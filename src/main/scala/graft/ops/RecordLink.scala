package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage: find rows in two sources that describe the
  * same real-world entity without an all-pairs compare — the entity
  * resolution step a multi-source corpus runs before cross-source dedup
  * can trust its ids (user accounts across ingest feeds, paper records
  * across crawls).
  *
  * Fellegi–Sunter shape (1969), fixed-point weights: candidate pairs
  * come ONLY from an equi-join on cheap blocking keys; each field
  * comparison contributes an agreement or disagreement weight (basis
  * points, integer — in the probabilistic model these are the log-odds
  * ln(m/u), here supplied by the caller as published constants so the
  * decision replays bit-exact); the summed score against a threshold
  * classifies the pair.
  *
  * Scale shape: the blocking join shuffles both sides by the block key
  * — candidates are |block|² per block, NEVER |A|·|B|; run
  * [[Audit.joinSizeProfile]] on the block keys first to see exactly how
  * many pairs a key layout buys and which hot block needs a finer key.
  * Scoring is a scan-fused projection over the candidate stream; the
  * threshold filter prunes before anything downstream shuffles.
  */
object RecordLink {

  /** One field comparison: `agree` is any deterministic boolean over
    * the joined (prefixed) columns — exact equality, prefix match,
    * last-4 match. Disagreement weights are typically negative.
    */
  final case class FieldRule(
      field: String,
      agree: Column,
      wAgreeBp: Long,
      wDisagreeBp: Long)

  /** Join `a` and `b` on identically-named blocking columns, score every
    * candidate with the field rules, keep pairs scoring ≥ thresholdBp.
    * Output = all columns of both inputs plus one `agree_<field>`
    * boolean per rule and the summed `score_bp`.
    *
    * Callers prefix their payload columns (a_… and b_…) so nothing
    * collides; blocking columns must carry the SAME name on both sides.
    */
  def linkBlocked(
      a: DataFrame,
      b: DataFrame,
      blockCols: Seq[String],
      rules: Seq[FieldRule],
      thresholdBp: Long
  ): DataFrame = {
    require(blockCols.nonEmpty, "blocking on nothing is an all-pairs join")
    require(rules.nonEmpty, "at least one field rule is required")
    val cands = a.join(b, blockCols)
    val flagged = rules.foldLeft(cands) { (d, r) =>
      d.withColumn(s"agree_${r.field}", r.agree)
    }
    flagged
      .withColumn("score_bp",
        rules.map(r => when(col(s"agree_${r.field}"), lit(r.wAgreeBp))
          .otherwise(lit(r.wDisagreeBp))).reduce(_ + _))
      .filter(col("score_bp") >= thresholdBp)
  }
}
