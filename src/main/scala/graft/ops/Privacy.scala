package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy gates beyond regex PII scrubbing ([[TextStats]]): consistent
  * key pseudonymization and k-anonymity suppression — the two operations
  * a corpus release runs before transcripts leave the trust boundary.
  */
object Privacy {

  /** Deterministic pseudonym for an identifier column: a salted
    * 64-bit md5 surrogate (`u_<16 hex>`). The same id always maps to the
    * same pseudonym, so joinability and per-entity grouping SURVIVE the
    * relabeling — the property naive redaction destroys — while rotating
    * `salt` per release makes pseudonyms unlinkable ACROSS releases.
    * Null ids stay null. md5 keeps the mapping engine-portable (the
    * oracle replays it literally, q_pseudonymize); one-wayness holds
    * only while the salt is secret, which is the standard surrogate-key
    * trade, not an encryption claim.
    */
  def pseudonym(id: Column, salt: String, prefix: String = "u_"): Column =
    concat(lit(prefix), substring(md5(concat(lit(salt), id)), 1, 16))

  /** Replace each of `keyCols` with its [[pseudonym]], in place. A
    * zero-shuffle scan projection — at 100 TB this rides the export scan
    * for free.
    */
  def pseudonymizeKeys(
      df: DataFrame,
      keyCols: Seq[String],
      salt: String
  ): DataFrame =
    keyCols.foldLeft(df)((d, c) => d.withColumn(c, pseudonym(col(c), salt)))

  /** k-anonymity suppression: keep only rows whose quasi-identifier
    * combination (`quasiCols`) occurs in at least `k` rows — a row whose
    * (lang, source, …) combo is near-unique re-identifies its author even
    * with ids pseudonymized. Adds `k_count` (the combo's cardinality) for
    * release auditing; the complement is the caller's suppressed set.
    *
    * NULL-SAFE: a combo containing nulls is a combo like any other (the
    * join matches with `<=>`), so null-heavy rows are suppressed or kept
    * by their true frequency rather than silently dropped by null
    * equality.
    *
    * Scale shape: ONE partial-agg shuffle on the quasi columns for the
    * combo counts, then an equi-join back on the same key — both
    * exchanges share the (quasi) partitioning, and AQE broadcasts the
    * count side when the combo space is small (the common case: quasi
    * columns are low-cardinality by definition).
    */
  def kAnonFilter(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("k_count"),
      "kAnonFilter reserves the column name k_count")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k_count"))
      .filter(col("k_count") >= k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("k_count"): _*)
    val cond = quasiCols
      .map(c => col(c) <=> col(s"__q_$c"))
      .reduce(_ && _)
    df.join(counts, cond)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
  }

  /** l-diversity audit — k-anonymity's companion gate: a quasi-identifier
    * combo can be k-anonymous yet still leak if all k rows share one
    * sensitive value (the homogeneity attack). Per combo: row count,
    * DISTINCT sensitive-value count (`diversity`; NULL sensitive values
    * are excluded, the standard count-distinct rule in both engines), and
    * `meets_l`. Release gates join the failing combos back for
    * suppression, exactly like [[kAnonFilter]].
    *
    * Scale shape: ONE exact count-distinct aggregation — Catalyst plans
    * it as two partial aggs (first keyed (quasi…, sensitive), then
    * (quasi…)), both map-side combinable, so a billion-row combo reduces
    * before either exchange.
    */
  def lDiversityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      l: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        count_distinct(sensitive).as("diversity"))
      .withColumn("meets_l", col("diversity") >= l)
  }

  /** t-closeness audit — the last rung of the release-gate ladder
    * ([[kAnonFilter]] → [[lDiversityAudit]] → this): a combo can be
    * k-anonymous AND l-diverse yet still leak when its sensitive-value
    * DISTRIBUTION deviates from the corpus (skewness attack: "this
    * combo's doc lengths are all near the extremes"). Per combo, the
    * Earth-Mover's Distance between the combo's distribution and the
    * global one over the ORDERED sensitive values (Li, Li &
    * Venkatasubramanian, ICDE'07 §4: for ordered data,
    * EMD = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m−1)), as the EXACT rational
    * (emd_num, emd_den): the cumulative difference at value i is
    * (cumCᵢ·N − cumGᵢ·N_q) / (N_q·N), so
    * `emd_num = Σᵢ |cumCᵢ·N − cumGᵢ·N_q|`, `emd_den = N_q·N·(m−1)`,
    * and `meets_t ⇔ emd_num·10⁴ ≤ tBp·emd_den` — no float division
    * anywhere, so the audit sits under a byte-exact oracle. The i = m
    * term is identically 0 (both cumulatives hit their totals), so
    * summing all m terms equals the standard m−1-term sum. m = 1
    * (a single global value) makes every distribution identical:
    * emd_num = 0 and the denominator uses max(m−1, 1) to stay nonzero.
    *
    * `sensitive` must be an ORDERED, bounded-cardinality column — pass
    * a generalized/bucketized value (e.g. `n_chars div 100`), which is
    * the standard t-closeness setting (distributions are compared over
    * the generalization hierarchy's leaves). NULL sensitive values are
    * excluded, matching [[lDiversityAudit]]'s count-distinct rule.
    *
    * Scale shape: ONE data-sized shuffle — the (quasi…, value) cell
    * counts, map-side combinable. Everything downstream is
    * aggregate-sized: the global distribution (m rows — its cumsum
    * window is single-partition BY DESIGN, over the m bucket values,
    * never over data rows), the |Q|·m dense grid (combo space × bucket
    * space, broadcast-joined), and per-combo cumsum windows of exactly
    * m rows each. Products are decimal(38,0): at 10¹² rows,
    * cumC·N ≤ 10²⁴ and N_q·N·(m−1) ≤ 10²⁷ — inside decimal range,
    * far past long.
    */
  def tClosenessAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      tBp: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tBp >= 0 && tBp <= 10000, s"tBp must be in [0, 10000], got $tBp")
    val dec = "decimal(38,0)"
    val base = df.filter(sensitive.isNotNull)
      .select(quasiCols.map(col) :+ sensitive.as("__v"): _*)
    val cells = base.groupBy(quasiCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val global = cells.groupBy(col("__v")).agg(sum("__c").as("__g"))
    val gcum = global.select(col("__v"),
      sum("__g").over(Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("__cumg"))
    val tot = global.agg(sum("__g").as("__N"), count(lit(1)).as("__m"))
    val groups = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("__nq"))
    val grid = groups.crossJoin(broadcast(gcum))
      .crossJoin(broadcast(tot))
    // null-safe cell join: a combo containing NULL quasi values is a
    // combo like any other (same rule as kAnonFilter)
    val cellsR = cells.select(
      quasiCols.map(c => col(c).as(s"__q_$c")) :+
        col("__v").as("__qv") :+ col("__c"): _*)
    val cond = (quasiCols.map(c => col(c) <=> col(s"__q_$c")) :+
      (col("__v") === col("__qv"))).reduce(_ && _)
    val cumW = Window.partitionBy(quasiCols.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = grid.join(cellsR, cond, "left")
      .withColumn("__cumc",
        sum(coalesce(col("__c"), lit(0L))).over(cumW))
      .withColumn("__term",
        abs(col("__cumc").cast(dec) * col("__N").cast(dec) -
          col("__cumg").cast(dec) * col("__nq").cast(dec)))
    terms
      .groupBy(quasiCols.map(col) :+ col("__nq") :+ col("__N") :+
        col("__m"): _*)
      .agg(sum(col("__term")).cast(dec).as("emd_num"))
      .withColumn("emd_den",
        (col("__nq").cast(dec) * col("__N").cast(dec) *
          greatest(col("__m") - 1, lit(1L)).cast(dec)).cast(dec))
      .withColumn("meets_t",
        col("emd_num") * lit(10000L).cast(dec) <=
          lit(tBp).cast(dec) * col("emd_den"))
      .select(quasiCols.map(col) :+ col("__nq").as("n") :+
        col("emd_num") :+ col("emd_den") :+ col("meets_t"): _*)
  }
}
