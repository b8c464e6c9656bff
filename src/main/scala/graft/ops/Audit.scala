package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus integrity audits a 100 TB pipeline runs around every copy,
  * migration or re-partition: an order-independent dataset digest
  * (verify a replica without sorting either side) and an exact
  * join-size forecast (predict a self-join blowup before paying for
  * it). Both are single partial-agg passes — nothing here sorts,
  * windows, or collects.
  */
object Audit {

  /** Row checksum as an exact unsigned-64 decimal: the first 16 hex
    * digits of md5(canonical), split 8+8 so each half stays inside
    * `conv`'s signed-long domain. Pure projection, codegen'd, and
    * replayable in ANSI SQL (the oracle rebuilds the same value with
    * per-digit positional arithmetic).
    */
  private[ops] def rowHashU64(canonical: Column): Column = {
    val hx = md5(canonical)
    val hi = conv(substring(hx, 1, 8), 16, 10).cast(ExactU64.dec38)
    val lo = conv(substring(hx, 9, 8), 16, 10).cast(ExactU64.dec38)
    hi * lit(4294967296L) + lo
  }

  /** Order-independent per-group digest: one row per group with the row
    * count and the sum of row checksums mod 2^64. Two datasets hold
    * identical rows within a group (as multisets of the canonical
    * string) iff (n_rows, digest) agree — the commutative sum makes the
    * digest independent of row order, partitioning, and file layout, so
    * a replica on another cluster verifies with ONE scan + ONE tiny
    * exchange per side and no sort anywhere.
    *
    * Caller owns the canonical row encoding; it must pin every column
    * that matters (and separator-escape them — `concat_ws` with a
    * control char is the usual choice). Collisions: md5 truncated to 64
    * bits summed over n rows — adversarial inputs can forge, random
    * corruption is caught with p ≈ 1 − n/2^64; this is a transport
    * audit, not a security boundary.
    *
    * Scale shape: scan-fused projection → partial-agg groupBy (sum +
    * count combine map-side); output cardinality = |groups|. The mod
    * 2^64 fold runs once on the final decimal sum — `decimal(38,0)`
    * holds 2^64·n_rows exactly for n up to 10^18 rows per group.
    */
  def datasetDigest(
      df: DataFrame,
      canonical: Column,
      groupCols: Seq[String]
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        (sum(rowHashU64(canonical)) % ExactU64.two64).cast(ExactU64.dec38)
          .as("digest"))

  /** Exact inner-equi-join size forecast WITHOUT running the join: per
    * key, |left| × |right| pairs; returned as the `topK` heaviest keys
    * with each key's share of the total output in basis points. The sum
    * of per-key count products IS the exact join cardinality — this is
    * the planning query a pipeline runs before an all-pairs-shaped
    * self-join (dedup candidates, co-occurrence) to find the hot keys
    * that need capping or salting.
    *
    * Scale shape: one partial-agg groupBy per side (map-side combined),
    * an equi-join of the two COUNT frames (|keys| rows, never input
    * rows), a 1-row global total broadcast back, and a distributed
    * top-k (TakeOrderedAndProject) — the full input is scanned exactly
    * once per side and never shuffled row-wise.
    */
  def joinSizeProfile(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      topK: Int
  ): DataFrame = {
    require(topK > 0, "topK must be positive")
    val la = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val rb = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    val perKey = la.join(rb, Seq("key"))
      .withColumn("pairs",
        (col("n_left").cast(ExactU64.dec38) * col("n_right")).cast(ExactU64.dec38))
    val total = perKey.agg(
      sum(col("pairs")).cast(ExactU64.dec38).as("total_pairs"),
      count(lit(1)).as("n_join_keys"))
    perKey.crossJoin(broadcast(total))
      .withColumn("share_bp",
        ExactU64.floorDiv(col("pairs") * lit(10000L), col("total_pairs"))
          .cast("long"))
      .orderBy(col("pairs").desc, col("key").asc)
      .limit(topK)
  }
}
