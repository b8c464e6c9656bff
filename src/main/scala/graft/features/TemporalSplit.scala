package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-based train/test splitting with an EMBARGO band — the split a
  * point-in-time feature pipeline must use (a random split leaks: a
  * training row later than a test row lets the model see the future).
  *
  * Rows strictly before `cutoff − embargoSec` are `train`; rows at or
  * after `cutoff` are `test`; the band in between is `embargo` —
  * excluded from BOTH sides so that features computed with trailing
  * windows (rolling counts, LOCF, as-of merges up to `embargoSec` of
  * lookback) can never straddle the boundary. Set `embargoSec` to the
  * longest feature lookback; 0 collapses to a plain cutoff split.
  *
  * Scale shape: a scan-fused projection — zero shuffle, zero state; the
  * split column is a pure function of the event time, so it is stable
  * across re-runs, partitions, and engines (the oracle replays it
  * verbatim). Assigning by entity instead (all of a conversation on one
  * side) is [[graft.ops.Curation.sampleGateBp]] on conv_id; this
  * operator is the TEMPORAL axis.
  */
object TemporalSplit {

  /** Adds `split` ∈ {'train','embargo','test'}. `cutoff` is epoch
    * seconds UTC; `tsCol` must be a timestamp column.
    */
  def byTime(
      df: DataFrame,
      tsCol: String,
      cutoffEpochSec: Long,
      embargoSec: Long
  ): DataFrame = {
    require(embargoSec >= 0, "embargoSec must be non-negative")
    val t = col(tsCol).cast("long")
    df.withColumn("split",
      when(t < cutoffEpochSec - embargoSec, "train")
        .when(t >= cutoffEpochSec, "test")
        .otherwise("embargo"))
  }

  /** Split-boundary audit: per split, row count and the min/max event
    * second — the frame a pipeline asserts on before training (train's
    * max must be < cutoff − embargo, test's min ≥ cutoff).
    */
  def audit(
      df: DataFrame,
      tsCol: String,
      cutoffEpochSec: Long,
      embargoSec: Long
  ): DataFrame =
    byTime(df, tsCol, cutoffEpochSec, embargoSec)
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(tsCol).cast("long")).as("min_sec"),
        max(col(tsCol).cast("long")).as("max_sec"))

  /** Zero-leakage invariant as a Column (for raise_error gating or
    * filter-based assertions): true iff the row's split is consistent
    * with its own timestamp.
    */
  def consistent(tsCol: String, cutoffEpochSec: Long, embargoSec: Long): Column = {
    val t = col(tsCol).cast("long")
    (col("split") === "train" && t < cutoffEpochSec - embargoSec) ||
      (col("split") === "test" && t >= cutoffEpochSec) ||
      (col("split") === "embargo" && t >= cutoffEpochSec - embargoSec &&
        t < cutoffEpochSec)
  }
}
