package graft.metrics

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability without extra passes: `Observation` metrics ride
  * along with the action that materializes the DataFrame (no second scan),
  * and a partition histogram diagnoses shuffle skew before it burns a
  * 1000-executor stage.
  */
object Lineage {

  /** Attach row/null/min-max observations; read them AFTER an action:
    * {{{
    * val (df2, obs) = Lineage.observed(df, "ts")
    * df2.write.parquet(...)           // any action
    * val m = obs.get                  // Map(rows -> ..., nulls -> ...)
    * }}}
    */
  def observed(df: DataFrame, tsCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val out = df.observe(
      obs,
      count(lit(1)).as("rows"),
      sum(when(col(tsCol).isNull, 1L).otherwise(0L)).as("null_ts"),
      min(col(tsCol)).as("min_ts"),
      max(col(tsCol)).as("max_ts")
    )
    (out, obs)
  }

  /** Rows per physical partition (one lightweight job) + skew ratio. */
  def partitionHistogram(df: DataFrame): (Map[Int, Long], Double) = {
    val counts = df
      .groupBy(spark_partition_id().as("pid"))
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val skew =
      if (counts.isEmpty) 0.0
      else counts.values.max.toDouble / (counts.values.sum.toDouble / counts.size)
    (counts, skew)
  }
}
