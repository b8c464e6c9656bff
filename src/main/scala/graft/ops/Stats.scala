package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics for corpus dashboards — the numbers a
  * curation run is tuned against (doc-length percentiles per language,
  * token-count spread per source).
  *
  * Quantiles here are EXACT and DISCRETE: the q-quantile of a group of n
  * rows is the value at rank ceil(q·n) in (value, tiebreaker) order — an
  * element of the data, computed by rank selection, never interpolated.
  * That makes the result integer-exact and engine-portable (the oracle
  * replays the identical row_number + ceil arithmetic in SQL), unlike
  * approx_percentile (non-deterministic sketch) or interpolating
  * percentile functions (float formulas that differ across engines).
  */
object Stats {

  /** Per-group exact discrete quantiles of an integer column, one output
    * row per group: (group, n, q<bp1>, q<bp2>, ...). `qsBp` are quantile
    * levels in basis points (5000 = median, 9900 = p99).
    *
    * Scale shape: one shuffle on the group key, then a per-group sort
    * window — groups parallelize, the same contract as every grouped
    * window in this library. The rank selection is pure integer
    * predicates, no division:  rn = ceil(q·n/10⁴)  ⇔
    * rn·10⁴ ≥ q·n  ∧  (rn−1)·10⁴ < q·n.
    */
  def exactGroupedQuantiles(
      df: DataFrame,
      groupCol: String,
      value: Column,
      tieCol: String,
      qsBp: Seq[Int]
  ): DataFrame = {
    require(qsBp.nonEmpty && qsBp.forall(q => q > 0 && q <= 10000),
      "quantiles are basis points in 1..10000")
    require(!Seq("__v", "__rn", "__n").exists(df.columns.contains),
      "exactGroupedQuantiles reserves the column names __v, __rn, __n")
    val w = Window.partitionBy(col(groupCol)).orderBy(value, col(tieCol))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__v", value)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val picks = qsBp.map { q =>
      val qn = lit(q.toLong) * col("__n")
      val isPick = col("__rn") * 10000L >= qn &&
        (col("__rn") - 1L) * 10000L < qn
      max(when(isPick, col("__v"))).as(s"q$q")
    }
    ranked.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), picks: _*)
  }
}
