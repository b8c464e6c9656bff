package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-level analytics a curation pipeline runs before and after
  * every transform: per-column profiles (the schema-drift / data-quality
  * gate), exact histograms (distribution eyeballing at any scale), and
  * exact per-group outlier flags (the "this document is 40σ long"
  * filter). All exact-integer / binary-collation outputs so each sits
  * under the hard DuckDB oracle — no floats, no sampling.
  */
object Analytics {

  /** One-pass column profiler: for each requested column, its row count,
    * null count, exact distinct count, and min/max rendered as strings
    * (binary collation — both engines compare UTF-8 bytes). The
    * before/after pair of these rows is the cheapest regression test a
    * pipeline stage can have.
    *
    * Scale shape: ONE aggregation over the scan. Multiple exact
    * count(distinct) columns plan as a single Expand + two-level
    * partial agg (rows × |cols| intermediate, key-only payload) — the
    * standard exact-distinct trade; swap in [[Sketches.kmvBuild]] when
    * approximate is acceptable. The unpivot to one row per column is a
    * driver-free inline explode of a |cols|-element array.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_str"),
        col(s"__mx_$c").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Exact equal-width histogram: per (keys, bin) the row count and the
    * observed value min/max inside the bin. `bin = floor(value/width)`
    * computed with integer arithmetic (subtract the non-negative `pmod`
    * remainder, then divide exactly) so negative values bin correctly
    * and no float rounding can move a boundary value across bins.
    * Scan-fused projection + one partial-agg shuffle keyed by
    * (keys, bin) — output is bounded by the number of OCCUPIED bins.
    */
  def histogram(
      df: DataFrame,
      value: Column,
      width: Long,
      keys: Seq[String] = Nil
  ): DataFrame = {
    require(width > 0, "bin width must be positive")
    val v = value.cast("long")
    // exact integral division (Spark's `/` would go through double):
    // the numerator is a multiple of width, so trunc-div == floor-div
    val bin = call_function("div", v - pmod(v, lit(width)), lit(width)).as("bin")
    df.filter(v.isNotNull)
      .groupBy(keys.map(col) :+ (bin: Column): _*)
      .agg(
        count(lit(1)).as("n"),
        min(v).as("v_min"),
        max(v).as("v_max"))
  }

  /** Exact per-group outlier flag: marks rows where
    * `(value − mean)² > z² · variance_pop` of the row's group — algebra
    * cleared of divisions and square roots so it stays on integers:
    * `(n·x − s)² > z² · (n·q − s²)` with s = Σx, q = Σx². Computed in
    * decimal(38,0) (the oracle replays in HUGEINT); exact for
    * |value| ≤ ~10⁹ at up to ~10¹⁰ rows per group — the caller's
    * contract, checked at analysis time only by the decimal domain
    * (Spark nulls on decimal overflow rather than corrupting).
    *
    * Note the strict `>`: a group with zero variance (all values equal,
    * including singletons) flags nothing. Scale shape: one key-only
    * stats agg (3 sums) + a broadcast-sized join back — group count
    * rows, never data rows, cross the second exchange.
    */
  def outliers(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      z2: Int
  ): DataFrame = {
    require(keys.nonEmpty, "outliers needs grouping keys")
    require(z2 > 0, "z² must be positive")
    val d = ExactU64.dec38
    val x = value.cast("long").cast(d)
    val stats = df
      .filter(value.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast(d).as("__gn"),
        sum(x).as("__gs"),
        sum(x * x).as("__gq"))
    val lhs = (col("__gn") * x - col("__gs")) * (col("__gn") * x - col("__gs"))
    val rhs = lit(z2).cast(d) *
      (col("__gn") * col("__gq") - col("__gs") * col("__gs"))
    df.filter(value.isNotNull)
      .join(stats, keys)
      .withColumn("is_outlier", lhs > rhs)
      .drop("__gn", "__gs", "__gq")
  }
}
