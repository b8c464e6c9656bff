package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key, at scale.
  *
  * Spark plans `L join R on L.ts between R.start and R.end` as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a full
  * broadcast of one side, which stops working the moment the interval
  * table outgrows the driver. Binning restores an equi key: quantize
  * the time axis into `binWidthSec` bins, register each interval in
  * every bin it covers, give each point its single bin, and equi-join
  * on the bin before refining the exact predicate.
  *
  * Each matching (point, interval) pair meets EXACTLY once — in the
  * point's bin — so no dedup pass is needed. The shuffle is keyed by
  * bin: pick `binWidthSec` near the typical interval length so the
  * interval fan-out (an interval spanning B bins is replicated B
  * times) stays O(1); the fan-out is capped by `maxBinsPerInterval`
  * and overflow FAILS LOUD rather than silently exploding a stage
  * (an open-ended interval at 1 s bins would otherwise replicate
  * millions of times).
  */
object RangeJoin {

  /** Inner join of `left` (point `tsCol`, epoch-second semantics via
    * cast to long) with `right` (interval [`startCol`, `endCol`],
    * inclusive both ends). Column names of the two sides must be
    * disjoint. Intervals with end < start fail loud.
    */
  def pointInInterval(
      left: DataFrame,
      tsCol: String,
      right: DataFrame,
      startCol: String,
      endCol: String,
      binWidthSec: Long,
      maxBinsPerInterval: Int = 4096
  ): DataFrame = {
    require(binWidthSec > 0, "binWidthSec must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: $overlap")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "pointInInterval reserves the column name __bin")

    def bin(c: Column): Column =
      call_function("div", c.cast("long"), lit(binWidthSec))

    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val guarded = right
      .withColumn("__b0",
        when(e >= s, bin(col(startCol))).otherwise(raise_error(concat(
          lit("pointInInterval: interval end before start at "),
          col(startCol).cast("string")))))
      .withColumn("__b1", bin(col(endCol)))
      // span stays a LONG: casting to int first would overflow (ANSI
      // throws a generic cast error; non-ANSI wraps and can sneak past
      // the guard) for exactly the pathological intervals the guard is
      // for (e.g. an end timestamp accidentally stored in millis)
      .withColumn("__span", col("__b1") - col("__b0") + 1L)
      .withColumn("__b1",
        when(col("__span") <= maxBinsPerInterval.toLong, col("__b1"))
          .otherwise(raise_error(concat(
            lit(s"pointInInterval: interval spans more than " +
              s"$maxBinsPerInterval bins of $binWidthSec s — widen " +
              "binWidthSec or split the interval at "),
            col(startCol).cast("string")))))
    val binnedRight = guarded
      .withColumn("__bin", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1", "__span")
    val binnedLeft = left.withColumn("__bin", bin(col(tsCol)))
    binnedLeft
      .join(binnedRight, Seq("__bin"))
      .filter(col(tsCol).cast("long") >= s && col(tsCol).cast("long") <= e)
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join (inclusive ends, epoch-second
    * semantics) — sessions × incident windows, spans × embargo ranges —
    * with the same binned equi key as [[pointInInterval]], no
    * BroadcastNestedLoopJoin, no driver-sized side.
    *
    * Exactly-once without a dedup pass: a candidate pair meets in every
    * bin both intervals cover, so it is KEPT only in the bin of the
    * overlap's left edge, `bin(greatest(lStart, rStart))` — one bin per
    * pair, chosen by arithmetic both copies agree on. Fan-out guards
    * and end-before-start checks are [[pointInInterval]]'s, applied to
    * BOTH sides (each interval replicates to the bins it covers, capped
    * by `maxBinsPerInterval`, overflow fails loud).
    */
  def intervalOverlap(
      left: DataFrame,
      lStartCol: String,
      lEndCol: String,
      right: DataFrame,
      rStartCol: String,
      rEndCol: String,
      binWidthSec: Long,
      maxBinsPerInterval: Int = 4096
  ): DataFrame = {
    require(binWidthSec > 0, "binWidthSec must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: $overlap")
    require(!(left.columns ++ right.columns).contains("__bin"),
      "intervalOverlap reserves the column name __bin")

    def bin(c: Column): Column =
      call_function("div", c.cast("long"), lit(binWidthSec))

    def binned(df: DataFrame, startCol: String, endCol: String): DataFrame = {
      val s = col(startCol).cast("long")
      val e = col(endCol).cast("long")
      df.withColumn("__b0",
          when(e >= s, bin(col(startCol))).otherwise(raise_error(concat(
            lit("intervalOverlap: interval end before start at "),
            col(startCol).cast("string")))))
        .withColumn("__b1", bin(col(endCol)))
        .withColumn("__span", col("__b1") - col("__b0") + 1L)
        .withColumn("__b1",
          when(col("__span") <= maxBinsPerInterval.toLong, col("__b1"))
            .otherwise(raise_error(concat(
              lit(s"intervalOverlap: interval spans more than " +
                s"$maxBinsPerInterval bins of $binWidthSec s — widen " +
                "binWidthSec or split the interval at "),
              col(startCol).cast("string")))))
        .withColumn("__bin", explode(sequence(col("__b0"), col("__b1"))))
        .drop("__b0", "__b1", "__span")
    }

    val lS = col(lStartCol).cast("long")
    val lE = col(lEndCol).cast("long")
    val rS = col(rStartCol).cast("long")
    val rE = col(rEndCol).cast("long")
    binned(left, lStartCol, lEndCol)
      .join(binned(right, rStartCol, rEndCol), Seq("__bin"))
      .filter(lS <= rE && rS <= lE &&
        col("__bin") === bin(greatest(col(lStartCol).cast("long"),
          col(rStartCol).cast("long"))))
      .drop("__bin")
  }
}
