package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact trailing-window DISTINCT counts without per-row sets.
  *
  * "How many distinct tools did this conversation use in the last hour?"
  * is a standard point-in-time feature, but a naive rolling
  * `collect_set` over a range frame materializes a set per row (state
  * proportional to window contents × rows), and SQL engines don't
  * support `COUNT(DISTINCT)` over a moving frame at all.
  *
  * This computes it exactly as an interval sweep: a key occurrence at
  * time t is the LAST occurrence of its key inside the trailing window
  * (t_a − W, t_a] for exactly the anchors with t_a ∈ [t, min(t + W,
  * t_next)) — where t_next is the key's next occurrence — so each
  * occurrence contributes one +1/−1 interval, and the distinct count at
  * any anchor is the number of intervals covering it: a running sum over
  * the merged (delta, anchor) event stream. Per-row cost is O(1); state
  * is one running long per partition.
  */
object RollingDistinct {

  /** For every input row (the anchors), adds `as` = the number of
    * distinct non-null `keyCol` values among rows of the same
    * `partCols` group whose timestamp lies in the trailing window
    * `(ts − windowSeconds, ts]` — the anchor's own key included.
    *
    * `orderCols` break timestamp ties deterministically within a
    * (partition, key) stream; ties of the same key at one timestamp
    * collapse to a single interval (distinct semantics). Output carries
    * `partCols` + `idCols` + the count — `idCols` must identify rows.
    *
    * Scale shape: one window per (part, key) for the next-occurrence
    * lead, one window per part for the sweep — both ordered streams with
    * O(1) state, the same per-conversation geometry as
    * [[Sessionize]]. No joins, no sets, no quadratic frames.
    */
  def rollingDistinctByTime(
      df: DataFrame,
      partCols: Seq[String],
      tsCol: String,
      orderCols: Seq[String],
      keyCol: String,
      windowSeconds: Long,
      idCols: Seq[String],
      as: String = "n_distinct"
  ): DataFrame = {
    require(partCols.nonEmpty, "rollingDistinctByTime needs partition columns")
    require(windowSeconds > 0, "windowSeconds must be positive")
    require(idCols.nonEmpty, "idCols must identify output rows")
    val reserved = Seq(as, "__rd_t", "__rd_kind", "__rd_d")
    require(!reserved.exists(df.columns.contains),
      s"rollingDistinctByTime reserves ${reserved.mkString(", ")}")

    val epoch = {
      val e = col(tsCol).cast("long")
      when(e.isNotNull, e).otherwise(raise_error(lit(
        "rollingDistinctByTime: null timestamp")))
    }

    // last-occurrence intervals: this occurrence is the window's
    // representative of its key until the key recurs (or W elapses)
    val wk = Window
      .partitionBy((partCols :+ keyCol).map(col): _*)
      .orderBy(epoch +: orderCols.map(col): _*)
    val intervals = df
      .filter(col(keyCol).isNotNull)
      .select(partCols.map(col) :+ epoch.as("__rd_t")
        :+ lead(epoch, 1).over(wk).as("__rd_next"): _*)
      .withColumn("__rd_end",
        least(col("__rd_t") + windowSeconds, col("__rd_next")))
      // same key at the same epoch: empty interval, the later twin covers
      .filter(col("__rd_t") < col("__rd_end"))

    val idNulls = idCols // delta rows carry no identity
    def deltaRows(t: String, d: Int) = intervals.select(
      partCols.map(col) ++
        Seq(col(t).as("__rd_t"), lit(0).as("__rd_kind"), lit(d).as("__rd_d")) ++
        idNulls.map(c => lit(null).cast(df.schema(c).dataType).as(c)): _*)

    val anchors = df.select(
      partCols.map(col) ++
        Seq(epoch.as("__rd_t"), lit(1).as("__rd_kind"), lit(0).as("__rd_d")) ++
        idCols.map(col): _*)

    // the sweep: at one timestamp all +1/−1 deltas (kind 0) apply before
    // any anchor (kind 1) reads — closed start, open end, exactly
    val ws = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("__rd_t"), col("__rd_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltaRows("__rd_t", 1)
      .unionByName(deltaRows("__rd_end", -1))
      .unionByName(anchors)
      .withColumn(as, coalesce(sum(col("__rd_d")).over(ws), lit(0L)))
      .filter(col("__rd_kind") === 1)
      .select(partCols.map(col) ++ idCols.map(col) :+ col(as): _*)
  }
}
