package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 hides the Column ↔ Expression conversions behind
  * `private[sql]`; this bridge re-exports them for graft's custom
  * expressions (same technique as other Spark extension libraries).
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Materializes every output row of the plan (unlike count(), which lets
    * Catalyst prune projection-only plans down to a metadata count) — the
    * honest benchmark action.
    */
  def forceEvaluate(df: Dataset[_]): Long =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd.count()
}
