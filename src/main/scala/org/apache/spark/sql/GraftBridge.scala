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
}
