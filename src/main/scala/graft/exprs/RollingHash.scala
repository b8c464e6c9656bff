package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint over Unicode codepoints:
  *
  *   h_0 = 0;  h_i = (h_{i-1} * 31 + codepoint_i) mod 1_000_000_007
  *
  * The modulus keeps every intermediate product under 2^63 (no silent
  * wraparound), which is what makes the fingerprint portable: DuckDB
  * BIGINT arithmetic errors on overflow instead of wrapping, so the
  * oracle can replay the exact same recurrence with list_reduce over
  * unicode() codepoints (q_rolling_fp in SparkEntry.oracleSql).
  * Surrogate pairs count as ONE codepoint on both sides.
  */
object RollingHashImpl {
  final val Mod = 1000000007L

  def hash(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp.toLong) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(input: Any): Any =
    RollingHashImpl.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.RollingHashImpl.hash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)
}
