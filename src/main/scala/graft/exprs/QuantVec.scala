package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, UnaryExpression
}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Quantized-int vector math as tight JVM loops behind codegen'd static
  * calls — the HOF (zip_with/aggregate) formulations are interpreted and
  * ~10x slower per row on 64-dim embeddings.
  *
  * Quantization contract (shared with the DuckDB oracles): per element,
  * q(x) = round-half-away-from-zero(x * 10000) as int64 — matching both
  * Spark's `round` (BigDecimal HALF_UP) and DuckDB's `ROUND`.
  */
object QuantVec {
  /** THE quantizer — the single definition every operator and expression
    * must share (IvfProbe, SignLsh, centroid packing): the quantization
    * contract is the oracle-portability linchpin, and a second copy that
    * drifts would silently desynchronize assignments from the oracle.
    */
  def q(x: Double): Long =
    if (x >= 0) math.floor(x * 10000.0 + 0.5).toLong
    else math.ceil(x * 10000.0 - 0.5).toLong

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += q(a.getFloat(i).toDouble) * q(b.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  def sqNorm(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val v = q(a.getFloat(i).toDouble)
      s += v * v
      i += 1
    }
    s
  }
}

case class QuantDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.exprs.QuantVec.dot($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QuantDot = copy(left = l, right = r)
}

/** Scalar twin of the array quantizers: one float element quantized
  * round-half-away ×10⁴ to int64 — the exact-integer per-dimension value
  * the k-means cluster sums aggregate ([[graft.ops.Similarity
  * .clusterSums]]), identical to how [[QuantDot]]/[[QuantSqNorm]] and the
  * packed IVF centroids quantize, so every vector operator in the module
  * shares one number system and the DuckDB oracle replays it with the
  * same ROUND arithmetic it already uses for the array paths.
  */
case class QuantElem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_elem"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quant_elem expects a float element, got $other")
    }
  override protected def nullSafeEval(a: Any): Any =
    QuantVec.q(a.asInstanceOf[Float].toDouble)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.exprs.QuantVec.q((double) $a)")
  override protected def withNewChildInternal(c: Expression): QuantElem =
    copy(child = c)
}

case class QuantSqNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_sq_norm"
  override protected def nullSafeEval(a: Any): Any =
    QuantVec.sqNorm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.exprs.QuantVec.sqNorm($a)")
  override protected def withNewChildInternal(c: Expression): QuantSqNorm =
    copy(child = c)
}
