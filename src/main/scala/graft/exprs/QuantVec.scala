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

  def gramPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val qs = new Array[Long](n)
    var i = 0
    while (i < n) { qs(i) = q(a.getFloat(i).toDouble); i += 1 }
    val out = new Array[Any](n * (n + 1) / 2)
    var idx = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        out(idx) = org.apache.spark.sql.catalyst.InternalRow(
          i, j, qs(i) * qs(j), qs(i), qs(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

/** Upper-triangle Gram contributions of ONE embedding row: for every
  * dimension pair i ≤ j, the struct (i, j, p = qᵢ·qⱼ, qᵢ, qⱼ) over the
  * shared [[QuantVec.q]] quantization — `inline` + one partial-agg sum
  * per (i, j) key turns these into the exact-integer covariance/PCA
  * sufficient statistics (n, Σqᵢ, Σqⱼ, Σqᵢqⱼ) with d(d+1)/2 output keys
  * no matter the corpus size. Quantized once per element, not per pair.
  */
case class QuantGramPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("p", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("qi", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("qj", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quant_gram_pairs"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quant_gram_pairs requires array<float>, got $other")
    }
  override protected def nullSafeEval(a: Any): Any =
    QuantVec.gramPairs(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.exprs.QuantVec.gramPairs($a)")
  override protected def withNewChildInternal(c: Expression): QuantGramPairs =
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
