package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder with the codebooks as DATA, not plan
  * literals — the compression step that makes a 100 TB embedding store
  * affordable: a dim-D float vector (4·D bytes) becomes M small codes
  * (M bytes at K ≤ 256), a 32× cut at D=64/M=8 that an ADC scan can
  * still search without decompression.
  *
  * The vector is split into M contiguous subspaces (subspace i's width =
  * its codebook's centroid dimension; widths must sum to D). Each
  * subspace is quantized round-half-away ×10⁴ (the [[QuantVec]] contract,
  * so the DuckDB oracle replays bit-exactly) and assigned the codebook
  * row minimizing the EXACT int64 squared L2 distance, ties to the
  * smaller code. Codes index codebook rows 0..K−1 in the order given.
  *
  * Same engineering as [[IvfProbeLists]]: the codebook tensor rides as a
  * task-serialized reference object (`ctx.addReferenceObj`), so the plan
  * is ONE node at any M·K and assignment is a zero-shuffle scan-side
  * loop. Fail-loud stance shared with the IVF path: dimension mismatch
  * and null vector elements throw rather than skewing distances.
  *
  * Overflow contract (same as QuantVec): |element| ≤ ~10⁵ keeps every
  * (qe−c)² term ≤ ~4·10¹⁸ per coordinate pair; embedding-scale values
  * (|x| ≤ ~10²) are orders of magnitude inside it.
  */
object PqEncodeImpl {
  def encode(arr: ArrayData, books: Array[Array[Array[Long]]]): ArrayData = {
    var dimSum = 0
    var i = 0
    while (i < books.length) { dimSum += books(i)(0).length; i += 1 }
    if (arr.numElements() != dimSum)
      throw new IllegalArgumentException(
        s"embedding dim ${arr.numElements()} != codebook subspace widths " +
          s"summing to $dimSum — codebooks were built for a different " +
          "embedding column")
    val out = new Array[Int](books.length)
    var off = 0
    i = 0
    while (i < books.length) {
      val book = books(i)
      val sub = book(0).length
      val qe = new Array[Long](sub)
      var d = 0
      while (d < sub) {
        if (arr.isNullAt(off + d))
          throw new IllegalArgumentException(
            s"embedding has a null element at index ${off + d} — " +
              "pq_encode requires fully-populated vectors")
        qe(d) = QuantVec.q(arr.getFloat(off + d).toDouble)
        d += 1
      }
      var best = -1
      var bestDist = Long.MaxValue
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var s = 0L
        d = 0
        while (d < sub) { val t = qe(d) - c(d); s += t * t; d += 1 }
        // strict < keeps the FIRST minimum: ties go to the smaller code
        if (s < bestDist) { bestDist = s; best = j }
        j += 1
      }
      out(i) = best
      off += sub
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class PqEncode(
    child: Expression,
    books: Array[Array[Array[Long]]]
) extends UnaryExpression {
  require(books.nonEmpty, "need at least one subspace codebook")
  require(books.forall(_.nonEmpty), "every codebook needs >= 1 centroid")
  require(books.forall(b => b.forall(_.length == b(0).length)),
    "every centroid within a codebook must share that subspace's dimension")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        // containsNull = true accepted (parquet reads arrays as
        // nullable-element even when none is); a null ELEMENT throws in
        // PqEncodeImpl.encode — same stance as IvfProbeLists
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float> embeddings, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(input: Any): Any =
    PqEncodeImpl.encode(input.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.PqEncodeImpl.encode($c, $booksRef)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}
