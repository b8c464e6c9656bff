package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BYTE start offsets of each single-space-split token (empties
  * included — exactly `split(text, " ", -1)`), plus one SENTINEL entry:
  * for n tokens the array has n+1 longs, where entry j is token j's
  * first byte and entry n is totalBytes + 1 (the start the (n+1)-th
  * token would have). The sentinel makes end arithmetic uniform: token
  * j's exclusive byte end is offsets[j+1] − 1 for EVERY j, last token
  * included — the bridge from word/block coordinates (segment dedup,
  * word chunking) to the byte-span convention of [[PiiSpans]].
  *
  * One pass over the UTF-8 bytes; continuation bytes never equal 0x20,
  * so the walk is safe on any input. Shuffle-free, codegen'd.
  */
object WordByteOffsetsImpl {
  def offsets(text: UTF8String): UnsafeArrayData = {
    val bytes = text.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) n += 1
      i += 1
    }
    val out = new Array[Long](n + 1)
    out(0) = 0L
    var w = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { out(w) = i + 1L; w += 1 }
      i += 1
    }
    out(n) = bytes.length + 1L
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class WordByteOffsets(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_byte_offsets requires a string column, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_byte_offsets"
  override protected def nullSafeEval(input: Any): Any =
    WordByteOffsetsImpl.offsets(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.WordByteOffsetsImpl.offsets($c)")
  override protected def withNewChildInternal(c: Expression): WordByteOffsets =
    copy(child = c)
}
