package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII span index: [start, end) BYTE offsets + kind for every token
  * [[graft.ops.TextStats.scrubPii]] would redact — the audit artifact a
  * release gate stores next to the scrubbed text ("WHERE was the email",
  * not just "an email was here"), and the input to span-level masking in
  * a tokenized pipeline. Classification is byte-for-byte the scrub's
  * rules (single-'@' email with nonempty local + dotted ≥3-byte domain;
  * 4 dot-separated 1–3-digit groups; ≥7-digit runs), so spans can never
  * desync from the redactions.
  *
  * Offsets are BYTES into the UNMODIFIED text (0-based start, exclusive
  * end): byte offsets are the engine-stable convention — char offsets
  * differ between UTF-8 and UTF-16 engines the moment a non-ASCII char
  * precedes the span. Tokenization splits on single 0x20 bytes, exactly
  * `split(text, " ", -1)`: UTF-8 continuation bytes never equal 0x20,
  * so the byte walk is safe on any input. One JVM pass per row,
  * shuffle-free, codegen'd.
  */
object PiiSpansImpl {

  private val IpRe = java.util.regex.Pattern.compile(
    "^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")
  private val NumRe = java.util.regex.Pattern.compile("^[0-9]{7,}$")

  /** null when the token is not PII; otherwise the kind tag. Mirrors the
    * when-chain order of scrubPii (email, then ip, then num).
    */
  def classify(tok: String): String = {
    val at = tok.indexOf('@')
    if (at >= 0 && tok.indexOf('@', at + 1) < 0) {
      val dom = tok.substring(at + 1)
      // byte lengths, matching the Column rules' octet_length
      if (tok.substring(0, at).getBytes("UTF-8").length >= 1 &&
        dom.getBytes("UTF-8").length >= 3 && dom.contains("."))
        return "email"
    }
    if (IpRe.matcher(tok).matches()) return "ip"
    if (NumRe.matcher(tok).matches()) return "num"
    null
  }

  def spans(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var tokStart = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > tokStart) {
          val kind = classify(
            new String(bytes, tokStart, i - tokStart, "UTF-8"))
          if (kind != null)
            out += new GenericInternalRow(Array[Any](
              tokStart.toLong, i.toLong, UTF8String.fromString(kind)))
        }
        tokStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class PiiSpans(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pii_spans requires a string column, got $other")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("end", LongType, nullable = false),
      StructField("kind", StringType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_spans"
  override protected def nullSafeEval(input: Any): Any =
    PiiSpansImpl.spans(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.PiiSpansImpl.spans($c)")
  override protected def withNewChildInternal(c: Expression): PiiSpans =
    copy(child = c)
}
