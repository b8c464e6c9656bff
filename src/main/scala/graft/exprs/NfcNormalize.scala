package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) — the step a corpus pipeline runs BEFORE any
  * content hashing: "é" as U+00E9 and as "e"+U+0301 are the same text
  * to a reader but different bytes to md5/minhash/simhash, so
  * un-normalized corpora under-deduplicate. Spark ships no normalizer
  * function; this wraps the JDK's (same tables DuckDB's nfc_normalize
  * uses, so the oracle replays it).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that is true
  * for pure-ASCII and most already-composed text — the common case
  * allocates nothing and returns the input UTF8String as-is.
  */
object NfcNormalizeImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string input, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.NfcNormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
