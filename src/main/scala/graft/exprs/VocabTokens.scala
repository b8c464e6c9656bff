package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer-accurate token counting: greedy longest-match against a
  * broadcast vocabulary — the counts shard packing and token budgets
  * should key on, instead of the "BPE-ish" regex approximation
  * ([[graft.ops.TextStats.regexTokenCount]]). At each position the
  * longest vocab entry matching there is consumed as one token; a
  * position matching nothing consumes one CODEPOINT as a fallback token
  * (the byte/char-fallback every real BPE vocab has).
  *
  * The vocab rides along as a task-serialized reference object (the
  * [[IvfProbeLists]] pattern): ONE expression node and O(1) generated
  * code regardless of vocab size, shipped once per executor — never a
  * plan literal per entry. Lookup is a first-char-gated linear scan,
  * fine for the heuristic vocabs used here; a 50k-entry production
  * vocab would swap in a trie behind the same expression contract.
  *
  * Vocab entries must be non-empty ASCII: ASCII makes Java's UTF-16
  * `startsWith` offsets coincide with codepoint offsets, so the count
  * is identical to engines that match by codepoint (the DuckDB oracle's
  * `substr` arithmetic) on ANY input text, non-BMP included.
  */
object VocabTokensImpl {

  def count(text: UTF8String, vocab: Array[String]): Long = {
    val s = text.toString
    val len = s.length
    var i = 0
    var n = 0L
    while (i < len) {
      val c = s.charAt(i)
      var best = 0
      var j = 0
      while (j < vocab.length) {
        val tok = vocab(j)
        if (tok.length > best && tok.charAt(0) == c && s.startsWith(tok, i))
          best = tok.length
        j += 1
      }
      if (best > 0) i += best
      else i += Character.charCount(s.codePointAt(i))
      n += 1L
    }
    n
  }

  /** The same greedy walk, materializing the token SEQUENCE instead of
    * its length — the input the tokenizer-training pair counts need.
    * Kept as a second tight loop rather than a seq.length wrapper so
    * [[count]] stays allocation-free on the packing hot path.
    */
  def tokens(
      text: UTF8String,
      vocab: Array[String]
  ): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    val len = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      var best = 0
      var j = 0
      while (j < vocab.length) {
        val tok = vocab(j)
        if (tok.length > best && tok.charAt(0) == c && s.startsWith(tok, i))
          best = tok.length
        j += 1
      }
      val step = if (best > 0) best else Character.charCount(s.codePointAt(i))
      out += UTF8String.fromString(s.substring(i, i + step))
      i += step
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** One classic-BPE merge pass over a token sequence: every LEFTMOST
    * NON-OVERLAPPING adjacent (t1, t2) occurrence collapses to their
    * concatenation, in one left-to-right scan — "aaaa" under (a, a)
    * becomes [aa, aa], "aaa" becomes [aa, a] (the second candidate
    * overlaps the consumed first and is skipped). The single scan IS
    * the leftmost-non-overlap contract; the oracle replays it with a
    * parity rule over runs of consecutive match positions.
    */
  def applyMerge(
      toks: org.apache.spark.sql.catalyst.util.ArrayData,
      t1: UTF8String,
      t2: UTF8String,
      merged: UTF8String
  ): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = toks.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (i + 1 < n && t1.equals(toks.getUTF8String(i)) &&
          t2.equals(toks.getUTF8String(i + 1))) {
        out += merged
        i += 2
      } else {
        out += toks.getUTF8String(i)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

case class VocabTokenCount(
    child: Expression,
    vocab: Array[String]
) extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must be non-empty")
  require(vocab.forall(t => t.nonEmpty && t.forall(_ < 128)),
    "vocab entries must be non-empty ASCII (keeps UTF-16 offsets == " +
      "codepoint offsets, so counts match codepoint-based engines exactly)")
  require(vocab.distinct.length == vocab.length,
    "duplicate vocab entries")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vocab_token_count requires a string column, got $other")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vocab_token_count"
  override protected def nullSafeEval(input: Any): Any =
    VocabTokensImpl.count(input.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // vocab as a REFERENCE OBJECT: generated code stays O(1) in its size
    val vocabRef = ctx.addReferenceObj("vocab", vocab, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.VocabTokensImpl.count($c, $vocabRef)")
  }
  override protected def withNewChildInternal(c: Expression): VocabTokenCount =
    copy(child = c)
}

/** [[VocabTokenCount]]'s sequence twin: the greedy longest-match token
  * ARRAY. Same vocab contract, same reference-object shipping; feeds the
  * adjacent-pair counts of the BPE-training inner loop.
  */
case class VocabTokenSeq(
    child: Expression,
    vocab: Array[String]
) extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must be non-empty")
  require(vocab.forall(t => t.nonEmpty && t.forall(_ < 128)),
    "vocab entries must be non-empty ASCII (keeps UTF-16 offsets == " +
      "codepoint offsets, so tokens match codepoint-based engines exactly)")
  require(vocab.distinct.length == vocab.length,
    "duplicate vocab entries")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vocab_token_seq requires a string column, got $other")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vocab_token_seq"
  override protected def nullSafeEval(input: Any): Any =
    VocabTokensImpl.tokens(input.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocab, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.VocabTokensImpl.tokens($c, $vocabRef)")
  }
  override protected def withNewChildInternal(c: Expression): VocabTokenSeq =
    copy(child = c)
}

/** [[VocabTokensImpl.applyMerge]] as an expression: one BPE merge rule
  * applied to a token-sequence column. The merge pair is expression
  * CONFIG (one learned rule per pass, the BPE-training shape), not a
  * per-row input; rounds nest — round r's plan holds r of these nodes,
  * each a single O(tokens) scan.
  */
case class BpeMergeApply(
    child: Expression,
    t1: String,
    t2: String
) extends UnaryExpression {
  require(t1.nonEmpty && t2.nonEmpty, "merge tokens must be non-empty")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_apply requires array<string> without nulls, got $other")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_merge_apply"

  @transient private lazy val u1 = UTF8String.fromString(t1)
  @transient private lazy val u2 = UTF8String.fromString(t2)
  @transient private lazy val um = UTF8String.fromString(t1 + t2)

  override protected def nullSafeEval(input: Any): Any =
    VocabTokensImpl.applyMerge(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      u1, u2, um)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r1 = ctx.addReferenceObj("t1", u1, "org.apache.spark.unsafe.types.UTF8String")
    val r2 = ctx.addReferenceObj("t2", u2, "org.apache.spark.unsafe.types.UTF8String")
    val rm = ctx.addReferenceObj("m", um, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.VocabTokensImpl.applyMerge($c, $r1, $r2, $rm)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMergeApply =
    copy(child = c)
}
