package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over an ASCII pattern set: every occurrence of
  * every pattern (overlapping included) is counted in ONE left-to-right
  * pass over the text, instead of one scan per pattern — the shape a
  * blocklist/badwords filter needs when the term list has thousands of
  * entries and the corpus is 100 TB (k regex passes over 100 TB is k
  * scans; this is one).
  *
  * Only the pattern array ships with the task (the expression holds it
  * as a reference object); the automaton itself is rebuilt once per JVM
  * from a transient lazy, so serialized plan size is O(Σ|pattern|), not
  * O(states × 128). Transitions are dense per state (goto with failure
  * links resolved at build time), so the match loop is one array load
  * per character with zero branching on misses. A character ≥ 128
  * resets to the root: patterns are ASCII-only (enforced), so no match
  * can span it, and the reset also realigns UTF-16 indexing with
  * codepoint indexing — counts are therefore identical to
  * codepoint-based engines (the DuckDB oracle's `substr` walk) on ANY
  * input, non-BMP included.
  *
  * Dense transitions cost states × 128 ints per JVM: a 10k-term × 8-char
  * blocklist is ~40 MB — fine per executor; a web-scale 1M-term list
  * would swap sparse transitions in behind the same contract.
  */
class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "pattern set must be non-empty")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "patterns must be non-empty ASCII (keeps UTF-16 offsets == codepoint " +
      "offsets, so counts match codepoint-based engines exactly)")
  require(patterns.distinct.length == patterns.length, "duplicate patterns")

  // rebuilt per JVM after deserialization; only `patterns` is serialized
  /** The resolved (delta, outputs) tables, for walkers living outside
    * this class (the span emitter in [[MultiMatchImpl]]). */
  private[exprs] def dense: (Array[Int], Array[Array[Int]]) = built

  @transient private lazy val built: (Array[Int], Array[Array[Int]]) = {
    val maxStates = patterns.map(_.length).sum + 1
    val next = Array.fill(maxStates * 128)(-1) // trie children
    val ownOut = Array.fill(maxStates)(List.empty[Int])
    var nStates = 1
    var pi = 0
    while (pi < patterns.length) {
      val p = patterns(pi)
      var st = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i).toInt
        if (next(st * 128 + c) < 0) { next(st * 128 + c) = nStates; nStates += 1 }
        st = next(st * 128 + c)
        i += 1
      }
      ownOut(st) ::= pi
      pi += 1
    }
    // BFS: failure links, then resolve goto-with-fallback into a dense
    // delta and fold the fail chain's outputs into each state once —
    // the match loop never walks a chain
    val fail = new Array[Int](nStates)
    val delta = new Array[Int](nStates * 128)
    val outs = new Array[Array[Int]](nStates)
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 128) {
      val ch = next(c)
      if (ch >= 0) { fail(ch) = 0; queue.add(ch); delta(c) = ch }
      else delta(c) = 0
      c += 1
    }
    outs(0) = ownOut(0).toArray
    while (!queue.isEmpty) {
      val st = queue.poll()
      outs(st) = (ownOut(st) ++ outs(fail(st)).toList).toArray
      var c2 = 0
      while (c2 < 128) {
        val ch = next(st * 128 + c2)
        if (ch >= 0) {
          fail(ch) = delta(fail(st) * 128 + c2)
          queue.add(ch)
          delta(st * 128 + c2) = ch
        } else {
          delta(st * 128 + c2) = delta(fail(st) * 128 + c2)
        }
        c2 += 1
      }
    }
    (delta, outs)
  }

  /** TOTAL occurrence count across all patterns — the gate predicate's
    * fast path: no per-pattern array, TRUE zero allocation (the walk
    * reads the UTF8String's bytes in place via getByte — no toString
    * transcode, no byte-array copy), and (per state) the output size is
    * precomputed, so the loop body is two array loads. Walking bytes is
    * exact: patterns are ASCII, any byte ≥ 0x80 (lead or continuation)
    * resets to root, which a match can never span.
    */
  def total(text: UTF8String): Long = {
    val (delta, outs) = built
    val len = text.numBytes
    var n = 0L
    var st = 0
    var i = 0
    while (i < len) {
      val c = text.getByte(i).toInt
      if (c >= 0) {
        st = delta(st * 128 + c)
        n += outs(st).length
      } else st = 0
      i += 1
    }
    n
  }

  /** Per-pattern occurrence counts (overlapping included), index-aligned
    * with `patterns`. One pass, one array load per byte, zero allocation
    * beyond the result array (same in-place byte walk as [[total]]).
    */
  def counts(text: UTF8String): Array[Long] = {
    val (delta, outs) = built
    val len = text.numBytes
    val n = new Array[Long](patterns.length)
    var st = 0
    var i = 0
    while (i < len) {
      val c = text.getByte(i).toInt
      if (c >= 0) {
        st = delta(st * 128 + c)
        val o = outs(st)
        var j = 0
        while (j < o.length) { n(o(j)) += 1L; j += 1 }
      } else st = 0
      i += 1
    }
    n
  }
}

object MultiMatchImpl {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** [start, end) BYTE spans of every occurrence of every pattern
    * (overlapping included), with the matched pattern as `term`. The
    * walk runs over the UTF-8 BYTES directly: patterns are ASCII, so
    * the byte automaton accepts exactly the same occurrences as the
    * char automaton (any byte ≥ 0x80 — lead or continuation — resets to
    * root, which a match can never span), and match positions fall out
    * in the byte convention [[PiiSpans]] and mergeSpans share, with no
    * String allocation per row.
    */
  def spans(text: UTF8String, ac: AcAutomaton): GenericArrayData = {
    val (delta, outs) = ac.dense
    val len = text.numBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var st = 0
    var i = 0
    while (i < len) {
      val c = text.getByte(i).toInt
      if (c >= 0) {
        st = delta(st * 128 + c)
        val o = outs(st)
        var j = 0
        while (j < o.length) {
          val p = ac.patterns(o(j))
          out += new GenericInternalRow(Array[Any](
            (i + 1 - p.length).toLong, (i + 1).toLong,
            UTF8String.fromString(p)))
          j += 1
        }
      } else st = 0
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def counts(
      text: UTF8String,
      ac: AcAutomaton
  ): org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(ac.counts(text))
}

/** array<bigint> of per-pattern occurrence counts for `child`, aligned
  * with the automaton's pattern order — the one-scan blocklist tagger.
  * The automaton is ONE reference object: generated code and plan size
  * stay O(1) in the pattern count (the [[IvfProbeLists]] pattern).
  */
case class MultiMatchCounts(
    child: Expression,
    ac: AcAutomaton
) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_match_counts requires a string column, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_match_counts"
  override protected def nullSafeEval(input: Any): Any =
    MultiMatchImpl.counts(input.asInstanceOf[UTF8String], ac)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac, "graft.exprs.AcAutomaton")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.MultiMatchImpl.counts($c, $acRef)")
  }
  override protected def withNewChildInternal(c: Expression): MultiMatchCounts =
    copy(child = c)
}

/** array<struct<start,end,term>> of [start, end) BYTE spans for every
  * pattern occurrence — WHERE each blocklist term matched, in the same
  * byte convention as [[PiiSpans]], so blocklist hits feed the same
  * mergeSpans do-not-train mask as PII and duplicate excisions.
  */
case class MultiMatchSpans(
    child: Expression,
    ac: AcAutomaton
) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_match_spans requires a string column, got $other")
    }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("start", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("end", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_match_spans"
  override protected def nullSafeEval(input: Any): Any =
    MultiMatchImpl.spans(input.asInstanceOf[UTF8String], ac)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac, "graft.exprs.AcAutomaton")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.MultiMatchImpl.spans($c, $acRef)")
  }
  override protected def withNewChildInternal(c: Expression): MultiMatchSpans =
    copy(child = c)
}

/** bigint TOTAL hit count across all patterns — the scalar the drop
  * gate filters on. Splitting it from [[MultiMatchCounts]] keeps the
  * gate inside whole-stage codegen (a higher-order `aggregate` over the
  * count array would fall out of it) and allocation-free per row.
  */
case class MultiMatchTotal(
    child: Expression,
    ac: AcAutomaton
) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_match_total requires a string column, got $other")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_match_total"
  override protected def nullSafeEval(input: Any): Any =
    ac.total(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac, "graft.exprs.AcAutomaton")
    defineCodeGen(ctx, ev, c => s"$acRef.total($c)")
  }
  override protected def withNewChildInternal(c: Expression): MultiMatchTotal =
    copy(child = c)
}
