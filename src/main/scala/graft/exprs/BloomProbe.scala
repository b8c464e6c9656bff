package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Deterministic Bloom-filter math shared by the build side (Sketches
  * .bloomBuild, plain DataFrame ops) and the probe side (the
  * [[BloomProbe]] expression). Everything stays in SIGNED int64 with 63
  * usable bits per word — bit 63 is never set, so the identical bit
  * pattern is replayable by engines with checked shift semantics (the
  * DuckDB oracle refuses `1 << 63`).
  *
  * Probe j of key x: fmix64(x ⊕ j·φ) (φ = the golden-ratio odd constant
  * [[SampleHashImpl.mix]] already uses), logical-shift-right 1 to a
  * non-negative signed value, then mod m = nWords·63. No false
  * negatives by construction; the false-positive rate is the standard
  * (1 − e^{−hn/m})^h.
  */
object BloomImpl {
  final val BitsPerWord = 63
  final val Phi = 0x9E3779B97F4A7C15L

  def position(key: Long, j: Int, nWords: Int): Long =
    (SampleHashImpl.mix(key ^ (j.toLong * Phi)) >>> 1) %
      (nWords.toLong * BitsPerWord)

  /** All-probes membership test against a packed word array. */
  def mightContain(key: Long, words: Array[Long], nHashes: Int): Boolean = {
    val nWords = words.length
    var j = 0
    while (j < nHashes) {
      val pos = position(key, j, nWords)
      val mask = 1L << (pos % BitsPerWord)
      if ((words((pos / BitsPerWord).toInt) & mask) == 0L) return false
      j += 1
    }
    true
  }
}

/** `bloom_might_contain(key)` with the packed filter as a REFERENCE
  * OBJECT (the [[IvfProbeLists]] pattern): the words array is serialized
  * once per task and registered via `ctx.addReferenceObj`, so the probe
  * is a zero-shuffle codegen'd projection with O(1) plan size no matter
  * how many bits the filter holds. This is the 100 TB shape for
  * "pre-filter a huge stream against a standing key set": the filter
  * broadcasts (8 B/word), the stream never shuffles, and only the
  * (rare) positives go on to an exact check.
  */
case class BloomProbe(
    child: Expression,
    words: Array[Long],
    nHashes: Int
) extends UnaryExpression {
  require(words.nonEmpty, "bloom filter must have at least one word")
  require(nHashes > 0, "nHashes must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a bigint key, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    BloomImpl.mightContain(input.asInstanceOf[Long], words, nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.BloomImpl.mightContain($c, $wordsRef, $nHashes)")
  }

  override protected def withNewChildInternal(c: Expression): BloomProbe =
    copy(child = c)
}
