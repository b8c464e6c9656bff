package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram bucket stream in ONE scan: for each window of `n`
  * consecutive codepoints, the bucket id the compositional path
  * (split("") → [[graft.ops.Dedup.shingles]] → [[RollingHash]] → % dims)
  * would produce — WITHOUT materializing per-char arrays, per-gram
  * strings, or a zip_with chain. The space-joined shingle encoding is
  * folded into the recurrence directly: the virtual gram string is
  * `c₁ ' ' c₂ ' ' … cₙ`, so
  * `h = fold(c over window) { h·31 + c; between chars also h·31 + 32 }
  * mod 1e9+7`, bucket = h mod dims. Bit-identical to the string path on
  * BMP text (the string path splits UTF-16 units while this walks
  * codepoints — identical wherever no surrogate pairs appear, and the
  * codepoint walk is the one the DuckDB oracle's `string_split` +
  * `unicode()` replays exactly).
  *
  * Motivation is measured, not aesthetic: the NB classifier's gram
  * stream via the compositional path benched 7.6 s warm at sf0.1
  * (docs/bench_latest.json) — per-document it allocates a char array,
  * n-gram strings, and a hash pass per gram. This expression is a
  * single O(len) walk with one long[] output.
  */
object CharGramBucketsImpl {
  final val Mod = 1000000007L

  def buckets(text: UTF8String, n: Int, dims: Int): GenericArrayData = {
    val s = text.toString
    val len = s.length
    // collect codepoints once (cheap int[] vs per-gram String allocs)
    val cps = new Array[Int](len)
    var m = 0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      cps(m) = cp
      m += 1
      i += Character.charCount(cp)
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var p = 0
    while (p <= m - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        h = (h * 31L + cps(p + j).toLong) % Mod
        if (j < n - 1) h = (h * 31L + 32L) % Mod
        j += 1
      }
      out(p) = h % dims
      p += 1
    }
    new GenericArrayData(out)
  }
}

case class CharGramBuckets(
    child: Expression,
    n: Int,
    dims: Int
) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  require(dims > 0, "dims must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_gram_buckets requires a string column, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_gram_buckets"
  override protected def nullSafeEval(input: Any): Any =
    CharGramBucketsImpl.buckets(input.asInstanceOf[UTF8String], n, dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.CharGramBucketsImpl.buckets($c, $n, $dims)")
  override protected def withNewChildInternal(c: Expression): CharGramBuckets =
    copy(child = c)
}
