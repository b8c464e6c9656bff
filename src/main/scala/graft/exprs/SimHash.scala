package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens (document fingerprinting for
  * near-duplicate detection). For each token, a 64-bit hash votes ±1 per
  * bit position; the sign of each bit's tally forms the fingerprint.
  * Near-duplicates differ in few bits (compare via hamming distance =
  * bit_count(a ^ b), a plain Spark expression).
  *
  * Implemented as a custom Catalyst expression (single pass over the
  * string, zero allocation per token, stays inside whole-stage codegen).
  */
object SimHash {

  /** FNV-1a 64-bit over Unicode CODE POINTS — deterministic,
    * dependency-free token hash. Codepoint (not UTF-16 unit) iteration
    * keeps the hash identical to engines that see codepoints (the DuckDB
    * oracle's string_split + unicode()) even for non-BMP input.
    */
  def fnv1a64(s: String, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h ^= cp.toLong
      h *= 0x100000001B3L
      i += Character.charCount(cp)
    }
    h
  }

  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val s = text
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) {
        val h = fnv1a64(s, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SimHash.simhash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.SimHash.simhash64($c.toString())")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))
}
