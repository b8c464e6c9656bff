package graft.exprs

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: lowercase+split+shingle+md5+min in a single
  * JVM loop. Semantics are IDENTICAL to the HOF composition it replaces
  * (and to the DuckDB oracle):
  *
  *   words    = lower(text) split on single space (empties kept)
  *   shingles = k-word joins with ' ' (empty if fewer than `shingleLen`)
  *   sig(j)   = min over shingles of substr(md5(s"${j/4}|" + shingle),
  *              8*(j%4)+1, 8)    — four 32-bit hashes per md5
  *
  * Returns NULL when there are fewer than `shingleLen` words (caller
  * filters those out, matching the HOF path's pre-filter).
  */
object MinHashSigImpl {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexChars((bytes(i) >> 4) & 0xF)
      out(i * 2 + 1) = hexChars(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  def signature(text: UTF8String, k: Int, shingleLen: Int): ArrayData = {
    val words =
      text.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val nSh = words.length - shingleLen + 1
    if (nSh <= 0) return null
    val mins = new Array[String](k)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var w = 0
      while (w < shingleLen) {
        if (w > 0) sb.append(' ')
        sb.append(words(i + w))
        w += 1
      }
      val shingle = sb.toString
      var g = 0
      while (g < k / 4) {
        val h = md5Hex(g.toString + "|" + shingle)
        var c = 0
        while (c < 4) {
          val j = g * 4 + c
          val part = h.substring(c * 8, c * 8 + 8)
          if (mins(j) == null || part.compareTo(mins(j)) < 0) mins(j) = part
          c += 1
        }
        g += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }
}

case class MinHashSig(child: Expression, k: Int, shingleLen: Int)
    extends UnaryExpression {
  require(k % 4 == 0, "k must be a multiple of 4")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    MinHashSigImpl.signature(input.asInstanceOf[UTF8String], k, shingleLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.exprs.MinHashSigImpl.signature($c, $k, $shingleLen);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}
