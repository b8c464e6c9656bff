package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingle array: lowercase + single-space split + k-word
  * joins in a single JVM loop — semantics IDENTICAL to the HOF
  * composition it replaces ([[graft.ops.Dedup.shingles]] over
  * [[graft.ops.Dedup.words]], plus `array_distinct` when `distinct`):
  *
  *   words    = lower(text) split on single space (empties kept)
  *   shingles = k-word joins with ' ' (EMPTY array if fewer than k words)
  *   distinct = first-occurrence-order dedup (array_distinct semantics)
  *
  * The HOF chain (two zip_withs + transform + array_distinct) is
  * interpreted per element; this is the same one-loop trade
  * [[MinHashSig]] makes for signatures, for callers that need the raw
  * shingle strings (posting lists, n-gram streams). NULL text → NULL
  * (callers explode, which drops the row — same as the HOF path).
  */
object WordShinglesImpl {
  def shingles(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val words =
      text.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val nSh = words.length - k + 1
    if (nSh <= 0)
      return new GenericArrayData(Array.empty[Any])
    val sb = new java.lang.StringBuilder(64)
    if (!distinct) {
      val out = new Array[Any](nSh)
      var i = 0
      while (i < nSh) {
        sb.setLength(0)
        var w = 0
        while (w < k) {
          if (w > 0) sb.append(' ')
          sb.append(words(i + w))
          w += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < nSh) {
        sb.setLength(0)
        var w = 0
        while (w < k) {
          if (w > 0) sb.append(' ')
          sb.append(words(i + w))
          w += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }
}

case class WordShingles(child: Expression, shingleLen: Int, distinct: Boolean)
    extends UnaryExpression {
  require(shingleLen >= 1, "shingle length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingles(
      input.asInstanceOf[UTF8String], shingleLen, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.exprs.WordShinglesImpl.shingles($c, $shingleLen, $distinct);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}
