package graft.exprs

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ops.Dedup

/** WordShingles (one-loop JVM shingle array) vs the HOF composition it
  * replaces — must be indistinguishable on every input shape, since the
  * posting/n-gram operators swapped from one to the other.
  */
class WordShinglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a",                       // duplicate shingles
    "one two",                         // fewer than k words (k=3)
    "",                                // empty text -> [""] words
    " leading and  double  spaces ",   // empty tokens preserved
    "MiXeD CaSe ÜNICODE Straße ŁÓDŹ",  // lowercase folding
    "tab\tand\nnewline stay one token",
    null.asInstanceOf[String]
  )

  test("matches shingles(words(text), k) [+ array_distinct] for k = 1..4") {
    val df = cases.zipWithIndex.map(_.swap).toDF("id", "text")
    for (k <- 1 to 4) {
      val hofPlain = Dedup.shingles(Dedup.words(col("text")), k)
      val hofDist = array_distinct(hofPlain)
      val got = df.select(
          col("id"),
          Dedup.shingleCol(col("text"), k, distinct = false).as("g0"),
          Dedup.shingleCol(col("text"), k, distinct = true).as("g1"),
          hofPlain.as("e0"), hofDist.as("e1"))
        .collect()
      got.foreach { r =>
        assert(r.get(1) == r.get(3), s"k=$k plain id=${r.get(0)}")
        assert(r.get(2) == r.get(4), s"k=$k distinct id=${r.get(0)}")
      }
    }
  }

  test("randomized equivalence (500 strings, k=3)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab c  dé "
    val rows = (0 until 500).map { i =>
      (i, (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("id", "text")
    val bad = df.select(
        Dedup.shingleCol(col("text"), 3, distinct = true).as("g"),
        array_distinct(Dedup.shingles(Dedup.words(col("text")), 3)).as("e"))
      .filter(col("g") =!= col("e"))
      .count()
    assert(bad == 0L)
  }
}
