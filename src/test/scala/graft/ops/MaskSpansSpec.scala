package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class MaskSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordByteOffsets: starts of every token plus the uniform end " +
    "sentinel, multi-byte chars counted in bytes") {
    val got = Seq(Tuple1("héllo wörld x"))
      .toDF("t")
      .select(TextStats.wordByteOffsets(col("t")))
      .as[Seq[Long]].head()
    // "héllo"=6B @0, "wörld"=6B @7, "x"=1B @14, sentinel = 15+1
    assert(got == Seq(0L, 7L, 14L, 16L))
    // uniform rule: end of token j = offsets(j+1) - 1
    assert(got(1) - 1 == 6L && got(3) - 1 == 15L)
    // empty string: one empty token
    val empty = Seq(Tuple1("")).toDF("t")
      .select(TextStats.wordByteOffsets(col("t"))).as[Seq[Long]].head()
    assert(empty == Seq(0L, 1L))
  }

  test("mergeSpans: overlap merges, abutting merges, gaps split, " +
    "n_spans counts absorbed sources") {
    val spans = Seq(
      (1L, 0L, 5L), (1L, 3L, 8L), // overlap -> [0, 8)
      (1L, 8L, 10L), // abuts previous end -> still one island
      (1L, 12L, 15L), // gap -> new island
      (2L, 4L, 6L) // other doc untouched
    ).toDF("doc_id", "start", "end")
    val got = TextStats.mergeSpans(spans, "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 10L, 3L), (1L, 12L, 15L, 1L), (2L, 4L, 6L, 1L)))
  }

  test("mergeSpans: a span fully contained in an earlier, longer span " +
    "never splits the island (running max, not previous end)") {
    val spans = Seq(
      (1L, 0L, 20L), (1L, 2L, 4L), // contained
      (1L, 6L, 25L), // overlaps the long one
      (1L, 22L, 23L) // contained in [6,25) even though prev row ends at 25
    ).toDF("doc_id", "start", "end")
    val got = TextStats.mergeSpans(spans, "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 25L, 4L)))
  }

  test("blockByteSpans: block coordinates land on exact byte boundaries " +
    "of the original text, last partial block ends at text end") {
    // 12 words of 2 chars -> blocks of 5 words: [0,5) [5,10) [10,12)
    val words = (0 until 12).map(i => f"w$i%01d").map(_.take(2))
    val text = (0 until 12).map(i => s"a$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "t")
    val spans = Seq((1L, 0L, 1L), (1L, 2L, 1L)).toDF(
      "doc_id", "span_start", "span_blocks")
    val got = SegDedup.blockByteSpans(d, "doc_id", col("t"), spans, 5)
      .as[(Long, Long, Long)].collect().toSet
    val bytes = text.getBytes("UTF-8")
    got.foreach { case (_, s, e) =>
      // spans slice whole words: no separator at either edge
      val sliced = new String(bytes.slice(s.toInt, e.toInt), "UTF-8")
      assert(!sliced.startsWith(" ") && !sliced.endsWith(" "), s"[$s,$e)='$sliced'")
    }
    // block 0 = words 0..4; block 2 = words 10..11 (partial, to text end)
    val w = text.split(" ")
    assert(got.contains((1L, 0L, w.take(5).mkString(" ").length.toLong)))
    assert(got.contains((1L,
      (text.length - w.drop(10).mkString(" ").length).toLong,
      text.length.toLong)))
  }
}
