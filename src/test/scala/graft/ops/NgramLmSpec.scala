package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("knBigramStats: counts, continuation types, total — hand-computed") {
    // doc1 pairs: (a,b) (b,a) (a,b) (b,c); doc2: (b,c) (c,c)
    // B: (a,b):2 (b,a):1 (b,c):2 (c,c):1  -> d_total = 4
    // left_types:  b<-{a}=1  a<-{b}=1  c<-{b,c}=2
    // right_types: a->{b}=1  b->{a,c}=2 c->{c}=1
    val df = Seq((1L, "a b A b c"), (2L, "b c c")).toDF("doc_id", "text")
    val got = NgramLm.knBigramStats(df, "text")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 1L, 1L, 4L),
      ("b", "a", 1L, 1L, 2L, 4L),
      ("b", "c", 2L, 2L, 2L, 4L),
      ("c", "c", 1L, 2L, 1L, 4L)), got.mkString(","))
  }

  test("knBigramStats: minCount filters output only; continuation counts " +
    "still see every bigram") {
    val df = Seq((1L, "a b a b c"), (2L, "b c c")).toDF("doc_id", "text")
    val got = NgramLm.knBigramStats(df, "text", minCount = 2L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // same statistics as the unfiltered run — only rows with c < 2 gone
    assert(got == Set(
      ("a", "b", 2L, 1L, 1L, 4L),
      ("b", "c", 2L, 2L, 2L, 4L)), got.mkString(","))
  }

  test("knBigramStats: empty split-artifact words and short docs excluded") {
    // doubled space makes an empty "word"; one-word docs have no pairs
    val df = Seq((1L, "x  y"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    assert(NgramLm.knBigramStats(df, "text").count() == 0L)
  }

  test("goodTuringCounts: frequency-of-frequencies and token mass — " +
    "hand-computed") {
    // bigrams: (a,b):2 (b,a):1 (b,c):2 (c,c):1 -> N_1 = 2, N_2 = 2
    // big_n = 1*2 + 2*2 = 6 (= total bigram tokens)
    val df = Seq((1L, "a b a b c"), (2L, "b c c")).toDF("doc_id", "text")
    val got = NgramLm.goodTuringCounts(df, "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 6L), (2L, 2L, 6L)), got.mkString(","))
  }
}
