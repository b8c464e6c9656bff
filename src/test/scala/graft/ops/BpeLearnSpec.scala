package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeLearnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpeLearnMerges: classic BPE training — merges compose in " +
    "learned order, deterministic lexicographic ties, counts at " +
    "selection time") {
    val df = Seq("abab abab", "abc").toDF("text")
    val got = TextStats.bpeLearnMerges(df, "text",
        Seq("a", "b", "c", " "), rounds = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      // round 1 over chars: (a,b) appears 5x across both docs
      (1, "a", "b", "ab", 5L),
      // round 2 counts the MERGED stream: doc1 = [ab,ab, ,ab,ab]
      (2, "ab", "ab", "abab", 2L),
      // round 3: three pairs tie at n=1; " " < "ab" < "abab" wins on t1
      (3, " ", "abab", " abab", 1L)))
  }

  test("bpeLearnMerges: leftmost non-overlapping pairing — aaaa gives " +
    "two (a,a) merges, then [aa,aa] merges once more") {
    val df = Seq("aaaa").toDF("text")
    val got = TextStats.bpeLearnMerges(df, "text", Seq("a"), rounds = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      // 3 candidate positions but only 2 non-overlapping merges: n is
      // the PAIR count (3); the apply pass collapses to [aa, aa]
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L)))
    // round 3 found no pair: the single remaining token ends training
  }

  test("bpeMergeApply: odd run keeps its tail token") {
    // build the sequence through the tokenizer (containsNull = false,
    // the type bpe_merge_apply's analysis check requires)
    val toks = Seq("aaab").toDF("text").select(
      TextStats.vocabTokenSeq(
        org.apache.spark.sql.functions.col("text"), Seq("a", "b"))
        .as("toks"))
    val got = toks.select(
        TextStats.bpeMergeApply(org.apache.spark.sql.functions.col("toks"),
          "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(got == Seq("aa", "a", "b"))
  }

  test("bpeLearnMerges: stops early when no adjacent pair exists") {
    val df = Seq("a", "b").toDF("text")
    assert(TextStats.bpeLearnMerges(df, "text", Seq("a", "b"), 4)
      .count() == 0L)
  }
}
