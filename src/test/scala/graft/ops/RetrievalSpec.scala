package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25 sufficient statistics: tf, dl, df and corpus constants are exact") {
    val docs = Seq(
      (1L, "spark spark hash"),
      (2L, "hash join"),
      (3L, "sort merge join plan")).toDF("doc_id", "text")
    val got = Retrieval.bm25Stats(docs, "doc_id", "text", Seq("spark", "hash"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    // (term, doc, tf, dl, df_docs, n_docs, total_dl); total_dl = 3+2+4
    assert(got == Set(
      ("spark", 1L, 2L, 3L, 1L, 3L, 9L),
      ("hash", 1L, 1L, 3L, 2L, 3L, 9L),
      ("hash", 2L, 1L, 2L, 2L, 3L, 9L)))
  }

  test("terms absent from the corpus emit no postings; empty term set fails loud") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Retrieval.bm25Stats(docs, "doc_id", "text", Seq("zzz")).isEmpty)
    assertThrows[IllegalArgumentException] {
      Retrieval.bm25Stats(docs, "doc_id", "text", Seq.empty)
    }
  }

  test("posting join stays term-selective: only query terms survive the scan filter") {
    val docs = Seq((1L, "a b c d e f g spark")).toDF("doc_id", "text")
    val got = Retrieval.bm25Stats(docs, "doc_id", "text", Seq("spark"))
    assert(got.count() == 1)
    // dl still counts ALL words, not just query terms
    assert(got.select("dl").as[Long].head() == 8L)
  }

  test("moreLikeThisJaccard: exact fixed-point scores, self and " +
    "zero-overlap docs never candidates, ties to smaller doc_id") {
    val docs = Seq(
      (0L, "a b c d"),   // the query
      (1L, "a b c d"),   // identical: J = 1
      (2L, "a b x y"),   // J = 2/6
      (3L, "a b y z"),   // J = 2/6 — tie with 2, must rank after it
      (4L, "p q r s")    // zero overlap: absent
    ).toDF("doc_id", "text")
    val got = Retrieval.moreLikeThisJaccard(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") === 0), "doc_id", "text", topK = 10)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.map(r => (r._2, r._4)).toSeq == Seq((1L, 1), (2L, 2), (3L, 3)))
    assert(got.head._3 == 1000000000L)           // J=1 exactly
    assert(got(1)._3 == 2L * 1000000000L / 6L)   // floor(2e9/6)
  }

  test("rrfFuse: rank-only fusion — contributions are scale div (k0+rank), " +
    "docs in both lists beat docs in one, fused ties to smaller doc_id") {
    def list(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("query_id", "doc_id", "rank")
    val dense = list((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
    val lex = list((0L, 11L, 1), (0L, 13L, 2), (0L, 10L, 3))
    val got = Retrieval.rrfFuse(Seq(dense, lex), topK = 10, k0 = 60)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    def c(r: Int) = 1000000000L / (60L + r)
    // 11: r2+r1, 10: r1+r3, 12: r3 only, 13: r2 only
    assert(got.map(r => (r._2, r._3)).toSeq == Seq(
      (11L, c(2) + c(1)), (10L, c(1) + c(3)), (13L, c(2)), (12L, c(3))))
    // equal fused score (same single-list rank) breaks to the smaller doc
    val tied = Retrieval.rrfFuse(
      Seq(list((1L, 7L, 1)), list((1L, 5L, 1))), topK = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(tied.map(_._2).toSeq == Seq(5L, 7L))
    assertThrows[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, topK = 1)
    }
  }

  test("rankEvalAtK: first relevant rank and hit count within cutoff; " +
    "no-hit queries keep a NULL-rank row; beyond-cutoff hits ignored") {
    val ranked = Seq(
      (0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3), // rel at 2 and 3
      (1L, 20L, 1), (1L, 21L, 2),               // rel only at cutoff+1
      (2L, 30L, 1)                              // no rels at all
    ).toDF("query_id", "doc_id", "rank")
    val rels = Seq((0L, 11L), (0L, 12L), (1L, 21L)).toDF("query_id", "doc_id")
    val got = Retrieval.rankEvalAtK(ranked, rels, k = 2)
      .as[(Long, Option[Long], Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(
      0L -> ((Some(2L), 1L)),  // doc 12's hit at rank 3 is beyond k=2
      1L -> ((Some(2L), 1L)),
      2L -> ((None, 0L))))
  }

  test("ndcgStatsAtK: full hit-rank multiset with total-relevant " +
    "denominators; no-hit queries keep a NULL-rank row") {
    val ranked = Seq(
      (0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3), // hits at 2 AND 3
      (1L, 20L, 1), (1L, 21L, 2),
      (2L, 30L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val rels = Seq((0L, 11L), (0L, 12L), (0L, 99L), (1L, 21L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.ndcgStatsAtK(ranked, rels, k = 3)
      .as[(Long, Option[Long], Long)].collect().toSet
    assert(got == Set(
      (0L, Some(2L), 3L), // both hit ranks kept (rankEval would compress)
      (0L, Some(3L), 3L), // n_rel_total = 3 incl. doc 99, never retrieved
      (1L, Some(2L), 1L),
      (2L, None, 0L)), got.mkString(","))
  }
}
