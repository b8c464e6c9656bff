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
}
