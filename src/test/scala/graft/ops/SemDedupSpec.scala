package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated directions; duplicates are scaled copies (cosine
  // exactly 1 before quantization)
  private val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
  private val e2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
  private def corpus = Seq(
    (0L, e1),
    (1L, e1.map(_ * 0.5f)), // dup of 0, same list
    (2L, e2),
    (3L, e2.map(_ * 0.25f)), // dup of 2, same list
    (4L, Seq(0.7f, 0.7f, 0.1f, 0.0f)) // between, unique
  ).toDF("vec_id", "embedding")

  private val centroids = Seq(0 -> e1, 1 -> e2)

  test("semDedup: total assignment, min-id keeper per component, singletons keep themselves") {
    val got = Similarity.semDedup(corpus, centroids, minCosineBp = 9990)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.size == 5, "one row per corpus vector")
    assert(got(0L) == ((0, 0L, true)))
    assert(got(1L) == ((0, 0L, false)), "copy clusters under its original")
    assert(got(2L) == ((1, 2L, true)))
    assert(got(3L) == ((1, 2L, false)))
    assert(got(4L)._2 == 4L && got(4L)._3, "unpaired vector is its own keeper")
  }

  test("semDedup: cross-list near-dups are invisible by design") {
    // a dup pair forced into DIFFERENT lists (each vector nearest a
    // different centroid) must NOT cluster — the documented SemDedup
    // approximation
    val c = Seq(
      (0L, Seq(1.0f, 0.9f, 0.0f, 0.0f)), // nearest e1
      (1L, Seq(0.9f, 1.0f, 0.0f, 0.0f)) // nearest e2, cosine ~0.994 with 0
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(c, centroids, minCosineBp = 9900)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(0L) && got(1L), "both keep: pair straddles a list boundary")
  }

  test("semDedupDroppedLists surfaces oversized lists; capped list yields no pairs") {
    val many = (0L until 10L).map(i => (i, e1.map(_ * (1.0f + i))))
      .toDF("vec_id", "embedding")
    val dropped = Similarity.semDedupDroppedLists(many, centroids, maxListSize = 5)
      .collect()
    assert(dropped.length == 1 && dropped(0).getInt(0) == 0 &&
      dropped(0).getLong(1) == 10L)
    val res = Similarity.semDedup(many, centroids, minCosineBp = 9990,
      maxListSize = 5)
    assert(res.filter(col("is_keeper")).count() == 10L,
      "oversized list silenced: everything keeps (and the audit said so)")
  }

  test("topTermsPerDoc: tf ranks first, corpus rarity breaks ties, then term") {
    val docs = Seq(
      (1L, "alpha alpha beta gamma"),
      (2L, "beta delta delta gamma"),
      (3L, "gamma gamma gamma zeta")
    ).toDF("doc_id", "text")
    val got = TextStats.topTermsPerDoc(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: alpha tf=2 (df=1); then beta/gamma tf=1 — beta df=2 < gamma df=3
    assert(got((1L, 1L)) == (("alpha", 2L, 1L)))
    assert(got((1L, 2L)) == (("beta", 1L, 2L)))
    // doc 2: delta tf=2; beta (df=2) before gamma (df=3)
    assert(got((2L, 1L)) == (("delta", 2L, 1L)))
    assert(got((2L, 2L)) == (("beta", 1L, 2L)))
    // doc 3: gamma tf=3; zeta tf=1 df=1
    assert(got((3L, 1L)) == (("gamma", 3L, 3L)))
    assert(got((3L, 2L)) == (("zeta", 1L, 1L)))
  }
}
