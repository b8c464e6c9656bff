package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class TripletSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // unit vectors in a 3d toy space: cosine is just the dot here
  private val corpus = Seq(
    (10L, Array(1.0f, 0.0f, 0.0f)), // = anchor 0: excluded as self-like? no — distinct id, cosine 1 → positive band
    (11L, Array(0.9f, 0.4359f, 0.0f)), // cos ≈ 0.9 with anchor
    (12L, Array(0.3f, 0.9539f, 0.0f)), // cos ≈ 0.3 — below band
    (13L, Array(0.2f, 0.9798f, 0.0f)), // cos ≈ 0.2
    (14L, Array(0.1f, 0.9950f, 0.0f)), // cos ≈ 0.1
    (15L, Array(0.0f, 1.0f, 0.0f)) // cos 0 — never selected (dot must be > 0 for pos)
  ).toDF("vec_id", "embedding")

  private val anchor = Seq((0L, Array(1.0f, 0.0f, 0.0f)))
    .toDF("query_id", "q_embedding")

  test("positive = best in-band, negative = best below band after " +
    "skipTop, bands partition on one predicate") {
    val got = Similarity.tripletMine(
        corpus, anchor, posMinCosineBp = 8000, skipTop = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // positive band (cos ≥ 0.8): ids 10 (cos 1) and 11 (cos .9) → best 10
    // below band ranked by dot: 12, 13, 14, 15; skipTop=1 → negative 13
    assert(got.map(t => (t._1, t._2, t._4)) == Seq((0L, 10L, 13L)))
    val (_, _, posDot, _, negDot) = got.head
    assert(posDot > negDot)
  }

  test("anchors with no in-band positive emit nothing") {
    val far = Seq((1L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("query_id", "q_embedding") // orthogonal to everything
    assert(Similarity.tripletMine(corpus, far, 8000).isEmpty)
  }

  test("a triplet's positive and negative can never coincide (band " +
    "partition) on the real sf0.001 embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val t = Similarity.tripletMine(e, q, posMinCosineBp = 3000, skipTop = 0)
    assert(t.filter(col("pos_id") === col("neg_id")).isEmpty)
    assert(t.filter(col("pos_id") === col("query_id") ||
      col("neg_id") === col("query_id")).isEmpty)
    // at 3000 bp this corpus gives at least one anchor a positive
    assert(t.count() > 0)
  }
}
