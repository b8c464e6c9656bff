package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("mmrSelect: greedy exact-integer MMR — redundancy penalized, " +
    "ties by vec_id, scores bit-exact") {
    // query (1,0); quantized dots: rel(1)=1e8, rel(2)=9e7, rel(3)=2e7,
    // rel(4)=0; sim(3,1)=2e7, sim(3,2)=1.8e7
    val c = corpus(
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(0.9f, 0.0f),
      3L -> Seq(0.2f, 0.8f),
      4L -> Seq(0.0f, 0.7f))
    val got = Similarity.mmrSelect(c, Seq(1.0f, 0.0f), k = 3,
        lambdaBp = 7000)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 1L, 7000L * 100000000L), // no selected set: pure relevance
      (2, 2L, 7000L * 90000000L - 3000L * 90000000L),
      (3, 3L, 7000L * 20000000L - 3000L * 20000000L)))
  }

  test("mmrSelect: a low-lambda selection skips the near-duplicate a " +
    "plain top-k would take; early exhaustion returns fewer rows") {
    // id 2 is a near-copy of id 1 (higher rel than id 3) but at
    // lambda=0.3 its redundancy term dominates: MMR picks the diverse
    // id 3 second. Plain top-2 by rel would pick (1, 2).
    val c = corpus(
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(0.98f, 0.0f),
      3L -> Seq(0.6f, 0.6f))
    val got = Similarity.mmrSelect(c, Seq(1.0f, 0.0f), k = 2,
        lambdaBp = 3000)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L))
    // score(3) = 3000·6e7 − 7000·6e7; score(2) would be −3.92e11
    assert(got(1)._3 == 3000L * 60000000L - 7000L * 60000000L)

    val tiny = corpus(1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.0f, 1.0f))
    assert(Similarity.mmrSelect(tiny, Seq(1.0f, 0.0f), k = 10)
      .count() == 2L)
  }
}
