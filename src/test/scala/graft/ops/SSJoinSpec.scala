package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SSJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shingleSet(text: String, k: Int): Set[String] = {
    val ws = text.toLowerCase.split(" ", -1)
    if (ws.length < k) Set.empty
    else ws.sliding(k).map(_.mkString(" ")).toSet
  }

  /** Driver-side brute force: every pair, exact Jaccard, same integer
    * threshold arithmetic.
    */
  private def brute(docs: Seq[(Long, String)], k: Int, tauBp: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> shingleSet(t, k) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 10000 >= tauBp * uni
    } yield (a, b, inter, uni)).toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int = 3, tauBp: Int = 8000,
      cap: Long = 1000L): Set[(Long, Long, Long, Long)] =
    SSJoin.jaccardJoinExact(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, tauBp, cap)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("recall = 1: prefix-filtered result equals brute force on a random corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table", "hash")
    def doc(): String = (0 until 6 + rnd.nextInt(10))
      .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 40L).map(i => i -> doc())
    // inject exact dups and near-dups so the ≥ τ band is populated
    val docs = base ++ Seq(
      100L -> base(3)._2,
      101L -> (base(5)._2 + " extra"),
      102L -> base(7)._2)
    for (tauBp <- Seq(5000, 8000, 9500, 10000)) {
      assert(run(docs, tauBp = tauBp) == brute(docs, 3, tauBp), s"tauBp=$tauBp")
    }
  }

  test("τ = 1.0 keeps only identical shingle sets; near-miss below τ excluded") {
    val docs = Seq(
      1L -> "a b c d e",
      2L -> "a b c d e",      // identical
      3L -> "a b c d e f",    // superset: J = 3/4 over shingles
      4L -> "x y z q r")
    val exact = run(docs, tauBp = 10000)
    assert(exact == Set((1L, 2L, 3L, 3L)))
    // 3-shingles of doc1: {abc,bcd,cde} (3); doc3 adds {def} (4): J=3/4
    assert(run(docs, tauBp = 7500).contains((1L, 3L, 3L, 4L)))
    assert(!run(docs, tauBp = 7600).exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("docs with fewer than k words never pair; empty corpus yields nothing") {
    assert(run(Seq(1L -> "a b", 2L -> "a b")) == Set.empty)
    assert(run(Seq.empty[(Long, String)]) == Set.empty)
  }

  test("hot-prefix guard fails loud on a degenerate all-identical corpus") {
    val docs = (0L until 50L).map(i => i -> "a b c d e f")
    assertThrows[IllegalStateException] { run(docs, cap = 10L) }
    // raising the cap knowingly lets the quadratic corpus through, exactly
    assert(run(docs, cap = 50L).size == 50 * 49 / 2)
  }
}
