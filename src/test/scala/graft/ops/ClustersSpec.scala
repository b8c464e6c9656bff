package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class ClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIters: Int = 20): Map[Long, Long] =
    Clusters.connectedComponents(pairs.toDF("a", "b"), maxIters = maxIters)
      .as[(Long, Long)].collect().toMap

  test("connected components: transitivity, min-id labels, singletons absent") {
    // a–b and b–c dup ⇒ one cluster of three; (10,11) separate; 99 no pair
    val got = cc(Seq((2L, 1L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L),
      got.toSeq.sorted.mkString(","))
  }

  test("cluster assignment is invariant under pair order, endpoint swap " +
    "and (monotone) relabeling") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 120).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val base = cc(pairs)
    // order shuffled + endpoints swapped
    val shuffled = rnd.shuffle(pairs.map { case (a, b) => (b, a) })
    assert(cc(shuffled) == base)
    // monotone relabeling id -> 7*id + 3: min-id labels map along
    val mapped = cc(pairs.map { case (a, b) => (7 * a + 3, 7 * b + 3) })
    assert(mapped == base.map { case (id, l) => (7 * id + 3, 7 * l + 3) })
  }

  test("a long chain converges (rounds = O(diameter)) and maxIters fails " +
    "loud instead of emitting half-merged clusters") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    val got = cc(chain, maxIters = 40)
    assert(got.size == 31 && got.values.forall(_ == 0L))
    assertThrows[IllegalStateException] { cc(chain, maxIters = 3) }
  }

  test("dropNearDuplicates keeps the min id per component and every " +
    "unpaired row") {
    val df = (0L to 5L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val kept = Clusters.dropNearDuplicates(df, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 4L, 5L))
  }

  test("keepBestInClusters: highest score survives, ties to smallest id, " +
    "unpaired rows untouched") {
    // components {1,2,3} (via 1-2, 2-3) and {4,5}; 0 unpaired
    val df = Seq(
      (0L, 10L), (1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L), (5L, 7L)
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val kept = Clusters
      .keepBestInClusters(df, "doc_id", col("score"), pairs)
      .select("doc_id").as[Long].collect().toSet
    // {1,2,3}: max score 9 tie between 2 and 3 → 2; {4,5}: 5 wins (7 > 1)
    assert(kept == Set(0L, 2L, 5L))
  }

  test("composes with minhashPairs: mass duplicates collapse to one keeper") {
    val docs = ((0L until 12L).map(i =>
      (i, "identical boilerplate text repeated in every copy of this doc")) ++
      Seq((100L, "something else entirely about catalyst plan rewrites here")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
    val comp = Clusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    // all 12 identical docs in one cluster labeled by the min id
    assert((0L until 12L).forall(comp.get(_).contains(0L)), comp.mkString(","))
    assert(!comp.contains(100L))
    val kept = Clusters.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 100L))
  }

  test("dedupFlow: losers attributed to their cluster winner's source; " +
    "totals reconcile with keepBestInClusters") {
    // component {1,2,3}: scores 5,9,7 -> winner id 2 (src B); losers 1,3
    //   (both src A) -> cell (A -> B, n=2, cost=5+7)
    // component {10,11}: tie score 3 -> smaller id 10 wins (src B);
    //   loser 11 (src B) -> diagonal cell (B -> B, n=1, cost=3)
    val docs = Seq(
      (1L, "A", 5L), (2L, "B", 9L), (3L, "A", 7L),
      (10L, "B", 3L), (11L, "B", 3L), (99L, "C", 1L))
      .toDF("doc_id", "source", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val flow = Clusters.dedupFlow(docs, "doc_id", "source",
        col("score"), pairs)
      .as[(String, String, Long, Long)].collect().toSet
    assert(flow == Set(("A", "B", 2L, 12L), ("B", "B", 1L, 3L)))
    // the matrix's drop total IS keepBest's drop count
    val survivors = Clusters.keepBestInClusters(
      docs, "doc_id", col("score"), pairs).count()
    assert(flow.map(_._3).sum == docs.count() - survivors)
  }

  test("spreadFlag: one tainted copy taints the whole component, " +
    "unpaired rows keep their own flag") {
    val docs = Seq(
      (1L, true), (2L, false), (3L, false), // chain 1-2, 2-3: all tainted
      (10L, false), (11L, false),           // clean pair: stays clean
      (50L, true), (60L, false))            // unpaired
      .toDF("doc_id", "flag")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Clusters.spreadFlag(docs, "doc_id", col("flag"), pairs)
      .as[(Long, Boolean, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((true, true, 1L)), 2L -> ((false, true, 1L)),
      3L -> ((false, true, 1L)),
      10L -> ((false, false, 10L)), 11L -> ((false, false, 10L)),
      50L -> ((true, true, 50L)), 60L -> ((false, false, 60L))))
    // exactly one output row per input row — total assignment, no fanout
    assert(got.size == docs.count())
  }

  test("clusterSplit: paired docs share a side (zero split leakage), " +
    "unpaired docs gate on their own id, rates nest") {
    val docs = (0L to 40L).map(i => Tuple1(i)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    def split(bp: Int): Map[Long, (Long, String)] =
      Clusters.clusterSplit(docs, "doc_id", pairs, testBp = bp)
        .as[(Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = split(2000)
    // total assignment, one row per input row
    assert(got.size == 41)
    // every component rides the gate of its min id — all copies same side
    assert(Seq(1L, 2L, 3L).map(got(_)).distinct.size == 1)
    assert(got(1L)._1 == 1L)
    assert(Seq(10L, 11L).map(got(_)).distinct.size == 1)
    // unpaired: split_key is the row's own id, gate matches sampleGateBp
    assert(got(7L)._1 == 7L)
    assert(got(7L)._2 ==
      (if (graft.exprs.SampleHashImpl.gateBp(7L) < 2000) "test" else "train"))
    // nesting: test(1000) is a subset of test(3000)
    val lo = split(1000).collect { case (id, (_, "test")) => id }.toSet
    val hi = split(3000).collect { case (id, (_, "test")) => id }.toSet
    assert(lo.subsetOf(hi) && lo.size < hi.size)
  }

  test("clusterSplit: no MinHash near-dup pair straddles the split on a " +
    "corpus with planted mirrors") {
    val base = (0L until 60L).map { i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i word${i % 7} tail${i % 5}")
    }
    // plant mirrors: every 6th doc duplicated verbatim under a new id
    val mirrored = base ++ base.collect {
      case (i, t) if i % 6 == 0 => (i + 1000L, t)
    }
    val d = mirrored.toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(d, "doc_id", "text").persist()
    assert(pairs.count() > 0) // the planted mirrors must actually pair
    val splits = Clusters.clusterSplit(
      d.select("doc_id"), "doc_id", pairs, testBp = 3000)
    val straddling = pairs
      .join(splits.select(col("doc_id").as("a"), col("split").as("sa")), Seq("a"))
      .join(splits.select(col("doc_id").as("b"), col("split").as("sb")), Seq("b"))
      .filter(col("sa") =!= col("sb"))
    assert(straddling.isEmpty)
    pairs.unpersist()
  }
}
