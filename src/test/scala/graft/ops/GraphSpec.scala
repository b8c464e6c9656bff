package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val scale = 1000000000000L

  private def pr(edges: Seq[(String, String, Long)], iters: Int = 3): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), iters)
      .as[(String, Long)].collect().toMap

  test("word-adjacency edges: weighted bigram counts, <2-word docs contribute nothing") {
    val df = Seq("a b a b", "b a", "x", "").toDF("text")
    val got = Graph.wordAdjacencyEdges(df, "text")
      .as[(String, String, Long)].collect().toSet
    // "a b a b" -> a→b ×2, b→a ×1; "b a" -> b→a ×1
    assert(got == Set(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("symmetric 2-cycle is stationary at scale/N (hand-computed integer round)") {
    // r0 = 5e11; r85 = 8500·r0 div 10000 = 4.25e11 all to the one
    // out-edge; teleport = (1500·scale div 10000) div 2 = 7.5e10;
    // r1 = 7.5e10 + 4.25e11 = 5e11 = r0 — exact fixpoint, every round
    val got = pr(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 3)
    assert(got == Map("a" -> scale / 2, "b" -> scale / 2))
  }

  test("dangling node keeps teleport only; its inbound mass still arrives") {
    val got = pr(Seq(("a", "b", 1L)), iters = 1)
    val teleport = (1500L * scale / 10000L) / 2
    val r85 = 8500L * (scale / 2) / 10000L
    assert(got("a") == teleport)
    assert(got("b") == teleport + r85)
  }

  test("out-mass splits by edge WEIGHT with per-edge floor division") {
    val got = pr(Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L)), iters = 1)
    val r0 = scale / 3
    val teleport = (1500L * scale / 10000L) / 3
    val r85 = 8500L * r0 / 10000L
    assert(got("b") == teleport + r85 * 2 / 3)
    assert(got("c") == teleport + r85 / 3)
  }

  test("total mass is conserved up to the documented floor leak (≤ 1/edge/round + N teleport floors)") {
    val rnd = new scala.util.Random(11)
    // a 12-cycle guarantees no dangling node (a dangling node's 85%
    // outbound mass evaporates by design and would swamp the floor leak)
    val cycle = (0 until 12).map(i => (s"n$i", s"n${(i + 1) % 12}", 1L))
    val edges = (cycle ++ (0 until 40).map(_ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}", rnd.nextInt(5) + 1L)))
      .filter { case (a, b, _) => a != b }.distinct
    val got = pr(edges, iters = 3)
    val total = got.values.sum
    assert(total <= scale)
    // loose bound: each of N teleports and each edge share floors ≤1 per
    // round, plus the damping split itself
    assert(scale - total < scale / 100, s"leaked ${scale - total}")
  }

  test("ranks are invariant under node renaming") {
    val edges = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L), ("a", "c", 1L))
    val base = pr(edges)
    val renamed = pr(edges.map { case (s, d, w) => ("x" + s, "x" + d, w) })
    assert(renamed == base.map { case (k, v) => ("x" + k, v) })
  }

  test("hub centrality: every spoke points at the hub, hub outranks spokes") {
    val spokes = (1 to 6).map(i => (s"s$i", "hub", 1L))
    val back = (1 to 6).map(i => ("hub", s"s$i", 1L))
    val got = pr(spokes ++ back, iters = 3)
    assert((1 to 6).forall(i => got("hub") > got(s"s$i")))
  }

  test("empty graph and bad damping fail loud") {
    assertThrows[IllegalArgumentException] {
      Graph.pageRank(Seq.empty[(String, String, Long)].toDF("src", "dst", "w"), 0)
    }
    assertThrows[IllegalArgumentException] {
      Graph.pageRank(Seq(("a", "b", 1L)).toDF("src", "dst", "w"), 1, dampBp = 10000)
    }
  }

  private def paths(rows: Seq[(String, Int, Option[Int])], maxRounds: Int = 20) =
    Graph.treePaths(
        rows.map { case (t, i, p) => (t, i, p.map(Integer.valueOf).orNull) }
          .toDF("tree", "node", "parent"),
        "tree", "node", "parent", maxRounds)
      .select(col("tree"), col("node"), col("root").cast("int"),
        col("depth"), col("path"))
      .as[(String, Int, Int, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("treePaths: forest of two trees — roots, depths, ancestor paths") {
    //   t1: 0 ← 1 ← 3, 0 ← 2          t2: 5 alone
    val got = paths(Seq(
      ("t1", 0, None), ("t1", 1, Some(0)), ("t1", 2, Some(0)),
      ("t1", 3, Some(1)), ("t2", 5, None)))
    assert(got == Map(
      ("t1", 0) -> ((0, 0L, "")), ("t1", 1) -> ((0, 1L, "/0")),
      ("t1", 2) -> ((0, 1L, "/0")), ("t1", 3) -> ((0, 2L, "/1/0")),
      ("t2", 5) -> ((5, 0L, ""))))
  }

  test("treePaths: a depth-40 chain resolves in ≤7 doublings; the same " +
    "chain with maxRounds too small (a would-be cycle) fails loud") {
    val chain = ("c", 0, None) +: (1 to 40).map(i => ("c", i, Some(i - 1)))
    val got = paths(chain, maxRounds = 7) // ceil(log2 40)+1 = 7
    assert(got(("c", 40)) ==
      ((0, 40L, (39 to 0 by -1).map("/" + _).mkString)))
    assertThrows[IllegalStateException] { paths(chain, maxRounds = 3) }
  }

  test("treePaths fails loud on a dangling parent instead of dropping " +
    "the subtree") {
    val ex = intercept[Exception] {
      paths(Seq(("t", 0, None), ("t", 1, Some(9))))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("dangling parent")))
  }

  private def dfs(rows: Seq[(String, Int, Option[Int])]) =
    Graph.dfsOrder(
        rows.map { case (t, i, p) => (t, i, p.map(Integer.valueOf).orNull) }
          .toDF("tree", "node", "parent"),
        "tree", "node", "parent")
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("dfsOrder: hand-checked pre-order — subtrees contiguous, siblings " +
      "by id, multi-digit ids sort numerically, forests independent") {
    //   t1:      0            DFS: 0, 1, 3, 10, 2
    //          /   \          (10 is in 3's subtree and must come BEFORE
    //         1     2          sibling 2 — string sort of unpadded ids
    //         |                would put "10" after "2")
    //         3
    //         |
    //        10
    val got = dfs(Seq(
      ("t1", 0, None), ("t1", 1, Some(0)), ("t1", 2, Some(0)),
      ("t1", 3, Some(1)), ("t1", 10, Some(3)),
      ("t2", 7, None), ("t2", 8, Some(7))))
    assert(got == Map(
      ("t1", 0) -> ((0L, 0L)), ("t1", 1) -> ((1L, 1L)),
      ("t1", 3) -> ((2L, 2L)), ("t1", 10) -> ((3L, 3L)),
      ("t1", 2) -> ((1L, 4L)),
      ("t2", 7) -> ((0L, 0L)), ("t2", 8) -> ((1L, 1L))))
  }

  test("dfsOrder properties on a random forest: positions are a " +
      "permutation, every parent precedes its child, every subtree is a " +
      "contiguous interval") {
    val rnd = new scala.util.Random(23)
    val rows = ("f", 0, None) +: (1 to 60).map(i =>
      ("f", i, Some(rnd.nextInt(i)))) // parent < child: acyclic by construction
    val got = dfs(rows)
    val pos = got.map { case ((_, n), (_, p)) => n -> p }
    assert(pos.values.toSeq.sorted == (0L until 61L))
    val parent = rows.collect { case (_, n, Some(p)) => n -> p }.toMap
    assert(parent.forall { case (c, p) => pos(p) < pos(c) })
    // subtree of n = n + all descendants; its positions must be an interval
    def subtree(n: Int): Set[Int] =
      Set(n) ++ parent.collect { case (c, p) if p == n => c }.flatMap(subtree)
    (0 to 60).foreach { n =>
      val ps = subtree(n).map(pos(_))
      assert(ps.max - ps.min + 1 == ps.size, s"subtree of $n not contiguous")
    }
  }

  test("dfsOrder fails loud on an id wider than padWidth") {
    val ex = intercept[Exception] {
      Graph.dfsOrder(
        Seq(("t", 1, null), ("t", 100, Integer.valueOf(1)))
          .toDF("tree", "node", "parent"),
        "tree", "node", "parent", padWidth = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("does not fit")))
  }
}
