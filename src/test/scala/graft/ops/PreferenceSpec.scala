package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PreferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bradleyTerryStats: pair tallies, canonical order, margins — " +
    "hand-computed") {
    // comparisons: x>y, y>x, x>y, x>z, z>y
    // pairs: (x,y): n=3 wins_x=2; (x,z): n=1 wins_x=1; (y,z): n=1 wins_y=0
    // margins: x: w=3 n=4; y: w=1 n=4; z: w=1 n=2
    val cmp = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("x", "z"), ("z", "y"))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerryStats(cmp, "winner", "loser")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set(
      ("x", "y", 3L, 2L, 3L, 4L, 1L, 4L),
      ("x", "z", 1L, 1L, 3L, 4L, 1L, 2L),
      ("y", "z", 1L, 0L, 1L, 4L, 1L, 2L)), got.mkString(","))
  }

  test("bradleyTerryStats: self-comparisons and null items excluded") {
    val cmp = Seq(
      (Some("a"), Some("a")), // self: no signal
      (Some("a"), None), (None, Some("b")), // nulls excluded
      (Some("a"), Some("b")))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerryStats(cmp, "winner", "loser")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set(("a", "b", 1L, 1L, 1L, 1L, 0L, 1L)), got.mkString(","))
  }

  test("bradleyTerryStats: margin identities hold on a random tournament") {
    // deterministic pseudo-random comparisons over 7 items
    val items = (0 until 7).map(i => s"m$i")
    val cmp = (0 until 400).map { i =>
      val a = items((i * 131) % 7); val b = items((i * 173 + 1) % 7)
      (a, b)
    }.toDF("winner", "loser")
    val rows = Preference.bradleyTerryStats(cmp, "winner", "loser")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    // canonical order and within-pair bounds
    rows.foreach { case (a, b, n, wa, _, _, _, _) =>
      assert(a < b); assert(wa >= 0 && wa <= n)
    }
    // each item's margins re-derive from its pair rows
    val byItem = rows.flatMap { case (a, b, n, wa, waT, naT, wbT, nbT) =>
      Seq((a, wa, n, waT, naT), (b, n - wa, n, wbT, nbT))
    }.groupBy(_._1)
    byItem.foreach { case (_, g) =>
      assert(g.map(_._2).sum == g.head._4) // Σ pair wins = w_tot
      assert(g.map(_._3).sum == g.head._5) // Σ pair n = n_tot
      assert(g.map(_._4).distinct.length == 1) // margin constant per item
    }
    // global identity: Σ w_tot = Σ n_ab (every comparison has one winner)
    val totalN = rows.map(_._3).sum
    val wTots = byItem.map { case (_, g) => g.head._4 }.sum
    assert(wTots == totalN)
  }
}
