package graft.features

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RollingDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def run(rows: Seq[(String, Long, Int, Option[String])], w: Long) =
    RollingDistinct
      .rollingDistinctByTime(
        rows.map { case (c, t, i, k) => (c, ts(t), i, k) }
          .toDF("conv", "ts", "idx", "key"),
        partCols = Seq("conv"), tsCol = "ts", orderCols = Seq("idx"),
        keyCol = "key", windowSeconds = w, idCols = Seq("idx"), as = "n")
      .select($"conv", $"idx", $"n").as[(String, Int, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap

  /** Brute-force reference: count distinct keys in (t−w, t]. */
  private def brute(rows: Seq[(String, Long, Int, Option[String])], w: Long) =
    rows.map { case (c, t, i, _) =>
      (c, i) -> rows.collect {
        case (c2, t2, _, Some(k)) if c2 == c && t2 > t - w && t2 <= t => k
      }.distinct.size.toLong
    }.toMap

  test("hand-built: recurrence, expiry, nulls, ties") {
    val rows = Seq(
      ("c1", 0L, 0, Some("a")),
      ("c1", 10L, 1, Some("b")),   // a+b in window
      ("c1", 50L, 2, None),        // null key: anchors only
      ("c1", 70L, 3, Some("a")),   // a recurs; first a expired at 60
      ("c1", 130L, 4, Some("a")),  // b expired (10+60=70 < 130)
      ("c1", 130L, 5, Some("a")),  // same key same ts: still 1
      ("c2", 0L, 0, Some("z"))
    )
    val got = run(rows, w = 60L)
    assert(got == Map(
      ("c1", 0) -> 1L, ("c1", 1) -> 2L, ("c1", 2) -> 2L,
      ("c1", 3) -> 1L, // a refreshed; b@10 is OUT — window is (10, 70]
      ("c1", 4) -> 1L, ("c1", 5) -> 1L,
      ("c2", 0) -> 1L))
    assert(got == brute(rows, 60L))
  }

  test("randomized differential vs brute force") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val rows = (0 until 300).map { i =>
        (s"c${rng.nextInt(4)}", rng.nextInt(200).toLong, i,
          if (rng.nextInt(5) == 0) None else Some(s"k${rng.nextInt(6)}"))
      }
      val w = Seq(1L, 13L, 60L, 500L)(trial % 4)
      assert(run(rows, w) == brute(rows, w), s"trial $trial w=$w")
    }
  }
}
