package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: exact counts, nulls, distincts, binary min/max") {
    val df = Seq(
      (1L, "b", Some(10L)),
      (2L, "a", None),
      (3L, "a", Some(30L)),
      (4L, null, Some(10L))
    ).toDF("id", "s", "v")
    val got = Analytics.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(got("s") == (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
    assert(got("v") == (("v", 4L, 1L, 2L, Some("10"), Some("30"))))
    intercept[IllegalArgumentException] {
      Analytics.profile(df, Seq("id", "nope"))
    }
  }

  test("histogram: floor binning (negatives included), per-bin min/max") {
    val df = Seq(-101L, -1L, 0L, 99L, 100L, 250L, 250L)
      .toDF("v")
    val got = Analytics.histogram(df, $"v", width = 100L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // floor semantics: -101 -> bin -2, -1 -> bin -1 (trunc-div would say 0)
    assert(got == Map(
      -2L -> ((1L, -101L, -101L)),
      -1L -> ((1L, -1L, -1L)),
      0L -> ((2L, 0L, 99L)),
      1L -> ((1L, 100L, 100L)),
      2L -> ((2L, 250L, 250L))))
  }

  test("outliers: integer 3σ flag matches the naive float computation") {
    // group g1: tight cluster + one far point; g2: zero variance;
    // g3: singleton — the latter two must flag nothing
    val rows = (1 to 50).map(i => ("g1", i.toLong, 100L + (i % 5))) ++
      Seq(("g1", 99L, 100000L)) ++
      (1 to 10).map(i => ("g2", 200L + i, 7L)) ++
      Seq(("g3", 300L, 42L))
    val df = rows.toDF("g", "id", "v")
    val got = Analytics.outliers(df, Seq("g"), $"v", z2 = 9)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    val byGroup = rows.groupBy(_._1)
    for ((g, rs) <- byGroup) {
      val vs = rs.map(_._3.toDouble)
      val mean = vs.sum / vs.size
      val varp = vs.map(x => (x - mean) * (x - mean)).sum / vs.size
      rs.foreach { case (_, id, v) =>
        val expected = (v - mean) * (v - mean) > 9.0 * varp
        assert(got(id) == expected, s"group $g id $id")
      }
    }
    assert(got(99L), "the far point must flag")
    assert((201L to 210L).forall(id => !got(200L + id - 200L)),
      "zero-variance group flags nothing")
    assert(!got(300L), "singleton flags nothing")
  }

  test("driftStats: conditional bin counts, totals, exact shift numerator") {
    // ref: 10, 110, 120 -> bins 0,1,1 ; cur: 15, 250 -> bins 0,2
    val df = Seq(
      (Some(10L), Some(true)), (Some(110L), Some(true)),
      (Some(120L), Some(true)),
      (Some(15L), Some(false)), (Some(250L), Some(false)),
      (None, Some(true)) // null value rows are ignored
    ).toDF("v", "r")
    val got = Analytics.driftStats(df, $"r", $"v", 100L)
      .select($"bin", $"n_ref", $"n_cur", $"tot_ref", $"tot_cur",
        $"delta_num".cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // totals: ref 3, cur 2; delta_num = n_cur*3 - n_ref*2
    assert(got(0L) == ((0L, 1L, 1L, 3L, 2L, 1L * 3 - 1L * 2)))
    assert(got(1L) == ((1L, 2L, 0L, 3L, 2L, 0L * 3 - 2L * 2)))
    assert(got(2L) == ((2L, 0L, 1L, 3L, 2L, 1L * 3 - 0L * 2)))
    assert(got.size == 3)
  }

  test("minMaxScaleBp: floor scaling, endpoints, degenerate group -> NULL") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 40L),
      ("b", 4L, 7L), ("b", 5L, 7L), // zero span
      ("c", 6L, 5L) // singleton
    ).toDF("g", "id", "v")
    val got = Analytics.minMaxScaleBp(df, Seq("g"), $"v")
      .select($"id", $"scaled_bp").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(0L), "group min -> 0")
    assert(got(3L).contains(10000L), "group max -> scaleBp")
    // (20-10)*10000/30 = 3333.33 -> floor 3333
    assert(got(2L).contains(3333L))
    assert(got(4L).isEmpty && got(5L).isEmpty && got(6L).isEmpty,
      "degenerate groups carry no order information")
  }

  test("minMaxScaleBp: wide int64 spans do not overflow (decimal numerator)") {
    // (v - min) * 10000 = 3e22 here — far past Long.MaxValue; the
    // decimal(38,0) numerator keeps the floor division exact
    val df = Seq(
      ("g", 1L, 0L),
      ("g", 2L, 3000000000000000000L),
      ("g", 3L, 1500000000000000000L)
    ).toDF("g", "id", "v")
    val got = Analytics.minMaxScaleBp(df, Seq("g"), $"v")
      .select($"id", $"scaled_bp").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(0L))
    assert(got(2L).contains(10000L))
    assert(got(3L).contains(5000L))
  }

  test("driftStats invariants on randomized data: totals partition the " +
    "corpus and delta_num sums to zero") {
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(500)((rng.nextInt(1000).toLong, rng.nextBoolean()))
    val df = rows.toDF("v", "r")
    val got = Analytics.driftStats(df, $"r", $"v", 50L)
      .select($"n_ref", $"n_cur", $"tot_ref", $"tot_cur",
        $"delta_num".cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val (nRef, nCur) = (rows.count(_._2).toLong, rows.count(!_._2).toLong)
    assert(got.forall(r => r._3 == nRef && r._4 == nCur),
      "every row carries the true slice totals")
    assert(got.map(_._1).sum == nRef && got.map(_._2).sum == nCur,
      "bin counts partition each slice exactly")
    assert(got.map(_._5).sum == 0L,
      "proportion shifts are zero-sum across bins")
  }

  test("rollupCounts: per-level counts with grouping flags") {
    val df = Seq(
      ("en", "web", 10L), ("en", "web", 20L), ("en", "book", 5L),
      ("fr", "web", 7L)
    ).toDF("lang", "source", "v")
    val got = Analytics.rollupCounts(df, Seq("lang", "source"), $"v")
      .as[(Option[String], Option[String], Int, Int, Long, Long)]
      .collect().toSet
    assert(got == Set(
      (Some("en"), Some("web"), 0, 0, 2L, 30L),
      (Some("en"), Some("book"), 0, 0, 1L, 5L),
      (Some("fr"), Some("web"), 0, 0, 1L, 7L),
      (Some("en"), None, 0, 1, 3L, 35L),
      (Some("fr"), None, 0, 1, 1L, 7L),
      (None, None, 1, 1, 4L, 42L)))
  }

  test("thresholdSweep: confusion cells hand-checked, rows conserve") {
    import org.apache.spark.sql.functions._
    val df = Seq((50L, true), (150L, true), (150L, false), (250L, false))
      .toDF("s", "l")
    val got = Analytics.thresholdSweep(df, col("s"), col("l"),
        Seq(100L, 200L))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // thr 100: tp {150T}, fp {150F, 250F}, fn {50T}, tn {}
    // thr 200: tp {}, fp {250F}, fn {50T, 150T}, tn {150F}
    assert(got == Set((100L, 1L, 2L, 1L, 0L), (200L, 0L, 1L, 2L, 1L)))
    assert(got.forall { case (_, tp, fp, fn, tn) => tp + fp + fn + tn == 4L })
    assertThrows[IllegalArgumentException] {
      Analytics.thresholdSweep(df, col("s"), col("l"), Seq(1L, 1L))
    }
  }

  test("volumeAnomaly: trailing baseline excludes the spike itself, " +
    "no-history buckets never flag, cross-multiply exact") {
    import org.apache.spark.sql.functions._
    // key a: hours 0,1,2 hold 2,2,9 rows -> hour 2 baseline mean 2,
    // 9 > 2*2 -> spike; hour 0 has no history -> never flags; hour 1
    // baseline mean 2, 2 > 4 false.
    val rows =
      (Seq.fill(2)(0L) ++ Seq.fill(2)(3600L) ++ Seq.fill(9)(7200L))
        .zipWithIndex
        .map { case (sec, i) => ("a", sec + (i % 60)) } // jitter inside hour
    val df = rows.toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Analytics.volumeAnomaly(df, "k", "ts",
        bucketSeconds = 3600L, trailing = 2, factor = 2L)
      .orderBy("bucket")
      .select("bucket", "n", "trail_n", "trail_sum", "is_spike")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 0L, 0L, false),
      (1L, 2L, 1L, 2L, false),
      (2L, 9L, 2L, 4L, true)))
  }

  private def naiveAuc(rows: Seq[(Double, Boolean)]): (BigInt, BigInt) = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    var num = BigInt(0)
    for (p <- pos; n <- neg)
      num += (if (p > n) 2 else if (p == n) 1 else 0)
    (num, BigInt(2) * pos.size * neg.size)
  }

  test("aucExact: hand case with ties, average-rank semantics") {
    // scores: pos {3, 2}, neg {2, 1} -> pairs: (3>2)+(3>1)+(2==2 half)+(2>1)
    // = 3.5 of 4 -> AUC 7/8
    val df = Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false))
      .toDF("s", "l").withColumn("g", lit(0L))
    val got = Analytics.aucExact(df, $"g", $"s", $"l")
      .select($"auc_num".cast("long"), $"auc_den".cast("long"))
      .as[(Long, Long)].collect().head
    assert(got == ((7L, 8L)))
  }

  test("aucExact: randomized differential vs naive pair counting; " +
      "chunked two-phase == single-chunk; degenerate segment den=0") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val seg = rnd.nextInt(3).toLong
      // coarse scores force ties; one segment all-positive (den = 0)
      val score = rnd.nextInt(40).toDouble / 4.0
      val label = if (seg == 2L) true else rnd.nextBoolean()
      (seg, score, label)
    }
    val df = rows.toDF("g", "s", "l")
    // tiny chunkSpan exercises the carry join across many chunks
    val chunked = Analytics.aucExact(df, $"g", $"s", $"l", chunkSpan = 0.5)
      .select($"seg", $"n_pos".cast("long"), $"n_neg".cast("long"),
        $"auc_num".cast("long"), $"auc_den".cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val single = Analytics.aucExact(df, $"g", $"s", $"l", chunkSpan = 1e9)
      .select($"seg", $"n_pos".cast("long"), $"n_neg".cast("long"),
        $"auc_num".cast("long"), $"auc_den".cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(chunked == single)
    for (seg <- Seq(0L, 1L, 2L)) {
      val segRows = rows.filter(_._1 == seg).map(r => (r._2, r._3))
      val (num, den) = naiveAuc(segRows)
      val got = chunked.find(_._1 == seg).get
      assert((BigInt(got._4), BigInt(got._5)) == ((num, den)),
        s"seg $seg")
    }
    assert(chunked.find(_._1 == 2L).get._5 == 0L) // no negatives
  }

  test("calibrationBins: clamped edges, exact bp score mass, null excluded") {
    val df = Seq(
      (Some(-5.0), Some(true)), // clamps to bin 0
      (Some(0.5), Some(false)),
      (Some(9.99), Some(true)), // still bin 0 at width 10.0
      (Some(95.0), Some(true)),
      (Some(150.0), Some(false)), // clamps to bin 9
      (None, Some(true)), (Some(1.0), None) // excluded
    ).toDF("s", "l")
    val got = Analytics.calibrationBins(df, $"s", $"l",
        nBins = 10, lo = 0.0, hi = 100.0)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      0L -> ((3L, 2L, -50000L + 5000L + 99900L)),
      9L -> ((2L, 1L, 950000L + 1500000L))))
  }

  test("funnel: order-sensitive — stage events before the anchor don't count") {
    val df = Seq(
      // u1 completes in order
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      // u2 has b BEFORE its first a: reaches a only
      (2L, "b", 5L), (2L, "a", 10L),
      // u3 reaches b; its c is BEFORE b's anchor
      (3L, "a", 10L), (3L, "c", 15L), (3L, "b", 20L),
      // u4 never does a
      (4L, "b", 1L), (4L, "c", 2L)
    ).map { case (u, t, sec) => (u, t, new java.sql.Timestamp(sec * 1000L)) }
      .toDF("u", "et", "ts")
    val got = Analytics.funnel(df, "u", "ts", Seq(
        "a" -> ($"et" === "a"), "b" -> ($"et" === "b"),
        "c" -> ($"et" === "c")))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, "a", 3L), (1L, "b", 2L), (2L, "c", 1L)))
  }

  test("cohortRetention: first-seen bucket cohorts, offsets, distinct users") {
    val df = Seq(
      (1L, 0L), (1L, 5L), // u1 cohort 0, active offsets {0}
      (1L, 86400L), // ... and offset 1
      (2L, 86400L), (2L, 86400L * 2), // u2 cohort 1, offsets {0, 1}
      (3L, 100L) // u3 cohort 0, offset 0
    ).map { case (u, sec) => (u, new java.sql.Timestamp(sec * 1000L)) }
      .toDF("u", "ts")
    val got = Analytics.cohortRetention(df, "u", "ts", 86400L)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("kappaExact: hand case vs the textbook formula; one-sided class " +
      "contributes nothing; nulls excluded") {
    // a: x x x y y z ; b: x x y y y z — agree = 5 of 6 (only row 3 differs)
    // marginals a: x3 y2 z1; b: x2 y3 z1 -> pe_num = 6+6+1 = 13
    val df = Seq(
      ("x", "x"), ("x", "x"), ("x", "y"), ("y", "y"), ("y", "y"),
      ("z", "z")
    ).map { case (a, b) => (Option(a), Option(b)) }
      .toDF("a", "b")
      .union(Seq((Option("w"), Option.empty[String])).toDF("a", "b"))
    val got = Analytics.kappaExact(df, $"a", $"b")
      .select($"n".cast("long"), $"n_agree".cast("long"),
        $"pe_num".cast("long"))
      .as[(Long, Long, Long)].collect().head
    assert(got == ((6L, 5L, 13L)))
    // kappa = (n*agree - pe) / (n^2 - pe) = (30-13)/(36-13) = 17/23
    assert(got._1 * got._2 - got._3 == 17L &&
      got._1 * got._1 - got._3 == 23L)
  }

  test("trendSlope: exact rational slope per group; single-x group has " +
    "den 0") {
    import spark.implicits._
    val df = Seq(
      ("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L), // slope 2
      ("down", 0L, 9L), ("down", 2L, 5L),             // slope −2
      ("flat", 7L, 4L), ("flat", 7L, 8L))             // no x spread
      .toDF("g", "x", "y")
    val got = Analytics.trendSlope(df, Seq("g"), col("x"), col("y"))
      .select(col("g"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("up") == ((3L, 12L, 6L)))     // 12/6 = 2
    assert(got("down") == ((2L, -8L, 4L)))   // −8/4 = −2
    assert(got("flat")._3 == 0L)
  }

  test("ksDistance: exact max CDF gap in cross-product form, smallest " +
    "attaining value, identical samples give 0") {
    import spark.implicits._
    val df = Seq((true, 1L), (true, 2L), (true, 3L), (false, 3L),
      (false, 4L)).toDF("a", "v")
    val got = Analytics.ksDistance(df, col("a"), col("v"))
      .select(col("n_a"), col("n_b"), col("ks_num").cast("long"),
        col("at_value"))
      .as[(Long, Long, Long, Long)].collect()
    // F_a(2)=2/3, F_b(2)=0 → gap = |2·2 − 0·3| = 4 (KS = 4/6)
    assert(got.toSeq == Seq((3L, 2L, 4L, 2L)))
    val same = Seq((true, 5L), (false, 5L), (true, 9L), (false, 9L))
      .toDF("a", "v")
    val z = Analytics.ksDistance(same, col("a"), col("v"))
      .select(col("ks_num").cast("long")).as[Long].collect()
    assert(z.toSeq == Seq(0L))
  }

  test("fleissStats: textbook invariants on a hand case; ragged items " +
    "dropped and audited; null labels make an item ragged") {
    // 3 raters, 4 clean items + 1 ragged (null label) + 1 short (2 rows)
    // item 1: x x x (unanimous)  item 2: x x y  item 3: y y y
    // item 4: x y z (full split)
    val ratings = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "x"), (2L, "x"), (2L, "y"),
      (3L, "y"), (3L, "y"), (3L, "y"),
      (4L, "x"), (4L, "y"), (4L, "z"),
      (5L, "x"), (5L, "x"), (5L, null),
      (6L, "y"), (6L, "y"))
      .toDF("item", "label")
    val got = Analytics.fleissStats(ratings, "item", "label", 3)
      .select(col("n_items").cast("long"), col("n_raters"),
        col("agree_pairs").cast("long"), col("pe_num").cast("long"),
        col("n_dropped"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // kept cells: 1:{x:3} 2:{x:2,y:1} 3:{y:3} 4:{x:1,y:1,z:1}
    // agree_pairs = 6 + (2+0) + 6 + 0 = 14
    // totals: x = 3+2+1 = 6, y = 1+3+1 = 5, z = 1 -> pe_num = 36+25+1 = 62
    assert(got == Seq((4L, 3L, 14L, 62L, 2L)), got.mkString(","))
    // perfect agreement: kappa numerator check — P-bar = 1
    // (agree_pairs == n_items * R * (R-1))
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "label")
    val p = Analytics.fleissStats(perfect, "item", "label", 2)
      .select(col("n_items").cast("long"), col("agree_pairs").cast("long"))
      .as[(Long, Long)].head()
    assert(p._2 == p._1 * 2L * 1L)
  }

  test("passAtK: exact falling-factorial rationals; all-fail, all-pass, " +
    "sub-k tasks excluded, f < k clamps the numerator to 0") {
    val samples = Seq(
      // task t1: n=4, c=2 -> fail_num = 2*1 = 2, fail_den = 4*3 = 12
      ("t1", true), ("t1", false), ("t1", true), ("t1", false),
      // t2: n=3, c=0 -> all fail: 3*2=6 / 3*2=6 -> pass@2 = 0
      ("t2", false), ("t2", false), ("t2", false),
      // t3: n=2, c=2 -> f=0 < k: fail_num=0 -> pass@2 = 1
      ("t3", true), ("t3", true),
      // t4: n=1 < k -> excluded
      ("t4", true))
      .toDF("task", "ok")
    val got = Analytics.passAtK(samples, "task", col("ok"), k = 2)
      .select(col("task"), col("n"), col("c"),
        col("fail_num").cast("long"), col("fail_den").cast("long"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("t1", 4L, 2L, 2L, 12L),
      ("t2", 3L, 0L, 6L, 6L),
      ("t3", 2L, 2L, 0L, 2L)), got.mkString(","))
    // cross-check t1 against the binomial form: C(2,2)/C(4,2) = 1/6 = 2/12
  }

  test("fleissStats: empty-kept corpus returns zeros, not an empty frame") {
    val ragged = Seq((1L, "x"), (2L, "y")).toDF("item", "label")
    val got = Analytics.fleissStats(ragged, "item", "label", 3)
      .select(col("n_items").cast("long"), col("agree_pairs").cast("long"),
        col("pe_num").cast("long"), col("n_dropped"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 0L, 2L)), got.mkString(","))
  }

  test("isotonicCalibrate: PAV pools violators into exact reduced " +
    "rationals; monotone input passes through") {
    // rates 1/2, 0/3, 1/1: the first two violate -> pool to 1/5
    val v = Seq((0L, 2L, 1L), (1L, 3L, 0L), (2L, 1L, 1L))
      .toDF("bin", "n", "n_pos")
    val got = Analytics.isotonicCalibrate(v)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 1L, 5L), (1L, 3L, 0L, 1L, 5L), (2L, 1L, 1L, 1L, 1L)))

    // already monotone: each bin keeps its own (reduced) rate
    val m = Seq((0L, 4L, 0L), (1L, 4L, 2L), (2L, 4L, 4L))
      .toDF("bin", "n", "n_pos")
    val gm = Analytics.isotonicCalibrate(m)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(gm == Seq(
      (0L, 4L, 0L, 0L, 1L), (1L, 4L, 2L, 1L, 2L), (2L, 4L, 4L, 1L, 1L)))

    // strictly decreasing: one global pool
    val d = Seq((0L, 1L, 1L), (1L, 1L, 0L)).toDF("bin", "n", "n_pos")
    val gd = Analytics.isotonicCalibrate(d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(gd == Seq((0L, 1L, 1L, 1L, 2L), (1L, 1L, 0L, 1L, 2L)))
  }

  test("isotonicCalibrate: cascading merge and the maxBins guard") {
    // rates 1/1, 1/2, 0/1: pooling the last two (1/3) still violates
    // 1/1 -> the merge cascades into one pool 2/4 = 1/2
    val c = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 1L, 0L))
      .toDF("bin", "n", "n_pos")
    val gc = Analytics.isotonicCalibrate(c)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(gc == Seq(
      (0L, 1L, 1L, 1L, 2L), (1L, 2L, 1L, 1L, 2L), (2L, 1L, 0L, 1L, 2L)))

    val big = Seq((0L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 1L))
      .toDF("bin", "n", "n_pos")
    val e = intercept[IllegalArgumentException] {
      Analytics.isotonicCalibrate(big, maxBins = 2)
    }
    assert(e.getMessage.contains("more than 2 bins"))
  }
}
