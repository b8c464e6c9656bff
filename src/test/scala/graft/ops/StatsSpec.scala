package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference doubled-average-rank per row: r2(v) = 2·|{u < v}| + c(v) + 1. */
  private def r2Map(vs: Seq[Double]): Map[Double, BigInt] = {
    val counts = vs.groupBy(identity).view.mapValues(_.size).toMap
    counts.map { case (v, c) =>
      val before = vs.count(_ < v)
      v -> (BigInt(2) * before + c + 1)
    }
  }

  private def naiveStats(rows: Seq[(Double, Double)])
      : (Long, BigInt, BigInt, BigInt, BigInt, BigInt) = {
    val rx = r2Map(rows.map(_._1))
    val ry = r2Map(rows.map(_._2))
    val xs = rows.map(r => rx(r._1))
    val ys = rows.map(r => ry(r._2))
    (rows.size.toLong, xs.sum, ys.sum,
      xs.zip(ys).map { case (a, b) => a * b }.sum,
      xs.map(a => a * a).sum, ys.map(a => a * a).sum)
  }

  test("spearmanExact: hand case — perfect monotone pair gives rho = 1") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (5.0, 21.0)).toDF("x", "y")
    val g = Stats.spearmanExact(df, $"x", $"y")
      .select($"n", $"s_x".cast("long"), $"s_y".cast("long"),
        $"s_xy".cast("long"), $"s_xx".cast("long"), $"s_yy".cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // identical rank sequences: s_xy == s_xx == s_yy -> rho = 1 exactly
    assert(g._1 == 3L && g._2 == 12L && g._3 == 12L)
    assert(g._4 == g._5 && g._5 == g._6)
    // rho numerator == denominator-squared pieces: n*s_xy - s_x*s_y
    assert(g._1 * g._4 - g._2 * g._3 == g._1 * g._5 - g._2 * g._2)
  }

  test("spearmanExact: randomized differential vs naive ranks with ties; " +
      "chunked two-phase == single-chunk; nulls excluded") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      // coarse grids force heavy ties in both columns
      (rnd.nextInt(20).toDouble, rnd.nextInt(15).toDouble)
    }
    val withNulls = rows.map { case (a, b) => (Option(a), Option(b)) } ++
      Seq((None, Some(1.0)), (Some(2.0), None))
    val df = withNulls.toDF("x", "y")
    val got = Stats.spearmanExact(df, $"x", $"y", chunkSpan = 3.0)
      .select($"n", $"s_x".cast("long"), $"s_y".cast("long"),
        $"s_xy".cast("long"), $"s_xx".cast("long"), $"s_yy".cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val single = Stats.spearmanExact(df, $"x", $"y", chunkSpan = 1e9)
      .select($"n", $"s_x".cast("long"), $"s_y".cast("long"),
        $"s_xy".cast("long"), $"s_xx".cast("long"), $"s_yy".cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == single)
    val (n, sx, sy, sxy, sxx, syy) = naiveStats(rows)
    assert(got == ((n, sx.toLong, sy.toLong, sxy.toLong, sxx.toLong,
      syy.toLong)))
    // rank-sum invariant: s_x = s_y = n(n+1)
    assert(got._2 == n * (n + 1) && got._3 == n * (n + 1))
  }

  /** Naive weighted quantile: smallest v with cum(≤v)·10⁴ ≥ q·W. */
  private def naiveWq(rows: Seq[(Long, Long)], q: Int): Option[Long] = {
    val byV = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val w = byV.map(_._2).sum
    var cum = 0L
    byV.collectFirst {
      case (v, wv) if { cum += wv; wv > 0 && cum * 10000L >= q * w } => v
    }
  }

  test("weightedGroupedQuantiles: weight 1 == exactGroupedQuantiles; " +
      "randomized differential; zero weight never picked; negative raises") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map { i =>
      ("g" + (i % 2), rnd.nextInt(300).toLong, rnd.nextInt(5).toLong)
    } :+ (("g2", 7L, 0L)) :+ (("g2", 9L, 3L)) // g2: zero-weight 7 skipped
    val df = rows.toDF("g", "v", "w")
    val qs = Seq(2500, 5000, 9900)
    val got = Stats.weightedGroupedQuantiles(df, "g", $"v", $"w", qs,
        chunkSpan = 32L)
      .select($"g", $"q2500", $"q5000", $"q9900")
      .as[(String, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val grows = rows.filter(_._1 == g).map(r => (r._2, r._3))
      assert(got(g) == ((naiveWq(grows, 2500), naiveWq(grows, 5000),
        naiveWq(grows, 9900))), s"group $g")
    }
    assert(got("g2") == ((Some(9L), Some(9L), Some(9L)))) // 7 never picked
    // weight ≡ 1 reproduces the unweighted operator
    val ones = df.withColumn("w1", lit(1L))
    val wq = Stats.weightedGroupedQuantiles(ones, "g", $"v", $"w1", qs,
        chunkSpan = 32L)
      .select($"g", $"q2500", $"q5000", $"q9900")
      .as[(String, Long, Long, Long)].collect().toSet
    val uq = Stats.exactGroupedQuantiles(ones.withColumn("tie", $"v"),
        "g", $"v", "tie", qs, chunkSpan = 32L)
      .select($"g", $"q2500", $"q5000", $"q9900")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(wq == uq)
    val neg = Seq(("g", 1L, -2L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Stats.weightedGroupedQuantiles(neg, "g", $"v", $"w", Seq(5000))
        .collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      Option(e.getCause).exists(_.getMessage.contains("negative weight")))
  }

  /** Reference discrete quantile: value at rank ceil(q·n/10⁴) in sorted
    * order — the documented contract of exactGroupedQuantiles.
    */
  private def refQuantile(vs: Seq[Long], qBp: Int): Long = {
    val sorted = vs.sorted
    val r = (qBp.toLong * sorted.size + 9999) / 10000
    sorted((r - 1).toInt)
  }

  test("madOutliers: hand case — one far value beyond 3 MADs") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 4L), ("g", 5L, 100L)).toDF("g", "id", "v")
    val got = Stats.madOutliers(df, "g", $"v", "id", kBp = 30000L)
      .select($"id", $"med", $"mad", $"abs_dev", $"is_outlier")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // med = rank ceil(2.5) = 3rd of (1,2,3,4,100) = 3; adevs (2,1,0,1,97)
    // sorted (0,1,1,2,97) -> mad = 1; outlier iff adev > 3
    assert(got.forall(r => r._2 == 3L && r._3 == 1L))
    assert(got.map(r => r._1 -> r._5).toMap ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true))
  }

  test("madOutliers + winsorize: a NULL group is a group — its rows " +
      "survive the join-back with their own median/bounds") {
    val df = Seq((Option("g"), 1L, 10L), (Option("g"), 2L, 20L),
      (Option.empty[String], 3L, 5L), (Option.empty[String], 4L, 7L),
      (Option.empty[String], 5L, 9L)).toDF("g", "id", "v")
    val mad = Stats.madOutliers(df, "g", $"v", "id", kBp = 30000L)
      .select($"id", $"med").as[(Long, Long)].collect().toMap
    assert(mad.size == 5)
    assert(mad(3L) == 7L && mad(4L) == 7L && mad(5L) == 7L) // null-group med
    val win = Stats.winsorize(df, "g", $"v", "id", loBp = 500, hiBp = 9500)
      .select($"id").as[Long].collect()
    assert(win.length == 5)
  }

  test("madOutliers: mad = 0 (majority constant) flags every deviating row " +
      "— the documented caveat") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L), ("g", 4L, 7L))
      .toDF("g", "id", "v")
    val got = Stats.madOutliers(df, "g", $"v", "id", kBp = 30000L)
      .select($"id", $"mad", $"is_outlier")
      .as[(Long, Long, Boolean)].collect()
    assert(got.forall(_._2 == 0L))
    assert(got.filter(_._3).map(_._1).toSeq == Seq(4L))
  }

  test("madOutliers: randomized differential vs naive medians, " +
      "two-phase chunking exercised") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 3}"
      (g, i.toLong, rnd.nextInt(5000).toLong)
    }
    val byG = rows.groupBy(_._1)
    val expect = rows.map { case (g, id, v) =>
      val vs = byG(g).map(_._3)
      val med = refQuantile(vs, 5000)
      val mad = refQuantile(vs.map(x => math.abs(x - med)), 5000)
      (g, id) -> (med, mad, math.abs(v - med) * 10000L > 30000L * mad)
    }.toMap
    val got = Stats.madOutliers(rows.toDF("g", "id", "v"), "g", $"v", "id",
        kBp = 30000L, chunkSpan = 64L)
      .select($"g", $"id", $"med", $"mad", $"is_outlier")
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.length == rows.size)
    got.foreach { case (g, id, med, mad, fl) =>
      assert(expect((g, id)) == ((med, mad, fl)))
    }
  }

  test("winsorize: clamps into exact [p5, p95], flags only moved rows, " +
      "randomized differential") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map { i =>
      (s"g${i % 2}", i.toLong, rnd.nextInt(10000).toLong)
    }
    val byG = rows.groupBy(_._1)
    val got = Stats.winsorize(rows.toDF("g", "id", "v"), "g", $"v", "id",
        loBp = 500, hiBp = 9500, chunkSpan = 128L)
      .select($"g", $"id", $"v", $"lo", $"hi", $"v_clipped", $"was_clipped")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == rows.size)
    got.foreach { case (g, _, v, lo, hi, clipped, flag) =>
      val vs = byG(g).map(_._3)
      assert(lo == refQuantile(vs, 500) && hi == refQuantile(vs, 9500))
      assert(clipped == math.min(math.max(v, lo), hi))
      assert(flag == (v < lo || v > hi))
      assert(clipped >= lo && clipped <= hi)
    }
  }

  test("quantileNormalize: reference group is a fixed point; other groups " +
      "match the naive rank-scaled lookup; two-phase chunking exercised") {
    val rnd = new scala.util.Random(47)
    // deliberately different sizes so rank scaling is non-trivial
    val rows = (1 to 200).map(i => ("ref", i.toLong, rnd.nextInt(3000).toLong)) ++
      (1 to 77).map(i => ("g1", 1000L + i, rnd.nextInt(9000).toLong)) ++
      (1 to 123).map(i => ("g2", 2000L + i, rnd.nextInt(500).toLong))
    val df = rows.toDF("g", "id", "v")
    val got = Stats.quantileNormalize(df, "g", $"v", "id", refGroup = "ref",
        chunkSpan = 64L)
      .select($"g", $"id", $"v", $"rank", $"n", $"v_norm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == rows.size)
    val byG = rows.groupBy(_._1).view
      .mapValues(_.sortBy(r => (r._3, r._2))).toMap
    val refSorted = byG("ref").map(_._3)
    val nRef = refSorted.size.toLong
    val expectRank = byG.flatMap { case (g, rs) =>
      rs.zipWithIndex.map { case ((_, id, _), i) => (g, id) -> (i + 1L) }
    }
    got.foreach { case (g, id, v, rank, n, vNorm) =>
      assert(rank == expectRank((g, id)), s"rank of ($g, $id)")
      assert(n == byG(g).size.toLong)
      val rt = (rank * nRef + n - 1) / n
      assert(vNorm == refSorted((rt - 1).toInt), s"v_norm of ($g, $id)")
      if (g == "ref") assert(vNorm == v, "reference must map to itself")
    }
    // normalized multiset of a group IS a rank-scaled sample of ref values
    val g2Norm = got.filter(_._1 == "g2").map(_._6).toSet
    assert(g2Norm.subsetOf(refSorted.toSet))
    val e = intercept[Exception] {
      Stats.quantileNormalize(df, "g", $"v", "id", refGroup = "absent")
        .collect()
    }
    assert(e.getMessage.contains("reference group") ||
      Option(e.getCause).exists(_.getMessage.contains("reference group")))
  }

  test("quantileCuts/applyCuts: cuts at the exact rank contract; " +
    "boundary value opens the next bin; null rides through") {
    // values 10..80: quartile cuts at ranks ceil(2)=2, ceil(4)=4,
    // ceil(6)=6 -> cut values 20, 40, 60
    val ref = (1L to 8L).map(v => (v, v * 10)).toDF("id", "v")
    val cuts = Stats.quantileCuts(ref, col("v"), "id", 4)
      .orderBy("cut_idx")
      .as[(Int, Long)].collect().toSeq
    assert(cuts == Seq((1, 20L), (2, 40L), (3, 60L)))

    val apply = Seq(Option(5L), Option(20L), Option(39L), Option(40L),
      Option(75L), None).toDF("v")
    val got = apply.select(
        Stats.applyCuts(col("v"), cuts.map(_._2)).as("bin"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(0L), Some(1L), Some(1L), Some(2L), Some(3L),
      None))
  }

  test("giniStats: exact rational — hand case 1/6, uniform mass 0, " +
    "single-holder (n-1)/n") {
    def gini(vals: Seq[Long]): (Long, Long, Long, Long) =
      Stats.giniStats(
          vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
            .toDF("id", "v"),
          col("v"), "id")
        .select(col("n"), col("total").cast("long"),
          col("gini_num").cast("long"), col("gini_den").cast("long"))
        .as[(Long, Long, Long, Long)].head()
    // (1,1,2): mean-abs-diff 4/9 over 2*mean 8/3 -> G = 1/6 = 2/12
    assert(gini(Seq(1L, 1L, 2L)) == ((3L, 4L, 2L, 12L)))
    // all equal -> perfectly even, G = 0
    assert(gini(Seq(7L, 7L, 7L, 7L)) == ((4L, 28L, 0L, 112L)))
    // one doc holds everything -> G = (n-1)/n = 4/5 = 40/50
    assert(gini(Seq(0L, 0L, 0L, 0L, 10L)) == ((5L, 10L, 40L, 50L)))
  }

  test("lorenzCurve: exact bucket boundaries, cumulative mass, totals") {
    // 4 docs, 2 buckets: ranks 0..3 -> phases 0,0,1,1 by floor(r·2/4);
    // sorted masses (1, 2, 3, 10): bottom half holds 3 of 16
    val df = Seq((0L, 3L), (1L, 10L), (2L, 1L), (3L, 2L))
      .toDF("id", "v")
    val got = Stats.lorenzCurve(df, col("v"), "id", nBuckets = 2)
      .orderBy("bucket")
      .select(col("bucket"), col("n_docs"), col("mass").cast("long"),
        col("cum_docs"), col("cum_mass").cast("long"),
        col("total_docs"), col("total_mass").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 3L, 2L, 3L, 4L, 16L),
      (1L, 2L, 13L, 4L, 16L, 4L, 16L)))
  }
}
