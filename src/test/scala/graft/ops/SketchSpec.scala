package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.exprs.{BloomImpl, SampleHashImpl}

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------- KMV

  test("kmvDistinct: below-k group is exact; estimate within KMV error") {
    val df = Seq.tabulate(5000)(i => ("big", i.toLong % 1200)) ++
      Seq.tabulate(40)(i => ("small", i.toLong))
    val out = Sketches
      .kmvDistinct(df.toDF("g", "id"), Seq("g"), "id", 256)
      .collect().map(r => r.getString(0) -> r).toMap

    val small = out("small")
    assert(small.getAs[Long]("k_used") == 40L)
    assert(small.getAs[Boolean]("est_exact"))
    assert(small.getDecimal(4).longValueExact() == 40L, "exact branch = k_used")

    val big = out("big")
    assert(big.getAs[Long]("k_used") == 256L)
    assert(!big.getAs[Boolean]("est_exact"))
    val est = big.getDecimal(4).longValueExact()
    // KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 3x that
    assert(est > 1000 && est < 1450, s"estimate $est for true 1200")
  }

  test("kmvDistinct: invariant under partitioning (mergeable partials)") {
    val base = Seq.tabulate(3000)(i => ("g", (i % 700).toLong)).toDF("g", "id")
    val a = Sketches.kmvDistinct(base.repartition(1), Seq("g"), "id", 64).collect()
    val b = Sketches.kmvDistinct(base.repartition(13), Seq("g"), "id", 64).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "the sketch is an order statistic of a set — partitioning must not matter")
  }

  test("kmvDistinct: duplicate ids collapse (distinct semantics)") {
    val dup = (Seq.fill(50)(7L) ++ Seq.fill(50)(8L)).map(("g", _)).toDF("g", "id")
    val r = Sketches.kmvDistinct(dup, Seq("g"), "id", 16).collect().head
    assert(r.getAs[Long]("k_used") == 2L)
    assert(r.getDecimal(4).longValueExact() == 2L)
  }

  test("kmvMergeSketches: merged estimate equals from-scratch (lossless merge)") {
    val rows = Seq.tabulate(4000)(i =>
      ("g" + (i % 3), i % 5, (i % 900).toLong)).toDF("g", "part", "id")
    val direct = Sketches.kmvDistinct(rows, Seq("g"), "id", 64)
      .orderBy("g").collect().map(_.toString)
    val fine = Sketches.kmvSketch(rows, Seq("g", "part"), "id", 64)
    val merged = Sketches.kmvEstimate(
      Sketches.kmvMergeSketches(fine, Seq("g"), 64), Seq("g"), 64)
      .orderBy("g").collect().map(_.toString)
    assert(merged.toSeq == direct.toSeq)
  }

  test("kmvMergeSketches: all-empty parts keep their group alive with n_ids 0") {
    val sk = Sketches.kmvSketch(
      Seq(("g1", Some(1L)), ("g2", None), ("g2", None))
        .toDF("g", "id"), Seq("g"), "id", 8)
    val merged = Sketches.kmvMergeSketches(sk, Seq("g"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("g1" -> 1L, "g2" -> 0L))
  }

  // -------------------------------------------------------------- Bloom

  test("bloom: zero false negatives, and position math matches BloomImpl") {
    val members = (0L until 300L).map(_ * 17L)
    val built = Sketches.bloomBuild(members.toDF("k"), col("k"), 64, 3)
    val words = Sketches.bloomWords(built, 64)
    // every member must hit — via the expression AND the reference impl
    val hits = Sketches
      .bloomMightContain(members.toDF("k"), col("k"), words, 3)
      .agg(sum(when(col("bloom_hit"), 0L).otherwise(1L))).as[Long].head()
    assert(hits == 0L, "a Bloom filter can never miss a member")
    members.foreach(m => assert(BloomImpl.mightContain(m, words, 3)))
  }

  test("bloom: a saturated filter false-positives, an empty one never hits") {
    val members = (0L until 5000L).toDF("k")
    val tiny = Sketches.bloomWords(
      Sketches.bloomBuild(members, col("k"), 2, 3), 2) // 126 bits, 5000 keys
    val fp = (100000L until 100100L).count(BloomImpl.mightContain(_, tiny, 3))
    assert(fp > 90, s"a saturated filter should hit nearly everything, hit $fp/100")
    val empty = new Array[Long](64)
    assert((0L until 100L).forall(!BloomImpl.mightContain(_, empty, 3)))
  }

  test("bloom: bit 63 is never used (checked-shift-safe packing)") {
    val words = Sketches.bloomWords(
      Sketches.bloomBuild((0L until 10000L).toDF("k"), col("k"), 4, 4), 4)
    words.foreach(w => assert(w >= 0L, "sign bit must stay clear"))
  }

  test("membershipWithBloomFastPath: exact vs plain join; misses skip the join") {
    val old = (0L until 400L).map(_ * 3L).toDF("k")
    val nw = (0L until 900L).map(i => (i, i)).toDF("id", "k")
    val got = Sketches.membershipWithBloomFastPath(nw, "k", old, 32, 3)
    val gotMap = got.collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    (0L until 900L).foreach { i =>
      val (hit, member) = gotMap(i)
      assert(member == (i % 3 == 0 && i < 1200), s"wrong membership for $i")
      if (member) assert(hit, "a member can never be a bloom miss")
      if (!hit) assert(!member)
    }
    // the confirm join's probe side must be gated on bloom_hit: walk the
    // optimized plan and check every Join's left subtree filters on the
    // probe expression
    val plan = org.apache.spark.sql.GraftBridge.logicalPlan(got)
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val gated = j.left.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.references.exists(_.name == "bloom_hit") => f
      }
      assert(gated.nonEmpty, "confirm join probe side is not bloom-gated")
      val probes = j.left.collect {
        case p if p.expressions.exists(
          _.exists(_.isInstanceOf[graft.exprs.BloomProbe])) => p
      }
      assert(probes.nonEmpty, "probe expression missing below the join")
    }
  }

  // ---------------------------------------------------------------- CMS

  test("cms: estimates are one-sided (est >= true), exact at generous width") {
    // skewed multiset: key i appears i times
    val rows = (1L to 50L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("k")
    val truth = rows.groupBy("k").agg(count(lit(1)).as("true_count"))
    val wide = Sketches.cmsEstimate(truth, col("k"),
      Sketches.cmsBuild(rows, col("k"), 3, 4096), 3, 4096)
    wide.collect().foreach { r =>
      assert(r.getAs[Long]("est_count") == r.getAs[Long]("true_count"),
        s"width 4096 over 50 keys should be collision-free: $r")
    }
    val narrow = Sketches.cmsEstimate(truth, col("k"),
      Sketches.cmsBuild(rows, col("k"), 3, 8), 3, 8)
    var over = 0L
    narrow.collect().foreach { r =>
      val d = r.getAs[Long]("est_count") - r.getAs[Long]("true_count")
      assert(d >= 0L, "CMS can never underestimate")
      over += d
    }
    assert(over > 0L, "width 8 over 50 keys must collide somewhere")
  }

  test("cms: slice sketches merge counter-wise to the full-corpus sketch") {
    val rows = (0L until 3000L).map(_ % 37L).toDF("k")
    val full = Sketches.cmsBuild(rows, col("k"), 2, 64)
      .orderBy("row_idx", "counter_idx").collect().map(_.toString).toSeq
    val a = Sketches.cmsBuild(rows.filter(col("k") < 20L), col("k"), 2, 64)
    val b = Sketches.cmsBuild(rows.filter(col("k") >= 20L), col("k"), 2, 64)
    val merged = a.unionByName(b)
      .groupBy("row_idx", "counter_idx").agg(sum("cnt").as("cnt"))
      .orderBy("row_idx", "counter_idx").collect().map(_.toString).toSeq
    assert(merged == full, "counter-wise add is a lossless merge")
  }

  test("cms: unseen keys estimate 0 unless they collide") {
    val rows = (0L until 100L).toDF("k")
    val sketch = Sketches.cmsBuild(rows, col("k"), 3, 8192)
    val unseen = (1000000L until 1000050L).toDF("k")
      .withColumn("true_count", lit(0L))
    val est = Sketches.cmsEstimate(unseen, col("k"), sketch, 3, 8192)
    val nonzero = est.filter(col("est_count") > 0).count()
    assert(nonzero <= 2, s"at width 8192 almost all unseen keys miss, got $nonzero")
  }

  test("membershipWithBloomFastPath: null keys survive with is_member=false") {
    val old = Seq(1L, 2L, 3L).toDF("k")
    val nw = Seq((1L, Some(1L)), (2L, Some(99L)), (3L, Option.empty[Long]))
      .toDF("id", "k")
    val got = Sketches.membershipWithBloomFastPath(nw, "k", old, 8, 3)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Boolean]), r.getBoolean(3))))
      .toMap
    assert(got.size == 3, "no row may vanish")
    assert(got(1L) == ((Some(true), true)))
    assert(got(2L)._2 == false)
    assert(got(3L) == ((None, false)),
      "null key: bloom_hit null, member of nothing")
  }

  // ---------------------------------------------------------------- PPS

  test("samplePps: certainty rows always kept, inclusion prob exact") {
    // one heavy row (w=1000) among 100 light (w=1): W=1100, k=2 ⇒ the
    // heavy row has k·w=2000 > W ⇒ certainty
    val df = (Seq((0L, 1000L)) ++ (1L to 100L).map((_, 1L)))
      .toDF("id", "w").withColumn("s", lit("x"))
    val kept = Curation.samplePps(df, "id", "s", col("w"), 2L)
    val heavy = kept.filter(col("id") === 0L).collect()
    assert(heavy.length == 1, "w ≥ W/k row must be kept with certainty")
    assert(heavy.head.getDecimal(3).longValueExact() == 1100L, "p_num capped at W")
    assert(heavy.head.getDecimal(4).longValueExact() == 1100L)
    val light = kept.filter(col("id") =!= 0L).select("p_num").collect()
    light.foreach(r => assert(r.getDecimal(0).longValueExact() == 2L,
      "light row p_num = k·w = 2"))
  }

  test("samplePps: nested in k and weight-0 rows never kept") {
    val df = (1L to 400L).map(i => (i, i % 7)).toDF("id", "w")
      .withColumn("s", lit("x"))
    def keptIds(k: Long): Set[Long] =
      Curation.samplePps(df, "id", "s", col("w"), k)
        .select("id").as[Long].collect().toSet
    val k5 = keptIds(5L); val k20 = keptIds(20L)
    assert(k5.subsetOf(k20), "samples must nest in k")
    val zeros = df.filter(col("w") === 0).select("id").as[Long].collect().toSet
    assert(k20.intersect(zeros).isEmpty, "zero-weight rows are never sampled")
  }

  test("samplePps: a NULL stratum is its own stratum, not silently dropped") {
    val df = ((1L to 50L).map(i => (i, Some("a"))) ++
      (51L to 100L).map(i => (i, Option.empty[String])))
      .map { case (i, s) => (i, s, 10L) }.toDF("id", "s", "w")
    val kept = Curation.samplePps(df, "id", "s", col("w"), 50L)
    // k >= group size and uniform weights => every row kept in BOTH strata
    assert(kept.count() == 100L, "null-stratum rows must sample too")
    val nullRows = kept.filter(col("s").isNull)
    assert(nullRows.count() == 50L)
    nullRows.select("p_den").collect().foreach(r =>
      assert(r.getDecimal(0).longValueExact() == 500L,
        "null stratum totals over ITS OWN rows"))
  }

  test("samplePps: negative weight fails loud") {
    val df = Seq((1L, -5L)).toDF("id", "w").withColumn("s", lit("x"))
    val e = intercept[Exception] {
      Curation.samplePps(df, "id", "s", col("w"), 1L).collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      Option(e.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("unsigned order: fmix64 keys with the sign bit set sort after positives") {
    // find ids whose mixed keys straddle the sign bit and check the
    // sketch's k-th minimum respects UNSIGNED order
    val ids = (0L until 2000L)
    val negs = ids.count(i => SampleHashImpl.mix(i) < 0)
    assert(negs > 500, "the mix should hit the top bit about half the time")
    val r = Sketches.kmvDistinct(ids.toDF("id").withColumn("g", lit("x")),
      Seq("g"), "id", 100).collect().head
    val kth = r.getDecimal(3)
    assert(kth.compareTo(new java.math.BigDecimal("9223372036854775807")) < 0,
      "with 2000 uniform keys the 100th unsigned minimum must be far below 2^63")
  }

  test("hllRegisters: rho matches a BigInt reference bit count per value") {
    val vals = (1 to 200).map(i => s"doc-$i")
    val got = Sketches.hllRegisters(vals.toDF("v"), $"v", p = 8)
      .as[(Long, Int)].collect().toMap
    // reference: same md5-first-15-hex-digits key, p=8, w=52
    val exp = scala.collection.mutable.Map.empty[Long, Int]
    val md = java.security.MessageDigest.getInstance("MD5")
    for (v <- vals) {
      val hex = md.digest(v.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val k = java.lang.Long.parseLong(hex, 16)
      val bucket = k % 256
      val r = k / 256
      val rho = if (r == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(r))
      exp(bucket) = math.max(exp.getOrElse(bucket, 0), rho)
    }
    assert(got == exp.toMap)
  }

  test("hllMerge: union of halves == whole; estimate within HLL error") {
    val n = 20000
    val vals = (1 to n).map(i => s"item-$i")
    val whole = Sketches.hllRegisters(vals.toDF("v"), $"v", p = 8)
    val a = Sketches.hllRegisters(vals.take(n / 2).toDF("v"), $"v", p = 8)
    // overlapping second half: merge must behave as set union
    val b = Sketches.hllRegisters(vals.drop(n / 3).toDF("v"), $"v", p = 8)
    val merged = Sketches.hllMerge(a, b)
    assert(merged.as[(Long, Int)].collect().toMap ==
      whole.as[(Long, Int)].collect().toMap)
    val est = Sketches.hllEstimate(whole, p = 8)
    // 1.04/sqrt(256) = 6.5% standard error; allow 4 sigma
    assert(math.abs(est - n) < n * 0.26, s"estimate $est vs true $n")
    // small-range: 5 distinct values must use linear counting, close-exact
    val tiny = Sketches.hllRegisters((1 to 5).map(i => s"t$i").toDF("v"), $"v", 8)
    val tinyEst = Sketches.hllEstimate(tiny, p = 8)
    assert(math.abs(tinyEst - 5.0) < 1.0, s"tiny estimate $tinyEst")
  }

  test("hllRegistersBy: each group's registers equal the ungrouped sketch " +
      "of that group's values") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"val-${i % 700}"))
    val df = rows.toDF("g", "v")
    val grouped = Sketches.hllRegistersBy(df, Seq("g"), $"v", p = 6)
      .as[(String, Long, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketches.hllRegisters(
          rows.filter(_._1 == g).map(_._2).toDF("v"), $"v", p = 6)
        .as[(Long, Int)].collect().toMap
      assert(grouped(g) == solo, s"group $g")
    }
  }

  // ------------------------------------------------- log₂ histogram

  test("logHistogram: bucket = bitlength, 0 gets bucket 0, " +
      "power-of-two boundaries land on the right side") {
    val df = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("v")
      .withColumn("g", lit("g"))
    val got = Sketches.logHistogram(df, "g", $"v")
      .select($"bucket", $"cnt").as[(Long, Long)].collect().toMap
    // expected: 0→b0; 1→b1; 2,3→b2; 4,7→b3; 8→b4; 1023→b10; 1024→b11
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L,
      10L -> 1L, 11L -> 1L))
  }

  test("logHistogram: negative values fail loud") {
    val e = intercept[Exception] {
      Sketches.logHistogram(Seq(("g", -1L)).toDF("g", "v"), "g", $"v")
        .collect()
    }
    assert(e.getMessage.contains("negative value") ||
      Option(e.getCause).exists(_.getMessage.contains("negative value")))
  }

  test("logHistMerge: half-corpus sketches merge losslessly to the whole") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map(i => (s"g${i % 2}", rnd.nextInt(100000).toLong))
    val df = rows.toDF("g", "v")
    val whole = Sketches.logHistogram(df, "g", $"v")
      .as[(String, Long, Long)].collect().toSet
    val a = Sketches.logHistogram(
      rows.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toDF("g", "v"),
      "g", $"v")
    val b = Sketches.logHistogram(
      rows.zipWithIndex.filter(_._2 % 2 == 1).map(_._1).toDF("g", "v"),
      "g", $"v")
    val merged = Sketches.logHistMerge(a, b, "g")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("logHistQuantiles: the exact quantile always lies inside the " +
      "factor-2 bracket; n matches") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 1500).map(i => (s"g${i % 3}", rnd.nextInt(50000).toLong))
    val df = rows.toDF("g", "v")
    val sketch = Sketches.logHistogram(df, "g", $"v")
    val got = Sketches.logHistQuantiles(sketch, "g", Seq(5000, 9900))
      .select($"g", $"n", $"q5000_lo", $"q5000_hi", $"q9900_lo", $"q9900_hi")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def exact(vs: Seq[Long], qBp: Int): Long =
      vs(((qBp.toLong * vs.size + 9999) / 10000 - 1).toInt)
    got.foreach { case (g, n, lo5, hi5, lo99, hi99) =>
      val vs = byG(g)
      assert(n == vs.size)
      val e5 = exact(vs, 5000)
      val e99 = exact(vs, 9900)
      assert(lo5 <= e5 && e5 <= hi5, s"$g median $e5 outside [$lo5, $hi5]")
      assert(lo99 <= e99 && e99 <= hi99, s"$g p99 $e99 outside [$lo99, $hi99]")
      // factor-2 bracket: hi = 2·lo − 1
      assert(hi5 == 2 * lo5 - 1 && hi99 == 2 * lo99 - 1)
    }
  }

  test("bloom-pruned as-of feed: answer byte-equal to unpruned, and the " +
      "prune genuinely shrinks the feed (no false negatives by construction)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // anchors cover keys 0..9; the feed spans 0..99 — 90% prunable
    val anchors = (0 until 10).flatMap(k =>
      Seq((k.toLong, 1, ts(100 + k)), (k.toLong, 2, ts(200 + k))))
      .toDF("key", "turn_idx", "ts")
    val feed = (0 until 100).flatMap(k =>
      Seq((k.toLong, ts(50 + k), s"v$k-a"), (k.toLong, ts(150 + k), s"v$k-b")))
      .toDF("key", "ts", "value")
    val words = Sketches.bloomWords(
      Sketches.bloomBuild(anchors, $"key", nWords = 8, nHashes = 4),
      nWords = 8)
    val pruned = Sketches.bloomMightContain(feed, $"key", words, nHashes = 4)
      .filter($"bloom_hit").drop("bloom_hit")
    val nPruned = pruned.count()
    assert(nPruned < feed.count(), "prune must drop something")
    assert(nPruned >= 20L, "matching feed rows must all survive")
    def asof(f: org.apache.spark.sql.DataFrame) =
      graft.features.AsOf.joinBackward(anchors, f, Seq("key"))
        .select($"key", $"turn_idx", $"value")
        .as[(Long, Int, String)].collect().toSet
    assert(asof(pruned) == asof(feed))
  }
}
