package graft.features

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.{TranscriptGen, Turn}

/** Feature operators vs a deliberately naive single-threaded in-memory
  * oracle (SURVEY.md §5): Spark output must match exactly under stable
  * (conv_id, ts, turn_idx) ordering, and a leakage property asserts no
  * feature reads a timestamp greater than its anchor.
  */
class FeatureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val turns: Seq[Turn] =
    (0L until 40L).flatMap(c => TranscriptGen.turnsFor(seed = 7L, c, maxLen = 64))
  private lazy val df = spark.createDataFrame(turns)

  private def sortedConv(c: String): Seq[Turn] =
    turns.filter(_.conv_id == c).sortBy(t => (t.ts.getTime, t.turn_idx))

  test("joinForward: earliest obs at ts >= anchor; exact-match + tolerance") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val anchors = Seq(("a", 1, ts(10)), ("a", 2, ts(20)), ("a", 3, ts(31)),
      ("b", 1, ts(5))).toDF("k", "idx", "ts")
    val obs = Seq(("a", ts(20), "x"), ("a", ts(30), "y"))
      .toDF("k", "ts", "v")
    def run(exact: Boolean, tol: Option[Long] = None) =
      AsOf.joinForward(anchors, obs, Seq("k"),
          allowExactMatches = exact, toleranceMs = tol)
        .select("k", "idx", "v")
        .as[(String, Int, Option[String])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val exact = run(exact = true)
    assert(exact(("a", 1)) == Some("x")) // next obs at 20
    assert(exact(("a", 2)) == Some("x")) // ts == anchor counts
    assert(exact(("a", 3)) == None)      // nothing after 31
    assert(exact(("b", 1)) == None)      // key with no obs
    val strict = run(exact = false)
    assert(strict(("a", 2)) == Some("y")) // equal ts excluded -> 30
    val tol = run(exact = true, tol = Some(5000L))
    assert(tol(("a", 1)) == None)        // 20 is 10s after anchor > 5s
    assert(tol(("a", 2)) == Some("x"))   // 0s ahead, within tolerance
  }

  test("native joinForward (negated-ts sort-merge) equals union-merge forward") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val anchors = Seq(("a", 1, ts(10)), ("a", 2, ts(20)), ("a", 3, ts(31)),
      ("b", 1, ts(5))).toDF("k", "idx", "ts")
    val obs = Seq(("a", ts(20), "x"), ("a", ts(30), "y"))
      .toDF("k", "ts", "v")
    for {
      exact <- Seq(true, false)
      tol <- Seq(None, Some(5000L), Some(60000L))
    } {
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("k", "idx", "v")
        .as[(String, Int, Option[String])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val union = key(AsOf.joinForward(anchors, obs, Seq("k"),
        allowExactMatches = exact, toleranceMs = tol))
      val native = key(AsOfNative.joinForward(anchors, obs, Seq("k"),
        allowExactMatches = exact, toleranceMs = tol))
      assert(native == union, s"exact=$exact tol=$tol")
    }
  }

  test("native joinForward on TIMESTAMP_NTZ is timezone-free (DST window)") {
    import org.apache.spark.sql.functions.{col, to_timestamp_ntz}
    // 2026-03-08 02:00-03:00 does not exist in America/Los_Angeles (spring
    // forward): NTZ values inside that hour collide/shift if negation
    // round-trips through a session-timezone cast. Native must equal the
    // union-merge, which compares NTZ values directly.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val anchors = Seq(("k", 1, "2026-03-08 02:10:00"),
        ("k", 2, "2026-03-08 02:50:00"))
        .toDF("k", "idx", "s")
        .select(col("k"), col("idx"), to_timestamp_ntz(col("s")).as("ts"))
      val obs = Seq(("k", "2026-03-08 02:30:00", "mid"),
        ("k", "2026-03-08 03:30:00", "late"))
        .toDF("k", "s", "v")
        .select(col("k"), to_timestamp_ntz(col("s")).as("ts"), col("v"))
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("idx", "v").as[(Int, Option[String])].collect().toMap
      val union = key(AsOf.joinForward(anchors, obs, Seq("k")))
      val native = key(AsOfNative.joinForward(anchors, obs, Seq("k")))
      assert(union === Map(1 -> Some("mid"), 2 -> Some("late")))
      assert(native === union)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("lag matches in-memory oracle per conversation") {
    val w = Windows.turnWindow
    val got = Windows
      .withLag(df, w, "text", 1)
      .select("conv_id", "turn_idx", "ts", "text_lag1")
      .as[(String, Int, Timestamp, Option[String])]
      .collect()
      .map(r => (r._1, r._2) -> r._4)
      .toMap
    for (c <- turns.map(_.conv_id).distinct) {
      val sorted = sortedConv(c)
      sorted.zipWithIndex.foreach { case (t, i) =>
        val expected = if (i == 0) None else Option(sorted(i - 1).text)
        assert(got((c, t.turn_idx)) == expected,
          s"lag mismatch at ($c, ${t.turn_idx})")
      }
    }
  }

  test("LOCF backfill matches oracle (nulls carried forward)") {
    val got = Windows
      .locf(df, Windows.turnWindow, "tool")
      .select("conv_id", "turn_idx", "tool_locf")
      .as[(String, Int, Option[String])]
      .collect()
      .map(r => (r._1, r._2) -> r._3)
      .toMap
    for (c <- turns.map(_.conv_id).distinct) {
      var lastSeen: Option[String] = None
      sortedConv(c).foreach { t =>
        if (t.tool != null) lastSeen = Some(t.tool)
        assert(got((c, t.turn_idx)) == lastSeen,
          s"locf mismatch at ($c, ${t.turn_idx})")
      }
    }
  }

  test("decayedSum matches in-memory oracle; horizon 1 is identity") {
    import org.apache.spark.sql.functions.{char_length, coalesce, col, lit}
    val v = coalesce(char_length(col("text")).cast("long"), lit(0L))
    val got = Windows
      .decayedSum(df.withColumn("v", v), Windows.turnWindow,
        col("v"), horizon = 4, as = "dec")
      .select("conv_id", "turn_idx", "dec")
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (c <- turns.map(_.conv_id).distinct) {
      // char_length counts CODEPOINTS (the gen's word list has an astral
      // char, where Java String.length would over-count by one)
      val vals = sortedConv(c).map(t =>
        if (t.text == null) 0L
        else t.text.codePointCount(0, t.text.length).toLong)
      sortedConv(c).zipWithIndex.foreach { case (t, i) =>
        // weight 2^(3 - distance) over the trailing <= 4 rows
        val expected = (0 to math.min(3, i))
          .map(d => vals(i - d) * (1L << (3 - d))).sum
        assert(got((c, t.turn_idx)) == expected,
          s"decayed mismatch at ($c, ${t.turn_idx})")
      }
    }
    // horizon 1: weight 2^0 on the current row only
    val id1 = Windows
      .decayedSum(df.withColumn("v", v), Windows.turnWindow,
        col("v"), horizon = 1, as = "dec")
      .filter(col("dec") =!= col("v")).count()
    assert(id1 == 0L, "horizon-1 decayedSum must equal the value itself")
  }

  test("sessionize assigns gap-based ids matching oracle") {
    val gap = 30L
    val got = Sessionize(df, Seq("conv_id"), "ts", gap, Seq("turn_idx"))
      .select("conv_id", "turn_idx", "session_seq")
      .as[(String, Int, Long)]
      .collect()
      .map(r => (r._1, r._2) -> r._3)
      .toMap
    for (c <- turns.map(_.conv_id).distinct) {
      var seq = -1L
      var prev: Option[Long] = None
      sortedConv(c).foreach { t =>
        val sec = t.ts.getTime / 1000L
        if (prev.isEmpty || sec - prev.get > gap) seq += 1
        prev = Some(sec)
        assert(got((c, t.turn_idx)) == seq,
          s"session mismatch at ($c, ${t.turn_idx})")
      }
    }
  }

  test("as-of join backward matches oracle and never leaks future rows") {
    // anchors: assistant turns; features: tool observations
    val anchors = df.filter($"role" === "assistant")
      .select("conv_id", "turn_idx", "ts")
    val obs = df.filter($"tool".isNotNull)
      .select($"conv_id", $"ts", $"tool", $"turn_idx".as("obs_idx"))
    val joined = AsOf
      .joinBackward(anchors, obs, Seq("conv_id"))
      .select("conv_id", "turn_idx", "ts", "tool", "obs_idx")
      .as[(String, Int, Timestamp, Option[String], Option[Int])]
      .collect()

    val obsLocal = turns.filter(_.tool != null)
    joined.foreach { case (c, idx, ts, tool, obsIdx) =>
      // oracle: latest obs with (ts, turn_idx-as-src-tiebreak) ≤ anchor
      val candidates = obsLocal.filter(o =>
        o.conv_id == c && o.ts.getTime <= ts.getTime)
      val expected =
        if (candidates.isEmpty) None
        else Some(candidates.maxBy(o => (o.ts.getTime, o.turn_idx)))
      // ZERO-LEAKAGE property: matched ts must be ≤ anchor ts
      obsIdx.foreach { oi =>
        val matched = obsLocal.find(o => o.conv_id == c && o.turn_idx == oi).get
        assert(matched.ts.getTime <= ts.getTime,
          s"LEAKAGE at ($c, $idx): matched ${matched.ts} > anchor $ts")
      }
      // exact oracle value (ties broken by union sort order are stable
      // within equal ts — compare the ts of the match, not the row id)
      assert(tool.isDefined == expected.isDefined, s"match presence ($c,$idx)")
      for (e <- expected; oi <- obsIdx) {
        val matched = obsLocal.find(o => o.conv_id == c && o.turn_idx == oi).get
        assert(matched.ts.getTime == e.ts.getTime,
          s"as-of picked wrong ts at ($c,$idx)")
      }
    }
  }

  test("as-of strict (< semantics) excludes equal timestamps") {
    val anchors = Seq(("a", 1, ts(1000))).toDF("conv_id", "turn_idx", "ts")
    val obs = Seq(("a", ts(1000), "x"), ("a", ts(500), "y"))
      .toDF("conv_id", "ts", "tool")
    val exact = AsOf.joinBackward(anchors, obs, Seq("conv_id"))
      .select("tool").as[String].collect()
    val strict = AsOf
      .joinBackward(anchors, obs, Seq("conv_id"), allowExactMatches = false)
      .select("tool").as[String].collect()
    assert(exact.toSeq == Seq("x"))
    assert(strict.toSeq == Seq("y"))
  }

  test("as-of tolerance drops stale matches") {
    val anchors = Seq(("a", 1, ts(100000))).toDF("conv_id", "turn_idx", "ts")
    val obs = Seq(("a", ts(10000), "old")).toDF("conv_id", "ts", "tool")
    val within = AsOf.joinBackward(anchors, obs, Seq("conv_id"),
      toleranceMs = Some(100000L)).select("tool").as[Option[String]].collect()
    val outside = AsOf.joinBackward(anchors, obs, Seq("conv_id"),
      toleranceMs = Some(1000L)).select("tool").as[Option[String]].collect()
    assert(within.toSeq == Seq(Some("old")))
    assert(outside.toSeq == Seq(None))
  }

  test("rolling time window counts only trailing range") {
    val rows = Seq(
      ("u", ts(0), 1.0), ("u", ts(10000), 2.0), ("u", ts(70000), 4.0)
    ).toDF("conv_id", "ts", "v")
    val out = Windows
      .rollingByTime(rows, Seq("conv_id"), "ts", 60L,
        Seq((org.apache.spark.sql.functions.sum("v"), "s")))
      .select("s").as[Double].collect().sorted
    // at t=0: 1; t=10: 3; t=70: 6-1=... only rows within [t-60, t]: 2+4=6
    assert(out.toSeq == Seq(1.0, 3.0, 6.0))
  }

  test("rollingQuantileDisc: strictly-preceding frame, discrete rank, " +
    "null until history exists") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("A", 0, 10L), ("A", 1, 30L), ("A", 2, 20L),
      ("A", 3, 100L), ("A", 4, 5L))
      .toDF("conv_id", "turn_idx", "v")
      .withColumn("ts", timestamp_seconds(col("turn_idx") * 60))
    val got = Windows.rollingQuantileDisc(df, Windows.turnWindow,
        col("v"), k = 3, qBp = 5000, as = "med")
      .select("turn_idx", "med")
      .as[(Int, Option[Long])].collect().toMap
    // idx0: no history -> null; idx1: [10] -> 10; idx2: [10,30] ->
    // rank ceil(1.0)=1 -> 10; idx3: [10,20,30] -> rank 2 -> 20;
    // idx4: last 3 = [30,20,100] sorted [20,30,100] -> rank 2 -> 30
    assert(got == Map(0 -> None, 1 -> Some(10L), 2 -> Some(10L),
      3 -> Some(20L), 4 -> Some(30L)))
  }

  test("joinBackwardMulti: each feed equals its own joinBackward; all " +
    "feeds share ONE Window exec over one sort") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val anchors = Seq(("A", 0, 10L), ("A", 1, 25L), ("B", 0, 5L))
      .toDF("conv_id", "turn_idx", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val f1 = Seq(("A", 10L, "t1"), ("A", 20L, "t2"), ("B", 9L, "t3"))
      .toDF("conv_id", "sec", "name")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val f2 = Seq(("A", 5L, 100L), ("A", 25L, 200L))
      .toDF("conv_id", "sec", "len")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val multi = AsOf.joinBackwardMulti(anchors,
      Seq("tool" -> f1, "user" -> f2), Seq("conv_id"))
    val got = multi
      .select("conv_id", "turn_idx", "tool_name", "user_len")
      .as[(String, Int, Option[String], Option[Long])].collect().toSet
    // exact match at A/t10 -> t1; A/t25 -> t2 (20<=25) and len 200
    // (exact); B/t5: feed1 row is at t9 (future) -> null; feed2 empty
    assert(got == Set(
      ("A", 0, Some("t1"), Some(100L)),
      ("A", 1, Some("t2"), Some(200L)),
      ("B", 0, None, None)))
    // differential: each feed column equals the single-feed joinBackward
    val single1 = AsOf.joinBackward(anchors, f1, Seq("conv_id"))
      .select(col("conv_id"), col("turn_idx"), col("name").as("tool_name"))
    assert(multi.select("conv_id", "turn_idx", "tool_name")
      .except(single1).isEmpty)
    val single2 = AsOf.joinBackward(anchors, f2, Seq("conv_id"))
      .select(col("conv_id"), col("turn_idx"), col("len").as("user_len"))
    assert(multi.select("conv_id", "turn_idx", "user_len")
      .except(single2).isEmpty)
    // plan shape: ONE Window exec evaluates both LOCF carries, one sort
    val plan = multi.queryExecution.executedPlan.toString
    val windowLines = plan.split("\n").filter(_.contains("Window ["))
    assert(windowLines.length == 1,
      s"expected one Window exec, got:\n${windowLines.mkString("\n")}")
    // output-name collision (left already has tool_name) fails loud
    assertThrows[IllegalArgumentException] {
      AsOf.joinBackwardMulti(anchors.withColumn("tool_name", lit(1)),
        Seq("tool" -> f1), Seq("conv_id"))
    }
  }

  test("decayedAtAnchor: stepped half-life weights, future rows excluded, " +
    "exact integer accumulation") {
    import org.apache.spark.sql.functions._
    val t0 = 1700000000L
    val rows = Seq( // (grp, epoch offset from t0, value)
      ("a", 0L, 10L),   // age 25 → 2 half-lives → w = 2^20 >> 2
      ("a", 10L, 10L),  // age 15 → 1 → 2^19
      ("a", 20L, 10L),  // age 5  → 0 → 2^20
      ("a", 25L, 10L),  // age 0  → 0 → 2^20 (ts == anchor included)
      ("a", 30L, 999L), // FUTURE — excluded entirely
      ("b", 25L, 7L))
      .map { case (g, off, v) => (g, ts((t0 + off) * 1000L), v) }
      .toDF("grp", "t", "v")
    val anchor = lit(ts((t0 + 25L) * 1000L))
    val got = Windows.decayedAtAnchor(rows, Seq("grp"), "t", anchor,
        col("v"), halfLifeSec = 10L, as = "dec")
      .select(col("grp"), col("n_past"), col("dec").cast("long"))
      .as[(String, Long, Long)].collect()
      .map { case (g, n, d) => g -> ((n, d)) }.toMap
    val s = 1048576L
    assert(got("a") == ((4L, 10 * (s >> 2) + 10 * (s >> 1) + 10 * s + 10 * s)))
    assert(got("b") == ((1L, 7 * s)))
  }

  private def ts(ms: Long) = new Timestamp(ms)
}
