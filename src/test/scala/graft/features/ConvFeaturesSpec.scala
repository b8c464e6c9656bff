package graft.features

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConvFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // (conv_id, turn_idx, role, text, tool, ts)
  private def turns = Seq(
    ("c1", 0, "user", "hi there", null, ts(100)),
    ("c1", 1, "assistant", "hello", "tool_0", ts(130)),
    ("c1", 2, "user", null, null, ts(200)),
    ("c1", 3, "assistant", "again", "tool_0", ts(500)),
    ("c2", 0, "user", "lonely", null, ts(50))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("summarize: counts, span, chars, max gap") {
    val got = ConvFeatures.summarize(turns)
      .collect().map(r => r.getString(0) -> r).toMap
    val c1 = got("c1")
    assert(c1.getLong(1) == 4) // n_turns
    assert(c1.getLong(2) == 2) // n_user
    assert(c1.getLong(3) == 2) // n_assistant
    assert(c1.getLong(4) == 2) // n_tool_calls
    assert(c1.getLong(5) == 1) // n_distinct_tools
    assert(c1.getLong(8) == 400) // duration_sec
    assert(c1.getLong(9) == ("hi there".length + "hello".length +
      "again".length).toLong) // total_chars, null text = 0
    assert(c1.getLong(10) == 300) // max gap 200 -> 500
    val c2 = got("c2")
    assert(c2.getLong(1) == 1)
    assert(c2.getLong(8) == 0)
    assert(c2.isNullAt(10)) // single turn: no gap
  }

  test("reply latency: next assistant strictly after the user turn; null when never answered") {
    val got = ConvFeatures.replyLatency(turns)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got.keySet == Set(("c1", 0), ("c1", 2), ("c2", 0)))
    assert(got(("c1", 0)) == Some(30)) // 100 -> 130
    assert(got(("c1", 2)) == Some(300)) // 200 -> 500
    assert(got(("c2", 0)) == None) // never answered
  }

  test("reply latency: an assistant turn at the SAME ts but later turn_idx counts") {
    val t = Seq(
      ("c", 0, "user", ts(100)),
      ("c", 1, "assistant", ts(100))
    ).toDF("conv_id", "turn_idx", "role", "ts")
    val got = ConvFeatures.replyLatency(t).collect()
    assert(got.length == 1 && got(0).getLong(2) == 0)
  }

  test("turnContext: strictly-preceding frame, lookback bound, null text, empty first") {
    val got = ConvFeatures.turnContext(turns, 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(3), r.getLong(4)))).toMap
    assert(got(("c1", 0)) == (("", 0L)), "first turn: empty context, not null")
    assert(got(("c1", 1)) == (("user: hi there", 1L)))
    assert(got(("c1", 2)) == (("user: hi there\nassistant: hello", 2L)))
    // lookback 2 drops turn 0; null text keeps its role tag with empty body
    assert(got(("c1", 3)) == (("assistant: hello\nuser: ", 2L)))
    assert(got(("c2", 0)) == (("", 0L)))
  }

  test("dedupConversations: re-ingested conv collapses; roles, boundaries and nulls distinguish") {
    val t = Seq(
      ("c1", 0, "user", "ab", ts(10)), ("c1", 1, "assistant", "c", ts(20)),
      // same CONTENT + roles, new id/ts: must collapse onto c1
      ("c9", 0, "user", "ab", ts(99)), ("c9", 1, "assistant", "c", ts(100)),
      // same concatenated text, different turn split: distinct
      ("c2", 0, "user", "a", ts(10)), ("c2", 1, "assistant", "bc", ts(20)),
      // same texts as c1 but roles flipped: distinct
      ("c5", 0, "assistant", "ab", ts(10)), ("c5", 1, "user", "c", ts(20)),
      ("c3", 0, "user", null, ts(10)), ("c3", 1, "user", "x", ts(20)),
      ("c4", 0, "user", "", ts(10)), ("c4", 1, "user", "x", ts(20))
    ).toDF("conv_id", "turn_idx", "role", "text", "ts")
    val got = ConvFeatures.dedupConversations(t)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getBoolean(3)))).toMap
    assert(got("c1")._1 == got("c9")._1, "content-identical convs share a digest")
    assert(got("c1")._2 && !got("c9")._2, "min conv_id is the keeper")
    assert(got("c1")._1 != got("c2")._1, "[ab, c] must not collide with [a, bc]")
    assert(got("c1")._1 != got("c5")._1, "role flip is a different conversation")
    assert(got("c3")._1 != got("c4")._1, "null text is not empty text")
    assert(Seq("c2", "c3", "c4", "c5").forall(got(_)._2), "unique convs all kept")
  }

  test("renderConversation: stable order, tool tags, null text, byte-exact") {
    // out-of-order input rows must not change the render
    val shuffled = turns.orderBy($"text".desc_nulls_first)
    val got = ConvFeatures.renderConversation(shuffled)
      .select($"conv_id", $"n_turns", $"sft_text", $"n_chars")
      .as[(String, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val c1 = "user: hi there\nassistant[tool_0]: hello\n" +
      "user: \nassistant[tool_0]: again"
    assert(got("c1") == ((4L, c1, c1.length.toLong)))
    assert(got("c2") == ((1L, "user: lonely", 12L)))
  }

  test("render/spans agree at sub-second timestamps (exact-micros sort key)") {
    // sub-second order OPPOSES turn_idx order: a whole-second sort key
    // would fall through to turn_idx and render the turns backwards
    // relative to the span window's exact-ts order
    val t = Seq(
      ("c", 7, "user", "first", None: Option[String],
        new Timestamp(100100L)), // 100.1 s
      ("c", 2, "assistant", "second", None: Option[String],
        new Timestamp(100900L)) // 100.9 s
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val r = ConvFeatures.renderConversation(t)
      .select($"sft_text").as[String].head()
    assert(r == "user: first\nassistant: second")
    val spans = ConvFeatures.sftSpans(t)
      .select($"turn_idx", $"start_off", $"end_off")
      .as[(Int, Long, Long)].collect()
    spans.foreach { case (i, s, e) =>
      val want = if (i == 7) "user: first" else "assistant: second"
      assert(r.substring(s.toInt, e.toInt) == want, s"turn $i")
    }
  }

  test("sftSpans: substring extraction from the render is the invariant") {
    val rendered = ConvFeatures.renderConversation(turns)
      .select($"conv_id", $"sft_text").as[(String, String)].collect().toMap
    val spans = ConvFeatures.sftSpans(turns)
      .select($"conv_id", $"turn_idx", $"start_off", $"end_off", $"loss_mask")
      .as[(String, Int, Long, Long, Boolean)].collect()
    assert(spans.length == 5)
    val rows = turns.collect().map(r =>
      (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), Option(r.getString(3)), Option(r.getString(4))))
    ).toMap
    spans.foreach { case (c, i, s, e, mask) =>
      val (role, text, tool) = rows((c, i))
      val tag = tool.map(t => s"[$t]").getOrElse("")
      val want = s"$role$tag: ${text.getOrElse("")}"
      assert(rendered(c).substring(s.toInt, e.toInt) == want, s"$c/$i")
      assert(mask == (role == "assistant"), s"$c/$i mask")
    }
  }

  test("turnContext: never sees the current or future turns (zero leakage)") {
    val ctx = ConvFeatures.turnContext(turns, 10).collect()
    ctx.foreach { r =>
      val own = turns.collect().find(t =>
        t.getString(0) == r.getString(0) && t.getInt(1) == r.getInt(1)).get
      Option(own.getString(3)).filter(_.nonEmpty).foreach { text =>
        assert(!r.getString(3).contains(text),
          s"context of ${r.getString(0)}/${r.getInt(1)} leaked its own text")
      }
    }
  }

  test("groundingScore: strictly-earlier tool words only; dedup; empty turn emits (0,0)") {
    // g1/1 assistant "alpha beta alpha": alpha grounded by tool@0,
    //   beta is only in a LATER tool turn (idx 2) -> not grounded.
    // g1/3 assistant "beta gamma": beta now grounded (tool@2 < 3),
    //   gamma appears nowhere on the tool side.
    // g1/5 assistant "" -> zero words, must still emit a (0, 0) row.
    // g2 has a tool turn with the same words but MUST not ground g1
    //   (per-conversation scoping).
    val t = Seq(
      ("g1", 0, "tool", "alpha alpha", "t", ts(1)),
      ("g1", 1, "assistant", "alpha beta alpha", null, ts(2)),
      ("g1", 2, "tool", "beta", "t", ts(3)),
      ("g1", 3, "assistant", "beta gamma", null, ts(4)),
      ("g1", 5, "assistant", "", null, ts(5)),
      ("g2", 0, "tool", "gamma", "t", ts(1)),
      ("g2", 1, "assistant", "gamma", null, ts(2))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.groundingScore(t)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 4) // one row per assistant turn, empty one included
    assert(got(("g1", 1)) == ((1L, 2L))) // alpha yes, beta not-yet; deduped
    assert(got(("g1", 3)) == ((1L, 2L))) // beta yes (idx 2 < 3), gamma no
    assert(got(("g1", 5)) == ((0L, 0L)))
    assert(got(("g2", 1)) == ((1L, 1L)))
  }

  test("toolTrigrams: adjacency among tool calls; prose turns don't break a pattern") {
    // s1 calls a,b,a,b across turn idxs 0,2,4,6 (prose between) -> trigrams
    // (a,b,a) and (b,a,b). s2 calls a,b,a -> (a,b,a) again. At minSupport 2
    // only (a,b,a) survives with n=2.
    val t = Seq(
      ("s1", 0, "assistant", "x", "a", ts(1)),
      ("s1", 1, "user", "prose", null, ts(2)),
      ("s1", 2, "assistant", "x", "b", ts(3)),
      ("s1", 4, "assistant", "x", "a", ts(4)),
      ("s1", 5, "user", "prose", null, ts(5)),
      ("s1", 6, "assistant", "x", "b", ts(6)),
      ("s2", 0, "assistant", "x", "a", ts(1)),
      ("s2", 1, "assistant", "x", "b", ts(2)),
      ("s2", 2, "assistant", "x", "a", ts(3))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val all = ConvFeatures.toolTrigrams(t)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(all == Map(("a", "b", "a") -> 2L, ("b", "a", "b") -> 1L))
    val supported = ConvFeatures.toolTrigrams(t, minSupport = 2L).collect()
    assert(supported.length == 1)
    val r = supported.head
    assert((r.getString(0), r.getString(1), r.getString(2), r.getLong(3)) ==
      (("a", "b", "a", 2L)))
  }

  test("echoScore: nearest preceding user turn only; no-anchor turn emits (0, n)") {
    // e1/1 echoes from user@0 ("alpha beta"): alpha yes, zeta no -> (1, 2).
    // e1/3's nearest user is @2 ("gamma"): the OLDER user@0's alpha must
    //   not count -> only gamma echoes -> (1, 2).
    // e1/5 assistant with NO preceding user in-range? user@2 still
    //   precedes it; "delta" matches nothing -> (0, 1).
    // e2/0 assistant BEFORE any user turn -> (0, 1), not dropped.
    val t = Seq(
      ("e1", 0, "user", "alpha beta", null, ts(1)),
      ("e1", 1, "assistant", "alpha zeta", null, ts(2)),
      ("e1", 2, "user", "gamma", null, ts(3)),
      ("e1", 3, "assistant", "gamma alpha", null, ts(4)),
      ("e1", 5, "assistant", "delta", null, ts(5)),
      ("e2", 0, "assistant", "solo", null, ts(1)),
      ("e2", 1, "user", "late", null, ts(2))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.echoScore(t)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 4)
    assert(got(("e1", 1)) == ((1L, 2L)))
    assert(got(("e1", 3)) == ((1L, 2L))) // alpha from user@0 must NOT echo
    assert(got(("e1", 5)) == ((0L, 1L)))
    assert(got(("e2", 0)) == ((0L, 1L))) // no preceding user at all
  }

  test("selfRepeat: repeats point at the first identical turn, per conversation") {
    val t = Seq(
      ("r1", 0, "assistant", "loop", null, ts(1)),
      ("r1", 1, "user", "go on", null, ts(2)),
      ("r1", 2, "assistant", "loop", null, ts(3)),
      ("r1", 3, "assistant", "fresh", null, ts(4)),
      ("r1", 4, "assistant", "loop", null, ts(5)),
      ("r2", 0, "assistant", "loop", null, ts(1)) // other conv: not a repeat
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.selfRepeat(t)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getInt(2), r.getBoolean(3))))
      .toMap
    assert(got.size == 5) // user turn excluded
    assert(got(("r1", 0)) == ((0, false)))
    assert(got(("r1", 2)) == ((0, true)))
    assert(got(("r1", 3)) == ((3, false)))
    assert(got(("r1", 4)) == ((0, true)))
    assert(got(("r2", 0)) == ((0, false)))
  }

  test("lexicalDiversity: exact distinct/total; conv with no role words emits (0,0)") {
    val t = Seq(
      ("l1", 0, "assistant", "a b a", null, ts(1)),
      ("l1", 1, "assistant", "b c", null, ts(2)),
      ("l1", 2, "user", "ignored words", null, ts(3)),
      ("l2", 0, "user", "only user", null, ts(1)),
      ("l3", 0, "assistant", null, null, ts(1))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.lexicalDiversity(t)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      "l1" -> ((3L, 5L)), // {a,b,c} of a b a b c
      "l2" -> ((0L, 0L)),
      "l3" -> ((0L, 0L))))
  }

  test("orderAudit: dup idx, idx gap, ts inversion, null ts, all-null-ts conv") {
    // o1: idx 0,1,1,4 -> 1 dup, 1 gap (1->4); ts at idx 4 goes BACK ->
    //     1 inversion; one extra null-ts row counts but can't invert.
    // o2: clean 0,1.
    // o3: ONLY null-ts rows -> still audited, first_idx null.
    val t = Seq(
      ("o1", 0, "user", "x", null, Some(ts(10))),
      ("o1", 1, "assistant", "x", null, Some(ts(20))),
      ("o1", 1, "assistant", "x", null, Some(ts(21))), // dup idx
      ("o1", 4, "assistant", "x", null, Some(ts(15))), // gap + inversion
      ("o1", 5, "tool", "x", null, None), // null ts
      ("o2", 0, "user", "x", null, Some(ts(1))),
      ("o2", 1, "assistant", "x", null, Some(ts(2))),
      ("o3", 3, "user", "x", null, None),
      ("o3", 4, "assistant", "x", null, None)
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.orderAudit(t)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got("o1") == ((5L, 1L, Some(0), 1L, 1L, 1L)))
    assert(got("o2") == ((2L, 0L, Some(0), 0L, 0L, 0L)))
    assert(got("o3") == ((2L, 0L, None, 0L, 0L, 2L)))
  }

  test("qualityGate: every drop reason fires, first-error-only, keeper keeps") {
    val t = Seq(
      // k: keeper — grounded 1/2, echo 0/2, no repeats, TTR 2/2
      ("k", 0, "tool", "alpha beta gamma", "t", Some(ts(1))),
      ("k", 1, "user", "question here", null, Some(ts(2))),
      ("k", 2, "assistant", "alpha delta", null, Some(ts(3))),
      // o: dup turn_idx AND ungrounded -> 'order' wins (first error only)
      ("o", 0, "user", "x", null, Some(ts(1))),
      ("o", 1, "assistant", "y", null, Some(ts(2))),
      ("o", 1, "assistant", "z", null, Some(ts(3))),
      // e: assistant contributes zero words -> 'empty'
      ("e", 0, "user", "hi", null, Some(ts(1))),
      ("e", 1, "assistant", null, null, Some(ts(2))),
      // u: words but no tool turn anywhere -> grounded 0 -> 'ungrounded'
      ("u", 0, "user", "q zz", null, Some(ts(1))),
      ("u", 1, "assistant", "fresh words here", null, Some(ts(2))),
      // c: grounded 1/2 but echoes 2/2 of the preceding user -> 'echo'
      ("c", 0, "tool", "alpha", "t", Some(ts(1))),
      ("c", 1, "user", "alpha beta", null, Some(ts(2))),
      ("c", 2, "assistant", "alpha beta", null, Some(ts(3))),
      // p: 3 of 4 assistant turns byte-identical -> 'loop'
      ("p", 0, "tool", "alpha", "t", Some(ts(1))),
      ("p", 1, "assistant", "alpha", null, Some(ts(2))),
      ("p", 2, "assistant", "alpha", null, Some(ts(3))),
      ("p", 3, "assistant", "alpha", null, Some(ts(4))),
      ("p", 4, "assistant", "alpha", null, Some(ts(5))),
      // t: all checks pass except TTR 4/24 < 20% -> 'low_ttr'
      ("t", 0, "tool", "a b c d e f", "t", Some(ts(1))),
      ("t", 1, "assistant", "a a a a a b", null, Some(ts(2))),
      ("t", 2, "assistant", "b b b b b c", null, Some(ts(3))),
      ("t", 3, "assistant", "c c c c c d", null, Some(ts(4))),
      ("t", 4, "assistant", "d d d d d a", null, Some(ts(5)))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.qualityGate(t)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(14), Option(r.getString(15)))))
      .toMap
    assert(got == Map(
      "k" -> ((true, None)),
      "o" -> ((false, Some("order"))),
      "e" -> ((false, Some("empty"))),
      "u" -> ((false, Some("ungrounded"))),
      "c" -> ((false, Some("echo"))),
      "p" -> ((false, Some("loop"))),
      "t" -> ((false, Some("low_ttr")))))
    // loosening every threshold to the permissive extreme keeps all
    // gate-able convs (order/empty are structural, not thresholds)
    val loose = ConvFeatures.qualityGate(t, minGroundedBp = 0,
        maxEchoBp = 10000, maxRepeatBp = 10000, minTtrBp = 0)
      .collect().map(r => r.getString(0) -> Option(r.getString(15))).toMap
    assert(loose("u") == None && loose("c") == None &&
      loose("p") == None && loose("t") == None)
    assert(loose("o") == Some("order") && loose("e") == Some("empty"))
  }

  test("topicSegments: first turn opens, low-Jaccard turn breaks, " +
      "high-overlap continues, empty-vs-empty is NOT a boundary") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val t = Seq(
      ("c1", 0, "user", "alpha beta gamma", ts(0)),
      ("c1", 1, "assistant", "beta gamma delta", ts(10)),   // J=2/4 >= 0.2
      ("c1", 2, "user", "totally different words", ts(20)), // J=0 -> boundary
      ("c1", 3, "assistant", null, ts(30)),                 // empty vs words: J=0/3 -> boundary
      ("c1", 4, "user", "   ", ts(40))                      // empty vs empty: NOT a boundary
    ).toDF("conv_id", "turn_idx", "role", "text", "ts")
    val got = ConvFeatures.topicSegments(t, tauBp = 2000L)
      .select($"turn_idx", $"is_boundary", $"segment_id")
      .as[(Int, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0, true, 1L), (1, false, 1L), (2, true, 2L), (3, true, 3L),
      (4, false, 3L)))
  }

  test("mergeTurns: maximal same-role runs collapse in order, null text " +
    "renders empty, dense re-index, singles pass through") {
    val t = Seq(
      ("c1", 0, "user", "a", null, ts(100)),
      ("c1", 1, "user", "b", null, ts(110)),
      ("c1", 2, "user", null, null, ts(120)), // null body in mid-run
      ("c1", 3, "assistant", "x", null, ts(130)),
      ("c1", 4, "user", "c", null, ts(140)), // same role, NEW run
      ("c2", 0, "system", "s", null, ts(50))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.mergeTurns(t)
      .select("conv_id", "merged_idx", "role", "text", "first_turn_idx",
        "n_merged")
      .as[(String, Int, String, String, Int, Long)].collect().toSet
    assert(got == Set(
      ("c1", 0, "user", "a\nb\n", 0, 3L),
      ("c1", 1, "assistant", "x", 3, 1L),
      ("c1", 2, "user", "c", 4, 1L),
      ("c2", 0, "system", "s", 0, 1L)), got.mkString(","))
  }

  test("contextBudgetTrim: longest fitting suffix kept, system always " +
    "survives, oversized turn drops even when most recent") {
    val t = Seq(
      ("c1", 0, "system", "obey these rules", null, ts(10)), // 3 words, free
      ("c1", 1, "user", "one two three four", null, ts(20)), // 4 toks
      ("c1", 2, "assistant", "five six", null, ts(30)), // 2 toks
      ("c1", 3, "user", "seven", null, ts(40)), // 1 tok
      ("c2", 0, "user", "way too many words to ever fit", null, ts(10))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ConvFeatures.contextBudgetTrim(t, budgetTokens = 3L)
      .select("conv_id", "turn_idx", "tail_tokens")
      .as[(String, Int, Long)].collect().toSet
    // c1 suffix sums (non-system): idx1=7 idx2=3 idx3=1 -> keep 2,3 + system
    // c2's single 7-token turn exceeds the budget even alone
    assert(got == Set(("c1", 0, 7L), ("c1", 2, 3L), ("c1", 3, 1L)),
      got.mkString(","))
  }
}
