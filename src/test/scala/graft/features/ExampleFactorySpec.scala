package graft.features

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class ExampleFactorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def turns = Seq(
    ("c1", 0, "user", "q1", null, ts(100)),
    ("c1", 1, "assistant", "a1", null, ts(160)),
    ("c1", 2, "user", "q2", null, ts(1000)),
    ("c1", 3, "tool", "t", "tool_0", ts(1010)),
    ("c1", 4, "assistant", "a2", null, ts(1100)),
    ("c2", 0, "user", null, null, ts(50)), // null text: not an example
    ("c2", 1, "user", "only q", null, ts(2000)) // never answered
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("examples: context strictly past, label strictly future, split by time") {
    val got = ExampleFactory.examples(turns, 3, cutoffEpochSec = 1500L,
        embargoSec = 500L)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), Option(r.get(3)).map(_.toString.toLong),
          r.getString(4)))).toMap
    assert(got.keySet == Set(("c1", 0), ("c1", 2), ("c2", 1)),
      "user turns with non-null text only")
    assert(got(("c1", 0)) == (("", Some(60L), "train")))
    assert(got(("c1", 2)) ==
      (("user: q1\nassistant: a1", Some(100L), "embargo")))
    assert(got(("c2", 1)) == (("user: ", None, "test")),
      "null-text context keeps the role tag; unanswered label is null")
  }

  private def countExchanges(
      p: org.apache.spark.sql.execution.SparkPlan): Int = {
    // under AQE each materialized shuffle is a ShuffleQueryStageExec
    // LEAF (the ShuffleExchangeExec hides inside it); count both forms
    // and recurse through the adaptive wrapper and stage boundaries
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    p match {
      case a: AdaptiveSparkPlanExec => countExchanges(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
        1 + countExchanges(s.plan.children.head)
      case q: QueryStageExec => countExchanges(q.plan)
      case e: ShuffleExchangeExec => 1 + e.children.map(countExchanges).sum
      case other => other.children.map(countExchanges).sum
    }
  }

  test("examples: the whole factory costs exactly ONE shuffle") {
    val df = ExampleFactory.examples(turns, 3, 1500L, 500L)
    df.collect() // materialize so AQE's final plan exists
    val n = countExchanges(df.queryExecution.executedPlan)
    assert(n == 1,
      s"context + label must share one conv_id exchange, got $n")
  }

  test("rollingMulti: horizons share one exchange; counts match per-horizon truth") {
    val df = Seq(
      ("c", 0, ts(0)), ("c", 1, ts(1800)), ("c", 2, ts(4000)),
      ("c", 3, ts(7300)), ("c", 4, ts(90000))
    ).toDF("conv_id", "turn_idx", "ts")
    val out = Windows.rollingMulti(df, Seq("conv_id"), "ts",
      Seq(3600L, 86400L), count(lit(1)), "n")
    val got = out.collect().map(r => r.getInt(1) ->
      ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(0) == ((1L, 1L)))
    assert(got(1) == ((2L, 2L)), "1800 within 3600 of 0")
    assert(got(2) == ((2L, 3L)), "4000: {1800, 4000} in 1h, all 3 in 24h")
    assert(got(3) == ((2L, 4L)), "7300: {4000, 7300} in 1h")
    assert(got(4) == ((1L, 3L)),
      "90000: alone in 1h; 24h frame [3600, 90000] holds {4000, 7300, 90000}")
    out.collect()
    assert(countExchanges(out.queryExecution.executedPlan) == 1,
      "all horizons share one exchange")
  }

  test("roleTransitions: adjacency counts in conversation order") {
    val got = ConvFeatures.roleTransitions(turns)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // c1: u->a, a->u, u->tool, tool->a; c2: u->u
    assert(got == Map(
      ("user", "assistant") -> 1L,
      ("assistant", "user") -> 1L,
      ("user", "tool") -> 1L,
      ("tool", "assistant") -> 1L,
      ("user", "user") -> 1L))
  }

  test("preferencePairs: best vs worst by score, turn_idx tiebreak, " +
      "equal-score and singleton conversations emit nothing") {
    val df = Seq(
      // c1: clear gap -> one pair
      ("c1", 0, "assistant", "short", null, ts(10)),
      ("c1", 1, "assistant", "the long answer", null, ts(20)),
      ("c1", 2, "user", "ignored role", null, ts(30)),
      // c2: two same-score answers -> tie, no signal, dropped
      ("c2", 0, "assistant", "aaaa", null, ts(10)),
      ("c2", 1, "assistant", "bbbb", null, ts(20)),
      // c3: singleton assistant -> dropped
      ("c3", 0, "assistant", "only", null, ts(10)),
      // c4: three answers; ties at max score break on LATER turn_idx
      ("c4", 0, "assistant", "xx", null, ts(10)),
      ("c4", 1, "assistant", "zzzz", null, ts(20)),
      ("c4", 2, "assistant", "yyyy", null, ts(30)),
      // null text never pairs
      ("c5", 0, "assistant", null, null, ts(10)),
      ("c5", 1, "assistant", "hi", null, ts(20))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = ExampleFactory.preferencePairs(df, length(col("text")))
      .as[(String, Int, String, Long, Int, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("c1", "c4"))
    assert(got("c1") == (("c1", 1, "the long answer", 15L, 0, "short", 5L)))
    // c4: max score 4 shared by turns 1 and 2 -> chosen = turn 2 (later);
    // min score 2 unique -> rejected = turn 0
    assert(got("c4") == (("c4", 2, "yyyy", 4L, 0, "xx", 2L)))
  }
}
