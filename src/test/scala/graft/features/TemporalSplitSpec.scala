package graft.features

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class TemporalSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("byTime: exact boundary semantics (embargo band excluded from both sides)") {
    val cutoff = 1000L; val embargo = 100L
    val df = Seq(
      (1L, ts(899)), // train (strictly below cutoff - embargo)
      (2L, ts(900)), // embargo (inclusive lower bound)
      (3L, ts(999)), // embargo
      (4L, ts(1000)), // test (inclusive cutoff)
      (5L, ts(1500)) // test
    ).toDF("id", "ts")
    val got = TemporalSplit.byTime(df, "ts", cutoff, embargo)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> "test"))
    // every row satisfies the consistency invariant
    val bad = TemporalSplit.byTime(df, "ts", cutoff, embargo)
      .filter(!TemporalSplit.consistent("ts", cutoff, embargo)).count()
    assert(bad == 0L)
  }

  test("byTime: zero embargo collapses to a plain cutoff split") {
    val df = Seq((1L, ts(999)), (2L, ts(1000))).toDF("id", "ts")
    val got = TemporalSplit.byTime(df, "ts", 1000L, 0L)
      .select("split").as[String].collect().toSeq.sorted
    assert(got == Seq("test", "train"))
  }

  test("audit: min/max per split respect the boundaries") {
    val df = (0L until 2000L).map(s => (s, ts(s))).toDF("id", "ts")
    val a = TemporalSplit.audit(df, "ts", 1500L, 200L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(a("train") == ((1300L, 0L, 1299L)))
    assert(a("embargo") == ((200L, 1300L, 1499L)))
    assert(a("test") == ((500L, 1500L, 1999L)))
  }

  test("negativeSample: range, self-exclusion, determinism, independence of partitioning") {
    import graft.ops.Curation
    val df = (0L until 500L).toDF("doc_id")
    val a = Curation.negativeSample(df, "doc_id", 4).collect()
    a.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < 500, "neg in [0, N)")
      assert(r.getLong(2) != r.getLong(0), "no self negatives")
    }
    assert(a.length > 4 * 500 - 20 && a.length <= 4 * 500,
      s"k·N minus a few collisions, got ${a.length}")
    val b = Curation.negativeSample(df.repartition(7), "doc_id", 4)
      .collect().map(_.toString).sorted.toSeq
    assert(b == a.map(_.toString).sorted.toSeq, "draws are pure per-row functions")
    // distinct salts give distinct draw streams (not all k negatives equal)
    val perDoc = a.groupBy(_.getLong(0)).values
    assert(perDoc.exists(_.map(_.getLong(2)).distinct.size > 1))
  }
}
