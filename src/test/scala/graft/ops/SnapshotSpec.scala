package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diffSnapshots labels added/removed/changed/unchanged; summary " +
    "counts match") {
    val v1 = Seq((1L, "same"), (2L, "edit me"), (3L, "drop me"))
      .toDF("id", "text")
    val v2 = Seq((1L, "same"), (2L, "edited"), (4L, "brand new"))
      .toDF("id", "text")
    val diff = Snapshot.diffSnapshots(v1, v2, "id", md5(col("text")))
    val got = diff.select("id", "status").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
    val summary = Snapshot.diffSummary(diff)
      .as[(String, Long)].collect().toMap
    assert(summary == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  private def row(k: Long, v: Long, op: String, p: String) = (k, v, op, p)

  test("cdcMergeLatest: latest wins, deletes drop the key, delete can be " +
    "out-ranked by a newer upsert") {
    val standing = Seq(row(1L, 1L, "u", "a1"), row(2L, 1L, "u", "b1"),
      row(3L, 1L, "u", "c1")).toDF("k", "v", "op", "p")
    val delta = Seq(
      row(1L, 2L, "u", "a2"), // plain upsert
      row(2L, 2L, "d", "x"),  // delete wins (newest)
      row(3L, 2L, "d", "x"), row(3L, 3L, "u", "c3") // delete then re-insert
    ).toDF("k", "v", "op", "p")
    val got = Snapshot.cdcMergeLatest(standing, delta, "k", Seq("v"))
      .select("k", "p").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a2"), (3L, "c3")))
  }

  test("cdcMergeLatest is associative: one-shot == delta-at-a-time") {
    val feed = (1L to 200L).map { i =>
      row(i % 17, i, if (i % 5 == 0) "d" else "u", s"p$i")
    }.toDF("k", "v", "op", "p")
    val empty = feed.limit(0)
    val oneShot = Snapshot.cdcMergeLatest(empty, feed, "k", Seq("v"))
    val batched = feed.filter(col("v") <= 100)
      .transform(a => Snapshot.cdcMergeLatest(empty, a, "k", Seq("v")))
      .transform(st => Snapshot.cdcMergeLatest(
        st, feed.filter(col("v") > 100), "k", Seq("v")))
    assert(oneShot.exceptAll(batched).isEmpty &&
      batched.exceptAll(oneShot).isEmpty)
    assert(oneShot.count() > 0)
  }

  test("cdcMergeLatest fails loud on a bad op value") {
    val feed = Seq(row(1L, 1L, "upsert", "a")).toDF("k", "v", "op", "p")
    val ex = intercept[Exception] {
      Snapshot.cdcMergeLatest(feed.limit(0), feed, "k", Seq("v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("bad op value")))
  }
}
