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
}
