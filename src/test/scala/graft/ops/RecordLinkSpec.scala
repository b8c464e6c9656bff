package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class RecordLinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rules = Seq(
    RecordLink.FieldRule("name", col("a_name") === col("b_name"), 2200L, -800L),
    RecordLink.FieldRule("phone", col("a_phone") === col("b_phone"), 1800L, -700L))

  test("linkBlocked: scores candidates inside blocks only, classifies " +
    "by threshold, emits per-field agreement flags") {
    val a = Seq(
      (1L, "ann", "555-1234", "b1"),
      (2L, "bob", "555-9999", "b1"),
      (3L, "cyd", "777-0000", "b2")).toDF("a_id", "a_name", "a_phone", "blk")
    val b = Seq(
      (11L, "ann", "555-1234", "b1"), // full agree with 1 → 4000
      (12L, "bob", "555-0000", "b1"), // name only with 2 → 1500
      (13L, "cyd", "777-0000", "b9")  // would match 3 but block differs
    ).toDF("b_id", "b_name", "b_phone", "blk")
    val got = RecordLink.linkBlocked(a, b, Seq("blk"), rules, thresholdBp = 1400L)
      .select("a_id", "b_id", "agree_name", "agree_phone", "score_bp")
      .as[(Long, Long, Boolean, Boolean, Long)].collect().toSet
    assert(got == Set(
      (1L, 11L, true, true, 4000L),
      (2L, 12L, true, false, 1500L)))
    // raising the threshold keeps only the full agreement
    val strict = RecordLink.linkBlocked(a, b, Seq("blk"), rules, 2500L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(strict == Set((1L, 11L)))
    // cross-name candidates in a shared block score below zero
    val all = RecordLink.linkBlocked(a, b, Seq("blk"), rules, Long.MinValue)
    assert(all.count() == 4) // 2 a-rows × 2 b-rows in block b1
    assert(all.filter(col("a_id") === 1 && col("b_id") === 12)
      .select("score_bp").as[Long].head() == -1500L)
  }

  test("linkBlocked refuses an empty blocking key or empty rules") {
    val d = Seq((1L, "x")).toDF("a_id", "blk")
    assertThrows[IllegalArgumentException] {
      RecordLink.linkBlocked(d, d, Seq.empty, rules, 0L)
    }
    assertThrows[IllegalArgumentException] {
      RecordLink.linkBlocked(d, d, Seq("blk"), Seq.empty, 0L)
    }
  }
}
