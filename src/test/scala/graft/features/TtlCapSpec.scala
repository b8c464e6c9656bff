package graft.features

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark

class TtlCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("locfTtl: carry expires past the TTL, revives on a fresh " +
    "observation, own-row observation is age zero") {
    val df = Seq(
      ("a", 1, ts(0), Option("x")), // obs at 0
      ("a", 2, ts(50), None), //       carry x (age 50)
      ("a", 3, ts(200), None), //      expired (age 200 > 100)
      ("a", 4, ts(210), Option("y")), // fresh obs, age 0
      ("a", 5, ts(300), None), //      carry y (age 90)
      ("b", 1, ts(0), None), //        nothing ever observed
      // a NULL-ts observation is ignored outright: it neither serves
      // nor shadows c's dated obs at t=0 (nulls sort first here)
      ("c", 0, null.asInstanceOf[Timestamp], Option("ghost")),
      ("c", 1, ts(0), Option("real")),
      ("c", 2, ts(50), None)
    ).toDF("k", "idx", "ts", "v")
    val w = Window.partitionBy("k").orderBy("ts", "idx")
    val got = Windows.locfTtl(df, w, "v", "ts", ttlSeconds = 100L)
      .select(col("k"), col("idx"), col("v_ttl"))
      .as[(String, Int, Option[String])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("a", 1) -> Some("x"), ("a", 2) -> Some("x"), ("a", 3) -> None,
      ("a", 4) -> Some("y"), ("a", 5) -> Some("y"), ("b", 1) -> None,
      ("c", 0) -> None, ("c", 1) -> Some("real"), ("c", 2) -> Some("real")))
  }

  test("capped sessionize: gap boundaries first, then fixed-width " +
    "slices from each session's start") {
    val df = Seq(
      // session 0: events at 0..250 -> slices of 100s: 0,0,1,2
      ("a", 1, ts(0)), ("a", 2, ts(60)), ("a", 3, ts(150)),
      ("a", 4, ts(250)),
      // gap > 1000 -> session 1 restarts slice numbering at its start
      ("a", 5, ts(2000)), ("a", 6, ts(2120))
    ).toDF("k", "idx", "ts")
    val got = Sessionize.capped(df, Seq("k"), "ts",
        gapSeconds = 1000L, maxSeconds = 100L, tieBreak = Seq("idx"))
      .select(col("idx"), col("session_seq"), col("slice_seq"),
        col("capped_session_id"))
      .as[(Int, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1 -> ((0L, 0L, "a#0#0")), 2 -> ((0L, 0L, "a#0#0")),
      3 -> ((0L, 1L, "a#0#1")), 4 -> ((0L, 2L, "a#0#2")),
      5 -> ((1L, 0L, "a#1#0")), 6 -> ((1L, 1L, "a#1#1"))))
  }
}
