package graft.features

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("pointInInterval equals the plain range join, pairs appear exactly once") {
    // seeded random points and intervals, several crossing bin edges
    val rnd = new scala.util.Random(7)
    val points = (1 to 400).map(i => (i.toLong, ts(rnd.nextInt(10000).toLong)))
      .toDF("pid", "pts")
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(9000).toLong
      (i.toLong, ts(s), ts(s + rnd.nextInt(800).toLong))
    }.toDF("ivid", "s", "e")
    val plain = points.join(ivs,
        col("pts").cast("long") >= col("s").cast("long") &&
          col("pts").cast("long") <= col("e").cast("long"))
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val binned = RangeJoin.pointInInterval(points, "pts", ivs, "s", "e", 256L)
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length == binned.distinct.length, "each pair exactly once")
    assert(binned.sorted.toSeq == plain.sorted.toSeq)
  }

  test("boundary inclusivity at both ends and at a bin edge") {
    val points = Seq((1L, ts(255)), (2L, ts(256)), (3L, ts(300)),
      (4L, ts(511)), (5L, ts(512))).toDF("pid", "pts")
    val ivs = Seq((10L, ts(256), ts(511))).toDF("ivid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "pts", ivs, "s", "e", 256L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L), "inclusive [s, e], bin edges handled")
  }

  test("inverted interval and oversized span fail loud") {
    val p = Seq((1L, ts(10))).toDF("pid", "pts")
    val bad = Seq((1L, ts(100), ts(50))).toDF("ivid", "s", "e")
    val e1 = intercept[Exception] {
      RangeJoin.pointInInterval(p, "pts", bad, "s", "e", 10L).collect()
    }
    assert(e1.getMessage.contains("end before start") ||
      Option(e1.getCause).exists(_.getMessage.contains("end before start")))
    val huge = Seq((1L, ts(0), ts(1000000))).toDF("ivid", "s", "e")
    val e2 = intercept[Exception] {
      RangeJoin.pointInInterval(p, "pts", huge, "s", "e", 1L,
        maxBinsPerInterval = 100).collect()
    }
    assert(e2.getMessage.contains("spans more than") ||
      Option(e2.getCause).exists(_.getMessage.contains("spans more than")))
  }

  test("overlapping column names are rejected up front") {
    val p = Seq((1L, ts(10))).toDF("x", "pts")
    val iv = Seq((1L, ts(0), ts(20))).toDF("x", "s", "e")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "pts", iv, "s", "e", 10L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("intervalOverlap equals the plain theta join, pairs exactly once " +
      "(randomized, bin-edge-crossing)") {
    val rnd = new scala.util.Random(13)
    val as = (1 to 120).map { i =>
      val s = rnd.nextInt(9000).toLong
      (i.toLong, ts(s), ts(s + rnd.nextInt(700).toLong))
    }.toDF("aid", "as_", "ae")
    val bs = (1 to 80).map { i =>
      val s = rnd.nextInt(9000).toLong
      (i.toLong, ts(s), ts(s + rnd.nextInt(700).toLong))
    }.toDF("bid", "bs", "be")
    val plain = as.join(bs,
        col("as_").cast("long") <= col("be").cast("long") &&
          col("bs").cast("long") <= col("ae").cast("long"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val binned = RangeJoin.intervalOverlap(as, "as_", "ae", bs, "bs", "be",
        binWidthSec = 256L)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(binned == plain)
    // exactly once: no duplicate pairs even for multi-bin overlaps
    assert(binned.distinct == binned)
  }

  test("intervalOverlap: inclusive touch counts; disjoint misses; guards") {
    val a = Seq((1L, ts(0), ts(100))).toDF("aid", "as_", "ae")
    val touch = Seq((9L, ts(100), ts(200)), (10L, ts(101), ts(200)))
      .toDF("bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, "as_", "ae", touch, "bs", "be", 64L)
      .select("bid").as[Long].collect().toSeq
    assert(got == Seq(9L)) // shared endpoint overlaps; 101 does not
    val bad = Seq((1L, ts(50), ts(10))).toDF("bid", "bs", "be")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(a, "as_", "ae", bad, "bs", "be", 64L).collect()
    }
    assert(e.getMessage.contains("end before start") ||
      Option(e.getCause).exists(_.getMessage.contains("end before start")))
  }
}
