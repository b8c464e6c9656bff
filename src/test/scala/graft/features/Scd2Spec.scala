package graft.features

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.TranscriptGen

/** SCD-2 validity intervals: the two-phase lead must equal the single
  * per-key window lead exactly — including across chunk boundaries and
  * for mega-conversations — and the CDC merge must be associative.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def feed = TranscriptGen.generate(spark, nConvs = 120, maxLen = 512)
    .toDF()
    .filter(col("tool").isNotNull)
    .select(col("conv_id"), col("turn_idx"), col("ts"), col("tool"))

  test("two-phase valid_to equals single-window lead (incl. mega keys)") {
    val df = feed
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("turn_idx"))
    val expected = df
      .withColumn("expected", lead(col("ts"), 1).over(w))
      .select("conv_id", "turn_idx", "expected")
    // tiny chunk span so mega conversations straddle many chunks
    val got = Scd2.validIntervals(df, "conv_id", "ts", "turn_idx",
        chunkSpanSec = 120L)
      .select(col("conv_id"), col("turn_idx"), col("valid_to").as("got"))
    val joined = expected.join(got, Seq("conv_id", "turn_idx"))
    val bad = joined.filter(!(col("expected") <=> col("got"))).count()
    assert(bad == 0, s"$bad rows differ from the single-window lead")
    assert(joined.count() == df.count())
  }

  test("exactly one current (open) interval per key") {
    val out = Scd2.validIntervals(feed, "conv_id", "ts", "turn_idx",
      chunkSpanSec = 120L)
    val perKey = out.groupBy("conv_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"))
    assert(perKey.filter(col("n_open") =!= 1L).isEmpty)
  }

  test("null change timestamp fails loud") {
    val df = Seq(("c1", 0, "t")).toDF("conv_id", "turn_idx", "tool")
      .withColumn("ts", lit(null).cast("timestamp"))
    val ex = intercept[Exception] {
      Scd2.validIntervals(df, "conv_id", "ts", "turn_idx").collect()
    }
    assert(ex.getMessage.contains("null ts") ||
      ex.getCause != null && ex.getCause.getMessage.contains("null ts"))
  }

  test("point-in-time interval read equals backward as-of on the change " +
      "feed (randomized, with equal-ts changes and pre-feed anchors)") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(53)
    def ts(s: Long) = new Timestamp(s * 1000L)
    val changes = (1 to 300).map { i =>
      (s"c${i % 7}", i, ts(rnd.nextInt(50).toLong * 10L), s"tool${i % 5}")
    }
    val anchors = (1 to 200).map { i =>
      (s"c${i % 9}", 1000 + i, ts(rnd.nextInt(60).toLong * 5L))
    }
    val cdf = changes.toDF("conv_id", "turn_idx", "ts", "tool")
    val adf = anchors.toDF("conv_id", "turn_idx", "ts")
    val intervals = Scd2.validIntervals(cdf, "conv_id", "ts", "turn_idx",
        chunkSpanSec = 60L)
      .select(col("conv_id").as("dim_conv"), col("tool"),
        col("ts").as("valid_from"), col("valid_to"))
    val read = adf.join(intervals,
        col("conv_id") === col("dim_conv") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")), "left")
      .select(col("conv_id"), col("turn_idx"), col("tool"))
      .as[(String, Int, Option[String])].collect().toSet
    // reference: backward as-of against the per-(conv, ts) last change
    val obs = cdf.groupBy(col("conv_id"), col("ts"))
      .agg(max_by(col("tool"), col("turn_idx")).as("tool"))
    val asof = AsOf.joinBackward(adf, obs, Seq("conv_id"))
      .select(col("conv_id"), col("turn_idx"), col("tool"))
      .as[(String, Int, Option[String])].collect().toSet
    assert(read == asof)
    // exactly one row per anchor (intervals partition the timeline)
    assert(read.size == anchors.size)
  }
}
