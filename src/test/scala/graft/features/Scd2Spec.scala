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
}
