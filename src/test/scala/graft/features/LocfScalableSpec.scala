package graft.features

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.TranscriptGen

/** The two-phase mega-key LOCF must equal the single-window LOCF exactly,
  * including across chunk boundaries and for all-null prefixes.
  */
class LocfScalableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-phase LOCF equals single-window LOCF (incl. mega conversations)") {
    // seed with mega-conversations (every 97th conv hits maxLen)
    val df = TranscriptGen.generate(spark, nConvs = 120, maxLen = 512).toDF()
    val single = Windows
      .locf(df, Windows.turnWindow, "tool", as = "expected")
      .select("conv_id", "turn_idx", "expected")
    val scalable = LocfScalable(
      df, Seq("conv_id"), "ts", "turn_idx", "tool",
      chunkSeconds = 300L, as = "got")
      .select("conv_id", "turn_idx", "got")
    val joined = single.join(scalable, Seq("conv_id", "turn_idx"))
    val mismatches = joined
      .filter(!(joined("expected") <=> joined("got")))
      .count()
    assert(mismatches == 0, s"$mismatches rows differ from single-window LOCF")
    assert(joined.count() == df.count())
  }

  test("chunking actually splits mega keys across multiple groups") {
    import org.apache.spark.sql.functions._
    val df = TranscriptGen.generate(spark, nConvs = 98, maxLen = 512).toDF()
    val chunksPerConv = df
      .withColumn("__chunk", floor(col("ts").cast("long") / 300L))
      .groupBy("conv_id")
      .agg(countDistinct(col("__chunk")).as("n_chunks"))
      .agg(max(col("n_chunks")))
      .collect().head.getLong(0)
    assert(chunksPerConv > 1, "mega conversation should span several chunks")
  }
}
