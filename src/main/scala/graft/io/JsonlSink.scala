package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSONL training-shard export — the dataloader-facing TEXT format next
  * to [[graft.ops.Curation.writeShards]]' parquet layout: most SFT /
  * pretraining loaders stream `{"id":…,"text":"…"}` lines, one file per
  * shard, shards enumerable by listing.
  *
  * The line bytes are built with [[graft.exprs.JsonQuote]] (serde_json
  * escaping — the same codegen'd expression the report-serving path
  * uses), so the exported text is byte-replayable by the oracle
  * (DuckDB `to_json` produces the identical escape set: `\"` `\\`
  * `\b` `\t` `\n` `\f` `\r` + `\uXXXX` below 0x20) — q_write_jsonl
  * round-trips the sink through a read and hash-matches it.
  *
  * Scale shape: packing inherits [[graft.ops.Curation.packShards]]' two-
  * phase cumsum (no mega-stratum task); the write is ONE repartition on
  * (stratum, shard) routing each shard's lines to exactly one task →
  * exactly one file per `<strata>=…/shard_seq=…/` directory.
  */
object JsonlSink {

  /** One JSON object per row: `{"id":<id>,"text":<quoted text>}`. */
  def jsonLine(idCol: String, textCol: String): org.apache.spark.sql.Column = {
    import graft.exprs.{functions => gf}
    concat(lit("{\"id\":"), col(idCol).cast("string"),
      lit(",\"text\":"), gf.json_quote(col(textCol)), lit("}"))
  }

  /** Pack `df` into token-budget shards per stratum and write them as
    * JSONL text files, one file per (stratum, shard) directory. Returns
    * nothing; [[readBack]] is the enumeration/verification path.
    */
  def writeJsonlShards(
      df: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      budgetTokens: Long,
      outDir: String
  ): Unit = {
    val packed = graft.ops.Curation.packShards(
      df, strataCol, idCol,
      graft.ops.TextStats.regexTokenCount(col(textCol)), budgetTokens)
    // explicit count: see Layout.compactExec — keeps the partitioned
    // write parallel instead of AQE-coalescing it to one task
    packed
      .repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        .toInt, col(strataCol), col("shard_seq"))
      .sortWithinPartitions(col(strataCol), col("shard_seq"), col(idCol))
      .select(jsonLine(idCol, textCol).as("value"),
        col(strataCol), col("shard_seq"))
      .write
      .partitionBy(strataCol, "shard_seq")
      .mode("overwrite")
      .text(outDir)
  }

  /** Read a [[writeJsonlShards]] layout back: (stratum, shard_seq, line)
    * — partition-value inference types `shard_seq` as INT, normalized
    * back to long here (same note as writeShards' readback).
    */
  def readBack(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      strataCol: String
  ): DataFrame =
    spark.read.text(dir)
      .withColumn("shard_seq", col("shard_seq").cast("long"))
      .select(col(strataCol), col("shard_seq"), col("value").as("line"))
}
