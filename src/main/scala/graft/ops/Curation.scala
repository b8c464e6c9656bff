package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix curation operators: deterministic stratified sampling
  * (mixture weighting) and token-budget shard packing — the two
  * operations that turn a cleaned corpus into an actual training dataset.
  *
  * Both are exact-integer and order-deterministic, so they sit under the
  * DuckDB oracle like every other operator (q_sample_mix, q_pack_shards).
  */
object Curation {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column) =
    org.apache.spark.sql.GraftBridge.expression(c)

  /** Deterministic per-row sampling gate in [0, 10000) from an int64 id —
    * codegen'd fmix64, no RNG state. Row is in the r-bp sample iff
    * `gate < r`; samples nest across rates.
    */
  def sampleGateBp(id: Column): Column =
    bridge(graft.exprs.SampleHash(expr(id)))

  /** Stratified (mixture-weighted) sampling: keep each row with its
    * stratum's rate, deterministically by id hash. `ratesBp` maps stratum
    * value → keep-rate in basis points (10000 = keep all); strata absent
    * from the map fall back to `defaultBp`.
    *
    * Scale shape: one codegen'd projection + filter, no shuffle, no RNG
    * seeds to coordinate across executors, and fully pushdown-friendly
    * (the gate is a scan-fused predicate). Changing the mixture re-uses
    * the same hash, so raising a stratum's rate only ADDS documents —
    * incremental re-curation touches only the delta.
    */
  def sampleStratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      ratesBp: Map[String, Int],
      defaultBp: Int = 0
  ): DataFrame = {
    require((ratesBp.values ++ Seq(defaultBp)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in 0..10000")
    val rate = ratesBp.foldLeft(lit(defaultBp.toLong)) {
      case (acc, (stratum, bp)) =>
        when(col(strataCol) === stratum, lit(bp.toLong)).otherwise(acc)
    }
    df.filter(sampleGateBp(col(idCol)) < rate)
  }

  /** Token-budget shard packing: assign each document (ordered by
    * `orderCol` within its `strataCol` group) to training shard
    * `floor(exclusive_cumsum(tokens) / budget)`. A document whose tokens
    * straddle a boundary belongs to the shard where it STARTS, so a shard
    * may overrun the budget by at most one document (and a document
    * larger than the whole budget still lands in exactly one shard) —
    * the standard streaming-packer contract, stated rather than hidden.
    *
    * Scale shape: packing is inherently sequential IN ORDER, so the
    * window partitions by the stratum (mixture component / source / day
    * bucket) — shards parallelize across strata, which is how production
    * packers shard 100 TB without a global sort. For a single mega
    * stratum, pre-split it (e.g. by date) or run the two-phase running-sum
    * used by [[graft.features.LocfScalable]].
    */
  def packShards(
      df: DataFrame,
      strataCol: String,
      orderCol: String,
      tokens: Column,
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(!df.columns.contains("n_tokens") &&
      !df.columns.contains("shard_seq"),
      "packShards reserves the column names n_tokens and shard_seq")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumExcl = coalesce(sum(tokens).over(w), lit(0L))
    // integral `div`, not float `/`: a stratum's cumulative token sum at
    // 100 TB can pass 2^53, where a double quotient misplaces boundary
    // documents — keep the module's exact-integer contract
    df.withColumn("n_tokens", tokens)
      .withColumn("shard_seq",
        call_function("div", cumExcl, lit(budgetTokens)).cast("long"))
  }

  /** Materialize packed training shards: [[packShards]] then write ONE
    * parquet file per (stratum, shard) directory —
    * `out/<strataCol>=…/shard_seq=…/part-….parquet` — which is the layout
    * a training dataloader consumes (one sequential file per shard, shards
    * enumerable by listing). The repartition on (stratum, shard) routes
    * each shard's rows to exactly one task, so each directory holds
    * exactly one file; rows inside it are sorted by `orderCol`.
    *
    * Readback note: parquet partition-value inference types `shard_seq`
    * as INT — cast it back to long (the q_write_shards roundtrip oracle
    * does exactly this), and remember partition columns return at the END
    * of the readback schema.
    */
  def writeShards(
      df: DataFrame,
      strataCol: String,
      orderCol: String,
      tokens: Column,
      budgetTokens: Long,
      outDir: String
  ): Unit =
    packShards(df, strataCol, orderCol, tokens, budgetTokens)
      .repartition(col(strataCol), col("shard_seq"))
      .sortWithinPartitions(col(strataCol), col("shard_seq"), col(orderCol))
      .write
      .partitionBy(strataCol, "shard_seq")
      .mode("overwrite")
      .parquet(outDir)
}
