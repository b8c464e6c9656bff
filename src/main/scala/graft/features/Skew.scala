package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north rule: "partitioning / shuffle / skew
  * handled explicitly"; SURVEY.md §7.4 item 9).
  *
  * AQE's skew-join splitting (enabled in GraftSession) covers joins; this
  * covers skewed AGGREGATIONS: a mega-key (one conversation with 10^8
  * turns) funnels into a single reducer under plain groupBy. The salted
  * two-phase form spreads each key over `salts` partial aggregates and
  * recombines — turning one hot reducer into `salts` balanced ones.
  *
  * Applicable whenever the aggregate is algebraic (reassociatable):
  * sum/count/min/max and anything built from them.
  */
object Skew {

  import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

  /** True when `dt` contains a MapType at any nesting level. */
  private[features] def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType    => true
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: ArrayType  => containsMap(a.elementType)
    case _             => false
  }

  /** Two-phase salted aggregation. `partials` aggregate within each
    * (key, salt) group; `merges` recombine the partial columns (by name)
    * per key — e.g. partial `count(*) as n_part` merges as
    * `sum(col("n_part")) as n`.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Seq[(Column, String)],
      merges: Seq[(Column, String)]
  ): DataFrame = {
    require(partials.nonEmpty && merges.nonEmpty)
    // Salt from (input partition id, hashable row content) — NOT
    // monotonically_increasing_id(): mid-ids shift when a stage is
    // recomputed with different partitioning, which would make lineage
    // nondeterministic across retries. Content alone is not enough
    // either: a mega-key of byte-IDENTICAL rows (mass-duplicated
    // boilerplate) would collapse onto one salt and keep the hot
    // reducer — mixing in spark_partition_id() spreads duplicates
    // across as many salts as input partitions while staying
    // deterministic for a fixed input layout (task retries re-read the
    // same partition). Columns containing a MapType at ANY nesting level
    // are excluded (hash() rejects maps at any depth in Spark 3+ — a
    // struct<m:map<…>> fails analysis just like a top-level map).
    val hashable = df.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
      .toSeq
    val salted = df.withColumn(
      "__salt",
      pmod(hash(spark_partition_id() +: hashable: _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head._1.as(merges.head._2),
        merges.tail.map { case (c, n) => c.as(n) }: _*)
  }

  /** Convenience: salted count + sum per key (the common turn-volume /
    * token-volume rollup shape).
    */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int = 16
  ): DataFrame =
    saltedAgg(
      df, keys, salts,
      partials = Seq(count(lit(1)) -> "__n", sum(col(valueCol)) -> "__s"),
      merges = Seq(sum(col("__n")) -> "n", sum(col("__s")) -> "s")
    )
}
