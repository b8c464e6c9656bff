package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.compile.WaryGate
import graft.rules.WarySpec

/** Batch twin of the reference's JSON serving path (examples/axum/src/
  * main.rs:36-62: deserialize JSON → `wary()` → 200 with the transformed
  * payload, or 400 with the JSON error report).
  *
  * As a pipeline source that becomes: read JSON-lines with an explicit
  * schema (no sampling-based inference pass — at 100 TB a schema
  * inference scan doubles the read), run the validate-then-transform
  * gate, and land BOTH splits in ONE pass via a validity-partitioned
  * parquet sink:
  *
  * {{{
  *   outDir/__valid=true/...   // transformed rows, report = "[]"
  *   outDir/__valid=false/...  // original rows + JSON error report
  * }}}
  *
  * One scan, one write job, no second pass to split — and downstream
  * readers get partition pruning for free (`valid(outDir)` never touches
  * quarantined files).
  */
object JsonIngest {

  final case class IngestResult(
      validRows: Long,
      quarantinedRows: Long,
      outDir: String)

  /** Schema-first JSON-lines source. Corrupt lines are routed to the
    * gate as all-null rows (PERMISSIVE) rather than failing the job —
    * the `required` rules then quarantine them with a report, which is
    * the batch analogue of axum's 422-on-deserialize.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Gate + single-pass partitioned sink. Returns exact per-split counts
    * read back from the sink's own partition metadata (no extra job over
    * the input). An empty input yields (0, 0) and a sink with no data
    * files — check the counts before calling [[valid]]/[[quarantine]],
    * which infer their schema from the files.
    */
  def ingest(
      df: DataFrame,
      spec: WarySpec,
      outDir: String,
      partitions: Int = 0
  ): IngestResult = {
    // partition value is a string: Spark's partition-column type
    // inference does not cover booleans, so a boolean would silently
    // come back as StringType on read anyway — be explicit
    // same serving-shape report as WaryGate.reportJson (numeric index
    // path segments, raw-spliced detail) — to_json would double-encode
    // detail and drop its null case
    val gated = WaryGate(df, spec)
      .withColumn("report", WaryGate.reportColumn(col(WaryGate.ErrorsCol)))
      .withColumn("__valid",
        (size(col(WaryGate.ErrorsCol)) === 0).cast("string"))
      .drop(WaryGate.ErrorsCol)
    val sized = if (partitions > 0) gated.repartition(partitions) else gated
    sized.write
      .mode("overwrite")
      .partitionBy("__valid")
      .parquet(outDir)
    val spark = df.sparkSession
    // schema passed explicitly: an empty input produces a sink with no
    // parquet files, and schema inference would fail on it
    val counts = spark.read.schema(sized.schema).parquet(outDir)
      .groupBy("__valid").count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    IngestResult(
      validRows = counts.getOrElse("true", 0L),
      quarantinedRows = counts.getOrElse("false", 0L),
      outDir = outDir)
  }

  /** Transformed, validated rows — partition-pruned to `__valid=true`. */
  def valid(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .filter(col("__valid") === "true")
      .drop("__valid", "report")

  /** Quarantined originals + their JSON error report (`__valid=false`). */
  def quarantine(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .filter(col("__valid") === "false")
      .drop("__valid")

  /** Typed parse of an embedded JSON column (tool-call arguments, event
    * props): `from_json` against an explicit schema — scan-side, no
    * shuffle, no inference pass — plus a `<col>_valid` flag so malformed
    * payloads quarantine instead of killing the job. PERMISSIVE
    * `from_json` yields an all-NULL struct (not a NULL struct) on
    * unparseable input, indistinguishable from a parseable payload whose
    * fields are absent — so validity is detected the unambiguous way: a
    * `_corrupt_record` field appended to the parse schema, which Spark
    * populates ONLY on malformed input. The exposed `<col>_parsed`
    * struct carries exactly the caller's fields (corrupt marker
    * stripped) and is NULL for invalid payloads; a NULL input column is
    * invalid (there is nothing to parse).
    */
  def parseJsonColumn(df: DataFrame, column: String, schema: StructType): DataFrame = {
    require(df.columns.contains(column), s"no such column: $column")
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not declare $corrupt — it is the validity marker")
    val parsed = from_json(
      col(column), schema.add(corrupt, org.apache.spark.sql.types.StringType))
    val valid = col(column).isNotNull && parsed.getField(corrupt).isNull
    val clean = struct(
      schema.fieldNames.toSeq.map(f => parsed.getField(f).as(f)): _*)
    df.withColumn(s"${column}_parsed", when(valid, clean))
      .withColumn(s"${column}_valid", valid)
  }
}
