package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-first CSV source with malformed-row quarantine — the CSV twin
  * of [[JsonIngest.readJsonl]]. A malformed record (bad field type, wrong
  * arity) does not fail the job: PERMISSIVE parsing nulls the bad fields
  * and preserves the RAW LINE in the corrupt-record column, so the
  * quarantine keeps enough to re-parse after a schema fix — at 100 TB a
  * FAILFAST ingest that dies at hour nine on one bad line is not an
  * option, and silently dropping lines is worse.
  *
  * Composes with the format-independent gate sink: `readCsv` → route the
  * corrupt rows out → [[JsonIngest.ingest]] runs wary validation and
  * lands valid/quarantine splits in one pass, exactly as for JSON-lines.
  */
object CsvIngest {

  val CorruptCol = "_corrupt_record"

  /** Read CSV with an explicit schema (no inference scan) plus a trailing
    * corrupt-record column holding the raw line of any malformed record.
    * Well-formed fields of a partially-bad row are still parsed; the
    * corrupt column being non-null is the row's malformation flag.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .csv(path)

  /** Adds a `valid` flag ("true"/"false", string for partition-column
    * stability — same convention as [[JsonIngest]]) and renames the
    * corrupt payload to `raw`: the parse-level split, upstream of any
    * rule gate.
    */
  def flagged(df: DataFrame): DataFrame =
    df.withColumn("valid", col(CorruptCol).isNull.cast("string"))
      .withColumnRenamed(CorruptCol, "raw")
}
