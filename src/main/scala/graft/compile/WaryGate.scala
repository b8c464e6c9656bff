package graft.compile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rules.WarySpec

/** The validate-then-transform gate — `Wary::wary` as a single narrow
  * (shuffle-free) projection stage (reference: wary/src/lib.rs:100-114;
  * the gate condition at lib.rs:107-111).
  *
  *  1. `errors` column = the full report (ALL rule failures, mirroring
  *     wary's accumulate-everything `Report`).
  *  2. Transforms are applied ONLY when the row's report is empty; invalid
  *     rows keep their original values and can be routed to quarantine.
  *
  * At 100 TB this whole stage stays inside one whole-stage-codegen span per
  * scan: no shuffle, no UDF boundary, columns prune through it.
  */
object WaryGate {
  val ErrorsCol = "errors"

  /** df + `errors` column + gated transforms. */
  def apply(df: DataFrame, spec: WarySpec): DataFrame = {
    val withErrors =
      df.withColumn(ErrorsCol, RuleCompiler.compileTop(df, spec))
    val valid = size(col(ErrorsCol)) === 0
    spec.fields.filter(_.transforms.nonEmpty).foldLeft(withErrors) {
      (acc, f) =>
        val dt = df.schema(f.name).dataType
        val transformed =
          RuleCompiler.compileTransforms(col(f.name), dt, f.transforms)
        acc.withColumn(f.name, when(valid, transformed).otherwise(col(f.name)))
    }
  }

  /** Rows that passed validation (transforms applied). */
  def valid(df: DataFrame, spec: WarySpec): DataFrame =
    apply(df, spec).filter(size(col(ErrorsCol)) === 0).drop(ErrorsCol)

  /** Rows that failed validation (original values + report) — the batch
    * analogue of the reference's HTTP-400-with-JSON-report serving path
    * (examples/axum/src/main.rs:36-62).
    */
  def quarantine(df: DataFrame, spec: WarySpec): DataFrame =
    apply(df, spec).filter(size(col(ErrorsCol)) > 0)

  /** JSON-serialized report, byte-compatible with the reference's
    * serialization shape (error/mod.rs:294-328).
    */
  def reportJson(df: DataFrame, spec: WarySpec): DataFrame =
    apply(df, spec).withColumn("report", to_json(col(ErrorsCol)))
}
