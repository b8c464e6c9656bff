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

  /** JSON report string for an `errors` column, byte-compatible with the
    * reference's serialization (error/mod.rs:289-328: serde struct
    * `Inner { path, code, message, detail }` per error, report = JSON
    * array of them).
    *
    * Built manually rather than with `to_json` because: array-index path
    * segments serialize as JSON NUMBERS (path.rs `Elem` is untagged
    * Key(&str)|Index(usize)); `detail` is spliced as raw JSON (it already
    * holds the untagged error-variant serialization; NULL detail ⇒
    * `null`, matching unit variants — to_json would double-encode it as
    * a string and drop the null key); and string escaping must be
    * serde_json's (lowercase \u00xx hex — Jackson emits uppercase).
    *
    * Caveat: index segments are stored as digit strings internally, so a
    * serde-RENAMED field whose name is all digits would also serialize as
    * a number; field keys that are pure integers are pathological and not
    * produced by any reference fixture.
    */
  def reportColumn(errors: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.exprs.{functions => gf}
    val perErr = transform(errors, e => concat(
      lit("""{"path":["""),
      array_join(
        transform(e.getField("path"), s =>
          when(s.rlike("^(0|[1-9][0-9]*)$"), s).otherwise(gf.json_quote(s))),
        ","),
      lit("""],"code":"""),
      when(e.getField("code").isNull, lit("null"))
        .otherwise(gf.json_quote(e.getField("code"))),
      lit(""","message":"""),
      when(e.getField("message").isNull, lit("null"))
        .otherwise(gf.json_quote(e.getField("message"))),
      lit(""","detail":"""),
      coalesce(e.getField("detail"), lit("null")),
      lit("}")
    ))
    concat(lit("["), array_join(perErr, ","), lit("]"))
  }

  /** Gate + the serialized report column (serving-path output shape). */
  def reportJson(df: DataFrame, spec: WarySpec): DataFrame =
    apply(df, spec).withColumn("report", reportColumn(col(ErrorsCol)))
}
