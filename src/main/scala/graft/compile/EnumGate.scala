package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.rules.WarySpec

/** Sum-type (enum) validation — `#[derive(Wary)]` on enums runs each
  * variant's field rules under `match self`
  * (wary_derive/src/wary/emit.rs:186-342; README.md "Basic enum example").
  *
  * Columnar encoding of a Rust enum: a string TAG column plus one nullable
  * STRUCT column per variant (only the active variant's struct is
  * non-null). Validation compiles to the variant's rule tree gated by
  * `when(tag === variant)` — exactly one branch contributes errors per
  * row, mirroring the derive's match arms. Error paths carry the variant
  * FIELD names only (the reference adds no variant-name segment).
  *
  * Like [[WaryGate]], the whole gate is one narrow projection: no shuffle,
  * no UDFs, prunes into the scan.
  */
object EnumGate {

  /** (tag value, struct column name, per-variant spec). */
  final case class Variant(tag: String, column: String, spec: WarySpec)

  val ErrorsCol = "errors"

  def errorsColumn(df: DataFrame, tagCol: String, variants: Seq[Variant]): Column = {
    require(variants.nonEmpty, "at least one variant")
    val schema = df.schema
    val perVariant = variants
      .map { v =>
        val st = schema(v.column).dataType.asInstanceOf[StructType]
        when(col(tagCol) === v.tag,
          RuleCompiler.compileStructCol(col(v.column), st, v.spec))
          .otherwise(RuleCompiler.noErrs)
      }
      .reduce((a, b) => concat(a, b).cast(RuleCompiler.errArrayType))
    // A NULL or unknown tag has no reference analogue (deserializing an
    // unknown Rust enum variant FAILS) — flag it instead of letting the
    // row sail through unvalidated.
    val known = col(tagCol).isin(variants.map(_.tag): _*)
    val unknownErr = RuleCompiler.singleErr(
      array(), "unknown_variant",
      concat(lit("unknown enum variant: "),
        coalesce(col(tagCol), lit("null"))))
    when(known, perVariant).otherwise(unknownErr)
  }

  /** df + `errors` + per-variant gated transforms (transforms run only
    * when the row's report is empty AND the variant is active — the same
    * validate-then-transform gate as structs, per match arm).
    */
  def apply(df: DataFrame, tagCol: String, variants: Seq[Variant]): DataFrame = {
    val withErrors =
      df.withColumn(ErrorsCol, errorsColumn(df, tagCol, variants))
    val valid = size(col(ErrorsCol)) === 0
    variants.foldLeft(withErrors) { (acc, v) =>
      val st = df.schema(v.column).dataType.asInstanceOf[StructType]
      val transformedFields = st.fields.map { f =>
        v.spec.fields.find(s => s.name == f.name && s.transforms.nonEmpty) match {
          case Some(fs) =>
            RuleCompiler.compileTransforms(
              col(v.column).getField(f.name), f.dataType, fs.transforms)
              .as(f.name)
          case None => col(v.column).getField(f.name).as(f.name)
        }
      }
      if (v.spec.fields.exists(_.transforms.nonEmpty))
        acc.withColumn(
          v.column,
          // isNotNull guard: rebuilding from a NULL struct would produce
          // a non-null struct of null fields (same guard TRule.Dive has)
          when(valid && col(tagCol) === v.tag && col(v.column).isNotNull,
            struct(transformedFields.toSeq: _*))
            .otherwise(col(v.column)))
      else acc
    }
  }
}
