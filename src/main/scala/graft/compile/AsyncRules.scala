package graft.compile

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

/** The `custom_async` substitute (SURVEY.md §2.1: async rules have no
  * Catalyst analogue — reference wary/src/lib.rs:193-207,
  * wary_derive/src/wary/validate.rs:222-232): validation that needs I/O
  * (lookups, external services) runs as a partition-wise BATCHED check via
  * mapPartitions, so each task issues one batched call instead of one per
  * row. Results merge into the same `errors` column the synchronous rules
  * produce.
  */
object AsyncRules {

  /** Appends errors from a batched checker to `errorsCol`.
    *
    * `check` receives every value of `valueCol` in the partition (nulls
    * included) and must return one Option[errorCode] per input, in order —
    * the shape of an async batched client (`Future.sequence` → await) on
    * the executor.
    */
  def withBatchedRule(
      df: DataFrame,
      valueCol: String,
      pathName: String,
      message: String,
      errorsCol: String = WaryGate.ErrorsCol
  )(check: Seq[String] => Seq[Option[String]]): DataFrame = {
    val schema = df.schema
    val valueIdx = schema.fieldIndex(valueCol)
    val errsIdx = schema.fieldIndex(errorsCol)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))

    val out = df.mapPartitions { rows =>
      val buf = rows.toVector
      val verdicts = check(buf.map { r =>
        if (r.isNullAt(valueIdx)) null else r.getString(valueIdx)
      })
      buf.iterator.zip(verdicts.iterator).map { case (r, verdict) =>
        verdict match {
          case None => r
          case Some(code) =>
            val prev = r.getSeq[Row](errsIdx)
            val err = Row(Seq(pathName), code, message)
            Row.fromSeq(r.toSeq.updated(errsIdx, prev :+ err))
        }
      }
    }(enc)
    out
  }
}
