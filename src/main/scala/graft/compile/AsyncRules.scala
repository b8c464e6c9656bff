package graft.compile

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

/** The `custom_async` substitute (SURVEY.md §2.1: async rules have no
  * Catalyst analogue — reference wary/src/lib.rs:193-207,
  * wary_derive/src/wary/validate.rs:222-232): validation that needs I/O
  * (lookups, external services) runs as a partition-wise BATCHED check via
  * mapPartitions, so each task issues one batched call per `batchSize`
  * rows instead of one per row. Results merge into the same `errors`
  * column the synchronous rules produce.
  */
object AsyncRules {

  /** Appends errors from a batched checker to `errorsCol`.
    *
    * `check` receives up to `batchSize` values of `valueCol` at a time
    * (nulls included) and must return one Option[errorCode] per input, in
    * order — the shape of an async batched client (`Future.sequence` →
    * await) on the executor. Batches stream through the partition
    * (`grouped`, not a whole-partition buffer), so executor memory stays
    * O(batchSize) regardless of partition size.
    */
  def withBatchedRule(
      df: DataFrame,
      valueCol: String,
      pathName: String,
      message: String,
      errorsCol: String = WaryGate.ErrorsCol,
      batchSize: Int = 1024
  )(check: Seq[String] => Seq[Option[String]]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val schema = df.schema
    val valueIdx = schema.fieldIndex(valueCol)
    val errsIdx = schema.fieldIndex(errorsCol)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))

    val out = df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val verdicts = check(batch.map { r =>
          if (r.isNullAt(valueIdx)) null else r.getString(valueIdx)
        })
        require(verdicts.size == batch.size,
          s"batched checker returned ${verdicts.size} verdicts for " +
            s"${batch.size} inputs")
        batch.iterator.zip(verdicts.iterator).map { case (r, verdict) =>
          verdict match {
            case None => r
            case Some(code) =>
              val prev = r.getSeq[Row](errsIdx)
              // detail mirrors Error::Custom { code, message }
              // (error/mod.rs:61-68, serde untagged)
              val detail =
                s"""{"code":${RuleCompiler.jsonStr(code)},""" +
                  s""""message":${RuleCompiler.jsonStr(message)}}"""
              val err = Row(Seq(pathName), code, message, detail)
              Row.fromSeq(r.toSeq.updated(errsIdx, prev :+ err))
          }
        }
      }
    }(enc)
    out
  }
}
