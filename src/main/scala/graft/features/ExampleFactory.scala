package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end point of the transcript engine: turns → supervised
  * training examples, in ONE conv_id exchange.
  *
  * Per `user` turn with non-null text:
  *   - `context_text`  — the trailing ≤`lookback` turns, role-tagged
  *     ([[ConvFeatures.turnContext]] frame: strictly PRECEDING, zero
  *     leakage by construction),
  *   - `latency_sec`   — the forward reply-latency LABEL
  *     ([[ConvFeatures.replyLatency]] frame: strictly FOLLOWING; it
  *     reads the future because labels are allowed to — features are
  *     not, and the two frames can never mix a column),
  *   - `split`         — [[TemporalSplit.byTime]]'s train/embargo/test
  *     tag (scan-fused pure time function).
  *
  * Both window frames ride the SAME `partitionBy(conv_id)
  * orderBy(ts, turn_idx)` sort, so Catalyst plans a SINGLE Exchange +
  * Sort feeding both Window operators (spec-asserted) — the example
  * factory costs one shuffle at any corpus size, and over the
  * conv_id-bucketed layout, none.
  */
object ExampleFactory {

  def examples(
      turns: DataFrame,
      lookback: Int,
      cutoffEpochSec: Long,
      embargoSec: Long
  ): DataFrame = {
    require(lookback > 0, "lookback must be positive")
    val order = Window.partitionBy(col("conv_id"))
      .orderBy(col("ts"), col("turn_idx"))
    val past = order.rowsBetween(-lookback, -1)
    val future = order.rowsBetween(1, Window.unboundedFollowing)
    val tagged = concat(col("role"), lit(": "), coalesce(col("text"), lit("")))
    val nextAssist = min(when(col("role") === "assistant", col("ts"))).over(future)
    TemporalSplit.byTime(turns, "ts", cutoffEpochSec, embargoSec)
      .withColumn("context_text", concat_ws("\n", collect_list(tagged).over(past)))
      .withColumn("latency_sec",
        nextAssist.cast("long") - col("ts").cast("long"))
      .filter(col("role") === "user" && col("text").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("context_text"),
        col("latency_sec"), col("split"))
  }
}
