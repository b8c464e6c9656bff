package graft.features

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Preference-pair (DPO/RLHF) construction: per conversation, the
    * best- and worst-scoring assistant turns become one
    * (chosen, rejected) pair — the contrastive example a preference
    * tuner consumes. `score` is any deterministic integer scorer (a
    * quality model's quantized output, a rating column, a length
    * proxy); ties break on turn_idx (later wins for chosen, earlier
    * for rejected — fixed and stated, not engine luck). Conversations
    * whose best and worst scores are EQUAL emit nothing: a pair with
    * no score gap carries no preference signal, and a single-response
    * conversation can never pair with itself.
    *
    * Scale shape: ONE partial-agg shuffle — min/max over a
    * lexicographically-ordered struct(score, turn_idx, text), no
    * window, no sort, so a mega-conversation costs exactly its scan
    * (the struct comparison never reaches `text`: (score, turn_idx)
    * is already unique within a conversation). Over the
    * conv_id-bucketed layout the exchange disappears entirely.
    */
  def preferencePairs(turns: DataFrame, score: Column): DataFrame = {
    val a = turns
      .filter(col("role") === "assistant" && col("text").isNotNull)
      .select(col("conv_id"), score.cast("long").as("__score"),
        col("turn_idx"), col("text"))
    a.groupBy(col("conv_id"))
      .agg(
        max(struct(col("__score"), col("turn_idx"), col("text")))
          .as("__best"),
        min(struct(col("__score"), col("turn_idx"), col("text")))
          .as("__worst"))
      .filter(col("__best.__score") > col("__worst.__score"))
      .select(col("conv_id"),
        col("__best.turn_idx").as("chosen_idx"),
        col("__best.text").as("chosen_text"),
        col("__best.__score").as("chosen_score"),
        col("__worst.turn_idx").as("rejected_idx"),
        col("__worst.text").as("rejected_text"),
        col("__worst.__score").as("rejected_score"))
  }
}
