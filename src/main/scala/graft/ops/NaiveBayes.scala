package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-pipeline trainable classifier: hashed char-n-gram multinomial
  * Naive Bayes with EXACT integer scoring — the "model-based" stand-in
  * this sandbox can support honestly (no external model deps), closing
  * the gap between heuristic gates ([[TextStats.langId]]'s fixed marker
  * lists, length/ratio quality scores) and a classifier that LEARNS from
  * the corpus's own labels.
  *
  * Likelihoods use the whole-bit log2 approximation proven by
  * [[Curation.dsirScores]]: `bitlen(x) = floor(log2 x) + 1` via
  * `length(bin(x))`, so every weight, score and argmax is integer-exact
  * and the DuckDB oracle replays training AND inference bit-for-bit —
  * the price is coarse (±1 bit) per-feature resolution, which hashed NB
  * absorbs by summing hundreds of features per document.
  *
  * Score(doc, c) = Σ_g bitlen(cnt_c(bucket(g)) + 1)
  *                 − n_grams(doc) · bitlen(tot_c + dims)
  * — multinomial NB with +1 smoothing over the `dims` hash buckets,
  * class priors deliberately omitted (they would add bitlen(n_c) once
  * per doc; callers wanting them add a constant per class).
  */
object NaiveBayes {

  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  /** One row per char-n-gram occurrence, hashed to `dims` buckets —
    * ONE codegen'd scan per document ([[graft.exprs.CharGramBuckets]]:
    * the split → shingle → rolling-hash → mod composition folded into a
    * single recurrence, no per-gram string ever built; bit-identical on
    * BMP text, and the codepoint walk is what the oracle replays).
    * Spaces are characters like any other (word boundaries are signal
    * for char-level models). Measured: the compositional path ran
    * q_nb_classify at 7.6 s warm at sf0.1; this expression reads 2.6 s
    * (~3x) — the remainder is the ×|labels| scoring fan and the two
    * aggs, not gram extraction.
    */
  private def grams(
      df: DataFrame,
      textCol: Column,
      n: Int,
      dims: Int,
      keep: Seq[Column]
  ): DataFrame =
    df.select(keep :+ explode(
        org.apache.spark.sql.GraftBridge.column(
          graft.exprs.CharGramBuckets(
            org.apache.spark.sql.GraftBridge.expression(lower(textCol)),
            n, dims))).as("__bucket"): _*)

  /** Train: the dense (label × bucket) weight table. Output columns
    * `(label, bucket, w, base)` with `w = bitlen(cnt + 1)` and
    * `base = bitlen(Σ_b (cnt_b + 1))` — the per-class normalizer every
    * token pays. Dense (every class carries all `dims` buckets, absent
    * ones at cnt = 0) so unseen n-grams score the smoothed floor
    * instead of silently dropping.
    *
    * Scale shape: the n-gram stream is n_chars rows per doc but
    * collapses map-side into ONE partial-agg shuffle keyed
    * (label, bucket) — at most |classes|·dims keys per task; everything
    * after is model-sized (|classes|·dims rows, broadcastable by
    * construction).
    */
  def nbTrain(
      df: DataFrame,
      labelCol: String,
      textCol: Column,
      n: Int = 3,
      dims: Int = 256
  ): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(dims > 0, "dims must be positive")
    val counts = grams(df, textCol, n, dims,
        Seq(col(labelCol).as("__label")))
      .groupBy(col("__label"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
    val grid = counts.select(col("__label")).distinct()
      .crossJoin(broadcast(
        df.sparkSession.range(0, dims).select(col("id").as("__bucket"))))
    val dense = grid.join(counts, Seq("__label", "__bucket"), "left")
      .select(col("__label"), col("__bucket"),
        (coalesce(col("__n"), lit(0L)) + 1L).as("__cnt"))
    val totals = dense.groupBy(col("__label"))
      .agg(sum(col("__cnt")).as("__tot"))
    dense.join(totals, Seq("__label"))
      .select(col("__label").as("label"), col("__bucket").as("bucket"),
        bitlen(col("__cnt")).as("w"), bitlen(col("__tot")).as("base"))
  }

  /** Predict: per document, every class's exact integer score and the
    * argmax (ties broken by lexicographically smallest label, so the
    * result is deterministic and oracle-replayable). Documents too short
    * to yield a single n-gram predict NULL — undefined, not guessed.
    *
    * Scale shape: the n-gram stream broadcast-joins the model (each
    * occurrence fans out ×|classes| — bounded, classes are few by
    * definition) and collapses map-side into one shuffle keyed
    * (id, label); the argmax is a second agg on the same id key.
    */
  def nbPredict(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      model: DataFrame,
      n: Int = 3,
      dims: Int = 256
  ): DataFrame = {
    val scored = grams(df, textCol, n, dims, Seq(col(idCol)))
      .join(broadcast(model), col("__bucket") === col("bucket"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("w")).as("__sw"), count(lit(1)).as("__nt"),
        first(col("base")).as("__base"))
      .select(col(idCol), col("label"),
        (col("__sw") - col("__nt") * col("__base")).as("__score"))
    val best = scored.groupBy(col(idCol))
      .agg(min(struct((-col("__score")).as("ns"), col("label").as("l")))
        .as("__b"))
      .select(col(idCol), col("__b.l").as("predicted"),
        (-col("__b.ns")).as("score"))
    df.select(col(idCol)).join(best, Seq(idCol), "left")
  }
}
