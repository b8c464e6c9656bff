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

  /** k-fold CROSS-VALIDATION of the classifier in ONE aggregation pass —
    * no per-fold retraining loop: each fold's leave-fold-out counts are
    * pure algebra, `cnt₋f(label, bucket) = cnt_all(label, bucket) −
    * cnt_f(label, bucket)`, so one (label, fold, bucket) cell
    * aggregation yields ALL k models at once, and each document scores
    * against the model of its OWN fold (which its n-grams never
    * touched — the leakage-free accuracy estimate, unlike resubstitution
    * accuracy which [[nbPredict]]-on-the-training-frame reports).
    * Folds are the deterministic fmix64 gate mod k on `idCol` (group
    * k-fold assignment, the q_fold_assign contract).
    *
    * Returns one row per document: (id, fold, label, predicted, ok) —
    * ok = out-of-fold prediction equals the actual label. Documents too
    * short to yield an n-gram predict NULL, ok = NULL.
    *
    * Scale shape: the same single gram-stream partial agg as
    * [[nbTrain]] (keyed (label, fold, bucket) — at most
    * |classes|·k·dims keys per task), the dense leave-out model is
    * |classes|·k·dims rows (broadcast by construction), and scoring
    * joins each gram occurrence to its fold's |classes| rows before the
    * same two id-keyed aggs as [[nbPredict]].
    */
  def nbCrossVal(
      df: DataFrame,
      labelCol: String,
      textCol: Column,
      idCol: String,
      k: Int,
      n: Int = 3,
      dims: Int = 256
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(n >= 1, "n must be >= 1")
    require(dims > 0, "dims must be positive")
    val spark = df.sparkSession
    val fold = (org.apache.spark.sql.GraftBridge.column(
      graft.exprs.SampleHash(
        org.apache.spark.sql.GraftBridge.expression(col(idCol)))) % k)
      .cast("long")
    val base = df.withColumn("__fold", fold)
    val cells = grams(base, textCol, n, dims,
        Seq(col(labelCol).as("__label"), col("__fold")))
      .groupBy(col("__label"), col("__fold"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
    val labels = cells.select(col("__label")).distinct()
    val folds = spark.range(0, k).select(col("id").as("__fold"))
    val buckets = spark.range(0, dims).select(col("id").as("__bucket"))
    val grid = labels.crossJoin(broadcast(folds))
      .crossJoin(broadcast(buckets))
    val totals = cells.groupBy(col("__label"), col("__bucket"))
      .agg(sum(col("__n")).as("__all"))
    val dense = grid
      .join(totals, Seq("__label", "__bucket"), "left")
      .join(cells, Seq("__label", "__fold", "__bucket"), "left")
      .select(col("__label"), col("__fold"), col("__bucket"),
        (coalesce(col("__all"), lit(0L)) -
          coalesce(col("__n"), lit(0L)) + 1L).as("__cnt"))
    val model = dense
      .join(dense.groupBy(col("__label"), col("__fold"))
          .agg(sum(col("__cnt")).as("__tot")),
        Seq("__label", "__fold"))
      .select(col("__label").as("label"), col("__fold").as("mfold"),
        col("__bucket").as("bucket"),
        length(bin(col("__cnt"))).cast("long").as("w"),
        length(bin(col("__tot"))).cast("long").as("base"))
    val scored = grams(base, textCol, n, dims,
        Seq(col(idCol), col("__fold")))
      .join(broadcast(model),
        col("__bucket") === col("bucket") && col("__fold") === col("mfold"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("w")).as("__sw"), count(lit(1)).as("__nt"),
        first(col("base")).as("__base"))
      .select(col(idCol), col("label"),
        (col("__sw") - col("__nt") * col("__base")).as("__score"))
    val best = scored.groupBy(col(idCol))
      .agg(min(struct((-col("__score")).as("ns"), col("label").as("l")))
        .as("__b"))
      .select(col(idCol), col("__b.l").as("predicted"))
    base.select(col(idCol), col("__fold").as("fold"),
        col(labelCol).as("label"))
      .join(best, Seq(idCol), "left")
      .withColumn("ok", when(col("predicted").isNotNull,
        col("predicted") === col("label")))
  }
}
