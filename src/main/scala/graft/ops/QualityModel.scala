package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring, trained IN the engine: a ridge-regression
  * scorer over the integer text statistics of [[TextStats.qualityColumns]],
  * fit from exact-integer sufficient statistics — the supervised twin of
  * the k-means sufficient-statistics job ([[Similarity.clusterSums]]).
  *
  * The split of labor is the one that scales: the CLUSTER reduces the
  * corpus to one tiny X'X / X'y row (one partial-agg pass, decimal(38)
  * exact — counts×products at 10¹² rows overflow int64, so the sums are
  * 128-bit); the DRIVER solves the d×d normal equations (d ≈ a dozen
  * features — microseconds); SCORING returns to the cluster as one
  * codegen'd fixed-point projection. No gradient loops over the data, no
  * float nondeterminism in anything the oracle compares: the sufficient
  * stats are exactly reproducible integers (q_linfit_stats) and scoring
  * with published fixed-point weights is an exact integer dot
  * (q_quality_score); only the driver-side solve is floating point,
  * pinned by LinearFitSpec against an independent dense solver.
  *
  * A real pipeline swaps the toy label for human/model labels and the
  * feature slice for richer signals; the plumbing — stats shape, solve,
  * fixed-point publication — is what this module pins down.
  */
object QualityModel {

  /** The model's feature vector over a text column: an intercept plus a
    * fixed slice of integer text statistics. Order is the weight order.
    */
  def features(text: Column): Seq[(String, Column)] = Seq(
    "f_intercept" -> lit(1L),
    "f_chars" -> char_length(text).cast("long"),
    "f_ws_tokens" -> TextStats.wsTokenCount(text),
    "f_digits" -> TextStats.digitCount(text),
    "f_punct" -> TextStats.punctCount(text)
  )

  /** Exact sufficient statistics for least squares: ONE row with the
    * upper triangle of X'X (`xtx_i_j`, i ≤ j), X'y (`xty_i`) and the row
    * count `n`. Sums accumulate in decimal(38,0) — exact at 10¹² rows —
    * and surface as long (callers at scales where a sum exceeds int64
    * should keep the decimal; the oracle compares the long form).
    *
    * One partial-agg shuffle of a single row per partition — the
    * reduction is as cheap as a count(*).
    */
  def sufficientStats(
      df: DataFrame,
      feats: Seq[Column],
      label: Column
  ): DataFrame = {
    require(feats.nonEmpty, "need at least one feature")
    val d = feats.size
    val dec = "decimal(38,0)"
    val aggs =
      (for { i <- 0 until d; j <- i until d } yield
        sum((feats(i).cast(dec) * feats(j).cast(dec)).cast(dec))
          .cast("long").as(s"xtx_${i}_$j")) ++
      (0 until d).map(i =>
        sum((feats(i).cast(dec) * label.cast(dec)).cast(dec))
          .cast("long").as(s"xty_$i")) :+
      count(lit(1)).as("n")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Fit ridge weights from the sufficient statistics: solve
    * (X'X + λI)w = X'y on the driver (Gaussian elimination with partial
    * pivoting over a d×d matrix — the only float step, and the only
    * driver step). λ = 0 is plain least squares; the intercept row is
    * regularized like any other (pass feature-wise λ upstream if not).
    */
  def fitRidge(
      df: DataFrame,
      feats: Seq[Column],
      label: Column,
      lambda: Double = 0.0
  ): Array[Double] = {
    require(lambda >= 0.0, "lambda must be non-negative")
    val d = feats.size
    val row = sufficientStats(df, feats, label).collect()(0)
    val a = Array.ofDim[Double](d, d + 1)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      val v = row.getLong(idx).toDouble
      a(i)(j) = v
      a(j)(i) = v
      idx += 1
    }
    for (i <- 0 until d) {
      a(i)(d) = row.getLong(idx).toDouble
      a(i)(i) += lambda
      idx += 1
    }
    // Gaussian elimination, partial pivoting
    for (c <- 0 until d) {
      val p = (c until d).maxBy(r => math.abs(a(r)(c)))
      require(math.abs(a(p)(c)) > 1e-12,
        s"singular normal matrix at column $c — add ridge lambda or drop " +
          "a collinear feature")
      val t = a(c); a(c) = a(p); a(p) = t
      for (r <- c + 1 until d) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c to d) a(r)(k) -= f * a(c)(k)
      }
    }
    val w = new Array[Double](d)
    for (c <- d - 1 to 0 by -1) {
      var s = a(c)(d)
      for (k <- c + 1 until d) s -= a(c)(k) * w(k)
      w(c) = s / a(c)(c)
    }
    w
  }

  /** Quantize solved weights for publication: basis points
    * (round(w · 10⁴)), the fixed-point form [[scoreFixedPoint]] consumes
    * and engines replay exactly.
    */
  def toFixedPointBp(w: Array[Double]): Seq[Long] =
    w.toSeq.map(x => math.round(x * 10000.0))

  /** Exact fixed-point score: Σ wᵢ·fᵢ over int64. With weights in basis
    * points the score is the model output ×10⁴. Callers keep
    * |w|·|f|·d < 2⁶³ (holds for bp weights over per-document counts);
    * the sum is a pure codegen projection — zero shuffles, scan-fused.
    */
  def scoreFixedPoint(feats: Seq[Column], weightsFp: Seq[Long]): Column = {
    require(feats.size == weightsFp.size,
      s"${feats.size} features vs ${weightsFp.size} weights")
    feats.zip(weightsFp)
      .map { case (f, w) => f * lit(w) }
      .reduce(_ + _)
  }
}
