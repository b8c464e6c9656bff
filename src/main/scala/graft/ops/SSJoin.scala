package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the PPJoin family
  * — Xiao et al., WWW'08): every pair with Jaccard ≥ τ over k-word
  * shingle sets, with NO probabilistic recall loss. This is the exact
  * ground-truth counterpart of [[Dedup.minhashPairs]]: MinHash-LSH trades
  * recall for speed; prefix filtering keeps recall = 1 and prunes with an
  * exact necessary condition instead.
  *
  * Prefix theorem: fix ANY total order on tokens. If |x| = set size and
  * p(x) = |x| − ⌈τ·|x|⌉ + 1, then two sets with Jaccard ≥ τ must share a
  * token within their first p tokens under that order (else the overlap
  * is too small to reach τ). Ordering tokens by ASCENDING document
  * frequency puts the RAREST tokens in the prefix, so the candidate join
  * on prefix tokens fans out df(token) ways with the smallest df first —
  * the pruning does the work LSH bands do, exactly.
  *
  * Integer exactness: ⌈τ·ℓ⌉ = (tauBp·ℓ + 9999) div 10000 and the final
  * predicate inter·10000 ≥ tauBp·(|a|+|b|−inter) are pure int64 — no
  * float τ crosses the engine boundary, and the length prefilter
  * 10000·min(|a|,|b|) ≥ tauBp·max(|a|,|b|) is the same cross-multiplied
  * necessary condition.
  *
  * Scale shape: tokens meet in one partial-agg df count (vocab-sized,
  * broadcast back); the prefix rank window partitions by doc_id (one
  * document's shingle set, never the corpus); candidates join on prefix
  * token where per-token fan-out is df² of the RAREST tokens; the exact
  * verify joins candidates back to the two posting lists keyed on
  * (doc, token). A degenerate corpus (one shingle in every document)
  * would make a prefix token corpus-hot and the join quadratic — the
  * `maxPrefixDf` guard FAILS LOUD on that instead of silently running a
  * cross join (same contract as the interval-join fan-out cap).
  */
object SSJoin {

  /** All (a, b, inter, uni) with a < b and inter/uni ≥ tauBp/10000 over
    * k-word shingle sets of `textCol`; docs with fewer than k words have
    * an empty set and never pair.
    *
    * `materialize = false` returns the pure LAZY plan with no postings
    * cache, no hot-prefix guard action and no checkpoint — the
    * plan-inspection / composition path where the caller owns caching
    * and accepts the quadratic risk the guard exists for.
    */
  def jaccardJoinExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      tauBp: Int = 8000,
      maxPrefixDf: Long = 1000L,
      materialize: Boolean = true
  ): DataFrame = {
    require(tauBp > 0 && tauBp <= 10000, "tauBp must be in (0, 10000]")
    val toks0 = df.select(
      col(idCol).cast("long").as("id"),
      explode(Dedup.shingleCol(col(textCol), k, distinct = true)).as("tok"))
    val toks = if (materialize) toks0.persist() else toks0
    // global token order: rarest-first (df asc, token asc) — vocab-sized,
    // broadcast back onto the postings
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
    // per-doc set size from the SAME id-keyed window pass as the rank —
    // a count(*) over the full partition shares the rank's exchange+sort,
    // where a separate groupBy(id) + join back would cost two more stages
    val byId = Window.partitionBy(col("id"))
    val ranked = toks
      .join(broadcast(dfreq), Seq("tok"))
      .withColumn("rn", row_number().over(
        byId.orderBy(col("tdf"), col("tok"))))
      .withColumn("n", count(lit(1)).over(
        byId.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val prefix0 = ranked
      .filter(col("rn") <= col("n") - ceilBp(col("n"), tauBp) + 1)
      .select(col("id"), col("tok"), col("n"), col("rn"))
    val prefix = if (materialize) prefix0.persist() else prefix0
    if (materialize) {
      // fail-loud hot-prefix guard: one tiny agg over prefix postings only
      val hottest = prefix.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("m")).collect().headOption
        .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(0L)
      if (hottest > maxPrefixDf)
        throw new IllegalStateException(
          s"prefix token df $hottest exceeds maxPrefixDf=$maxPrefixDf — the " +
            "candidate join would be near-quadratic; raise the threshold, " +
            "lengthen shingles, or raise maxPrefixDf knowingly")
    }
    val la = prefix.select(col("id").as("a"), col("tok"), col("n").as("na"),
      col("rn").as("ra"))
    val lb = prefix.select(col("id").as("b"), col("tok"), col("n").as("nb"),
      col("rn").as("rb"))
    // PPJoin positional filter: J ≥ τ requires inter ≥ ⌈τ(na+nb)/(1+τ)⌉
    // =: α, and for the FIRST token a pair shares (in the global rarest-
    // first order) inter ≤ 1 + min(na − pa, nb − pb); a true pair's first
    // shared token therefore passes this bound, so filtering each joined
    // posting row by it (before the pair distinct) can never drop a true
    // pair — it only prunes pairs whose every shared prefix token sits
    // too late in both lists to reach α. Exact, cross-multiplied:
    // α = (τbp·(na+nb) + (10⁴+τbp) − 1) DIV (10⁴+τbp).
    val alpha = call_function("div",
      lit(tauBp.toLong) * (col("na") + col("nb")) + lit(10000L + tauBp - 1),
      lit(10000L + tauBp))
    val candidates = la.join(lb, Seq("tok"))
      .filter(col("a") < col("b"))
      // exact length prefilter: J ≥ τ ⇒ min ≥ τ·max (cross-multiplied)
      .filter(least(col("na"), col("nb")) * 10000 >=
        greatest(col("na"), col("nb")) * tauBp)
      .filter(lit(1L) + least(col("na") - col("ra"), col("nb") - col("rb"))
        >= alpha)
      .select(col("a"), col("b"), col("na"), col("nb"))
      .distinct()
    // exact verify: intersection size via the two posting lists. (A
    // collected-array variant — join each side's token array onto the
    // pair stream, size(array_intersect) per row — was measured 5x
    // SLOWER here: the pair stream then drags KB-sized array payloads
    // through two sort-merge joins, where this form shuffles only
    // fixed-width (id, tok) rows and collapses map-side.)
    val inter = candidates
      .join(toks.select(col("id").as("a"), col("tok")), Seq("a"))
      .join(toks.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    val filtered = inter
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 10000 >= col("uni") * tauBp)
      .select(col("a"), col("b"), col("inter"), col("uni"))
    if (!materialize) return filtered
    // materialize eagerly (the guard already ran one action; output is
    // pair-sized) so the postings caches can be dropped before returning
    val out = filtered.localCheckpoint()
    toks.unpersist()
    prefix.unpersist()
    out
  }

  /** The cross-multiplied ceiling ⌈tauBp·n/10000⌉ as an integer-division
    * Column. `n` must be a PLAIN named column reference (its SQL text is
    * spliced into a DIV expression — Spark's Column API has no integral
    * divide).
    */
  def ceilBp(n: Column, tauBp: Int): Column =
    expr(s"(${n.toString} * $tauBp + 9999) DIV 10000")
}
