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
      explode(array_distinct(
        Dedup.shingles(Dedup.words(col(textCol)), k))).as("tok"))
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
      .select(col("id"), col("tok"), col("n"))
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
    val la = prefix.select(col("id").as("a"), col("tok"), col("n").as("na"))
    val lb = prefix.select(col("id").as("b"), col("tok"), col("n").as("nb"))
    val candidates = la.join(lb, Seq("tok"))
      .filter(col("a") < col("b"))
      // exact length prefilter: J ≥ τ ⇒ min ≥ τ·max (cross-multiplied)
      .filter(least(col("na"), col("nb")) * 10000 >=
        greatest(col("na"), col("nb")) * tauBp)
      .select(col("a"), col("b"), col("na"), col("nb"))
      .distinct()
    // exact verify: each side's distinct-token list rides an id-keyed
    // join onto the pair stream and the intersection is a per-row hash
    // probe (array_intersect) — the standard PPJoin list verify. The
    // previous form exploded every candidate by its full token list into
    // a (candidates × tokens)-row shuffle join + re-aggregation; this one
    // moves each token list ONCE per side and never re-aggregates.
    val sets = toks.groupBy(col("id"))
      .agg(collect_list(col("tok")).as("__ts"))
    val inter = candidates
      .join(sets.select(col("id").as("a"), col("__ts").as("__ta")), Seq("a"))
      .join(sets.select(col("id").as("b"), col("__ts").as("__tb")), Seq("b"))
      .select(col("a"), col("b"), col("na"), col("nb"),
        size(array_intersect(col("__ta"), col("__tb"))).cast("long")
          .as("inter"))
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
