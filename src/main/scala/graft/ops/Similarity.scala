package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Exactness strategy: embeddings are quantized to int64 (×10000, round)
  * inside the expression, so dot products are exact integers — identical
  * across engines and across summation orders. Rankings therefore admit a
  * byte-exact DuckDB oracle (no float tolerance games).
  *
  * Scale notes:
  *  - brute-force top-k broadcasts the (small) query set and computes
  *    dot products map-side — no shuffle until the final per-query top-k,
  *    which is tiny. This is the correct baseline up to ~10^7 vectors.
  *  - lshBuckets gives the sub-linear path: sign-bit sketches over fixed
  *    pseudo-random hyperplanes bucket the corpus; candidate search probes
  *    only matching buckets (same shape as the MinHash band join).
  */
object Similarity {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column) =
    org.apache.spark.sql.GraftBridge.expression(c)

  /** Exact int64 dot product of two float-array columns (quantized ×10^4,
    * round half away from zero) — codegen'd custom expression.
    */
  def quantDot(a: Column, b: Column): Column =
    bridge(graft.exprs.QuantDot(expr(a), expr(b)))

  /** Exact int64 squared norm (quantized). */
  def quantSqNorm(a: Column): Column =
    bridge(graft.exprs.QuantSqNorm(expr(a)))

  /** Exact-integer covariance/PCA sufficient statistics of an embedding
    * column: per dimension pair i ≤ j, (n, s_i = Σqᵢ, s_j = Σqⱼ,
    * s_ij = Σqᵢqⱼ) over the shared ×10⁴ quantization — everything a
    * covariance/correlation/PCA consumer needs
    * (cov·n² = n·s_ij − s_i·s_j), exact in decimal(38,0) to ~10¹² rows,
    * engine-portable (the oracle replays ROUND + HUGEINT sums).
    *
    * Scale shape: one codegen'd [[graft.exprs.QuantGramPairs]] projection
    * fans each row out to d(d+1)/2 structs (quantized once per element),
    * then ONE partial-agg shuffle collapses map-side to at most
    * d(d+1)/2 keys per task — the exchange carries O(d²·tasks) rows, not
    * O(d²·corpus). Output: (i, j, n, s_i, s_j, s_ij).
    */
  def gramStats(df: DataFrame, embedding: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // null embeddings are EXCLUDED explicitly (a vector that doesn't
    // exist has no moments) — without the filter, inline would skip
    // them silently and n would disagree with a count(*) consumer.
    //
    // Two-level sum: the d(d+1)/2-per-row fan-out is first collapsed per
    // TASK with plain int64 sums — exact by construction (|p| ≤ 10^8 from
    // the ×10⁴ quantization, so a task would need > 9·10^10 rows to
    // overflow; input splits are bounded far below that, and ANSI mode
    // fails loud rather than wrapping) — and only the per-task partials
    // (≤ d(d+1)/2 rows each) are summed in decimal(38,0). Same exact
    // values and output schema as a direct decimal aggregation, without
    // paying interpreted decimal arithmetic once per fanned-out row.
    df.filter(embedding.isNotNull)
      .select(inline(bridge(graft.exprs.QuantGramPairs(expr(embedding)))))
      .groupBy(spark_partition_id().as("__t"), col("i"), col("j"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("qi")).as("__si"),
        sum(col("qj")).as("__sj"),
        sum(col("p")).as("__sij"))
      .groupBy(col("i"), col("j"))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__si").cast(dec)).as("s_i"),
        sum(col("__sj").cast(dec)).as("s_j"),
        sum(col("__sij").cast(dec)).as("s_ij"))
  }

  /** Double-precision cosine similarity (for allclose-style consumers). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Brute-force top-k by quantized inner product; ties broken by vec id.
    * `queries` is expected to be small — it is broadcast.
    *
    * @param excludeSelf drop candidates whose vec_id equals the query_id —
    *   opt-IN, for corpus-as-queries callers, same contract as [[annIvf]]
    *   and [[annCandidates]]: when queries live in a DIFFERENT id space,
    *   an id collision must not silently drop a valid candidate, so the
    *   default keeps every candidate.
    */
  def topKByDot(
      corpus: DataFrame, // (vec_id, embedding)
      queries: DataFrame, // (query_id, q_embedding)
      k: Int,
      excludeSelf: Boolean = false
  ): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
    val scored = (if (excludeSelf)
        joined.filter(col("query_id") =!= col("vec_id"))
      else joined)
      .select(
        col("query_id"),
        col("vec_id"),
        quantDot(col("embedding"), col("q_embedding")).as("dot")
      )
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (brute force): all (a < b)
    * pairs whose quantized inner product meets the threshold. The corpus
    * side is broadcast, so the shape is O(n²) work and O(n) driver memory
    * — correct ONLY for small/capped subsets. To make that impossible to
    * reach by accident at scale, the corpus size is checked against
    * `maxCorpus` and the call fails fast with a pointer to
    * [[nearDupPairsLsh]], the sub-quadratic route for full corpora.
    *
    * Guard cost: the check is `limit(maxCorpus+1).count()`, so it costs
    * O(maxCorpus) regardless of corpus size — but it IS an extra Spark
    * action that re-evaluates the corpus lineage up to the cap. Callers
    * that already know the size (a cached/counted input) pass `knownSize`
    * to skip the action entirely.
    */
  def nearDupPairs(
      corpus: DataFrame,
      minDot: Long,
      maxCorpus: Long = 100000L,
      knownSize: Option[Long] = None
  ): DataFrame = {
    val probe = math.min(maxCorpus + 1L, Int.MaxValue.toLong).toInt
    val n = knownSize.getOrElse(corpus.limit(probe).count())
    require(n <= maxCorpus,
      s"nearDupPairs is brute-force O(n²) with a broadcast side; corpus has " +
        s"> maxCorpus=$maxCorpus rows. Use nearDupPairsLsh (LSH-bucketed" +
        s") for full corpora, or raise maxCorpus explicitly for a capped " +
        "subset you know fits.")
    val a = corpus.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("a") < col("b"))
      .select(col("a"), col("b"), quantDot(col("ea"), col("eb")).as("dot"))
      .filter(col("dot") >= minDot)
  }

  /** Scale path for embedding near-dup: LSH-bucket the corpus, expand
    * (a < b) candidate pairs from ID-ONLY bucket rows via a bucket-keyed
    * self-join, then join the embeddings back for the exact quantized-dot
    * re-rank. Same output contract as [[nearDupPairs]] restricted to pairs
    * that collide in a bucket.
    *
    * Memory shape (the thing that matters at 100 TB): no single row ever
    * holds more than TWO embeddings — candidate generation carries only
    * (bucket, vec_id), and the re-rank joins each side's vector back
    * individually. A full bucket at the cap with dim-1024 floats costs
    * nothing beyond its (id, bucket) rows; the O(b²) pair expansion is
    * distributed across the bucket join's output rows, never materialized
    * inside one row.
    *
    * Recall caveats (both auditable, neither silent):
    *  - recall < 1 by construction — vectors must collide within the
    *    probed Hamming ball (raise `probes` toward nBits, or lower
    *    `nBits`, for recall);
    *  - buckets larger than `maxBucketSize` are DROPPED (a degenerate
    *    bucket means near-identical mass duplicates — exact dedup
    *    territory — or too-few bits). Dropped buckets are surfaced by
    *    [[lshDroppedHotBuckets]] on the same input: log it next to this
    *    output, exactly like Dedup.minhashPairs/droppedHotBuckets.
    */
  /** The exact bucket plus `probes` Hamming-1 neighbors (bit i flipped,
    * 0 ≤ i < probes ≤ nBits) — the standard multi-probe recall lever:
    * instead of fattening every bucket by lowering nBits, only the PROBE
    * side fans out (×(probes+1) rows), and each probe is one more hash-
    * join lookup. All probe values are distinct by construction, so
    * downstream pair/candidate generation stays duplicate-free.
    */
  private def probeBuckets(bucket: Column, probes: Int): Column =
    explode(array(
      (bucket +: (0 until probes).map(i => bucket.bitwiseXOR(lit(1L << i)))): _*))

  /** @param probes number of Hamming-1 neighbor buckets to probe per
    *   vector (0 = exact-bucket only; nBits = full Hamming-1 ball).
    *   Multi-probe expands only the LEFT side of the bucket join, and a
    *   pair (a < b) still appears exactly once: same-bucket pairs match
    *   via a's exact probe, Hamming-1 pairs via a's flipped probe into
    *   b's bucket (b's flip toward a yields (b, a), killed by a < b).
    *   The `maxBucketSize` cap is symmetric — a vector in an oversized
    *   bucket pairs with nothing, on either side, so output never
    *   depends on which endpoint carries the smaller id.
    */
  def nearDupPairsLsh(
      corpus: DataFrame,
      minDot: Long,
      dim: Int,
      nBits: Int = 12,
      maxBucketSize: Int = 10000,
      probes: Int = 0
  ): DataFrame = {
    val ea = corpus.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val eb = corpus.select(col("vec_id").as("b"), col("embedding").as("eb"))
    lshPairCandidates(corpus, dim, nBits, maxBucketSize, probes)
      .join(ea, Seq("a"))
      .join(eb, Seq("b"))
      .select(col("a"), col("b"), quantDot(col("ea"), col("eb")).as("dot"))
      .filter(col("dot") >= minDot)
  }

  /** Embedding near-duplicate pairs by COSINE threshold — the metric
    * embedding-dedup pipelines actually specify ("drop pairs above 0.999
    * cosine"), over the same sub-quadratic LSH candidate path as
    * [[nearDupPairsLsh]]. `minCosineBp` is the threshold in basis points
    * (9990 = 0.999).
    *
    * The predicate is EXACT integer arithmetic — no sqrt, no float
    * division:  cos(a,b) ≥ t  ⇔  dot > 0  ∧  dot²·10⁸ ≥ (t·10⁴)²·|a|²·|b|²
    * evaluated in decimal(38,0). Zero-norm vectors (undefined cosine)
    * never match. Output carries the integer evidence (dot, sq_a, sq_b)
    * so downstream can recompute the exact cosine at any precision.
    *
    * Numeric domain (decimal precision caps at 38 digits, so dot²·10⁸
    * must stay under 10³⁸): exact for |quantized dot| < 10¹⁵, i.e.
    * dim·(maxAbs·10⁴)² < 10¹⁵ — dim 4096 at |x| ≤ 7.8, dim 64 at
    * |x| ≤ 62. Real embedding columns (unit-ish floats) sit orders of
    * magnitude inside this. Beyond it the session's ANSI mode makes the
    * overflow THROW (fail loud), never silently drop a pair; pre-scale
    * pathological-magnitude vectors before calling.
    */
  def nearDupPairsCosine(
      corpus: DataFrame,
      minCosineBp: Int,
      dim: Int,
      nBits: Int = 12,
      maxBucketSize: Int = 10000,
      probes: Int = 0
  ): DataFrame = {
    require(minCosineBp > 0 && minCosineBp <= 10000,
      s"minCosineBp must be in 1..10000 (= cosine 0..1], got $minCosineBp)")
    val ea = corpus.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val eb = corpus.select(col("vec_id").as("b"), col("embedding").as("eb"))
    lshPairCandidates(corpus, dim, nBits, maxBucketSize, probes)
      .join(ea, Seq("a"))
      .join(eb, Seq("b"))
      .select(
        col("a"), col("b"),
        quantDot(col("ea"), col("eb")).as("dot"),
        quantSqNorm(col("ea")).as("sq_a"),
        quantSqNorm(col("eb")).as("sq_b"))
      .filter(cosineAtLeastBp(minCosineBp))
  }

  /** Exact cosine ≥ threshold predicate over the quantized `dot`, `sq_a`,
    * `sq_b` columns: dot² · 10⁸ ≥ bp² · |a|² · |b|² in decimal(38)
    * arithmetic — no sqrt, no float, byte-replayable by the oracle in
    * HUGEINT. Requires positive dot and norms (cosine in (0, 1]).
    */
  private def cosineAtLeastBp(minCosineBp: Int): Column = {
    val dec = "decimal(19,0)"
    val dotD = col("dot").cast(dec)
    val lhs = dotD * dotD * lit(100000000L).cast(dec)
    val rhs = lit(minCosineBp.toLong * minCosineBp).cast(dec) *
      col("sq_a").cast(dec) * col("sq_b").cast(dec)
    col("dot") > 0 && col("sq_a") > 0 && col("sq_b") > 0 && lhs >= rhs
  }

  /** Shared LSH candidate generation for the near-dup family: (a < b)
    * vector-id pairs sharing a bucket (or, under multi-probe, within
    * Hamming-`probes` of one). Id-only rows cross the shuffle — never
    * embeddings.
    *
    * The `maxBucketSize` cap is SYMMETRIC: a vector whose own exact
    * bucket is oversized participates in no pairs at all — neither as
    * the probing nor the probed side — so the output never depends on
    * which endpoint happens to carry the smaller id, and
    * [[lshDroppedHotBuckets]] (which reports exactly the oversized
    * buckets) fully accounts for every dropped pair.
    */
  private def lshPairCandidates(
      corpus: DataFrame,
      dim: Int,
      nBits: Int,
      maxBucketSize: Int,
      probes: Int
  ): DataFrame = {
    require(probes >= 0 && probes <= nBits,
      s"probes must be in 0..nBits (=$nBits)")
    val ids = corpus.select(
      col("vec_id"), lshBucket(col("embedding"), dim, nBits).as("bucket"))
    // eligible buckets from ids only (count, not collect). The size cap
    // bounds join fan-out on BOTH sides. Singleton buckets only produce
    // pairs under multi-probe, so the n > 1 pruning applies to the
    // exact-only case alone (where it is a pure optimization: an l-side
    // singleton's pair requires its own bucket via the r side anyway).
    val okCond =
      if (probes == 0) col("__n") > 1 && col("__n") <= maxBucketSize
      else col("__n") <= maxBucketSize
    val ok = ids.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__n"))
      .filter(okCond)
      .select("bucket")
    val okIds = ids.join(ok, Seq("bucket"))
    val lProbe = if (probes == 0) col("bucket") else probeBuckets(col("bucket"), probes)
    val l = okIds.select(lProbe.as("bucket"), col("vec_id").as("a"))
    val r = okIds.select(col("bucket"), col("vec_id").as("b"))
    // no distinct: each vector lands in exactly ONE exact bucket and all
    // of a vector's probe values are distinct, so every (a < b) pair is
    // generated at most once (see the probes scaladoc) — a dedup here
    // would be a full extra shuffle for nothing
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
  }

  /** Buckets the `maxBucketSize` cap would drop in [[nearDupPairsLsh]]:
    * one row per oversized bucket with its vector count — the drop metric
    * to log/alert on next to the capped pair output (without it, capped
    * drops are indistinguishable from ordinary LSH recall loss).
    */
  def lshDroppedHotBuckets(
      corpus: DataFrame,
      dim: Int,
      nBits: Int = 12,
      maxBucketSize: Int = 10000
  ): DataFrame =
    corpus
      .select(lshBucket(col("embedding"), dim, nBits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > maxBucketSize)

  /** IVF centroids as a driver-side list: a deterministic sample of corpus
    * vectors (every `step`-th id). The payload is k × dim floats of PLAIN
    * DATA (see [[ivfProbeLists]] — it never becomes plan literals), so at
    * k ≈ √N = 10⁶ this is a few GB: sized for a large driver, shipped once
    * per executor with the task closure. In production the sample is
    * replaced by trained k-means centroids from a separate job; the
    * assign/probe structure below is identical either way.
    */
  def ivfCentroids(corpus: DataFrame, step: Long): Seq[(Int, Seq[Float])] =
    corpus.filter(col("vec_id") % step === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => ((r.getLong(0) / step).toInt, r.getSeq[Float](1)))
      .toSeq
      .sortBy(_._1)

  /** Centroids packed for the DATA path: parallel arrays of list ids and
    * pre-quantized (×10⁴ round-half-away) int64 centroid vectors — the
    * payload a single [[graft.exprs.IvfProbeLists]] expression carries as
    * a task-serialized reference object. At k ≈ √N (10⁶ centroids at 10¹²
    * vectors) this is a few GB of PLAIN DATA shipped once per executor,
    * instead of a million-node expression tree the analyzer and codegen
    * would have to walk per plan.
    */
  private def packCentroids(
      centroids: Seq[(Int, Seq[Float])]): (Array[Int], Array[Array[Long]]) = {
    def q(x: Double): Long = graft.exprs.QuantVec.q(x)
    (centroids.map(_._1).toArray,
      centroids.map(_._2.map(v => q(v.toDouble)).toArray).toArray)
  }

  /** Nearest-centroid (inverted-list) id for a vector. One O(1)-plan-size
    * expression (centroids as data): assignment costs ZERO shuffles (IVF
    * assignment is embarrassingly parallel — the property that makes it
    * the ANN structure of choice at 10^12 vectors) and the plan does not
    * grow with k.
    */
  def ivfListId(embedding: Column, centroids: Seq[(Int, Seq[Float])]): Column =
    get(ivfProbeLists(embedding, centroids, 1), lit(0))

  /** The `nProbe` nearest list ids for a query vector (descending dot,
    * ties to the smaller id — consistent with [[ivfListId]]).
    */
  def ivfProbeLists(embedding: Column, centroids: Seq[(Int, Seq[Float])],
      nProbe: Int): Column = {
    val (ids, cents) = packCentroids(centroids)
    bridge(graft.exprs.IvfProbeLists(expr(embedding), ids, cents, nProbe))
  }

  /** Exact-integer dots against every centroid, packed as an array of
    * (dot, -list_id) structs — struct comparison is lexicographic, so
    * array_max = argmax by dot with ties to the SMALLER list id, and a
    * descending sort ranks probe lists under the same tie rule.
    *
    * SMALL-k ONLY: this builds one literal + one dot expression PER
    * CENTROID, so the plan tree grows O(k·dim) and analysis/codegen costs
    * explode around k ≈ 10³. Kept as the composed-builtins reference
    * implementation (equality-tested against the data path in OpsSpec);
    * production callers go through [[ivfProbeLists]].
    */
  private def centroidDots(embedding: Column,
      centroids: Seq[(Int, Seq[Float])]): Column =
    array(centroids.map { case (id, vec) =>
      struct(quantDot(embedding, typedlit(vec)).as("d"), lit(-id).as("nid"))
    }: _*)

  /** Literal-expression twin of [[ivfListId]] (small-k reference path). */
  def ivfListIdExpr(embedding: Column, centroids: Seq[(Int, Seq[Float])]): Column =
    -array_max(centroidDots(embedding, centroids)).getField("nid")

  /** Literal-expression twin of [[ivfProbeLists]] (small-k reference path). */
  def ivfProbeListsExpr(embedding: Column, centroids: Seq[(Int, Seq[Float])],
      nProbe: Int): Column =
    transform(
      slice(reverse(array_sort(centroidDots(embedding, centroids))), 1, nProbe),
      s => -s.getField("nid"))

  /** IVF-flat ANN candidates: corpus vectors in the query's `nProbe`
    * nearest inverted lists, re-ranked by exact quantized dot. Candidate
    * generation is one broadcast hash join on list_id (queries exploded
    * to their probe lists and broadcast) — the corpus is never shuffled.
    * Recall grows with nProbe; the caller takes top-k.
    */
  /** @param excludeSelf drop candidates whose vec_id equals the query_id —
    *   opt-IN, for callers whose queries are drawn from the corpus (the
    *   corpus-as-queries pattern). When queries live in a DIFFERENT id
    *   space, leave it false: an id collision between an unrelated query
    *   and corpus vector must not silently drop a valid candidate.
    */
  def annIvf(
      corpus: DataFrame, // (vec_id, embedding)
      queries: DataFrame, // (query_id, q_embedding)
      centroids: Seq[(Int, Seq[Float])],
      nProbe: Int,
      excludeSelf: Boolean = false
  ): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val assigned = corpus.withColumn(
      "list_id", ivfListId(col("embedding"), centroids))
    val probes = queries
      .select(col("query_id"), col("q_embedding"),
        explode(ivfProbeLists(col("q_embedding"), centroids, nProbe))
          .as("list_id"))
    val joined = assigned.join(broadcast(probes), Seq("list_id"))
    val cand =
      if (excludeSelf) joined.filter(col("query_id") =!= col("vec_id"))
      else joined
    cand.select(col("query_id"), col("vec_id"),
      quantDot(col("embedding"), col("q_embedding")).as("dot"))
  }

  /** Recall@k of an ANN candidate stream against exact top-k truth: per
    * query, |top-k(candidates) ∩ top-k(truth)| / k — the metric a 100 TB
    * pipeline logs next to every approximate index so recall loss is a
    * NUMBER, not a hope. Both sides rank by (dot desc, vec_id asc), the
    * engine-exact quantized ordering used everywhere in this module.
    * Queries absent from `candidates` (empty probe) still appear, with
    * recall 0. `recall_bp` is basis points (hits×10⁴/k, floored) so the
    * output stays integer-exact/oracle-portable. Duplicate
    * (query_id, vec_id) candidate rows — e.g. the union of two index
    * probes — are collapsed (best dot wins) BEFORE ranking, so a pair
    * can never be counted twice nor crowd a distinct candidate out of
    * the top-k, and hits ≤ k always holds.
    */
  /** Hard-negative mining for retrieval/contrastive training: per query,
    * the k highest-scoring corpus vectors AFTER dropping (a) the query
    * itself and (b) anything so similar it is presumably a positive or a
    * duplicate — exact cosine ≥ `maxCosineBp` via the same
    * division-free decimal predicate the near-dup family uses. The
    * closest `skipTop` survivors (likely unlabeled positives) are then
    * skipped, and the next k emitted with `neg_rank` 1..k — the standard
    * "hard but not false" negative band.
    *
    * Scale shape: identical to [[topKByDot]] — queries broadcast, corpus
    * streamed, per-query output cardinality k. For full-corpus query
    * sets swap the scored set for [[annCandidates]] / [[annIvf]] and
    * apply the same band; this brute form is the oracle-exact baseline.
    */
  def hardNegatives(
      corpus: DataFrame, // (vec_id, embedding)
      queries: DataFrame, // (query_id, q_embedding)
      k: Int,
      skipTop: Int = 0,
      maxCosineBp: Int = 9500,
      excludeSelf: Boolean = true
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(skipTop >= 0, "skipTop must be >= 0")
    require(maxCosineBp > 0 && maxCosineBp <= 10000,
      s"maxCosineBp must be in 1..10000, got $maxCosineBp")
    val joined = corpus.crossJoin(broadcast(queries))
    val scored = (if (excludeSelf)
        joined.filter(col("query_id") =!= col("vec_id"))
      else joined)
      .select(
        col("query_id"),
        col("vec_id"),
        quantDot(col("embedding"), col("q_embedding")).as("dot"),
        quantSqNorm(col("q_embedding")).as("sq_a"),
        quantSqNorm(col("embedding")).as("sq_b"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    scored
      .filter(!cosineAtLeastBp(maxCosineBp))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") > skipTop && col("rank") <= skipTop + k)
      .select(col("query_id"), col("vec_id"), col("dot"),
        (col("rank") - skipTop).as("neg_rank"))
  }

  /** Contrastive TRIPLET mining — the training-example factory for
    * embedding models: per anchor, ONE presumed positive (highest-dot
    * neighbor with exact cosine ≥ `posMinCosineBp`) and ONE hard
    * negative (highest-dot survivor BELOW the positive band, after
    * skipping `skipTop` — the same band [[hardNegatives]] mines, at
    * k = 1). The two bands partition the non-self corpus exactly (one
    * decimal(38) cosine predicate decides both), so a vector can never
    * be both the positive and the negative. Anchors with no positive
    * emit nothing — a triplet without a positive is not a triplet.
    *
    * Scale shape: ONE scored pass (queries broadcast, corpus streamed),
    * one window keyed (query_id, is_pos) for per-band ranks, one
    * query-keyed agg pivoting the two winners into the triplet row.
    * Per-anchor output is exactly one row; the corpus never re-scans.
    */
  def tripletMine(
      corpus: DataFrame, // (vec_id, embedding)
      queries: DataFrame, // (query_id, q_embedding)
      posMinCosineBp: Int,
      skipTop: Int = 0
  ): DataFrame = {
    require(posMinCosineBp > 0 && posMinCosineBp <= 10000,
      s"posMinCosineBp must be in 1..10000, got $posMinCosineBp")
    require(skipTop >= 0, "skipTop must be >= 0")
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        quantDot(col("embedding"), col("q_embedding")).as("dot"),
        quantSqNorm(col("q_embedding")).as("sq_a"),
        quantSqNorm(col("embedding")).as("sq_b"))
      .withColumn("is_pos", cosineAtLeastBp(posMinCosineBp))
    val w = Window.partitionBy(col("query_id"), col("is_pos"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    val ranked = scored.withColumn("rnk", row_number().over(w))
    ranked
      .filter((col("is_pos") && col("rnk") === 1) ||
        (!col("is_pos") && col("rnk") === skipTop + 1))
      .groupBy(col("query_id"))
      .agg(
        max(when(col("is_pos"), struct(col("vec_id"), col("dot"))))
          .as("pos"),
        max(when(!col("is_pos"), struct(col("vec_id"), col("dot"))))
          .as("neg"))
      .filter(col("pos").isNotNull && col("neg").isNotNull)
      .select(
        col("query_id"),
        col("pos.vec_id").as("pos_id"), col("pos.dot").as("pos_dot"),
        col("neg.vec_id").as("neg_id"), col("neg.dot").as("neg_dot"))
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98)
    * diverse top-k selection: greedily pick the candidate maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` — relevance to the query
    * traded against redundancy with what is ALREADY selected. This is
    * the dedup-aware selection step plain top-k lacks: ten near-copies
    * of the best document score ten slots under top-k, one slot here.
    * All arithmetic is exact int64 on the shared ×10⁴ quantization with
    * λ in basis points (`score = lambdaBp·dot − (10000−lambdaBp)·
    * maxSim`; the first pick has no selected set, so its redundancy
    * term is 0), ties broken by vec_id — bit-replayable by the oracle.
    *
    * Greedy MMR is INHERENTLY sequential in k (pick i+1 depends on pick
    * i), so the loop runs k rounds; each round is one distributed
    * scan+TopK job (`orderBy.limit(1)` plans as TakeOrderedAndProject —
    * per-partition top-1 then a k-way driver merge, never a global
    * sort) and collects exactly ONE row. The driver holds the ≤ k
    * selected vectors — the selection OUTPUT, the same driver-sizing
    * contract as [[ivfCentroids]] — and round i scores redundancy as
    * `greatest` over i codegen'd [[quantDot]]s against literal vectors,
    * so expression count grows O(k), fine for the k ≤ 10³ selections
    * MMR is used at (re-ranking a retrieved pool, picking diverse
    * exemplars). The corpus is scanned k times, NOT cached: at 100 TB
    * the caller passes the candidate POOL (e.g. an [[annCandidates]]
    * output), not the raw corpus.
    *
    * Returns (rank, vec_id, score) for the ≤ k selections, in selection
    * order; stops early when candidates run out.
    */
  def mmrSelect(
      corpus: DataFrame, // (vec_id, embedding)
      queryVec: Seq[Float],
      k: Int,
      lambdaBp: Int = 5000
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambdaBp >= 0 && lambdaBp <= 10000,
      s"lambdaBp must be in [0, 10000], got $lambdaBp")
    val spark = corpus.sparkSession
    import spark.implicits._
    val rel = quantDot(col("embedding"), typedlit(queryVec))
    var selected = Vector.empty[(Int, Long, Long)] // (rank, vec_id, score)
    var selVecs = Vector.empty[Seq[Float]]
    var exhausted = false
    while (selected.size < k && !exhausted) {
      val maxSim =
        if (selVecs.isEmpty) lit(0L)
        else if (selVecs.size == 1)
          quantDot(col("embedding"), typedlit(selVecs.head))
        else greatest(
          selVecs.map(v => quantDot(col("embedding"), typedlit(v))): _*)
      val score =
        lit(lambdaBp.toLong) * rel - lit(10000L - lambdaBp) * maxSim
      val picked = corpus
        // null embeddings cannot be scored: dropped up front rather than
        // surfacing as a null-score pick once real candidates run out
        .filter(col("embedding").isNotNull &&
          !col("vec_id").isin(selected.map(_._2): _*))
        .select(col("vec_id"), col("embedding"), score.as("__score"))
        .orderBy(col("__score").desc, col("vec_id").asc)
        .limit(1)
        .collect()
      if (picked.isEmpty) exhausted = true
      else {
        val r = picked.head
        selected :+= ((selected.size + 1, r.getLong(0), r.getLong(2)))
        selVecs :+= r.getSeq[Float](1).toVector
      }
    }
    selected.toDF("rank", "vec_id", "score")
  }

  def recallAtK(
      candidates: DataFrame, // (query_id, vec_id, dot)
      truth: DataFrame, // (query_id, vec_id, dot) — exact scores
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    def topK(df: DataFrame) = df
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select("query_id", "vec_id")
    val dedupedCand = candidates
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("dot")).as("dot"))
    val hits = topK(truth).join(topK(dedupedCand), Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    topK(truth).select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        lit(k).as("k"),
        floor(coalesce(col("hits"), lit(0L)) * 10000.0 / k).cast("long")
          .as("recall_bp"))
  }

  /** Sign-bit LSH bucket id from `nBits` fixed pseudo-random hyperplanes.
    * Hyperplane weights are derived per (bit, dimension) from a splitmix-
    * style integer hash — deterministic, no stored model. Vectors in the
    * same bucket are ANN candidates. One-pass codegen'd expression; the
    * HOF composition below is the tested reference implementation.
    */
  def lshBucket(embedding: Column, dim: Int, nBits: Int = 12): Column =
    bridge(graft.exprs.SignLsh(expr(embedding), nBits)).as("bucket")

  /** HOF reference implementation of [[lshBucket]] (interpreted; kept for
    * the OpsSpec equality test and as documentation of the exact math).
    * Integer weights + quantized embedding — see SignLshImpl's scaladoc.
    */
  def lshBucketHof(embedding: Column, dim: Int, nBits: Int = 12): Column = {
    // zip_with/aggregate HOFs instead of an unrolled nBits×dim expression:
    // the unrolled form costs seconds of whole-stage-codegen compilation
    // for a plan used once, while the HOF form is interpreted but compiles
    // instantly and the per-row work is identical.
    val qe = transform(embedding, x =>
      when(x >= 0, floor(x.cast("double") * 10000.0 + 0.5))
        .otherwise(ceil(x.cast("double") * 10000.0 - 0.5)).cast("long"))
    val bits = (0 until nBits).map { b =>
      val w = array((0 until dim).map(d =>
        lit(graft.exprs.SignLshImpl.weight(b, d))): _*)
      val dot = aggregate(
        zip_with(qe, w, (x, wd) => x * wd),
        lit(0L), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).as("bucket")
  }

  /** ANN via LSH buckets: probe the query's bucket plus `probes` Hamming-1
    * neighbor buckets (0 = single-probe). Returns candidate (query_id,
    * vec_id, dot) — recall grows with `probes` WITHOUT fattening corpus
    * buckets (only the broadcast query side fans out ×(probes+1)); the
    * caller re-ranks. Each (query, vec) pair appears at most once: a
    * query's probe values are all distinct and a corpus vector lives in
    * exactly one bucket.
    *
    * @param excludeSelf drop candidates whose vec_id equals the query_id —
    *   opt-IN for corpus-as-queries callers (see [[topKByDot]]); defaults
    *   to keeping every candidate so disjoint id spaces never lose one to
    *   an id collision.
    */
  def annCandidates(
      corpus: DataFrame,
      queries: DataFrame,
      dim: Int,
      nBits: Int = 12,
      probes: Int = 0,
      excludeSelf: Boolean = false
  ): DataFrame = {
    require(probes >= 0 && probes <= nBits,
      s"probes must be in 0..nBits (=$nBits)")
    val c = corpus.withColumn("bucket", lshBucket(col("embedding"), dim, nBits))
    val qb = queries.withColumn("bucket", lshBucket(col("q_embedding"), dim, nBits))
    val q =
      if (probes == 0) qb
      else qb.select(col("query_id"), col("q_embedding"),
        probeBuckets(col("bucket"), probes).as("bucket"))
    val joined = c.join(broadcast(q), Seq("bucket"))
    (if (excludeSelf) joined.filter(col("query_id") =!= col("vec_id"))
     else joined)
      .select(col("query_id"), col("vec_id"),
        quantDot(col("embedding"), col("q_embedding")).as("dot"))
  }

  // ------------------------------------------------------------- k-means

  /** One Lloyd-step's sufficient statistics, exact-integer: assign every
    * corpus vector to its nearest centroid (the [[ivfListId]] rule —
    * max quantized dot, ties to the smaller list id, the SAME assignment
    * the IVF index uses at query time, so training optimizes the
    * index's own routing), then per (list, dimension) emit the member
    * count and the sum of quantized coordinates. `n` and `qsum` are
    * int64 sums of ×10⁴-quantized values — exact, engine-portable, and
    * everything a driver needs to form the new means (`qsum / n / 10⁴`).
    *
    * Scale shape: assignment is the zero-shuffle [[graft.exprs
    * .IvfProbeLists]] expression; posexplode fans each row out to `dim`
    * fixed-width rows that collapse in ONE partial-agg-friendly
    * groupBy(list, dim) — k·dim result rows total, no iteration state on
    * the executors. This is the distributed half of k-means; the k·dim
    * reduction is the only thing that ever reaches the driver.
    */
  def clusterSums(
      corpus: DataFrame, // (vec_id, embedding)
      centroids: Seq[(Int, Seq[Float])]
  ): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    corpus
      .select(ivfListId(col("embedding"), centroids).as("list_id"),
        posexplode(col("embedding")).as(Seq("dim_idx", "__x")))
      .groupBy(col("list_id"), col("dim_idx"))
      .agg(count(lit(1)).as("n"),
        sum(bridge(graft.exprs.QuantElem(expr(col("__x"))))).as("qsum"))
  }

  /** Chunk→parent embedding POOLING sufficient statistics: per (group,
    * dimension), the member count and the exact int64 sum of ×10⁴-
    * quantized coordinates — the mean-pooled parent embedding real
    * pipelines build when documents are chunked for embedding (chunk
    * vectors in, one document vector out as `qsum / n / 10⁴`). Same
    * exactness contract as [[clusterSums]]; only the grouping key
    * differs (caller-supplied parent id instead of the IVF assignment).
    *
    * Scale shape: posexplode to fixed-width (group, dim, q) rows that
    * collapse in ONE partial-agg-friendly groupBy — output is
    * |groups|·dim rows, embeddings cross the single exchange only as
    * per-dimension partial sums.
    */
  def poolStats(
      df: DataFrame,
      groupCol: Column,
      vecCol: Column
  ): DataFrame =
    df
      .select(groupCol.as("group_id"),
        posexplode(vecCol).as(Seq("dim_idx", "__x")))
      .groupBy(col("group_id"), col("dim_idx"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(bridge(graft.exprs.QuantElem(expr(col("__x"))))).as("qsum"))

  /** Lloyd iterations over [[clusterSums]]: each round assigns (zero
    * shuffles), reduces to k·dim sufficient-statistic rows, and the
    * driver forms the new centroids — mean per dimension, then (spherical
    * k-means, the right objective for a DOT-product index) rescaled to
    * unit L2 norm so max-dot assignment equals nearest-by-angle and a
    * large-norm centroid cannot capture everything. A cluster that loses
    * all members keeps its previous centroid. The driver-side collect is
    * k·dim rows per round — the irreducible k-means synchronization
    * point, identical in role to [[ivfCentroids]]'s documented driver
    * sizing; vectors themselves never leave the executors.
    */
  def kmeansTrain(
      corpus: DataFrame,
      init: Seq[(Int, Seq[Float])],
      iters: Int,
      spherical: Boolean = true
  ): Seq[(Int, Seq[Float])] = {
    require(iters >= 0, "iters must be non-negative")
    var cents = init
    for (_ <- 0 until iters) {
      val stats = clusterSums(corpus, cents).collect()
        .groupBy(_.getInt(0))
        .map { case (lid, rows) =>
          val dims = rows.map(r =>
            (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
          val n = dims.head._2
          lid -> dims.map { case (_, _, qsum) =>
            (qsum.toDouble / n / 10000.0).toFloat }.toSeq
        }
      cents = cents.map { case (lid, old) =>
        stats.get(lid) match {
          case None => (lid, old) // empty cluster: keep previous centroid
          case Some(mean) =>
            if (!spherical) (lid, mean)
            else {
              val norm = math.sqrt(mean.map(x => x.toDouble * x).sum)
              if (norm == 0.0) (lid, old)
              else (lid, mean.map(x => (x / norm).toFloat))
            }
        }
      }
    }
    cents
  }

  /** SemDedup (semantic dedup, Abbas et al. 2023's shape): partition the
    * corpus into IVF lists by nearest centroid, find within-list pairs
    * whose exact quantized cosine clears `minCosineBp`, resolve them to
    * connected components, and keep one vector (the min id) per
    * component. Output is a TOTAL assignment: one row per corpus vector
    * with its list, component label and keep decision — unpaired vectors
    * are their own singleton component.
    *
    * Scale shape: assignment is the zero-shuffle [[ivfListId]] expression
    * (centroids ride as data); pair generation shuffles only (vec_id,
    * list_id) rows keyed by list, never embeddings; scoring joins
    * embeddings by single id; component resolution is
    * [[Clusters.connectedComponents]] (per-round joins keyed on vertex
    * id). The within-list pairing is SemDedup's defining approximation —
    * cross-list near-dups are invisible by design (that loss is the
    * price of never comparing all pairs) — and `maxListSize` caps the
    * in-list O(n²/k): an oversized list (degenerate centroid) produces
    * no pairs and is surfaced by [[semDedupDroppedLists]], mirroring the
    * LSH hot-bucket audit.
    */
  def semDedup(
      corpus: DataFrame, // (vec_id, embedding)
      centroids: Seq[(Int, Seq[Float])],
      minCosineBp: Int,
      maxListSize: Int = 10000,
      maxIters: Int = 20
  ): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(minCosineBp > 0 && minCosineBp <= 10000,
      s"minCosineBp must be in 1..10000 (= cosine 0..1], got $minCosineBp)")
    require(maxListSize > 1, s"maxListSize must be > 1, got $maxListSize")
    val assigned = corpus.select(col("vec_id"),
      ivfListId(col("embedding"), centroids).as("list_id"))
    val ok = assigned.groupBy(col("list_id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1 && col("__n") <= maxListSize)
      .select("list_id")
    val okIds = assigned.join(ok, Seq("list_id"))
    val cand = okIds.select(col("list_id"), col("vec_id").as("a"))
      .join(okIds.select(col("list_id"), col("vec_id").as("b")), Seq("list_id"))
      .filter(col("a") < col("b"))
      .select("a", "b")
    val ea = corpus.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val eb = corpus.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val pairs = cand
      .join(ea, Seq("a"))
      .join(eb, Seq("b"))
      .select(
        col("a"), col("b"),
        quantDot(col("ea"), col("eb")).as("dot"),
        quantSqNorm(col("ea")).as("sq_a"),
        quantSqNorm(col("eb")).as("sq_b"))
      .filter(cosineAtLeastBp(minCosineBp))
      .select("a", "b")
    val labels = Clusters.connectedComponents(pairs, maxIters = maxIters)
      .withColumnRenamed("id", "vec_id")
    assigned
      .join(labels, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("list_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"),
        (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id"))
          .as("is_keeper"))
  }

  /** IVF lists the `maxListSize` cap silences in [[semDedup]]: one row
    * per oversized list with its vector count — the audit that keeps a
    * degenerate centroid (half the corpus in one list) from silently
    * disabling semantic dedup for that mass.
    */
  def semDedupDroppedLists(
      corpus: DataFrame,
      centroids: Seq[(Int, Seq[Float])],
      maxListSize: Int = 10000
  ): DataFrame =
    corpus
      .select(ivfListId(col("embedding"), centroids).as("list_id"))
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > maxListSize)

  // --- product quantization -------------------------------------------------

  /** PQ codebooks as a driver-side tensor: the `k` lowest-id corpus
    * vectors' subvectors, split into `m` equal-width contiguous
    * subspaces — `books(i)(j)` is subspace i's j-th centroid and codes
    * index that order. The deterministic id sample stands in for trained
    * per-subspace k-means exactly as [[ivfCentroids]]' sample stands in
    * for trained IVF centroids (swap in [[kmeansStep]] output per
    * subspace in production; the encode/search structure is identical).
    * Payload is m·k·(dim/m) = k·dim floats of plain data — the same
    * driver sizing note as [[ivfCentroids]].
    */
  def pqBooks(corpus: DataFrame, m: Int, k: Int): Seq[Seq[Seq[Float]]] = {
    require(m >= 1, s"need >= 1 subspace, got $m")
    require(k >= 1, s"need >= 1 centroid per codebook, got $k")
    val rows = corpus.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(k)
      .collect().map(_.getSeq[Float](1))
    require(rows.nonEmpty, "pqBooks: empty corpus")
    val dim = rows(0).length
    require(dim % m == 0,
      s"embedding dim $dim must split into m=$m equal-width subspaces")
    val sub = dim / m
    (0 until m).map(i => rows.toSeq.map(v => v.slice(i * sub, (i + 1) * sub)))
  }

  private def packBooks(
      books: Seq[Seq[Seq[Float]]]): Array[Array[Array[Long]]] =
    books.map(_.map(
      _.map(v => graft.exprs.QuantVec.q(v.toDouble)).toArray).toArray).toArray

  /** PQ codes for a vector: `array<int>` of length m, code i = the row of
    * codebook i nearest to subspace i in exact quantized squared L2
    * (ties to the smaller code). ONE reference-object expression
    * ([[graft.exprs.PqEncode]]) — zero shuffles, O(1) plan size at any
    * m·k, the same data-path engineering as [[ivfProbeLists]].
    */
  def pqEncode(embedding: Column, books: Seq[Seq[Seq[Float]]]): Column =
    bridge(graft.exprs.PqEncode(expr(embedding), packBooks(books)))

  /** Asymmetric-distance (ADC) lookup: the exact int64 PQ approximation
    * of ||query − x||² for a CODED vector x — `Σᵢ tableᵢ[codeᵢ]` with
    * `tableᵢ[j] = ||q(query subspace i) − booksᵢⱼ||²` precomputed
    * driver-side (m·k longs per query, ONE typed literal in the plan).
    * This is how a PQ index scans 10¹² vectors: codes stream, the query
    * never meets a float vector, and the per-row cost is m array lookups
    * + m adds. Integer-exact end to end, so it sits under the hard
    * oracle.
    */
  def pqAdcDist(
      codes: Column,
      query: Seq[Float],
      books: Seq[Seq[Seq[Float]]]
  ): Column = {
    val packed = packBooks(books)
    val qq = query.map(v => graft.exprs.QuantVec.q(v.toDouble)).toArray
    var off = 0
    val tables: Seq[Seq[Long]] = packed.toSeq.map { book =>
      val sub = book(0).length
      val t = book.toSeq.map { c =>
        var s = 0L
        var d = 0
        while (d < sub) { val x = qq(off + d) - c(d); s += x * x; d += 1 }
        s
      }
      off += sub
      t
    }
    require(off == query.length,
      s"query dim ${query.length} != codebook subspace widths summing to $off")
    aggregate(
      zip_with(codes, typedlit(tables),
        (code, table) => element_at(table, code + 1)),
      lit(0L), (acc, x) => acc + x)
  }
}
