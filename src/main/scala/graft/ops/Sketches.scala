package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.exprs.{BloomImpl, BloomProbe, KMinHashAgg}

/** Deterministic, exactly-replayable sketches for corpus-scale set
  * questions: KMV order statistics for distinct cardinality and a
  * packed Bloom filter for membership pre-filtering. Both are mergeable
  * with O(sketch) state — the only structures that answer "how many
  * distinct / have we seen this" over 100 TB without shuffling the raw
  * key stream — and both are built on the repo's fmix64 bijection, so a
  * SQL oracle replays every bit (no RNG, no JVM-private hash seeds).
  */
object Sketches {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column) =
    org.apache.spark.sql.GraftBridge.expression(c)

  import ExactU64.{dec38, two64, unsignedDec, floorDiv}

  /** Per-group distinct-cardinality estimate via the k-minimum-values
    * sketch: group rows by `groupCols`, mix `idCol` through the fmix64
    * bijection (distinct ids ⇒ distinct hashes, so the order statistic
    * is exact, not probabilistic-in-collisions), keep the k smallest
    * (unsigned) values with O(k) mergeable state ([[KMinHashAgg]]), and
    * estimate
    *
    *   n_distinct ≈ floor((k−1)·2^64 / (u_(k) + 1))
    *
    * where u_(k) is the k-th smallest unsigned hash. When a group holds
    * fewer than k distinct ids the sketch saw the entire set and the
    * count is EXACT (`est_exact = true`).
    *
    * Scale shape: one partial-agg shuffle where only O(k)-long arrays
    * cross the wire — never the id stream itself; the estimator math is
    * pure projection on one row per group. Nothing touches the driver,
    * and sketches for disjoint corpus slices union by re-aggregating
    * the arrays (exploded) through the same aggregate.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int
  ): DataFrame =
    kmvEstimate(kmvSketch(df, groupCols, idCol, k), groupCols, k)

  /** The raw sketch frame: one row per group with `n_ids` (non-null id
    * count) and `mins` (the ascending unsigned k-minimum array). This is
    * the MATERIALIZABLE artifact — persist it per corpus slice / day /
    * source and re-aggregate later: KMV merge is lossless (the k
    * smallest of a union are among the k smallest of each part), so
    * estimates from merged sketches equal estimates from scratch.
    */
  def kmvSketch(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int
  ): DataFrame = {
    val mixed = Curation.shuffleKey(col(idCol))
    val agg = bridge(KMinHashAgg(expr(mixed), k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(col(idCol)).as("n_ids"),
        agg.as("mins"))
  }

  /** Merge sketches down to a coarser grouping: explode the min-arrays
    * and push them through the SAME bounded aggregate (values are
    * already mixed — no re-hash), summing the id counts. Input rows are
    * [[kmvSketch]] outputs at any finer grouping; output is a sketch
    * frame at `groupCols`. Only k-long arrays are read or shuffled.
    */
  def kmvMergeSketches(
      sketches: DataFrame,
      groupCols: Seq[String],
      k: Int
  ): DataFrame = {
    val agg = bridge(
      KMinHashAgg(expr(col("__v")), k).toAggregateExpression())
    sketches
      // outer explode keeps all-empty parts alive (their group must
      // still appear, with n_ids 0); count each SOURCE row's n_ids once
      // (at element position 0) since the explode repeats it per element
      .select((groupCols.map(col) :+ col("n_ids") :+
        posexplode_outer(col("mins")).as(Seq("pos", "__v"))): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(coalesce(col("pos"), lit(0)) === 0, col("n_ids"))
          .otherwise(0L)).as("n_ids"),
        agg.as("mins"))
      .select((groupCols.map(col) :+ col("n_ids") :+ col("mins")): _*)
  }

  /** Estimator projection over a sketch frame (from [[kmvSketch]] or
    * [[kmvMergeSketches]]): k_used, the k-th unsigned minimum, and
    *
    *   n_distinct ≈ floor((k−1)·2^64 / (u_(k) + 1))
    *
    * — EXACT (`est_exact = true`) when the group held fewer than k
    * distinct ids. Pure projection; no data motion.
    */
  def kmvEstimate(
      sketches: DataFrame,
      groupCols: Seq[String],
      k: Int
  ): DataFrame =
    sketches.select(
      (groupCols.map(col) ++ Seq(
        col("n_ids"),
        size(col("mins")).cast("long").as("k_used"),
        when(size(col("mins")) > 0,
          unsignedDec(element_at(col("mins"), size(col("mins")))))
          .as("kth_hash_u"),
        when(size(col("mins")) < k,
          size(col("mins")).cast("long").cast(dec38))
          .otherwise(floorDiv(
            lit((k - 1).toLong).cast(dec38) * two64,
            unsignedDec(element_at(col("mins"), size(col("mins"))))
              + lit(1L).cast(dec38)))
          .as("est_distinct"),
        (size(col("mins")) < k).as("est_exact"))): _*)

  /** Pairwise OVERLAP matrix between groups from their KMV sketches —
    * "how much does crawl A's id universe intersect crawl B's" for every
    * pair, WITHOUT touching full data again. For each unordered pair the
    * k smallest of the union of the two sketches are (provably) the KMV
    * sketch of the union; the fraction of them present in BOTH sketches
    * is the standard k-min-values Jaccard estimator (Beyer et al.,
    * SIGMOD 2007):  J ≈ n_common / k_used, and the intersection size
    * follows as J · |A ∪ B| with [[kmvEstimate]] on the union sketch.
    * Emitted as exact integers (n_common, k_used, jaccard_bp) so the
    * estimator itself replays bit-for-bit; `exact = true` (both sides
    * under k) means n_common IS the true intersection count.
    *
    * Scale shape: input is the |groups|-row sketch frame — full data was
    * touched once by [[kmvSketch]]; the pair join is |groups|² rows of
    * k-long arrays, array math codegen'd per pair. Elements are compared
    * in the unsigned decimal domain (the sketch stores signed longs in
    * unsigned order — a signed array_sort would be wrong).
    */
  def kmvOverlapMatrix(
      sketches: DataFrame,
      groupCol: String,
      k: Int
  ): DataFrame = {
    val toU = (c: Column) =>
      transform(c, x => when(x < 0L, x.cast(dec38) + two64)
        .otherwise(x.cast(dec38)))
    val a = sketches.select(col(groupCol).as("src_a"),
      toU(col("mins")).as("__ma"), col("n_ids").as("n_a"))
    val b = sketches.select(col(groupCol).as("src_b"),
      toU(col("mins")).as("__mb"), col("n_ids").as("n_b"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("__x",
        slice(array_sort(array_union(col("__ma"), col("__mb"))), 1, k))
      .withColumn("k_used", size(col("__x")))
      .withColumn("n_common", size(filter(col("__x"),
        x => array_contains(col("__ma"), x) && array_contains(col("__mb"), x))))
      .withColumn("jaccard_bp",
        when(col("k_used") === 0, 0L)
          .otherwise(call_function("div",
            col("n_common").cast("long") * 10000L,
            col("k_used").cast("long"))))
      .withColumn("exact",
        size(col("__ma")) < k && size(col("__mb")) < k)
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("k_used"), col("n_common"), col("jaccard_bp"), col("exact"))
  }

  /** Build a packed Bloom filter over an int64 key column as a
    * (word_idx, bits) frame: each key sets `nHashes` bit positions
    * (fmix64 of key ⊕ j·φ, see [[BloomImpl]]) in an m = nWords·63-bit
    * array. One partial-agg shuffle keyed by word_idx (bit_or combines
    * map-side), output is exactly `≤ nWords` rows no matter the corpus
    * size — broadcastable state, the point of the structure.
    */
  def bloomBuild(
      df: DataFrame,
      keyCol: Column,
      nWords: Int,
      nHashes: Int
  ): DataFrame = {
    require(nWords > 0, "nWords must be positive")
    require(nHashes > 0 && nHashes <= 16, "nHashes must be in [1, 16]")
    val m = nWords.toLong * BloomImpl.BitsPerWord
    // salts precomputed on the JVM (wrapping multiply) — ANSI-safe
    val salts = (0 until nHashes).map(j => j.toLong * BloomImpl.Phi)
    df.select(keyCol.cast("long").as("__key"))
      .filter(col("__key").isNotNull)
      .select(col("__key"),
        explode(array(salts.map(lit(_)): _*)).as("__salt"))
      .select(
        (shiftrightunsigned(
          Curation.shuffleKey(col("__key").bitwiseXOR(col("__salt"))), 1)
          % m).as("__pos"))
      .select(
        (col("__pos") / BloomImpl.BitsPerWord).cast("int").as("word_idx"),
        call_function("shiftleft", lit(1L),
          (col("__pos") % BloomImpl.BitsPerWord).cast("int")).as("__mask"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("__mask")).as("bits"))
  }

  /** Assemble a built filter into the packed long[] the probe expression
    * carries. The collect is bounded by `nWords` — a CONFIG constant
    * (8 B/word ⇒ a 1-in-10⁶-FP filter over 10⁹ keys is ~2.7 GB; size it
    * for the driver/executor budget like any broadcast). Words never set
    * by the build are zero.
    */
  def bloomWords(built: DataFrame, nWords: Int): Array[Long] = {
    val words = new Array[Long](nWords)
    built.select(col("word_idx"), col("bits")).collect().foreach { r =>
      words(r.getInt(0)) = r.getLong(1)
    }
    words
  }

  /** Probe: adds `bloom_hit` — true iff every probe bit of `keyCol` is
    * set. Zero-shuffle codegen'd projection with the filter as a
    * reference object ([[BloomProbe]]); no false negatives, so
    * `bloom_hit = false` rows can skip any exact check, and only the
    * (FP-rate-bounded) positives pay the real join.
    */
  def bloomMightContain(
      df: DataFrame,
      keyCol: Column,
      words: Array[Long],
      nHashes: Int
  ): DataFrame =
    df.withColumn("bloom_hit",
      bridge(BloomProbe(expr(keyCol.cast("long")), words, nHashes)))

  /** Count-Min sketch BUILD over an int64 key column: `depth` rows of
    * `width` counters; key x increments counter
    * (fmix64(x ⊕ d·φ) >>> 1) mod width in every row d. Output is the
    * sketch as DATA — at most depth·width rows of (row_idx,
    * counter_idx, cnt) no matter the corpus size — built in ONE
    * partial-agg shuffle keyed by (row, counter). Sketches for corpus
    * slices merge by unioning and re-summing (counter-wise add), the
    * same lossless-rollup story as [[kmvMergeSketches]].
    *
    * Estimates (see [[cmsEstimate]]) are deterministic and one-sided:
    * est(x) ≥ true(x) always, with overestimate bounded by the standard
    * e·n/width at confidence 1 − e^−depth. The frequency complement to
    * KMV (how many distinct) and Bloom (have we seen): how OFTEN — the
    * bounded-memory heavy-hitter / hot-key detector for a stream too
    * large to groupBy.
    */
  def cmsBuild(
      df: DataFrame,
      keyCol: Column,
      depth: Int,
      width: Int
  ): DataFrame = {
    require(depth > 0 && depth <= 8, "depth must be in [1, 8]")
    require(width > 0, "width must be positive")
    val salts = (0 until depth).map(j => j.toLong * BloomImpl.Phi)
    df.select(keyCol.cast("long").as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"),
        explode(array(salts.zipWithIndex.map { case (s, j) =>
          struct(lit(j).as("row_idx"), lit(s).as("__salt"))
        }: _*)).as("__x"))
      .select(col("__x.row_idx").as("row_idx"),
        (shiftrightunsigned(
          Curation.shuffleKey(col("__k").bitwiseXOR(col("__x.__salt"))), 1)
          % width.toLong).as("counter_idx"))
      .groupBy(col("row_idx"), col("counter_idx"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min LOOKUP: per DISTINCT row of `queries`, the sketch
    * estimate min over depth rows of that key's counter (absent counter
    * = 0). SET semantics: the final min-groupBy keys on all of
    * `queries`' columns, so byte-identical query rows collapse to one
    * output row — pass distinct keys (or a distinguishing id column)
    * when multiplicity matters. The sketch frame is broadcast
    * (≤ depth·width rows by construction), so the query side never
    * shuffles for the lookup — only its own final min-groupBy.
    */
  def cmsEstimate(
      queries: DataFrame,
      keyCol: Column,
      sketch: DataFrame,
      depth: Int,
      width: Int
  ): DataFrame = {
    require(depth > 0 && depth <= 8, "depth must be in [1, 8]")
    val reserved = Seq("__k", "__x", "row_idx", "counter_idx", "cnt",
      "est_count")
    require(!reserved.exists(queries.columns.contains),
      s"cmsEstimate reserves the column names ${reserved.mkString(", ")}")
    val salts = (0 until depth).map(j => j.toLong * BloomImpl.Phi)
    val outCols = queries.columns.map(col).toSeq
    queries
      .withColumn("__k", keyCol.cast("long"))
      .select((outCols :+ col("__k") :+
        explode(array(salts.zipWithIndex.map { case (s, j) =>
          struct(lit(j).as("row_idx"), lit(s).as("__salt"))
        }: _*)).as("__x")): _*)
      .select((outCols :+ col("__x.row_idx").as("row_idx") :+
        (shiftrightunsigned(
          Curation.shuffleKey(col("__k").bitwiseXOR(col("__x.__salt"))), 1)
          % width.toLong).as("counter_idx")): _*)
      .join(broadcast(sketch), Seq("row_idx", "counter_idx"), "left")
      .groupBy(outCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** EXACT membership of `newDf[keyName]` in `oldKeys[keyName]` with the
    * Bloom no-false-negative guarantee as the fast path: every row gets
    * `bloom_hit`; rows with `bloom_hit = false` are definitively
    * non-members and NEVER enter the confirm join — only the positives
    * (true members + the FP-rate sliver) do. The result is exact
    * (`is_member`), not probabilistic: the filter only routes.
    *
    * Scale shape: the new side's join input shrinks from |new| to
    * |members| + FP·|new| — at a typical 1% duplicate rate and 10⁻³ FP
    * rate, ~99% of a 100 TB ingest skips the shuffle entirely. The old
    * side still feeds the confirm join once (distinct keys); keep the
    * standing index pre-partitioned by key so that side's exchange
    * disappears too.
    */
  def membershipWithBloomFastPath(
      newDf: DataFrame,
      keyName: String,
      oldKeys: DataFrame,
      nWords: Int,
      nHashes: Int
  ): DataFrame = {
    val words = bloomWords(
      bloomBuild(oldKeys, col(keyName), nWords, nHashes), nWords)
    val probed = bloomMightContain(newDf, col(keyName), words, nHashes)
    val outCols = (newDf.columns :+ "bloom_hit").map(col).toSeq
    // a NULL key probes to bloom_hit = NULL and is a member of nothing
    // (equi-join semantics) — it must still appear in the output, so the
    // miss branch keeps it rather than letting two positive filters drop
    // the row between them
    val misses = probed.filter(col("bloom_hit").isNull || !col("bloom_hit"))
      .select(outCols: _*)
      .withColumn("is_member", lit(false))
    val confirmed = probed.filter(col("bloom_hit"))
      .join(
        oldKeys.select(col(keyName).cast("long").as("__ok")).distinct()
          .withColumn("__m", lit(true)),
        col(keyName).cast("long") === col("__ok"), "left")
      .select((outCols :+
        coalesce(col("__m"), lit(false)).as("is_member")): _*)
    misses.unionByName(confirmed)
  }

  /** HyperLogLog registers AS DATA — the industry-standard mergeable
    * cardinality sketch, built so every register byte sits under the
    * hard SQL oracle: the hash is the first 60 bits of md5 (the
    * engine-portable digest [[Dedup]] already replays via hex-digit
    * sums), bucket = k mod 2^p, and ρ = leading-zero count of the
    * remaining w = 60−p bits plus one, computed as w+1−bitlen via
    * `bin()` string length (identical unpadded semantics in Spark and
    * DuckDB — no float log2). Output: (bucket, max_rho), ≤ 2^p rows.
    * EMPTY buckets are absent — [[hllEstimate]] counts them as zeros;
    * a merge ([[hllMerge]]) is a groupBy-max, associative and
    * commutative, so per-partition / per-day register sets roll up
    * without touching raw keys. NULL values are excluded.
    *
    * Scale shape: one scan-fused projection + one partial-agg shuffle
    * whose payload is (bucket, rho) — max combines map-side, so the
    * exchange carries at most 2^p rows per task regardless of input
    * size. Estimation error is the standard 1.04/√m.
    */
  def hllRegisters(df: DataFrame, value: Column, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, "p must be in 4..14 (m = 2^p registers)")
    val m = 1L << p
    val w = 60 - p
    val k = conv(substring(md5(value.cast("binary")), 1, 15), 16, 10)
      .cast("long")
    df.filter(value.isNotNull)
      .select(k.as("__k"))
      .select((col("__k") % m).as("bucket"),
        call_function("div", col("__k"), lit(m)).as("__r"))
      .select(col("bucket"),
        when(col("__r") === 0L, lit(w + 1))
          .otherwise(lit(w + 1) - length(bin(col("__r"))))
          .cast("int").as("__rho"))
      .groupBy(col("bucket"))
      .agg(max(col("__rho")).as("max_rho"))
  }

  /** Per-group HLL registers — "distinct users per source at 100 TB"
    * as (group…, bucket, max_rho), ≤ 2^p rows per group. Same hash /
    * rho arithmetic as [[hllRegisters]]; the one exchange is keyed
    * (group, bucket) and max combines map-side. A group's registers
    * merge with another run's via [[hllMerge]] grouped the same way.
    */
  def hllRegistersBy(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      p: Int = 8
  ): DataFrame = {
    require(p >= 4 && p <= 14, "p must be in 4..14 (m = 2^p registers)")
    require(groupCols.nonEmpty, "groupCols must be non-empty; " +
      "use hllRegisters for the ungrouped sketch")
    val m = 1L << p
    val w = 60 - p
    val k = conv(substring(md5(value.cast("binary")), 1, 15), 16, 10)
      .cast("long")
    df.filter(value.isNotNull)
      .select(groupCols.map(col) :+ k.as("__k"): _*)
      .withColumn("bucket", col("__k") % m)
      .withColumn("__r", call_function("div", col("__k"), lit(m)))
      .withColumn("__rho",
        when(col("__r") === 0L, lit(w + 1))
          .otherwise(lit(w + 1) - length(bin(col("__r")))).cast("int"))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rho")).as("max_rho"))
  }

  /** Merge two register sets (same p): bucket-wise max. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))

  /** Standard HLL estimate with the small-range (linear counting)
    * correction. Driver-side on the ≤ 2^p register rows — the sketch
    * IS driver-sized by construction. Float by nature (the estimate is
    * approximate); the registers, not this number, sit under the
    * oracle.
    */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1L << p
    val regs = registers.select(col("bucket").cast("long"),
        col("max_rho").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    require(regs.keys.forall(b => b >= 0 && b < m), "bucket out of range")
    val zeros = m - regs.size
    val denom = regs.values.map(v => math.pow(2.0, -v)).sum + zeros.toDouble
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / denom
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Base-2 log-histogram sketch (DDSketch's shape at γ = 2) over a
    * NON-NEGATIVE integer column: bucket(0) = 0, bucket(v ≥ 1) =
    * bitlength(v), i.e. bucket b ≥ 1 covers [2^(b−1), 2^b − 1]. At most
    * 65 (group, bucket, cnt) rows per group no matter the corpus size,
    * built in ONE map-side-combinable shuffle; slices merge by unioning
    * and re-summing (counter-wise add — [[logHistMerge]]), the lossless
    * rollup the EXACT quantile family can't offer: where
    * [[Stats.exactGroupedQuantiles]] re-scans the corpus per question,
    * this sketch answers any quantile later, from O(65) state, within a
    * guaranteed factor-2 bracket. The bucket function is
    * `length(bin(v))` — the engine-portable bitlength idiom the HLL rho
    * already relies on (bin() is unpadded in both engines, no float
    * log2). Negative values fail loud.
    */
  def logHistogram(df: DataFrame, groupCol: String, value: Column): DataFrame = {
    val guarded = when(value < 0L, raise_error(concat(
      lit("logHistogram: negative value "), value.cast("string"),
      lit(" — the log bucket is defined for v >= 0 only"))))
      .otherwise(value.cast("long"))
    df.groupBy(col(groupCol),
        when(guarded === 0L, 0L)
          .otherwise(length(bin(guarded)).cast("long")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Lossless counter-wise merge of two log-histogram sketches. */
  def logHistMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile BRACKETS from a log-histogram sketch: per group and level q
    * (basis points), the rank-selected bucket b — the same division-free
    * integer rank arithmetic as [[Stats.exactGroupedQuantiles]], applied
    * to ≤ 65 bucket rows — reported as [q<bp>_lo, q<bp>_hi] =
    * [2^(b−1), 2^b − 1]: the true exact quantile provably lies inside
    * (relative error ≤ 2×). Output: (group, n, q<bp>_lo, q<bp>_hi, ...).
    */
  def logHistQuantiles(
      sketch: DataFrame,
      groupCol: String,
      qsBp: Seq[Int]
  ): DataFrame = {
    require(qsBp.nonEmpty && qsBp.forall(q => q > 0 && q <= 10000),
      "quantiles are basis points in 1..10000")
    require(qsBp.distinct.size == qsBp.size,
      s"duplicate quantile levels: ${qsBp.mkString(", ")}")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val cum = sketch
      .withColumn("__cum", sum(col("cnt")).over(w1))
      .withColumn("__n", sum(col("cnt")).over(wAll))
    val picks = qsBp.flatMap { q =>
      val qn = lit(q.toLong) * col("__n")
      val isPick = col("__cum") * 10000L >= qn &&
        (col("__cum") - col("cnt")) * 10000L < qn
      val b = max(when(isPick, col("bucket")))
      Seq(
        when(b === 0L, 0L)
          .otherwise(call_function("shiftleft", lit(1L),
            (b - 1L).cast("int"))).as(s"q${q}_lo"),
        when(b === 0L, 0L)
          .otherwise(call_function("shiftleft", lit(1L),
            b.cast("int")) - 1L).as(s"q${q}_hi"))
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), picks: _*)
  }
}
