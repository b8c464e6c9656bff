package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.exprs.{SimHash, SimHash64}
import graft.ops.TextStats

/** Ops vs naive in-memory oracles (the non-SQL-expressible operators). */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("simhash64 matches naive oracle and clusters near-duplicates") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "completely different content about spark engines")
    )
    val got = docs.toDF("doc_id", "text")
      .select($"doc_id", SimHash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    // oracle: same algorithm, plain Scala (independent codepath from codegen)
    docs.foreach { case (id, text) =>
      assert(got(id) == SimHash.simhash64(text), s"doc $id")
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(0L), got(1L)) < hamming(got(0L), got(2L)))
  }

  test("LSH ANN candidates are a subset of brute-force scores, with recall") {
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val brute = Similarity.topKByDot(e, q, 10, excludeSelf = true)
      .select("query_id", "vec_id", "dot")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val cand = Similarity.annCandidates(e, q, dim = 64, nBits = 8, excludeSelf = true)
      .as[(Long, Long, Long)].collect()
    // same dot products wherever both computed
    val full = Similarity.topKByDot(e, q, Int.MaxValue, excludeSelf = true)
      .select("query_id", "vec_id", "dot")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    cand.foreach { case (qid, vid, dot) =>
      assert(full((qid, vid)) == dot, s"dot mismatch ($qid,$vid)")
    }
    // buckets are self-consistent: every query finds SOME candidates
    // (8-bit sketch on 500 vecs ⇒ non-empty buckets with high probability)
    assert(cand.nonEmpty)
  }

  test("ANN self-exclusion is opt-in across the whole family: a query/" +
    "corpus id collision in disjoint id spaces never drops a candidate") {
    // corpus vec 1 and query 1 share the NUMBER 1 but identify different
    // objects; the query embedding equals vec 1's so they share a bucket
    val e = (1L to 5L)
      .map(i => (i, Array.fill(64)(i.toFloat / 10f)))
      .toDF("vec_id", "embedding")
    val q = Seq((1L, Array.fill(64)(0.1f))).toDF("query_id", "q_embedding")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").as[Long].collect().toSet
    // default: candidate kept everywhere
    assert(ids(Similarity.topKByDot(e, q, 5)).contains(1L))
    assert(ids(Similarity.annCandidates(e, q, dim = 64, nBits = 8))
      .contains(1L))
    assert(ids(Similarity.annIvf(e, q,
      centroids = Seq((0, Array.fill(64)(0.1f).toSeq)), nProbe = 1))
      .contains(1L))
    // corpus-as-queries opt-in: the self pair is dropped everywhere
    assert(!ids(Similarity.topKByDot(e, q, 5, excludeSelf = true))
      .contains(1L))
    assert(!ids(Similarity.annCandidates(e, q, dim = 64, nBits = 8,
      excludeSelf = true)).contains(1L))
    assert(!ids(Similarity.annIvf(e, q,
      centroids = Seq((0, Array.fill(64)(0.1f).toSeq)), nProbe = 1,
      excludeSelf = true)).contains(1L))
  }

  test("minhashPairs hot-bucket cap bounds pair output and reports drops") {
    // 200 identical boilerplate docs + 2 genuine near-dups
    val boiler = (0L until 200L).map(i => (i, "copy paste boilerplate text " +
      "that is exactly the same in every single document here"))
    val near = Seq(
      (1000L, "a unique document about spark physical plans and shuffles"),
      (1001L, "a unique document about spark physical plans and shuffle"))
    val df = (boiler ++ near).toDF("doc_id", "text")
    val capped = Dedup.minhashPairs(df, "doc_id", "text",
      maxBucketSize = 50)
    val pairs = capped.as[(Long, Long)].collect().toSet
    // boilerplate buckets (200 docs) dropped; near-dup pair survives
    assert(pairs.contains((1000L, 1001L)))
    assert(pairs.forall { case (a, b) => a >= 1000L && b >= 1000L },
      "boilerplate pairs leaked through the cap")
    val dropped = Dedup.droppedHotBuckets(df, "doc_id", "text",
      maxBucketSize = 50).collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) == 200L))
    // uncapped (default 10000) still yields the boilerplate pairs
    val uncapped = Dedup.minhashPairs(df, "doc_id", "text")
    assert(uncapped.count() > 1000L)
  }

  test("lshTuningCurve: nested band splits give monotone candidates and " +
    "recall; counters equal per-config minhashPairs; truth join exact") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 30).map(i => s"w$i")
    def doc(n: Int) = (0 until n).map(_ => vocab(rnd.nextInt(30))).mkString(" ")
    // pairs of near-identical docs (one word changed) + unrelated docs
    val rows = (0L until 20L).flatMap { i =>
      val base = doc(25)
      Seq((2 * i, base), (2 * i + 1, base.replaceFirst("w\\d+", "zz")))
    } ++ (100L until 120L).map(i => (i, doc(25)))
    val df = rows.toDF("doc_id", "text")
    val truth = SSJoin.jaccardJoinExact(df, "doc_id", "text", k = 3,
      tauBp = 5000, maxPrefixDf = 1000000L)
    val curve = Dedup.lshTuningCurve(df, "doc_id", "text", k = 8,
        bandConfigs = Seq(1, 2, 4, 8), shingleLen = 3, truthPairs = truth)
      .orderBy("bands")
      .select("bands", "n_candidates", "n_true", "n_truth", "recall_bp",
        "precision_bp")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(curve.map(_._1) == Seq(1, 2, 4, 8))
    // nested splits: candidate and true-hit counts monotone in bands
    assert(curve.map(_._2) == curve.map(_._2).sorted)
    assert(curve.map(_._3) == curve.map(_._3).sorted)
    assert(curve.map(_._4).distinct.size == 1) // one truth denominator
    // per-config counters equal a direct minhashPairs run
    val direct = Dedup.minhashPairs(df, "doc_id", "text", k = 8, bands = 4,
      shingleLen = 3).count()
    assert(curve.find(_._1 == 4).get._2 == direct)
    // at 8 bands of 1 row recall should be high on one-word edits
    assert(curve.last._5 >= 8000L, s"recall ${curve.last._5}")
  }

  test("nearDupPairs fails fast above maxCorpus; LSH path agrees on hits") {
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val ex = intercept[IllegalArgumentException] {
      Similarity.nearDupPairs(e, minDot = 0L, maxCorpus = 10L)
    }
    assert(ex.getMessage.contains("brute-force"))
    // LSH pairs are a subset of brute pairs with identical dots
    val brute = Similarity.nearDupPairs(e, minDot = 0L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.nearDupPairsLsh(e, minDot = 0L, dim = 64, nBits = 6)
      .as[(Long, Long, Long)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, b, dot) =>
      assert(brute((a, b)) == dot, s"dot mismatch ($a,$b)")
    }
  }

  test("nearDupPairsLsh memory shape: id-only buckets, dim-512 full bucket") {
    // 40 identical dim-512 vectors => one guaranteed-full bucket. Before
    // the id-only self-join shape, this bucket's row held 40 × 512 floats
    // (and O(b²) struct pairs); now no row carries more than two vectors.
    val base = (0 until 512).map(d => 0.5f + 0.0001f * (d % 7))
    val df = (0L until 40L).map(i => (i, base)).toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairsLsh(df, minDot = 0L, dim = 512,
      nBits = 8, maxBucketSize = 40)
    assert(out.count() == 40L * 39 / 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      "per-bucket embedding array collection crept back into the plan")
    // a smaller cap drops the bucket — and the audit surfaces the drop
    val capped = Similarity.nearDupPairsLsh(df, 0L, 512, 8, maxBucketSize = 10)
    assert(capped.count() == 0L)
    val dropped = Similarity
      .lshDroppedHotBuckets(df, 512, 8, maxBucketSize = 10).collect()
    assert(dropped.length == 1 && dropped(0).getLong(1) == 40L)
  }

  test("nearDupPairs knownSize skips the guard action, same output") {
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .filter($"vec_id" < 20)
    val counted = Similarity.nearDupPairs(e, minDot = 0L).count()
    val known = Similarity
      .nearDupPairs(e, minDot = 0L, knownSize = Some(20L)).count()
    assert(counted == known)
  }

  test("minhashPairsWithAudit: pairs + drop audit from ONE band evaluation") {
    val boiler = (0L until 200L).map(i => (i, "copy paste boilerplate text " +
      "that is exactly the same in every single document here"))
    val near = Seq(
      (1000L, "a unique document about spark physical plans and shuffles"),
      (1001L, "a unique document about spark physical plans and shuffle"))
    val df = (boiler ++ near).toDF("doc_id", "text")
    val r = Dedup.minhashPairsWithAudit(df, "doc_id", "text",
      maxBucketSize = 50)
    val pairs = r.pairs.as[(Long, Long)].collect().toSet
    val expected = Dedup.minhashPairs(df, "doc_id", "text", maxBucketSize = 50)
      .as[(Long, Long)].collect().toSet
    assert(pairs == expected)
    val dropped = r.droppedHotBuckets.collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) == 200L))
    // the audit's plan reuses the persisted bucket table instead of
    // recomputing MinHash signatures over the corpus a second time
    val plan = r.droppedHotBuckets.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") ||
      plan.contains("TableCacheQueryStage"),
      s"audit plan does not reuse the cached buckets:\n$plan")
    r.unpersist()
  }

  test("IVF ANN: candidates subset of brute with exact dots; " +
    "zero-shuffle assignment") {
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.ivfCentroids(e, step = 100L)
    assert(cents.size == 5 && cents.map(_._1) == Seq(0, 1, 2, 3, 4))
    // assignment is a pure narrow projection — NO exchange in the plan
    val assigned = e.withColumn(
      "list_id", Similarity.ivfListId($"embedding", cents))
    val plan = org.apache.spark.sql.GraftBridge.sparkPlan(assigned)
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
        case _ => 0
      }) + p.children.map(shuffles).sum
    assert(shuffles(plan) == 0, "IVF assignment must not shuffle")
    // every vector lands in exactly one list; all lists used
    assert(assigned.count() == e.count())
    assert(assigned.select("list_id").distinct().count() == 5)
    // candidates agree with brute-force dots and include each query's
    // own-list neighbors (recall ≥ the probe'd lists by construction)
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val cand = Similarity.annIvf(e, q, cents, nProbe = 2, excludeSelf = true)
      .as[(Long, Long, Long)].collect()
    assert(cand.nonEmpty)
    val brute = Similarity.topKByDot(e, q, k = e.count().toInt, excludeSelf = true)
      .select("query_id", "vec_id", "dot")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    cand.foreach { case (qid, vid, dot) =>
      assert(brute((qid, vid)) == dot, s"dot mismatch ($qid,$vid)")
    }
  }

  test("IVF data path ≡ literal-expression path; plan size O(1) in k " +
    "(k=1000 exercised)") {
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    // 1. bit-equality of the two formulations on sampled centroids
    val cents = Similarity.ivfCentroids(e, step = 20L)
    val data = e.select($"vec_id",
      Similarity.ivfListId($"embedding", cents).as("lid"),
      Similarity.ivfProbeLists($"embedding", cents, 3).as("p"))
    val ref = e.select($"vec_id",
      Similarity.ivfListIdExpr($"embedding", cents).as("lid"),
      Similarity.ivfProbeListsExpr($"embedding", cents, 3).as("p"))
    assert(data.exceptAll(ref).count() == 0 && ref.exceptAll(data).count() == 0)
    // 2. k = 1000: correct nearest-centroid assignment (vs an in-memory
    //    argmax with the same quantization + tie rule) at a k the literal
    //    path cannot reach, and an expression tree that does NOT grow
    def mkCents(k: Int): Seq[(Int, Seq[Float])] =
      (0 until k).map(i =>
        (i, (0 until 64).map(d => ((i * 31 + d * 7) % 100 - 50) / 10.0f)))
    def q(x: Double): Long =
      if (x >= 0) math.floor(x * 10000.0 + 0.5).toLong
      else math.ceil(x * 10000.0 - 0.5).toLong
    val big = mkCents(1000)
    val qc = big.map { case (id, v) => id -> v.map(x => q(x.toDouble)) }
    val got = e.select($"vec_id",
      Similarity.ivfListId($"embedding", big).as("lid"))
      .as[(Long, Int)].collect().toMap
    val vecs = e.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    vecs.foreach { case (id, emb) =>
      val qe = emb.map(x => q(x.toDouble))
      val want = qc.map { case (cid, cv) =>
        (cid, qe.zip(cv).map { case (a, b) => a * b }.sum)
      }.maxBy { case (cid, dot) => (dot, -cid.toLong) }._1
      assert(got(id) == want, s"vec $id")
    }
    def exprCount(k: Int): Int = {
      val df = e.select(
        Similarity.ivfProbeLists($"embedding", mkCents(k), 4).as("p"))
      df.queryExecution.analyzed.expressions
        .map(_.collect { case x => x }.size).sum
    }
    assert(exprCount(10) == exprCount(1000),
      "IVF plan must not grow with centroid count")
  }

  test("multi-probe LSH strictly improves recall: candidates AND pairs are " +
    "duplicate-free supersets of single-probe") {
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val single = Similarity.annCandidates(e, q, dim = 64, nBits = 8, excludeSelf = true)
    val multi = Similarity.annCandidates(e, q, dim = 64, nBits = 8, probes = 8, excludeSelf = true)
    val (nS, nM) = (single.count(), multi.count())
    assert(single.exceptAll(multi).count() == 0, "multi must cover single")
    assert(nM > nS, s"expected strictly more candidates ($nM vs $nS)")
    assert(multi.distinct().count() == nM, "probe expansion must not duplicate")

    val pairsS = Similarity.nearDupPairsLsh(e, minDot = 0L, dim = 64, nBits = 6)
    val pairsM = Similarity.nearDupPairsLsh(e, minDot = 0L, dim = 64,
      nBits = 6, probes = 6)
    val (pS, pM) = (pairsS.count(), pairsM.count())
    assert(pairsS.exceptAll(pairsM).count() == 0, "multi must cover single")
    assert(pM > pS, s"expected strictly more pairs ($pM vs $pS)")
    assert(pairsM.distinct().count() == pM, "pair expansion must not duplicate")
  }

  test("recallAtK: exact intersection counts, zero-hit queries included") {
    import org.apache.spark.sql.functions.col
    val truth = Seq(
      (1L, 10L, 100L), (1L, 11L, 90L), (1L, 12L, 80L),
      (2L, 20L, 50L), (2L, 21L, 40L)).toDF("query_id", "vec_id", "dot")
    // query 1: candidates cover 2 of top-2 truth; query 2: none
    val cand = Seq(
      (1L, 11L, 90L), (1L, 10L, 100L), (1L, 99L, 1L)).toDF("query_id", "vec_id", "dot")
    val got = Similarity.recallAtK(cand, truth, 2)
      .select("query_id", "hits", "recall_bp")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 10000L), (2L, 0L, 0L)))
    // self-check of the ranking: a candidate OUTSIDE its own top-k does
    // not count even if it is in truth's top-k
    val capped = Similarity.recallAtK(
      cand, truth.filter(col("query_id") === 1L), 1)
      .select("query_id", "hits").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 1L)))
  }

  test("nearDupPairsCosine finds exactly the scaled copies; integer " +
    "predicate survives max-magnitude vectors (decimal, not int64)") {
    import org.apache.spark.sql.functions.{col, lit, transform => atransform}
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val scaled = e.filter(col("vec_id") % 7 === 0).select(
      (col("vec_id") + 10000L).as("vec_id"),
      atransform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    val nScaled = scaled.count()
    val pairs = Similarity.nearDupPairsCosine(e.unionAll(scaled),
      minCosineBp = 9990, dim = 64, nBits = 6)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.length == nScaled, s"want $nScaled pairs, got ${pairs.length}")
    assert(pairs.forall { case (a, b) => b == a + 10000L },
      pairs.filterNot { case (a, b) => b == a + 10000L }.take(5).mkString(","))
    // dot²·10⁸ for two all-ones dim-64 vectors is ~4.2e27 — far past
    // int64; the decimal(38,0) predicate must neither overflow nor
    // misclassify an exact-identical pair (cosine exactly 1)
    val ones = Seq.fill(64)(1.0f)
    val big = Seq((0L, ones), (1L, ones), (2L, ones.map(-_)))
      .toDF("vec_id", "embedding")
    val bigPairs = Similarity.nearDupPairsCosine(big,
      minCosineBp = 10000, dim = 64, nBits = 6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(bigPairs == Set((0L, 1L)), bigPairs.mkString(","))
  }

  test("multi-probe hot-bucket cap is symmetric: output invariant under " +
    "id relabeling, hot-bucket vectors pair with nothing") {
    import org.apache.spark.sql.functions.{col, lit}
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 40)
    // tiny cap at few bits -> some buckets oversized, some ok
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Similarity.nearDupPairsLsh(df, minDot = Long.MinValue, dim = 64,
        nBits = 3, maxBucketSize = 4, probes = 3)
        .select("a", "b").as[(Long, Long)].collect()
        .map { case (a, b) => Set(a, b) }.toSet
    val fwd = pairs(e)
    // relabel ids in reverse order: the same geometric pairs must survive
    val rev = pairs(e.select((lit(1000L) - col("vec_id")).as("vec_id"),
        col("embedding")))
      .map(_.map(1000L - _))
    assert(fwd == rev, s"asymmetric under relabeling: " +
      s"fwdOnly=${(fwd -- rev).take(3)} revOnly=${(rev -- fwd).take(3)}")
    // no pair touches a vector whose own bucket is oversized
    val hot = Similarity.lshDroppedHotBuckets(e, dim = 64, nBits = 3,
      maxBucketSize = 4).select("bucket").as[Long].collect().toSet
    assert(hot.nonEmpty, "fixture must actually have an oversized bucket")
    val bucketOf = e.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), 64, 3).as("b"))
      .as[(Long, Long)].collect().toMap
    val hotIds = bucketOf.filter { case (_, b) => hot(b) }.keySet
    assert(fwd.forall(p => p.intersect(hotIds).isEmpty),
      s"pair touches hot-bucket vector: ${fwd.find(_.intersect(hotIds).nonEmpty)}")
  }

  test("recallAtK collapses duplicate candidate pairs (hits never exceed k)") {
    val truth = Seq((1L, 10L, 100L), (1L, 11L, 90L))
      .toDF("query_id", "vec_id", "dot")
    val cand = Seq((1L, 10L, 100L), (1L, 10L, 100L), (1L, 11L, 90L))
      .toDF("query_id", "vec_id", "dot")
    val got = Similarity.recallAtK(cand, truth, 2)
      .select("query_id", "hits", "recall_bp")
      .as[(Long, Long, Long)].collect().toSet
    // duplicated (1,10) must count once and must not crowd (1,11) out
    assert(got == Set((1L, 2L, 10000L)), got.mkString(","))
  }

  test("ANN/near-dup edges: empty query set, singleton corpus, empty corpus") {
    import org.apache.spark.sql.functions.col
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val noQ = e.filter(col("vec_id") < 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    assert(Similarity.annCandidates(e, noQ, dim = 64, nBits = 8).count() == 0)
    assert(Similarity.annCandidates(e, noQ, dim = 64, nBits = 8, probes = 8)
      .count() == 0)
    val one = e.filter(col("vec_id") === 0)
    assert(Similarity.nearDupPairsLsh(one, 0L, dim = 64, nBits = 6).count() == 0)
    assert(Similarity.nearDupPairsLsh(one, 0L, dim = 64, nBits = 6, probes = 6)
      .count() == 0)
    val none = e.filter(col("vec_id") < 0)
    assert(Similarity.nearDupPairsLsh(none, 0L, dim = 64, nBits = 6, probes = 6)
      .count() == 0)
    assert(Similarity.nearDupPairs(none, 0L).count() == 0)
  }

  test("SignLsh expression equals the HOF bucket composition") {
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(
      Similarity.lshBucket($"embedding", dim = 64, nBits = 8).as("fast"),
      Similarity.lshBucketHof($"embedding", dim = 64, nBits = 8).as("ref"))
    val mismatches = both.filter($"fast" =!= $"ref").count()
    assert(mismatches == 0, s"$mismatches bucket mismatches vs HOF reference")
  }

  test("rolling-hash fingerprint matches a naive codepoint recurrence") {
    val cases = Seq("hello", "h\u00e9llo\ud83d\ude00", "", "a",
      "\u1f48\u0394\u03a5\u03a3\u03a3\u0395\u038e\u03a3 \u0130stanbul  spaced")
    def naive(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val got = cases.toDF("text")
      .select(TextStats.rollingFingerprint($"text").as("rfp"))
      .as[Long].collect().toSeq
    assert(got == cases.map(naive))
  }

  test("featureHash: buckets match a naive hash; vector form is consistent") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "alpha beta gamma alpha"),
      (1L, "beta beta"),
      (2L, null.asInstanceOf[String]), // null text -> zero vector
      (3L, "")                         // empty -> zero vector
    ).toDF("doc_id", "text")
    val dims = 16
    def naiveBucket(w: String): Long =
      w.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L) % dims
    val rows = TextStats.featureHash(docs, "doc_id", "text", dims)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expected = Map(
      (0L, naiveBucket("alpha")) -> 2L,
      (0L, naiveBucket("gamma")) -> 1L,
      (0L, naiveBucket("beta")) -> 1L,
      (1L, naiveBucket("beta")) -> 2L)
    assert(rows == expected)
    val vecs = TextStats.featureHashVector(docs, "doc_id", "text", dims)
      .as[(Long, Seq[Long])].collect().toMap
    assert(vecs.keySet == Set(0L, 1L, 2L, 3L))
    assert(vecs.values.forall(_.length == dims))
    assert(vecs(2L).forall(_ == 0L) && vecs(3L).forall(_ == 0L))
    for (((id, b), n) <- expected) assert(vecs(id)(b.toInt) == n)
    assert(vecs(0L).sum == 4L && vecs(1L).sum == 2L)
  }

  test("exact dedup groups duplicate texts") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    assert(g == Set((2L, 1L), (1L, 2L))) // (n_docs, keep_id)
  }

  test("MinHashSig expression equals the HOF signature composition") {
    import org.apache.spark.sql.functions._
    val docs = graft.io.Tables
      .read(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val hof = docs
      .filter(size(Dedup.words($"text")) >= 3)
      .select($"doc_id",
        Dedup.minhashSignature(
          Dedup.shingles(Dedup.words($"text"), 3), 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val fastExpr = org.apache.spark.sql.GraftBridge.column(
      graft.exprs.MinHashSig(
        org.apache.spark.sql.GraftBridge.expression($"text"), 8, 3))
    val fast = docs.select($"doc_id", fastExpr.as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[String])].collect().toMap
    assert(fast.keySet == hof.keySet)
    fast.foreach { case (id, sig) =>
      assert(sig == hof(id), s"signature mismatch for doc $id")
    }
  }

  test("minhash pairs finds the near-duplicate, not the distinct doc") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("word jaccard exact counts") {
    val docs = Seq((0L, "a b c"), (1L, "b c d")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L)).toDF("a", "b")
    val r = Dedup.wordJaccard(pairs, docs, "doc_id", "text")
      .select("inter", "uni").as[(Long, Long)].collect().head
    assert(r == ((2L, 4L)))
  }

  test("multimodal decode: real PNG/WAV header parsing, CRC + tamper rejection") {
    val png = Multimodal.encodePng(640, 480, 8, 2, seed = 7L)
    assert(Multimodal.decodeMeta(1L, png) == Multimodal.MediaDecoded(
      1L, "png", Some(640), Some(480), None, None, Some(8)))
    val wav = Multimodal.encodeWav(44100, 2, 16, 128, seed = 9L)
    assert(Multimodal.decodeMeta(2L, wav) == Multimodal.MediaDecoded(
      2L, "wav", None, None, Some(2), Some(44100), Some(16)))
    // tampered IHDR width byte -> CRC mismatch -> unknown, never a guess
    val bad = png.clone(); bad(18) = (bad(18) ^ 0x01).toByte
    assert(Multimodal.decodeMeta(3L, bad).format == "unknown")
    assert(Multimodal.decodeMeta(4L,
      Multimodal.opaqueBytes(5L, 64)).format == "unknown")
    // crafted NEGATIVE chunk size must not walk the offset backward forever
    val badWav = wav.clone()
    java.util.Arrays.fill(badWav, 16, 20, 0xFF.toByte) // fmt size = -1
    assert(Multimodal.decodeMeta(5L, badWav).format == "unknown")
    // chunk size near Int.MaxValue must not WRAP the offset negative
    // (off + 8 + size overflows Int) — structural garbage decodes as
    // unknown, never ArrayIndexOutOfBounds
    val hugeWav = Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0,
      'W', 'A', 'V', 'E', 'j', 'u', 'n', 'k',
      -1, -1, -1, 0x7f) ++ Array.fill[Byte](8)(0) // junk size = Int.MaxValue
    assert(Multimodal.decodeMeta(6L, hugeWav).format == "unknown")
    // distributed path: generate() image/audio rows carry REAL containers
    val dec = Multimodal.decodeTable(
      Multimodal.generate(spark, 12).toDF().select($"media_id", $"bytes"))
      .collect()
    assert(dec.count(_.format == "png") == 4)
    assert(dec.count(_.format == "wav") == 4)
    assert(dec.count(_.format == "unknown") == 4) // opaque video payloads
  }

  test("decontam matching joins are broadcast: the corpus shingle stream " +
    "never shuffles for matching") {
    // "alpha beta gamma" is hot (df 200 > 100, anti-joined away);
    // "beta gamma delta" survives in 50 docs — so BOTH broadcast joins
    // stay in the final plan (an all-hot or all-cold fixture would let
    // AQE elide one of them via empty-relation propagation)
    val corpus = (0L until 200L).map { i =>
      val tail = if (i < 50) "delta" else s"x$i"
      (i, s"alpha beta gamma $tail")
    }.toDF("doc_id", "text")
    val probes = Seq((0L, "alpha beta gamma delta"))
      .toDF("probe_id", "text")
    val df = Decontam.ngramOverlap(corpus, probes, "doc_id", "probe_id",
      "text", k = 3, minContamBp = 1, maxShingleDf = 100)
    // matches must survive: an all-hot/empty result would let AQE
    // collapse the final plan to EmptyRelation and void the assertion
    assert(df.collect().length > 0)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        nodes(q.plan)
      case o => o +: o.children.flatMap(nodes)
    }
    val all = nodes(org.apache.spark.sql.GraftBridge.executedPlan(df))
    val bhj = all.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    // the hot-shingle anti join is broadcast in the FINAL plan; the
    // probe-matching inner join now sits inside the materialized pruned
    // stream (ngramOverlap's checkpoint) and is asserted on its own
    // subplan below
    assert(bhj.size >= 1, s"expected >=1 broadcast join, got ${bhj.size}")
    val shuffleJoins = all.filter {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _ => false
    }
    assert(shuffleJoins.isEmpty,
      s"corpus shingles crossed a shuffle join: $shuffleJoins")
    // the matching stage itself: corpus shingles meet the broadcast probe
    // set map-side — never a shuffle join
    import org.apache.spark.sql.functions.{col, explode}
    val cRaw = corpus.select(col("doc_id"),
      explode(Dedup.shingles(Dedup.words(col("text")), 3)).as("shingle"))
    val pSized = probes.select(col("probe_id"),
      explode(Dedup.shingles(Dedup.words(col("text")), 3)).as("shingle"))
    val pruned = Decontam.prunedMatches(cRaw, pSized)
    assert(pruned.count() > 0)
    val prunedNodes = nodes(org.apache.spark.sql.GraftBridge.executedPlan(pruned))
    assert(prunedNodes.exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _ => false
    }, "pruning join is not broadcast")
    assert(!prunedNodes.exists {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _ => false
    }, "pruning join crossed a shuffle")
  }

  test("multimodal: featurize batch shape + frame sampling") {
    val media = Multimodal.generate(spark, 30)
    val feats = Multimodal.featurize(media).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.histogram.length == 16))
    assert(feats.forall(f => math.abs(f.histogram.sum - 1.0f) < 1e-3))
    val frames = Multimodal.sampleFrames(media.toDF(), nFrames = 4)
    val byId = frames.groupBy("media_id").count().collect()
    assert(byId.nonEmpty && byId.forall(_.getLong(1) == 4L))
    // deterministic: same input → same hashes
    val h1 = frames.orderBy("media_id", "frame_idx")
      .select("frame_hash").as[Long].collect().toSeq
    val h2 = Multimodal.sampleFrames(media.toDF(), 4)
      .orderBy("media_id", "frame_idx").select("frame_hash")
      .as[Long].collect().toSeq
    assert(h1 == h2)
  }

  test("topNgrams: exact counts, (count desc, ngram asc) boundary, and a " +
    "TakeOrdered plan — never a global sort") {
    val df = Seq(
      "x y z x y z x y z", // "x y z" ×3 (+ wrap grams), "y z x" ×2 ...
      "a b c a b c",
      "z z z z"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextStats.topNgrams(df, "text", n = 3, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x y z", 3L), ("a b c", 2L), ("y z x", 2L)))
    val plan = TextStats.topNgrams(df, "text", 3, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("ShuffleHash: bijective sample of ids, consistent with the gate, " +
    "and order-defining (all distinct)") {
    import org.apache.spark.sql.functions.col
    val ids = ((-500L to 500L) ++ Seq(Long.MinValue, Long.MaxValue, 1L << 62))
    val df = ids.toDF("id")
    val got = df.select(col("id"),
        Curation.shuffleKey(col("id")).as("k"),
        Curation.sampleGateBp(col("id")).as("g"))
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._2).distinct.length == ids.size) // injective on sample
    // the gate is derived from the same mix: (mix >>> 20) % 10000
    assert(got.forall { case (_, k, g) => ((k >>> 20) % 10000L) == g })
    // deterministic across evaluation modes (interpreted vs codegen paths
    // agree by construction — re-evaluate and compare)
    val again = df.select(Curation.shuffleKey(col("id"))).as[Long].collect()
    assert(got.map(_._2).toSeq == again.toSeq)
  }

  test("hardNegatives: self and near-positives excluded, band after skipTop") {
    import spark.implicits._
    // corpus: query q0 = unit-x; v1 = exact duplicate (cosine 1 → excluded);
    // v2 = 0.99-ish scaled copy (excluded at bp 9500); v3..v6 descending dots
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (0L, vec(1, 0, 0, 0)),
      (1L, vec(1, 0, 0, 0)),          // duplicate of q0
      (2L, vec(0.99, 0.141, 0, 0)),   // cosine ≈ .990 → excluded
      (3L, vec(0.9, 0.436, 0, 0)),    // cosine .9 → kept, highest dot
      (4L, vec(0.8, 0.6, 0, 0)),
      (5L, vec(0.5, 0.866, 0, 0)),
      (6L, vec(0.1, 0.995, 0, 0))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val got = Similarity.hardNegatives(corpus, q, k = 2, skipTop = 1,
        maxCosineBp = 9500)
      .select($"vec_id", $"neg_rank").as[(Long, Int)].collect().sortBy(_._2)
    // kept order by dot: 3 (skipped), then 4, 5 → the band
    assert(got.toSeq == Seq((4L, 1), (5L, 2)))
    // threshold is the lever: at bp=10000 only exact duplicates (cosine
    // = 1.0) are excluded, so the 0.99 near-copy leads the band
    val raw = Similarity.hardNegatives(corpus, q, k = 2, skipTop = 0,
        maxCosineBp = 10000)
      .select($"vec_id", $"neg_rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(raw.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("cooccurrence: windowed pair counts + unigram counts + total") {
    import spark.implicits._
    val df = Seq("a b a b", "b a", "c", "").toDF("text")
    val got = TextStats.cooccurrence(df, "text", maxDist = 2)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // tokens: a:3 b:3 c:1 "":1 → total 8
    // dist-1 pairs: (a,b)x2 (b,a)x2; dist-2: (a,a) (b,b) from doc 1
    assert(got == Map(
      ("a", "b") -> ((2L, 3L, 3L, 8L)),
      ("b", "a") -> ((2L, 3L, 3L, 8L)),
      ("a", "a") -> ((1L, 3L, 3L, 8L)),
      ("b", "b") -> ((1L, 3L, 3L, 8L))))
    // minCount prunes below-threshold pairs before the joins
    val pruned = TextStats.cooccurrence(df, "text", 2, minCount = 2L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet == Set(("a", "b"), ("b", "a")))
  }

  test("editConfirm: banded Levenshtein keeps near pairs, rejects far ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"), (2L, "hello worlds"), // distance 1
      (3L, "hxllo wyrld"), // distance 2 from doc 1
      (4L, "completely different text entirely")
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L))
      .toDF("a", "b")
    val got = Dedup.editConfirm(cands, docs, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 2L),
      "only within-threshold pairs survive, with their exact distance")
    // threshold 0 degenerates to exact equality
    val eq = Dedup.editConfirm(cands, docs, "doc_id", "text", maxDist = 0)
      .collect()
    assert(eq.isEmpty)
    intercept[IllegalArgumentException] {
      Dedup.editConfirm(cands, docs, "doc_id", "text", maxDist = -1)
    }
  }

  test("middleTruncate: head+marker+tail over budget, byte-identity under") {
    import spark.implicits._
    val df = Seq(
      "a b c d e f g h", // 8 words > 2+1 budget
      "x  y", // within budget; double space must survive byte-identical
      "solo"
    ).toDF("text")
    val got = df.select(
      TextStats.middleTruncate($"text", 2, 1).as("t")).as[String].collect()
    assert(got.toSet == Set("a b <...> h", "x  y", "solo"))
    intercept[IllegalArgumentException] {
      TextStats.middleTruncate(org.apache.spark.sql.functions.lit("x"), 0, 1)
    }
  }

  test("parseJsonColumn: corrupt marker validity, clean struct, null input") {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val df = Seq(
      (1L, """{"k": 7}"""),
      (2L, "{nope"),
      (3L, """{"other": 1}"""), // valid JSON, field absent -> k NULL, valid
      (4L, null.asInstanceOf[String])
    ).toDF("id", "props")
    val out = graft.io.JsonIngest.parseJsonColumn(df, "props",
        StructType(Seq(StructField("k", IntegerType))))
      .select($"id", $"props_parsed".getField("k"), $"props_valid")
      .as[(Long, Option[Int], Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(7), true)))
    assert(out(2L) == ((None, false)), "malformed JSON is invalid, not all-null-valid")
    assert(out(3L) == ((None, true)), "missing field is a schema question, not validity")
    assert(out(4L) == ((None, false)), "NULL input has nothing to parse")
    intercept[IllegalArgumentException] {
      graft.io.JsonIngest.parseJsonColumn(df, "props",
        StructType(Seq(StructField("_corrupt_record", StringType))))
    }
  }

  test("simhashPairs: exact copy at hamming 0, far texts rejected, " +
    "pigeonhole bound enforced") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact copy -> hamming 0
      (3L, "totally unrelated words here now maybe"),
      (4L, "zeta eta theta iota kappa lambda")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.get((1L, 2L)).contains(0L), "identical text pairs at hamming 0")
    // differential: ham <= 3 implies a shared 16-bit band (pigeonhole),
    // so the banded search must find EXACTLY the <= 3 signature pairs
    val sig = docs
      .select($"doc_id", graft.exprs.SimHash64($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    val expected = (for {
      a <- sig.keys; b <- sig.keys if a < b
      h = java.lang.Long.bitCount(sig(a) ^ sig(b)) if h <= 3
    } yield (a, b) -> h.toLong).toMap
    assert(got == expected)
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4)
    }
  }

  test("simhashPairsWithAudit: dropped hot buckets audited; pairs match " +
    "simhashPairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "other words entirely"), (5L, "other words entirely")
    ).toDF("doc_id", "text")
    val r = Dedup.simhashPairsWithAudit(docs, "doc_id", "text",
      maxHamming = 0, maxBucketSize = 2)
    val pairs = r.pairs.as[(Long, Long, Long)].collect().toSet
    // the 3-copy signature overfills its buckets in every band; the
    // 2-copy pair's buckets stay under the cap
    assert(pairs == Set((4L, 5L, 0L)))
    val dropped = r.droppedHotBuckets
      .select($"n_docs").as[Long].collect()
    assert(dropped.nonEmpty && dropped.forall(_ >= 3L),
      "every audited bucket is over the cap")
    val plain = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 0, maxBucketSize = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(plain == pairs, "audit variant and plain variant agree")
    r.unpersist()
  }

  test("rarityStats: corpus-frequency joins, rare counts, tokenless zeros") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"), // a:3 total (2 here + 1 in doc2), b:2
      (2L, "a b rare"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextStats.rarityStats(docs, "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // corpus counts: a=3, b=2, rare=1
    assert(got(1L) == ((3L, 0L, 3L + 3L + 2L)))
    assert(got(2L) == ((3L, 1L, 3L + 2L + 1L)))
    assert(got(3L) == ((0L, 0L, 0L)), "tokenless doc reports zeros")
  }

  test("vocabGrowth: new types by first bucket, running totals, " +
    "zero-token docs keep their bucket on the axis") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b"), // bucket 0: types a, b
      (1L, "b a"), // nothing new
      (2L, "c a"), // bucket 1: c is new
      (3L, ""), // zero tokens, still a bucket-1 doc
      (4L, "d d d") // bucket 2: d is new, 3 tokens
    ).toDF("doc_id", "text")
    val got = TextStats.vocabGrowth(docs, "doc_id", "text", bucketDocs = 2L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (0L, 2L, 2L, 2L, 4L, 4L),
      (1L, 2L, 1L, 3L, 2L, 6L),
      (2L, 1L, 1L, 4L, 3L, 9L)), got.mkString(","))
  }

  test("vocabGrowth: negative ids fail loud") {
    import spark.implicits._
    val docs = Seq((-1L, "a")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextStats.vocabGrowth(docs, "doc_id", "text", 2L).collect()
    }
    assert(e.getMessage.contains("vocabGrowth") ||
      e.getCause != null && e.getCause.getMessage.contains("vocabGrowth"),
      e.getMessage)
  }

  test("bpePairCounts: greedy-walk adjacent pairs, longest match wins, " +
    "codepoint fallback") {
    import spark.implicits._
    val vocab = Seq("ab", "b", "a", "c")
    val df = Seq("abab", "cba", "xab", "a").toDF("text")
    // greedy: "abab" -> ab|ab ; "cba" -> c|b|a ; "xab" -> x(fallback)|ab ;
    // "a" -> single token, no pair
    val got = TextStats.bpePairCounts(df, "text", vocab)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("ab", "ab") -> 1L, ("c", "b") -> 1L, ("b", "a") -> 1L,
      ("x", "ab") -> 1L))
    val toks = df.select(TextStats.vocabTokenSeq($"text", vocab))
      .as[Seq[String]].collect().toSet
    assert(toks == Set(Seq("ab", "ab"), Seq("c", "b", "a"),
      Seq("x", "ab"), Seq("a")))
  }

  test("poolStats: per-(group, dim) exact quantized sums and counts") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0.1f, -0.2f)),
      (1L, Array(0.3f, 0.00005f)), // q rounds half away: 0.5 -> 1
      (2L, Array(1.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val group = org.apache.spark.sql.functions
      .expr("div(vec_id - pmod(vec_id, 2), 2)")
    val got = Similarity.poolStats(df, group, $"embedding")
      .as[(Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def q(x: Float): Long = graft.exprs.QuantVec.q(x.toDouble)
    assert(got == Map(
      (0L, 0) -> ((2L, q(0.1f) + q(0.3f))),
      (0L, 1) -> ((2L, q(-0.2f) + q(0.00005f))),
      (1L, 0) -> ((1L, q(1.0f))),
      (1L, 1) -> ((1L, q(2.0f)))))
  }

  test("pqEncode: per-subspace argmin, tie to smaller code, dim guard") {
    import spark.implicits._
    // subspace 0 books: (0,0) vs (1,1); subspace 1 books: (0,1) vs (1,0)
    val books: Seq[Seq[Seq[Float]]] = Seq(
      Seq(Seq(0f, 0f), Seq(1f, 1f)),
      Seq(Seq(0f, 1f), Seq(1f, 0f)))
    val df = Seq(
      (1L, Seq(0.9f, 1.1f, 0.05f, 0.95f)), // near (1,1) then near (0,1)
      (2L, Seq(0.1f, -0.1f, 0.9f, 0.1f)) // near (0,0) then near (1,0)
    ).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = df
      .select($"vec_id", Similarity.pqEncode($"embedding", books).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) == Seq(1, 0))
    assert(got(2L) == Seq(0, 1))
    // exact tie (two identical centroids): the smaller code wins
    val tied = df.select(Similarity.pqEncode($"embedding",
        Seq(Seq(Seq(0f, 0f), Seq(0f, 0f)),
          Seq(Seq(0f, 0f), Seq(0f, 0f)))).as("c"))
      .as[Seq[Int]].collect()
    assert(tied.forall(_ == Seq(0, 0)))
    // wrong total width fails loud, not a truncated distance
    val err = intercept[Exception] {
      df.select(Similarity.pqEncode($"embedding",
        Seq(Seq(Seq(0f, 0f, 0f)))).as("c")).collect()
    }
    assert(err.getMessage != null)
  }

  test("pqAdcDist equals the brute table sum over the encoded corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val dim = 8
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(dim)(rng.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val books = Similarity.pqBooks(df, m = 2, k = 4)
    val query = vecs(5)._2
    val got = df
      .select($"vec_id",
        Similarity.pqAdcDist(
          Similarity.pqEncode($"embedding", books), query, books).as("adc"))
      .as[(Long, Long)].collect().toMap
    // oracle: plain-Scala quantized argmin + table lookup
    def q(x: Float): Long = graft.exprs.QuantVec.q(x.toDouble)
    def sq(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qBooks = books.map(_.map(_.map(q)))
    val qQuery = query.map(q)
    vecs.foreach { case (id, v) =>
      val qv = v.map(q)
      val want = qBooks.zipWithIndex.map { case (book, i) =>
        val sub = book(0).length
        val qsub = qv.slice(i * sub, (i + 1) * sub)
        val code = book.indices.minBy(j => (sq(qsub, book(j)), j))
        sq(qQuery.slice(i * sub, (i + 1) * sub), book(code))
      }.sum
      assert(got(id) == want, s"vec $id")
    }
  }

  test("lmSurprisalStats: bigram/unigram joins, multiplicities, " +
    "short docs emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, ""),
      (4L, "solo")
    ).toDF("doc_id", "text")
    val got = TextStats.lmSurprisalStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    // corpus unigrams: a=3 b=3 c=1; bigrams: (a,b)=3 (b,a)=1 (b,c)=1
    assert(got == Set(
      (1L, 3L, 3L, 2L), // (a,b) twice in doc 1
      (1L, 1L, 3L, 1L), // (b,a) once
      (2L, 3L, 3L, 1L), // (a,b)
      (2L, 1L, 3L, 1L) // (b,c)
    ))
  }

  test("scriptMix: per-script codepoint-range counts, hand-checked on " +
    "mixed Latin/Han/Cyrillic/digit text") {
    import spark.implicits._
    val df = Seq(
      (1L, "abc \u4e2d\u6587 \u0440\u0443 42"), // 3 latin, 2 han, 2 cyr, 2 digit
      (2L, "\u00e9\u00c0\u0151"), // latin-1/extended -> latin class
      (3L, "")
    ).toDF("id", "text")
    val got = TextStats.scriptMix(df, "id", org.apache.spark.sql.functions.col("text"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 12L, 3L, 2L, 2L, 2L)))
    assert(got(1) == ((2L, 3L, 3L, 0L, 0L, 0L)))
    assert(got(2) == ((3L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("gramStats: upper-triangle covariance sufficient stats vs naive; " +
      "diagonal ties out with quantSqNorm") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(41)
    val d = 5
    val vecs = (1 to 40).map(id =>
      (id.toLong, Array.fill(d)((rnd.nextFloat() * 2 - 1))))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.gramStats(df, col("embedding"))
      .select($"i", $"j", $"n", $"s_i".cast("long"), $"s_j".cast("long"),
        $"s_ij".cast("long"))
      .as[(Int, Int, Long, Long, Long, Long)].collect()
    assert(got.length == d * (d + 1) / 2)
    val q = vecs.map { case (_, v) => v.map(x =>
      graft.exprs.QuantVec.q(x.toDouble)) }
    got.foreach { case (i, j, n, si, sj, sij) =>
      assert(i <= j && n == vecs.size)
      assert(si == q.map(_(i)).sum, s"s_i at ($i,$j)")
      assert(sj == q.map(_(j)).sum, s"s_j at ($i,$j)")
      assert(sij == q.map(r => r(i) * r(j)).sum, s"s_ij at ($i,$j)")
    }
    // diagonal entries sum to the corpus quantized squared-norm total
    val diagSum = got.filter(r => r._1 == r._2).map(_._6).sum
    val normSum = df.select(Similarity.quantSqNorm(col("embedding")).as("s"))
      .agg(org.apache.spark.sql.functions.sum($"s")).as[Long].collect().head
    assert(diagSum == normSum)
  }

  test("subdialoguePairs: copied turn run pairs with its source at full " +
      "containment; unrelated conversations emit nothing; the hot-shingle " +
      "cap excludes template runs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def pairs(rows: Seq[(String, Int, String)], maxDf: Int = 20) =
      Dedup.subdialoguePairs(rows.toDF("conv", "idx", "text").repartition(5),
          "conv", "idx", "text", k = 3, maxShingleDf = maxDf)
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val a = Seq("a0", "a1", "a2", "a3", "a4", "a5").zipWithIndex
      .map { case (t, i) => ("A", i, t) }
    val b = Seq("a1", "a2", "a3", "a4").zipWithIndex // A's middle run
      .map { case (t, i) => ("B", i, t) }
    val c = Seq("x0", "x1", "x2", "x3").zipWithIndex
      .map { case (t, i) => ("C", i, t) }
    // A: 4 shingles, B: 2 (both inside A), C: disjoint → one pair
    assert(pairs(a ++ b ++ c) == Set(("A", "B", 2L, 4L, 2L, 10000L)))
    // shingle boundaries matter: a copy offset by one turn still matches
    // only the overlapping aligned runs, not partial ones
    val b2 = Seq("a0x", "a1", "a2", "a3").zipWithIndex
      .map { case (t, i) => ("B", i, t) } // first turn differs
    assert(pairs(a ++ b2) == Set(("A", "B", 1L, 4L, 2L, 5000L)))
    // a run shared by MANY conversations (template flow) is capped out:
    // with maxDf = 2, three conversations sharing one run emit no pairs
    val tpl = (0 to 2).flatMap(i =>
      Seq("t0", "t1", "t2").zipWithIndex.map { case (t, j) => (s"T$i", j, t) })
    assert(pairs(tpl, maxDf = 2).isEmpty)
    // ...but the same three at maxDf = 3 pair all three ways
    assert(pairs(tpl, maxDf = 3).size == 3)
    // null text participates as '' (still a valid shingle component)
    val n1 = Seq(("N1", 0, "p"), ("N1", 1, null), ("N1", 2, "q"),
      ("N2", 0, "p"), ("N2", 1, null), ("N2", 2, "q"))
    assert(pairs(n1.map(r => (r._1, r._2, r._3: String))) ==
      Set(("N1", "N2", 1L, 1L, 1L, 10000L)))
  }
}
