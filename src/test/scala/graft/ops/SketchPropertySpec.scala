package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Randomized differential properties for the sketch family — seeded,
  * so failures replay deterministically. Each property runs against
  * brute-force truth computed on the same data.
  */
class SketchPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMV: exact below k; within 4/sqrt(k) relative error above (20 seeded corpora)") {
    val k = 256
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nDistinct = 50 + rnd.nextInt(5000)
      val ids = Seq.fill(nDistinct * 2)(rnd.nextInt(nDistinct).toLong)
      val truth = ids.distinct.size
      val est = Sketches.kmvDistinct(ids.toDF("id").withColumn("g", lit("x")),
        Seq("g"), "id", k).collect().head.getDecimal(4).longValueExact()
      if (truth < k) assert(est == truth, s"seed $seed: below k must be exact")
      else {
        val rel = math.abs(est - truth).toDouble / truth
        assert(rel < 4.0 / math.sqrt(k),
          s"seed $seed: est $est vs truth $truth (rel $rel)")
      }
    }
  }

  test("Bloom: zero false negatives on 10 seeded random key sets") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val members = Seq.fill(500)(rnd.nextLong()).distinct
      val words = Sketches.bloomWords(
        Sketches.bloomBuild(members.toDF("k"), col("k"), 64, 4), 64)
      members.foreach(m =>
        assert(graft.exprs.BloomImpl.mightContain(m, words, 4),
          s"seed $seed: member $m missed"))
    }
  }

  test("CMS: est >= true on 10 seeded skewed multisets; exact at generous width") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(200 + seed)
      // zipf-ish: key i with multiplicity ~ n/i
      val rows = (1 to 80).flatMap(i =>
        Seq.fill(1 + 800 / i)(i.toLong + rnd.nextInt(3))).toDF("k")
      val truth = rows.groupBy("k").agg(count(lit(1)).as("true_count"))
      val est = Sketches.cmsEstimate(truth, col("k"),
        Sketches.cmsBuild(rows, col("k"), 3, 16384), 3, 16384)
      est.collect().foreach { r =>
        assert(r.getAs[Long]("est_count") >= r.getAs[Long]("true_count"),
          s"seed $seed: CMS underestimated $r")
        assert(r.getAs[Long]("est_count") == r.getAs[Long]("true_count"),
          s"seed $seed: width 16384 over <=82 keys must be exact: $r")
      }
    }
  }

  test("PPS: sample size concentrates around k (10 seeded weight distributions)") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(300 + seed)
      val n = 2000
      val df = (1 to n).map(i =>
        (seed * 100000L + i, 1L + rnd.nextInt(100).toLong))
        .toDF("id", "w").withColumn("s", lit("x"))
      val k = 100L
      val kept = Curation.samplePps(df, "id", "s", col("w"), k).count()
      // Poisson-binomial sd <= sqrt(k); allow 5 sigma
      assert(math.abs(kept - k) <= 5 * math.sqrt(k.toDouble),
        s"seed $seed: kept $kept for target $k")
    }
  }

  test("negativeSample: draws are uniform-ish over the id space (chi-square sanity)") {
    val n = 400
    val draws = Curation.negativeSample((0L until n.toLong).toDF("doc_id"),
        "doc_id", 8)
      .select("neg_id").as[Long].collect()
    // bucket into 20 cells; expected 8*400/20 = 160 per cell
    val cells = draws.groupBy(_ % 20).view.mapValues(_.size).toMap
    val exp = draws.length / 20.0
    val chi2 = (0L until 20L).map { c =>
      val o = cells.getOrElse(c, 0)
      (o - exp) * (o - exp) / exp
    }.sum
    // 19 dof: p=0.001 critical value ~ 43.8
    assert(chi2 < 43.8, s"chi-square $chi2 over 20 cells suggests bias")
  }

  test("KMV overlap matrix: exact intersection/union counts below k; " +
    "estimator within 4/sqrt(k) above (seeded)") {
    // groups with known overlap: g0 = [0,300), g1 = [200,500), g2 = [450,460)
    val rows = (0L until 300L).map(("g0", _)) ++
      (200L until 500L).map(("g1", _)) ++ (450L until 460L).map(("g2", _))
    val df = rows.toDF("g", "id")
    // k above every set size → everything exact
    val exact = Sketches.kmvOverlapMatrix(
        Sketches.kmvSketch(df, Seq("g"), "id", 1024), "g", 1024)
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_common"),
        col("exact"))
      .as[(String, String, Int, Int, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(exact(("g0", "g1")) == ((500, 100, true))) // |∪|=500, |∩|=100
    assert(exact(("g0", "g2")) == ((310, 0, true)))
    assert(exact(("g1", "g2")) == ((300, 10, true)))
    // k = 256 below the union sizes → estimator, not exact
    val est = Sketches.kmvOverlapMatrix(
        Sketches.kmvSketch(df, Seq("g"), "id", 256), "g", 256)
      .select(col("src_a"), col("src_b"), col("jaccard_bp"), col("exact"))
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val (jbp, isExact) = est(("g0", "g1"))
    assert(!isExact)
    // true J = 100/500 = 0.2; 4/sqrt(256) = 0.25 absolute slack
    assert(math.abs(jbp / 10000.0 - 0.2) < 0.25, s"jaccard_bp $jbp")
  }
}
