package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Differential properties for the selection/evaluation operators:
  * the cross-validation count algebra vs literal per-fold retraining,
  * greedy coverage vs a naive in-memory sweep, and the PAV fit vs the
  * minimax identity computed independently.
  */
class SelectionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nbCrossVal's leave-fold-out algebra equals literal per-fold " +
    "nbTrain+nbPredict retraining") {
    val rnd = new Random(660001L)
    val words = Vector("alpha", "beta", "gamma", "omega", "sigma",
      "delta", "kappa", "theta")
    val rows = (0 until 40).map { i =>
      val cls = if (rnd.nextBoolean()) "a" else "b"
      val bias = if (cls == "a") 0 else 4
      val text = (0 until 6 + rnd.nextInt(10))
        .map(_ => words(bias + rnd.nextInt(4))).mkString(" ")
      (i.toLong, cls, text)
    }
    val df = rows.toDF("id", "cls", "text")
    val k = 3
    val onePass = NaiveBayes.nbCrossVal(df, "cls", col("text"), "id",
        k, dims = 64)
      .select(col("id"), col("predicted"))
      .as[(Long, Option[String])].collect().toMap
    // literal retraining: k separate nbTrain calls on the complement
    val fold = (id: Long) => graft.exprs.SampleHashImpl.gateBp(id) % k
    val literal = (0 until k).flatMap { f =>
      val train = df.filter(col("id").isin(
        rows.map(_._1).filter(fold(_) != f): _*))
      val test = df.filter(col("id").isin(
        rows.map(_._1).filter(fold(_) == f): _*))
      val model = NaiveBayes.nbTrain(train, "cls", col("text"), dims = 64)
      NaiveBayes.nbPredict(test, "id", col("text"), model, dims = 64)
        .select(col("id"), col("predicted"))
        .as[(Long, Option[String])].collect()
    }.toMap
    assert(onePass == literal)
  }

  test("coverageSelect equals the naive greedy sweep on random corpora") {
    val rnd = new Random(660002L)
    for (_ <- 0 until 4) {
      val vocab = ('a' to 'p').map(_.toString)
      val rows = (0 until 12).map { i =>
        (i.toLong,
          (0 until 1 + rnd.nextInt(6))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val k = 1 + rnd.nextInt(5)
      val got = Curation.coverageSelect(
          rows.toDF("doc_id", "text"), "doc_id", "text", k)
        .as[(Int, Long, Long)].collect().toSeq
      // naive greedy
      val sets = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet
      }.toMap
      var covered = Set.empty[String]
      var picked = Vector.empty[(Int, Long, Long)]
      var done = false
      for (r <- 1 to k if !done) {
        val cands = sets.view
          .filterKeys(id => !picked.exists(_._2 == id))
          .mapValues(s => (s -- covered).size)
          .filter(_._2 > 0).toSeq
        if (cands.isEmpty) done = true
        else {
          val (id, g) = cands.minBy { case (id, g) => (-g, id) }
          picked :+= ((r, id, g.toLong))
          covered ++= sets(id)
        }
      }
      assert(got == picked, s"rows=$rows k=$k")
    }
  }

  test("isotonicCalibrate equals the minimax identity " +
    "max_j min_k avg(j..k) on random bins") {
    val rnd = new Random(660003L)
    for (_ <- 0 until 6) {
      val bins: IndexedSeq[(Long, Long, Long)] =
        (0 until 2 + rnd.nextInt(8)).map { b =>
          val n = 1L + rnd.nextInt(9)
          (b.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
        }
      val got = Analytics.isotonicCalibrate(bins.toDF("bin", "n", "n_pos"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._4, r._5))).toMap
      // independent minimax computation over exact fractions
      val p = bins.map(_._3)
      val w = bins.map(_._2)
      def avg(j: Int, kk: Int): (Long, Long) =
        ((j to kk).map(p).sum, (j to kk).map(w).sum)
      def lt(a: (Long, Long), b: (Long, Long)): Boolean =
        BigInt(a._1) * b._2 < BigInt(b._1) * a._2
      val want = bins.indices.map { i =>
        var best: (Long, Long) = null
        for (j <- 0 to i) {
          var mn: (Long, Long) = null
          for (kk <- i until bins.length) {
            val a = avg(j, kk)
            if (mn == null || lt(a, mn)) mn = a
          }
          if (best == null || lt(best, mn)) best = mn
        }
        val g = BigInt(best._1).gcd(BigInt(best._2)).toLong max 1L
        bins(i)._1 -> ((best._1 / g, best._2 / g))
      }.toMap
      assert(got == want, s"bins=$bins")
    }
  }
}
