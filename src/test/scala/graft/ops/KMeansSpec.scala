package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(x: Double): Long = graft.exprs.QuantVec.q(x)

  /** Single-node reference: assign by (max quantized dot, ties to smaller
    * id), then per (list, dim) count + quantized-coordinate sums.
    */
  private def naiveSums(
      vecs: Seq[(Long, Seq[Float])],
      cents: Seq[(Int, Seq[Float])]): Map[(Int, Int), (Long, Long)] = {
    val qc = cents.map { case (id, v) => (id, v.map(x => q(x.toDouble))) }
    val assigned = vecs.map { case (_, v) =>
      val qv = v.map(x => q(x.toDouble))
      val best = qc
        .map { case (id, c) => (id, qv.zip(c).map { case (a, b) => a * b }.sum) }
        .minBy { case (id, d) => (-d, id) }._1
      (best, qv)
    }
    assigned
      .flatMap { case (lid, qv) => qv.zipWithIndex.map { case (x, d) => ((lid, d), x) } }
      .groupBy(_._1)
      .map { case (k, xs) => k -> (xs.size.toLong, xs.map(_._2).sum) }
  }

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(id =>
      (id, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
  }

  test("clusterSums equals the single-node reference on random vectors") {
    val vecs = randVecs(80, 6, seed = 3)
    val cents = vecs.take(5).map { case (id, v) => (id.toInt, v) }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.clusterSums(df, cents)
      .as[(Int, Int, Long, Long)].collect()
      .map { case (l, d, n, s) => ((l, d), (n, s)) }.toMap
    assert(got == naiveSums(vecs, cents))
  }

  test("kmeansTrain separates well-separated spherical blobs and emits " +
    "unit-norm centroids") {
    val rnd = new scala.util.Random(17)
    val dim = 8
    // three orthogonal-axis blobs on the unit sphere with small jitter
    def blob(axis: Int, n: Int, base: Long) = (0 until n).map { i =>
      val v = Array.fill(dim)((rnd.nextDouble() * 0.1 - 0.05))
      v(axis) += 1.0
      val norm = math.sqrt(v.map(x => x * x).sum)
      (base + i, v.map(x => (x / norm).toFloat).toSeq)
    }
    val vecs = blob(0, 30, 0L) ++ blob(3, 30, 100L) ++ blob(6, 30, 200L)
    val df = vecs.toDF("vec_id", "embedding")
    // deliberately bad init: three members of the FIRST blob
    val init = Seq(0, 1, 2).map(i => (i, vecs(i)._2))
    val trained = Similarity.kmeansTrain(df, init, iters = 5)
    assert(trained.forall { case (_, c) =>
      math.abs(c.map(x => x.toDouble * x).sum - 1.0) < 1e-3 })
    // every blob ends up internally consistent: members of one blob agree
    // on their assigned list
    val assignment = df
      .select(col("vec_id"), Similarity.ivfListId(col("embedding"), trained).as("l"))
      .as[(Long, Int)].collect().toMap
    def listsOf(ids: Range) = ids.map(i => assignment(i.toLong)).toSet
    assert(listsOf(0 until 30).size == 1)
    assert(listsOf(100 until 130).size == 1)
    assert(listsOf(200 until 230).size == 1)
    // and training IMPROVED the routing objective (mean best-dot) vs init
    def objective(cents: Seq[(Int, Seq[Float])]): Double = {
      val qc = cents.map { case (_, c) => c.map(x => q(x.toDouble)) }
      vecs.map { case (_, v) =>
        val qv = v.map(x => q(x.toDouble))
        qc.map(c => qv.zip(c).map { case (a, b) => a * b }.sum).max.toDouble
      }.sum
    }
    assert(objective(trained) > objective(init))
  }

  test("a centroid that captures no vectors keeps its previous position") {
    val vecs = randVecs(20, 4, seed = 9)
    val df = vecs.toDF("vec_id", "embedding")
    val far = Seq.fill(4)(-1.0f / 2) // opposite corner: captures nothing
    val init = Seq((0, vecs.head._2), (1, far.toSeq))
    // with every vector near cents(0)'s side this may orphan centroid 1;
    // whatever happens, the contract is: no crash, k centroids out, and
    // any empty cluster's centroid is unchanged
    val out = Similarity.kmeansTrain(df, init, iters = 2)
    assert(out.size == 2)
    val assigned = df
      .select(Similarity.ivfListId(col("embedding"), init).as("l"))
      .groupBy("l").count().as[(Int, Long)].collect().toMap
    if (!assigned.contains(1)) assert(out(1)._2 == far.toSeq)
  }
}
