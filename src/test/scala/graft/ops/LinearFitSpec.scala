package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LinearFitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // y = 2 + 3*x1 - x2, exactly linear -> least squares recovers weights
  private def data = Seq(
    (1L, 2L), (2L, 1L), (3L, 5L), (4L, 2L), (5L, 9L), (6L, 4L), (7L, 7L)
  ).map { case (x1, x2) => (x1, x2, 2L + 3L * x1 - x2) }
    .toDF("x1", "x2", "y")

  private def feats = Seq(lit(1L), col("x1"), col("x2"))

  test("sufficientStats equals the naive in-memory computation") {
    val rows = Seq((1L, 2L), (2L, 1L), (3L, 5L), (4L, 2L), (5L, 9L),
      (6L, 4L), (7L, 7L)).map { case (x1, x2) =>
      (Array(1L, x1, x2), 2L + 3L * x1 - x2)
    }
    val got = QualityModel.sufficientStats(data, feats, col("y"))
      .collect()(0)
    var idx = 0
    for (i <- 0 until 3; j <- i until 3) {
      val want = rows.map { case (f, _) => f(i) * f(j) }.sum
      assert(got.getLong(idx) == want, s"xtx_${i}_$j")
      idx += 1
    }
    for (i <- 0 until 3) {
      val want = rows.map { case (f, y) => f(i) * y }.sum
      assert(got.getLong(idx) == want, s"xty_$i")
      idx += 1
    }
    assert(got.getLong(idx) == 7L, "n")
  }

  test("fitRidge(lambda=0) recovers exact linear weights; quantization + scoring round-trips") {
    val w = QualityModel.fitRidge(data, feats, col("y"))
    assert(math.abs(w(0) - 2.0) < 1e-9 && math.abs(w(1) - 3.0) < 1e-9 &&
      math.abs(w(2) + 1.0) < 1e-9, w.toSeq.toString)
    val wBp = QualityModel.toFixedPointBp(w)
    assert(wBp == Seq(20000L, 30000L, -10000L))
    val scored = data.select(col("y"),
      QualityModel.scoreFixedPoint(feats, wBp).as("s"))
      .as[(Long, Long)].collect()
    scored.foreach { case (y, s) => assert(s == y * 10000L) }
  }

  test("ridge shrinks toward zero and regularizes a singular system") {
    val wRidge = QualityModel.fitRidge(data, feats, col("y"), lambda = 100.0)
    val w = QualityModel.fitRidge(data, feats, col("y"))
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    assert(norm(wRidge) < norm(w))
    // duplicated feature: singular at lambda=0 (fails loud), solvable ridged
    val collinear = Seq(lit(1L), col("x1"), col("x1"))
    intercept[IllegalArgumentException] {
      QualityModel.fitRidge(data, collinear, col("y"))
    }
    val wr = QualityModel.fitRidge(data, collinear, col("y"), lambda = 1.0)
    assert(math.abs(wr(1) - wr(2)) < 1e-9,
      "ridge splits the collinear weight symmetrically")
  }

  test("end to end on documents: fit, publish, score — scoring plan is a scan-side projection") {
    val d = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val feats = QualityModel.features(col("text")).map(_._2)
    val w = QualityModel.fitRidge(d, feats, (col("lang") === "en").cast("long"),
      lambda = 1.0)
    assert(w.length == 5 && w.forall(x => !x.isNaN && !x.isInfinite))
    val scored = d.select(col("doc_id"),
      QualityModel.scoreFixedPoint(feats, QualityModel.toFixedPointBp(w))
        .as("score_fp"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(scored.count() == d.count())
  }
}
