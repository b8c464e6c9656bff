package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def digestOf(rows: Seq[(Long, String, String)]): Map[String, (Long, BigDecimal)] =
    Audit.datasetDigest(
        rows.toDF("id", "grp", "payload"),
        concat_ws("", col("id"), col("payload")), Seq("grp"))
      .select(col("grp"), col("n_rows"), col("digest").cast("string"))
      .as[(String, Long, String)].collect()
      .map { case (g, n, d) => g -> ((n, BigDecimal(d))) }.toMap

  test("dataset digest is order- and partitioning-independent, and " +
    "catches a dropped row, a mutated payload, and a cross-group swap") {
    val base = Seq(
      (1L, "a", "x"), (2L, "a", "y"), (3L, "a", "z"),
      (4L, "b", "p"), (5L, "b", "q"))
    val d0 = digestOf(base)
    // row order + partition layout must not matter
    val shuffled = Audit.datasetDigest(
        scala.util.Random.shuffle(base).toDF("id", "grp", "payload").repartition(7),
        concat_ws("", col("id"), col("payload")), Seq("grp"))
      .select(col("grp"), col("n_rows"), col("digest").cast("string"))
      .as[(String, Long, String)].collect()
      .map { case (g, n, d) => g -> ((n, BigDecimal(d))) }.toMap
    assert(shuffled == d0)
    // dropped row: count and digest both move
    val dropped = digestOf(base.filterNot(_._1 == 2L))
    assert(dropped("a")._1 == 2L && dropped("a")._2 != d0("a")._2)
    assert(dropped("b") == d0("b"))
    // same count, mutated payload: digest moves
    val mutated = digestOf(base.map { case (i, g, p) =>
      if (i == 3L) (i, g, "Z") else (i, g, p) })
    assert(mutated("a")._1 == d0("a")._1 && mutated("a")._2 != d0("a")._2)
    // swapping two rows across groups keeps totals but moves both digests
    val swapped = digestOf(base.map { case (i, g, p) =>
      if (i == 1L) (i, "b", p) else if (i == 4L) (i, "a", p) else (i, g, p) })
    assert(swapped("a")._2 != d0("a")._2 && swapped("b")._2 != d0("b")._2)
  }

  test("digest values stay in [0, 2^64) and match an independent " +
    "BigInt replay of md5-prefix sums") {
    val rows = Seq((10L, "g", "alpha"), (11L, "g", "beta"), (12L, "g", "gamma"))
    val got = digestOf(rows)("g")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = rows.map { case (i, _, p) =>
      val hex = md.digest(s"$i$p".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      BigInt(hex, 16)
    }.sum.mod(BigInt(2).pow(64))
    assert(got._1 == 3L && got._2 == BigDecimal(expect))
  }

  test("join-size profile: exact per-key count products, share in bp, " +
    "top-k order, null keys excluded") {
    val left = Seq((1L, "k1"), (2L, "k1"), (3L, "k1"), (4L, "k2"),
      (5L, null), (6L, "k3")).toDF("id", "k")
    val right = Seq((1L, "k1"), (2L, "k1"), (3L, "k2"), (4L, "k2"),
      (5L, "k2"), (6L, null), (7L, "k9")).toDF("id", "k")
    // pairs: k1 = 3*2 = 6, k2 = 1*3 = 3; k3/k9 unmatched; total 9
    val got = Audit.joinSizeProfile(left, right, "k", "k", topK = 5)
      .select(col("key"), col("n_left"), col("n_right"),
        col("pairs").cast("long"), col("total_pairs").cast("long"),
        col("n_join_keys"), col("share_bp"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("k1", 3L, 2L, 6L, 9L, 2L, 6666L),
      ("k2", 1L, 3L, 3L, 9L, 2L, 3333L)))
    // forecast equals the join actually run
    val actual = left.filter(col("k").isNotNull)
      .join(right.filter(col("k").isNotNull), "k").count()
    assert(actual == 9L)
  }
}
