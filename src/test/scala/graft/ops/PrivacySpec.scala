package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pseudonym: consistent within a salt, rotates across salts, " +
    "null id stays null") {
    val df = Seq(Some("c1"), Some("c2"), Some("c1"), None).toDF("id")
    val out = df.select(
        Privacy.pseudonym(col("id"), "s1").as("p1"),
        Privacy.pseudonym(col("id"), "s2").as("p2"))
      .as[(Option[String], Option[String])].collect().toSeq
    // same id -> same pseudonym (joinability preserved)
    assert(out(0)._1 == out(2)._1)
    // distinct ids -> distinct pseudonyms on this fixture
    assert(out(0)._1 != out(1)._1)
    // rotating the salt unlinks releases
    assert(out(0)._1 != out(0)._2)
    // null rides through
    assert(out(3) == ((None, None)))
    // shape: prefix + 16 hex
    assert(out(0)._1.get.matches("u_[0-9a-f]{16}"))
  }

  test("pseudonymizeKeys preserves group structure (count per key " +
    "invariant under relabeling)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5), ("c", 6))
      .toDF("conv_id", "x")
    val before = df.groupBy("conv_id").count()
      .select("count").as[Long].collect().sorted.toSeq
    val after = Privacy.pseudonymizeKeys(df, Seq("conv_id"), "s")
      .groupBy("conv_id").count()
      .select("count").as[Long].collect().sorted.toSeq
    assert(after == before)
  }

  test("kAnonFilter: combos below k suppressed, null combos matched " +
    "null-safely, k_count attached") {
    val df = Seq(
      (1L, Some("en"), "web"), (2L, Some("en"), "web"),
      (3L, Some("en"), "web"),
      (4L, Some("de"), "web"), // unique combo -> suppressed at k=2
      (5L, None, "web"), (6L, None, "web") // null combo of size 2
    ).toDF("id", "lang", "source")
    val out = Privacy.kAnonFilter(df, Seq("lang", "source"), k = 2L)
      .select("id", "k_count").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (5L, 2L), (6L, 2L)))
  }

  test("lDiversityAudit: distinct sensitive values per combo, nulls " +
      "excluded, homogeneous combo flagged even when k-anonymous") {
    val df = Seq(
      // ("en","a"): 3 rows, all sensitive 10 -> k-anonymous but l-failing
      (1L, "en", "a", Option(10L)), (2L, "en", "a", Option(10L)),
      (3L, "en", "a", Option(10L)),
      // ("en","b"): 3 rows, 2 distinct + a NULL (excluded)
      (4L, "en", "b", Option(10L)), (5L, "en", "b", Option(20L)),
      (6L, "en", "b", None)
    ).toDF("id", "lang", "source", "sens")
    val out = Privacy.lDiversityAudit(df, Seq("lang", "source"),
        org.apache.spark.sql.functions.col("sens"), l = 2L)
      .select("source", "n", "diversity", "meets_l")
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", 3L, 1L, false), ("b", 3L, 2L, true)))
  }

  test("tClosenessAudit: exact ordered-EMD rationals — skewed combo " +
    "fails, near-global combo passes, null sensitive excluded") {
    // global over non-null: v=1 ×3, v=2 ×5, N=8, m=2; cumG = (3, 8)
    val df = Seq(
      ("A", Option(1)), ("A", Option(1)), ("A", Option(2)),
      ("B", Option(2)), ("B", Option(2)), ("B", Option(2)),
      ("C", Option(1)), ("C", Option(2)),
      ("C", None) // excluded from both sides
    ).toDF("g", "v")
    val out = Privacy.tClosenessAudit(df, Seq("g"), col("v"), tBp = 3000)
      .select(col("g"), col("n"), col("emd_num").cast("long"),
        col("emd_den").cast("long"), col("meets_t"))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // A: cumC=(2,3) -> |2·8−3·3| + 0 = 7 / 24  (0.292 ≤ 0.3: meets)
    assert(out("A") == ((3L, 7L, 24L, true)))
    // B: cumC=(0,3) -> |0·8−3·3| + 0 = 9 / 24  (0.375 > 0.3: fails)
    assert(out("B") == ((3L, 9L, 24L, false)))
    // C: cumC=(1,2) -> |1·8−3·2| + 0 = 2 / 16  (0.125: meets)
    assert(out("C") == ((2L, 2L, 16L, true)))
  }

  test("tClosenessAudit: m = 1 degenerates to EMD 0 with nonzero " +
    "denominator; null quasi combos audited null-safely") {
    val one = Seq(("A", 5), ("B", 5)).toDF("g", "v")
    val o1 = Privacy.tClosenessAudit(one, Seq("g"), col("v"), tBp = 0)
      .select(col("g"), col("emd_num").cast("long"),
        col("emd_den").cast("long"), col("meets_t"))
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(o1 == Set(("A", 0L, 2L, true), ("B", 0L, 2L, true)))

    // global: v=1 ×2, v=2 ×1, N=3, m=2; cumG = (2, 3)
    val nq = Seq((Option("A"), 1), (None, 1), (None, 2)).toDF("g", "v")
    val o2 = Privacy.tClosenessAudit(nq, Seq("g"), col("v"), tBp = 10000)
      .select(col("g"), col("n"), col("emd_num").cast("long"),
        col("emd_den").cast("long"))
      .as[(Option[String], Long, Long, Long)].collect().toSet
    // null combo: cumC=(1,2) -> |1·3−2·2| + 0 = 1 / 6
    // A:          cumC=(1,1) -> |1·3−2·1| + 0 = 1 / 3
    assert(o2 == Set((Option("A"), 1L, 1L, 3L), (None, 2L, 1L, 6L)))
  }
}
