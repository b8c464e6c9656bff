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
}
