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
}
