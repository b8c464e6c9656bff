package graft.features

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-phase aggregation equals plain groupBy") {
    // one mega-key + long tail
    val rows = (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 500).map(i => (s"k${i % 37}", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(salted == plain)
  }

  test("salt hash excludes NESTED maps (struct/array-wrapped), not just top-level") {
    // hash() rejects MapType at any nesting depth in Spark 3+ — before the
    // recursive exclusion, a struct<m:map<..>> column failed analysis here
    val df = (1 to 100).map(i => ("hot", i.toLong, Map("a" -> i),
        (i, Map("b" -> i)), Seq(Map("c" -> i))))
      .toDF("k", "v", "m", "sm", "am")
    val out = Skew.saltedCountSum(df, Seq("k"), "v", salts = 4)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("hot", 100L, 5050L)))
  }

  test("salted aggregation spreads the hot key across partials") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val salted = df.withColumn(
      "__salt", pmod(hash(monotonically_increasing_id()), lit(8)))
    val partialCount = salted.groupBy("k", "__salt").count().count()
    assert(partialCount > 1, "salt must split the hot key")
  }
}
