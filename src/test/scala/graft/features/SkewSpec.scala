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

  test("topKPerKey equals the plain window route on a mega-key fixture") {
    // one key holds 90% of rows; order (v desc, id asc) is total per key
    val rows = (1 to 9000).map(i => ("hot", (i * 37) % 5003, i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 61}", i % 17, 100000L + i))
    val df = rows.toDF("k", "v", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val plain = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5)
      .as[(String, Int, Long, Long)].collect().sorted.toSeq
    for (salts <- Seq(1, 4, 16)) {
      val got = Skew
        .topKPerKey(df, Seq("k"), Seq($"v".desc, $"id".asc), k = 5, salts)
        .as[(String, Int, Long, Long)].collect().sorted.toSeq
      assert(got == plain, s"salts=$salts diverged from the window route")
    }
    // k larger than any key's row count: every row survives, ranked
    val small = (1 to 7).map(i => ("a", i, i.toLong)).toDF("k", "v", "id")
    val all = Skew
      .topKPerKey(small, Seq("k"), Seq($"v".desc, $"id".asc), k = 50, 4)
      .as[(String, Int, Long, Long)].collect()
    assert(all.length == 7 && all.map(_._4).sorted.toSeq == (1L to 7L))
  }

  test("skewJoin equals the plain join on a mega-key fixture") {
    // one conversation holds 90% of the rows — the exact shape the
    // hot-path broadcast exists for
    val left = ((1 to 900).map(i => ("mega", i)) ++
      (1 to 100).map(i => ("c" + (i % 25), i))).toDF("k", "v")
    val right = (Seq("mega") ++ (0 until 25).map("c" + _))
      .zipWithIndex.map { case (k, i) => (k, i * 10) }.toDF("k", "dim")
    val plain = left.join(right, Seq("k")).collect()
      .map(_.toString).sorted.toSeq
    val skewed = Skew.skewJoin(left, right, Seq("k"), 100L).collect()
      .map(_.toString).sorted.toSeq
    assert(skewed == plain)
  }

  test("skewJoin routes: hot side is a broadcast join, cold side is not") {
    val left = ((1 to 500).map(i => ("mega", i)) ++
      (1 to 50).map(i => ("c" + i, i))).toDF("k", "v")
    val right = (Seq("mega") ++ (1 to 50).map("c" + _))
      .map((_, 1L)).toDF("k", "dim")
    val joined = Skew.skewJoin(left, right, Seq("k"), 100L)
    val plan = joined.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    // 2 semi/anti splits + 1 semi on right + hot inner + cold inner
    assert(joins.size >= 5, s"expected the split join tree, got ${joins.size}")
    val broadcastJoins = joins.filter(j =>
      j.hint.rightHint.exists(_.strategy.contains(
        org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) ||
        j.hint.leftHint.exists(_.strategy.contains(
          org.apache.spark.sql.catalyst.plans.logical.BROADCAST)))
    assert(broadcastJoins.nonEmpty, "hot path must carry a broadcast hint")
  }

  test("skewJoin with no hot keys degrades to the plain join result") {
    val left = (1 to 60).map(i => ("c" + (i % 20), i)).toDF("k", "v")
    val right = (0 until 20).map(i => ("c" + i, i)).toDF("k", "dim")
    val plain = left.join(right, Seq("k")).collect().map(_.toString).sorted.toSeq
    val skewed = Skew.skewJoin(left, right, Seq("k"), 1000L).collect()
      .map(_.toString).sorted.toSeq
    assert(skewed == plain)
  }
}
