package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "en", 100L), (1L, "en", 200L), (2L, "en", 300L),
    (3L, "de", 50L), (4L, "de", 50L),
    (5L, "zh", 1000L)
  ).toDF("doc_id", "lang", "tok")

  test("mixturePlan: integer targets, undersupply keeps everything, absent stratum rate 0") {
    val plan = Curation.mixturePlan(corpus, "lang", col("tok"),
      Map("en" -> 5000, "de" -> 5000), budgetTokens = 123456L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // ideal en/de target = floor(123456 * 0.5) = 61728
    assert(plan("en") == ((3L, 600L, 5000L, 600L, 10000L)),
      "undersupplied: target clamps to avail, rate 10000")
    assert(plan("de") == ((2L, 100L, 5000L, 100L, 10000L)))
    assert(plan("zh") == ((1L, 1000L, 0L, 0L, 0L)), "no weight -> rate 0")
  }

  test("mixturePlan: budget split identity equals the naive product at representative values") {
    // floor(budget*bp/10^4) == bp*(budget div 10^4) + (bp*(budget mod 10^4)) div 10^4
    for (budget <- Seq(0L, 1L, 9999L, 10000L, 123456L, 987654321L);
         bp <- Seq(0, 1, 4999, 5000, 9999, 10000)) {
      val split = bp * (budget / 10000L) + (bp * (budget % 10000L)) / 10000L
      val naive = (BigInt(budget) * bp / 10000).toLong
      assert(split == naive, s"budget=$budget bp=$bp")
    }
  }

  test("sampleByPlan equals sampleStratified at the plan's own rates, and broadcasts the plan") {
    val docs = (0L until 500L).map(i =>
      (i, if (i % 3 == 0) "en" else "de")).toDF("doc_id", "lang")
    val plan = Seq(("en", 8000L), ("de", 2500L)).toDF("lang", "rate_bp")
    val byPlan = Curation.sampleByPlan(docs, "doc_id", "lang", plan)
    val byMap = Curation.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 8000, "de" -> 2500))
    assert(byPlan.select("doc_id").as[Long].collect().sorted.toSeq ==
      byMap.select("doc_id").as[Long].collect().sorted.toSeq)
    val physical = byPlan.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"plan join must broadcast, got:\n$physical")
  }

  test("sampleByPlan: stratum absent from the plan keeps nothing") {
    val docs = Seq((1L, "en"), (2L, "xx")).toDF("doc_id", "lang")
    val plan = Seq(("en", 10000L)).toDF("lang", "rate_bp")
    assert(Curation.sampleByPlan(docs, "doc_id", "lang", plan)
      .select("lang").as[String].collect().toSet == Set("en"))
  }

  test("sampleExactPerStratum: exact size, sort-equivalent selection, small strata kept whole") {
    val docs = (0L until 300L).map(i =>
      (i, if (i % 5 == 0) "big" else if (i < 3) "tiny" else "mid"))
      .filter { case (_, s) => s != "mid" }
      .toDF("doc_id", "lang")
    val got = Curation.sampleExactPerStratum(docs, "doc_id", "lang", 10L)
    assert(got.columns.toSeq == Seq("doc_id", "lang"),
      "helper columns dropped, original schema kept")
    val byStratum = got.as[(Long, String)].collect().groupBy(_._2)
    assert(byStratum("big").length == 10, "exactly k from a large stratum")
    assert(byStratum("tiny").length == 2, // ids 1, 2 (0 is "big")
      "stratum smaller than k kept whole")
    // selection = the k smallest shuffle keys (sort-based reference)
    val ref = docs
      .withColumn("__k", Curation.shuffleKey(col("doc_id")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("__k"))))
      .filter(col("__rn") <= 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq == ref)
  }

  test("assembleSequences: budget boundaries, ordered join, null text dropped") {
    val turns = Seq(
      // conv a: token counts 3, 4, 5 with budget 7 ->
      // exclusive cumsums 0, 3, 7 -> seqs 0, 0, 1
      ("a", 0, "one two three"),
      ("a", 1, "four five six seven"),
      ("a", 2, null),
      ("a", 3, "eight nine ten eleven twelve"),
      ("b", 0, "solo")
    ).toDF("conv_id", "turn_idx", "text")
    val got = Curation.assembleSequences(turns, "conv_id", "turn_idx", "text", 7L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(("a", 0L)) == ((2L, 7L, "one two three\nfour five six seven")))
    assert(got(("a", 1L)) == ((1L, 5L, "eight nine ten eleven twelve")))
    assert(got(("b", 0L)) == ((1L, 1L, "solo")))
    assert(got.size == 3)
  }
}
