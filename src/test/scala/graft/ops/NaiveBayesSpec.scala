package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nbTrain/nbPredict: learns separable char distributions; dense " +
    "model shape; too-short docs predict NULL") {
    val train = Seq(
      ("a", "alpha beta gamma alpha beta gamma alpha beta"),
      ("a", "beta gamma alpha beta alpha gamma gamma beta"),
      ("b", "omega sigma delta omega sigma delta omega"),
      ("b", "delta sigma omega delta omega sigma sigma")
    ).toDF("cls", "text")
    val model = NaiveBayes.nbTrain(train, "cls", col("text"), dims = 64)

    // dense: every class carries all 64 buckets; base constant per class
    assert(model.count() == 128L)
    assert(model.select("label", "base").distinct().count() == 2L)
    assert(model.agg(min("w")).head().getLong(0) >= 1L)

    val test = Seq(
      (1L, "alpha gamma beta alpha"),
      (2L, "sigma omega delta"),
      (3L, "x") // one char: no trigram, prediction undefined
    ).toDF("id", "text")
    val got = NaiveBayes.nbPredict(test, "id", col("text"), model,
        dims = 64)
      .select(col("id"), col("predicted"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None))
  }

  test("CharGramBuckets ≡ split→shingles→rollingFingerprint→mod on " +
    "BMP text including spaces and non-ASCII") {
    val texts = Seq("hello world", "straße über x", "ab", "a", "",
      "zhongwen 中文 mixed")
    val df = texts.toDF("t")
    val fused = df.select(
      org.apache.spark.sql.GraftBridge.column(
        graft.exprs.CharGramBuckets(
          org.apache.spark.sql.GraftBridge.expression(lower(col("t"))),
          3, 64)).as("b"))
      .as[Seq[Long]].collect().toSeq
    val composed = df.select(
      transform(
        Dedup.shingles(split(lower(col("t")), ""), 3),
        g => TextStats.rollingFingerprint(g) % 64).as("b"))
      .as[Seq[Long]].collect().toSeq
    assert(fused == composed)
  }

  test("nbPredict: equal-score tie breaks to the lexicographically " +
    "smallest label") {
    // identical class distributions -> every doc ties across classes
    val train = Seq(("z", "same text here"), ("a", "same text here"))
      .toDF("cls", "text")
    val model = NaiveBayes.nbTrain(train, "cls", col("text"), dims = 32)
    val got = NaiveBayes.nbPredict(
        Seq((1L, "same text here")).toDF("id", "text"),
        "id", col("text"), model, dims = 32)
      .select("predicted").as[String].head()
    assert(got == "a")
  }
}
