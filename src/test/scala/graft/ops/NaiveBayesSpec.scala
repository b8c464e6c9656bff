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

  test("nbCrossVal: out-of-fold accuracy on separable classes; a " +
    "fold-exclusive label CANNOT predict itself (leakage check)") {
    val aText = "alpha beta gamma alpha beta gamma"
    val bText = "omega sigma delta omega sigma delta"
    val rows = (0 until 30).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        if (i % 2 == 0) aText else bText)
    }
    val out = NaiveBayes.nbCrossVal(rows.toDF("id", "cls", "text"),
        "cls", col("text"), "id", k = 3, dims = 64)
      .select(col("id"), col("predicted"), col("ok"))
      .as[(Long, Option[String], Option[Boolean])].collect()
    assert(out.length == 30 && out.forall(_._3 == Some(true)), out.toSeq)

    // label z exists ONLY in fold 0 (ids chosen by the same gate), with
    // class a's text: fold-0 docs score against the leave-fold-0-out
    // model, which holds no z mass beyond smoothing — so z can never
    // predict itself. A leaky implementation (model including the doc's
    // own fold) would see z's mass and could.
    val zids = (100L to 300L)
      .filter(id => graft.exprs.SampleHashImpl.gateBp(id) % 3 == 0)
      .take(3)
    val rows2 = rows ++ zids.map(id => (id, "z", aText))
    val out2 = NaiveBayes.nbCrossVal(rows2.toDF("id", "cls", "text"),
        "cls", col("text"), "id", k = 3, dims = 64)
      .filter(col("label") === "z")
      .select(col("predicted"), col("ok"))
      .as[(Option[String], Option[Boolean])].collect()
    assert(out2.length == 3)
    assert(out2.forall(r => r._1 == Some("a") && r._2 == Some(false)),
      out2.toSeq)
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
