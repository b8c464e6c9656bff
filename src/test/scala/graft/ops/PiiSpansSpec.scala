package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class PiiSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spansOf(text: String): Seq[(Long, Long, String)] =
    Seq(Tuple1(text)).toDF("t")
      .select(explode(TextStats.piiSpans(col("t"))).as("sp"))
      .select("sp.start", "sp.end", "sp.kind")
      .as[(Long, Long, String)].collect().toSeq

  test("spans slice the original text's BYTES exactly, even past " +
    "non-ASCII characters") {
    val t = "héllo 10.0.0.1 x  a@b.c 1234567 end"
    val got = spansOf(t)
    val bytes = t.getBytes("UTF-8")
    assert(got == Seq((7L, 15L, "ip"), (19L, 24L, "email"), (25L, 32L, "num")))
    got.foreach { case (s, e, kind) =>
      val tok = new String(bytes.slice(s.toInt, e.toInt), "UTF-8")
      assert(graft.exprs.PiiSpansImpl.classify(tok) == kind,
        s"span [$s,$e) slices '$tok'")
    }
  }

  test("span count always equals piiTokenCount (classification shared " +
    "with the scrub) on the salted corpus") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("t", concat(col("text"), lit(" "),
        when(col("doc_id") % 4 === 0, lit("a@ex.com"))
          .when(col("doc_id") % 4 === 1, lit("10.0.0.1"))
          .otherwise(lit("1234567890"))))
    val bad = d.select(
        size(TextStats.piiSpans(col("t"))).cast("long").as("n_spans"),
        TextStats.piiTokenCount(col("t")).as("n_pii"))
      .filter(col("n_spans") =!= col("n_pii"))
    assert(bad.isEmpty)
  }

  test("classification mirrors the scrub rules on the tricky edges") {
    import graft.exprs.PiiSpansImpl.classify
    assert(classify("a@b.c") == "email")
    assert(classify("@b.com") == null) // empty local
    assert(classify("a@bc") == null) // no dot in domain
    assert(classify("a@b@c.d") == null) // two '@'
    assert(classify("a@.c") == null) // domain '.c' only 2 bytes
    assert(classify("1.2.3.4") == "ip")
    assert(classify("1.2.3.4.5") == null) // five groups
    assert(classify("1234567") == "num")
    assert(classify("123456") == null) // six digits
    assert(classify("") == null)
  }

  test("multi-space runs produce empty tokens that never span") {
    assert(spansOf("  1234567   10.0.0.1  ") ==
      Seq((2L, 9L, "num"), (12L, 20L, "ip")))
  }
}
