package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // explicit \uXXXX escapes throughout: decomposed (e + combining
  // acute U+0301) vs precomposed (U+00E9) are visually identical in source
  private def nfc(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextStats.nfcNormalize(col("t"))).as[String].head()

  test("nfc: composes decomposed sequences, idempotent, ASCII passthrough") {
    assert(nfc("e\u0301") == "\u00e9", "e + combining acute -> precomposed")
    assert(nfc("a\u0301b") == "\u00e1b")
    assert(nfc("\u00e9") == "\u00e9", "already composed unchanged")
    assert(nfc(nfc("e\u0301")) == "\u00e9", "idempotent")
    assert(nfc("plain ascii 123") == "plain ascii 123")
    assert(nfc("") == "")
  }

  test("nfc: does not touch sequences with no canonical composition") {
    // ZWJ emoji families have no NFC change
    val fam = "👨‍👩‍👧"
    assert(nfc(fam) == fam)
  }

  test("nfc: null propagates, non-string input fails at analysis") {
    val r = Seq((1, Option.empty[String]), (2, Some("e\u0301")))
      .toDF("id", "t")
      .select(col("id"), TextStats.nfcNormalize(col("t")).as("n"))
      .collect().map(x => x.getInt(0) -> Option(x.getString(1))).toMap
    assert(r(1).isEmpty && r(2).contains("\u00e9"))
    val e = intercept[Exception] {
      Seq(Tuple1(1L)).toDF("t").select(TextStats.nfcNormalize(col("t"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("nfc before fingerprinting: composed and decomposed text dedup together") {
    val df = Seq((1L, "cafe\u0301"), (2L, "caf\u00e9")).toDF("id", "t")
    val rawKeys = df.select(TextStats.fingerprint(col("t"))).distinct().count()
    val nfcKeys = df.select(TextStats.fingerprint(
      TextStats.nfcNormalize(col("t")))).distinct().count()
    assert(rawKeys == 2L, "raw bytes differ")
    assert(nfcKeys == 1L, "normalized text hashes identically")
  }
}
