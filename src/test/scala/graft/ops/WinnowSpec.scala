package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // plain-Scala reference: same hash (RollingHashImpl's recurrence over
  // codepoints), same winnow rule (window min, rightmost tie, distinct)
  private def refHash(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp.toLong) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }
  private def refWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val ws = text.toLowerCase.split(" ", -1)
    val hs = (0 to ws.length - k).map(i => refHash(ws.slice(i, i + k).mkString(" ")))
    (w - 1 until hs.length).map { end =>
      val lo = end - w + 1
      // min hash in window, rightmost occurrence
      val best = (lo to end).minBy(p => (hs(p), -p))
      (hs(best), best.toLong)
    }.toSet
  }

  test("winnowFingerprints equals the reference winnower on mixed docs") {
    val texts = Seq(
      "a b c d e f g h i j",
      "the cat sat on the mat and the cat sat again",
      "x x x x x x x x", // all-equal hashes: rightmost-tie exercised hard
      "one two three four five six seven one two three four five")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val k = 3; val w = 4
    val got = Dedup.winnowFingerprints(df, "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (d, a) => d -> a.map(r => (r._2, r._3)).toSet }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty) == refWinnow(t, k, w),
        s"doc $i")
    }
  }

  test("winnowing guarantee: a shared run of >= w + k - 1 words shares " +
    "a fingerprint; short docs emit nothing") {
    val k = 4; val w = 5
    val shared = "q1 q2 q3 q4 q5 q6 q7 q8" // w + k - 1 = 8 words
    val df = Seq(
      (1L, s"alpha beta gamma $shared delta"),
      (2L, s"$shared omega psi chi phi upsilon"),
      (3L, "too short here")) // < k + w - 1 words: no full window
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(df, "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect()
    val by = fp.groupBy(_._1).map { case (d, a) => d -> a.map(_._2).toSet }
    assert(by(1L).intersect(by(2L)).nonEmpty,
      "shared run must share a fingerprint hash")
    assert(!by.contains(3L), "sub-window doc emits nothing")
  }
}
