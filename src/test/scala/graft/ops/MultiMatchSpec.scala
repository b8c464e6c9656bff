package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.exprs.AcAutomaton

class MultiMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(text: String, terms: Seq[String]): Map[String, Long] = {
    val ac = new AcAutomaton(terms.toArray)
    val got = ac.counts(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    terms.zip(got).toMap
  }

  test("overlapping occurrences all count; terms nested in other terms " +
    "still fire (the fail-link path)") {
    // 'aa' in 'aaaa' at offsets 0,1,2; 'he' fires inside both 'she' and
    // 'hers' — the classic AC dictionary
    assert(counts("aaaa", Seq("aa")) == Map("aa" -> 3L))
    val got = counts("xhersheyz", Seq("he", "she", "hers"))
    assert(got == Map("he" -> 2L, "she" -> 1L, "hers" -> 1L))
  }

  test("non-ASCII input characters reset the automaton but never crash; " +
    "matches on either side still count") {
    // the emoji (non-BMP, two UTF-16 chars) sits between two hits
    assert(counts("bad😀bad", Seq("bad")) == Map("bad" -> 2L))
    // a term can never span a non-ASCII char
    assert(counts("baéd", Seq("bad")) == Map("bad" -> 0L))
  }

  test("differential vs naive indexOf counting on random ASCII strings") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abc "
    val terms = Seq("a", "ab", "ba", "abc", "aa", "c b", "bb")
    val ac = new AcAutomaton(terms.toArray)
    (0 until 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = ac.counts(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      terms.zipWithIndex.foreach { case (t, i) =>
        var n = 0L
        var from = s.indexOf(t)
        while (from >= 0) { n += 1; from = s.indexOf(t, from + 1) }
        assert(got(i) == n, s"term '$t' in '$s': got ${got(i)}, want $n")
      }
    }
  }

  test("rejects empty, non-ASCII and duplicate patterns") {
    intercept[IllegalArgumentException](new AcAutomaton(Array("a", "")))
    intercept[IllegalArgumentException](new AcAutomaton(Array("café")))
    intercept[IllegalArgumentException](new AcAutomaton(Array("a", "a")))
    intercept[IllegalArgumentException](new AcAutomaton(Array.empty[String]))
  }

  test("blocklistCounts emits only hits, phrases with spaces match as " +
    "substrings, and the gate keeps exactly the zero-hit rows") {
    val d = Seq(
      (1L, "clean text here", 15L),
      (2L, "a big data table", 16L),
      (3L, "slow slow big data", 18L),
      (4L, "nothing at all", 14L)
    ).toDF("doc_id", "text", "n_chars")
    val terms = Seq("slow", "big data")
    val tags = TextStats.blocklistCounts(d, "doc_id", col("text"), terms)
      .as[(Long, String, Long)].collect().toSet
    assert(tags == Set(
      (2L, "big data", 1L), (3L, "slow", 2L), (3L, "big data", 1L)))
    val kept = TextStats.blocklistGate(d, col("text"), terms)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("the plan holds ONE expression node regardless of blocklist size " +
    "(terms are a reference object, not literals)") {
    val d = Seq((1L, "x")).toDF("doc_id", "text")
    val big = (0 until 500).map(i => s"term$i")
    // analyzed plan: the optimizer folds a LocalRelation input entirely
    val plan = TextStats.blocklistGate(d, col("text"), big)
      .queryExecution.analyzed.toString
    assert(plan.contains("multi_match_total"))
    // no per-term literal leaks into the plan text
    assert(!plan.contains("term499") && plan.length < 4000, plan.length)
  }

  test("blocklistSpans: byte-exact offsets past non-ASCII, overlapping " +
    "occurrences all emitted, spans slice to their term") {
    val t = "héllo aa aaa slow x"
    val d = Seq((1L, t)).toDF("doc_id", "text")
    val got = TextStats.blocklistSpans(d, "doc_id", col("text"),
        Seq("aa", "slow"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 7L, 9L, "aa"), (1L, 10L, 12L, "aa"), (1L, 11L, 13L, "aa"),
      (1L, 14L, 18L, "slow")))
    val bytes = t.getBytes("UTF-8")
    got.foreach { case (_, s, e, term) =>
      assert(new String(bytes.slice(s.toInt, e.toInt), "UTF-8") == term)
    }
    // span count always equals the per-term counts
    val nFromCounts = TextStats.blocklistCounts(
        d, "doc_id", col("text"), Seq("aa", "slow"))
      .agg(sum("n")).as[Long].head()
    assert(nFromCounts == got.size.toLong)
  }

  test("blocklistGate keeps null-text rows (null contains no term; the " +
    "null-intolerant total must not silently drop them)") {
    val d = Seq((1L, "slow text"), (2L, null), (3L, "clean"))
      .toDF("doc_id", "text")
    val kept = TextStats.blocklistGate(d, col("text"), Seq("slow"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("total equals the sum of per-pattern counts on random strings") {
    val rnd = new scala.util.Random(97)
    val alphabet = "abcd"
    val terms = Seq("a", "ab", "abc", "bb", "dd", "cda")
    val ac = new AcAutomaton(terms.toArray)
    (0 until 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(50))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      assert(ac.total(u) == ac.counts(u).sum, s"on '$s'")
    }
  }
}
