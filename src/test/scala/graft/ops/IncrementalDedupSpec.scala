package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val old = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "completely different content about spark engines"),
    (102L, "tiny")
  ).toDF("doc_id", "text")

  private val fresh = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 100
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup of 100
    (3L, "an entirely novel document with nothing shared whatsoever here"),
    (4L, "tiny") // exact dup of 102, too short for shingles
  ).toDF("doc_id", "text")

  test("incrementalFlags: exact by hash, near by shared band, short docs exact-only") {
    val got = Dedup.incrementalFlags(fresh, old, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(got(1L)._1, "exact dup flagged")
    assert(got(1L)._2, "exact dup is also a near dup (identical bands)")
    assert(!got(1L)._3)
    assert(!got(2L)._1 && got(2L)._2 && !got(2L)._3, "near dup only")
    assert(got(3L) == ((false, false, true)), "novel doc kept")
    assert(got(4L) == ((true, false, false)),
      "short doc: no shingles, exact path still catches it")
  }

  test("incrementalKept returns exactly the kept rows, schema preserved") {
    val kept = Dedup.incrementalKept(fresh, old, "doc_id", "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(3L))
  }

  test("one-directional: old docs are never dropped, and a second batch sees batch one's survivors only if the caller appends them") {
    // the operator compares against oldDf ONLY: a batch-2 doc equal to
    // an OLD doc is dropped, while one equal to a batch-1 survivor that
    // was never appended to the standing corpus is kept — appending
    // survivors (and their index rows) between batches is the caller's
    // contract, not something the operator does implicitly
    val batch2 = Seq(
      (10L, "tiny"), // still in the standing corpus
      (11L, "an entirely novel document with nothing shared whatsoever here")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalFlags(batch2, old, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!got(10L) && got(11L))
  }
}
