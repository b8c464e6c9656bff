package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkWords: geometry, overlap, short tail, degenerate docs") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 words
      (2L, "a b c"), // shorter than one chunk
      (3L, "") // empty text -> one empty chunk
    ).toDF("doc_id", "text")
    val got = TextStats.chunkWords(docs, "doc_id", "text", 16, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 1: n = 1 + ceil((20-16)/8) = 2 chunks
    assert(got((1L, 0L)) == ((1L, 16L, (1 to 16).map(i => s"w$i").mkString(" "))))
    assert(got((1L, 1L)) == ((9L, 12L, (9 to 20).map(i => s"w$i").mkString(" "))),
      "second chunk overlaps 8 words and carries the short tail")
    assert(got((2L, 0L)) == ((1L, 3L, "a b c")))
    assert(got((3L, 0L)) == ((1L, 1L, "")), "empty text is one empty chunk")
    assert(got.size == 4)
  }

  test("chunkWords: stride == chunk means zero overlap and full coverage") {
    val docs = Seq((1L, (1 to 10).map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextStats.chunkWords(docs, "doc_id", "text", 4, 4)
      .orderBy("chunk_idx")
      .select("chunk_text").as[String].collect()
    assert(chunks.toSeq == Seq("1 2 3 4", "5 6 7 8", "9 10"))
    assert(chunks.mkString(" ") == (1 to 10).map(_.toString).mkString(" "),
      "non-overlapping chunks reconstruct the document")
  }

  test("intervalJoin condition: inclusive bounds, per-key, no backward matches") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val l = Seq(("c1", 0, ts(1000)), ("c2", 0, ts(1000)))
      .toDF("conv_id", "u_turn_idx", "u_ts")
    val r = Seq(
      ("c1", 1, ts(999)), // before the anchor: no match
      ("c1", 2, ts(1000)), // boundary: inclusive
      ("c1", 3, ts(4600)), // boundary: u_ts + 3600 inclusive
      ("c1", 4, ts(4601)), // past the window
      ("c2", 5, ts(2000)) // other key
    ).toDF("conv_id", "t_turn_idx", "t_ts")
    // batch frames: withWatermark is a no-op, the join condition is what
    // is under test (the streaming state machine is pinned by the
    // q_stream_join file-replay oracle)
    val got = graft.streaming.StreamingFeatures
      .intervalJoin(l, "u_ts", r, "t_ts", "conv_id", 3600L, "2 hours")
      .select("conv_id", "u_turn_idx", "t_turn_idx")
      .as[(String, Int, Int)].collect().toSet
    assert(got == Set(("c1", 0, 2), ("c1", 0, 3), ("c2", 0, 5)))
  }
}
