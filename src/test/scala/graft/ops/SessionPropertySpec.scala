package graft.ops

import scala.util.Random

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.features.{Sessionize, Windows}
import graft.ops.{TextStats => TS}

/** Seeded differential properties for the session's new operators:
  * random inputs vs independent single-threaded in-memory oracles —
  * BPE merge learning (tokenize + merge loop replayed naively), TTL'd
  * LOCF (linear scan with an expiry check), and capped sessionization
  * (gap splitter + fixed-width slicer).
  */
class SessionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- naive BPE reference --------------------------------------------------
  private def naiveTokens(s: String, vocab: Seq[String]): Vector[String] = {
    var i = 0
    val out = Vector.newBuilder[String]
    while (i < s.length) {
      val m = vocab.filter(t => s.startsWith(t, i))
        .sortBy(-_.length).headOption
      val step = m.map(_.length).getOrElse(1)
      out += m.getOrElse(s.substring(i, i + 1))
      i += step
    }
    out.result()
  }
  private def naiveApply(toks: Vector[String], t1: String, t2: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == t1 && toks(i + 1) == t2) {
        out += (t1 + t2); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }
  private def naiveLearn(
      docs: Seq[String], vocab: Seq[String], rounds: Int
  ): Seq[(Int, String, String, String, Long)] = {
    var seqs = docs.map(naiveTokens(_, vocab)).toVector
    var learned = Vector.empty[(Int, String, String, String, Long)]
    var done = false
    for (r <- 1 to rounds if !done) {
      val counts = seqs.flatMap(ts => ts.zip(ts.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.isEmpty) done = true
      else {
        val ((t1, t2), n) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        learned :+= ((r, t1, t2, t1 + t2, n))
        seqs = seqs.map(naiveApply(_, t1, t2))
      }
    }
    learned
  }

  test("bpeLearnMerges equals the naive tokenize+merge oracle on " +
    "random corpora") {
    val rnd = new Random(550001L)
    for (_ <- 0 until 6) {
      val alpha = "ab "
      val docs = (0 until 3 + rnd.nextInt(4)).map { _ =>
        (0 until 4 + rnd.nextInt(24))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val vocab = Seq("a", "b", " ")
      val rounds = 1 + rnd.nextInt(4)
      val got = TS.bpeLearnMerges(docs.toDF("text"), "text", vocab, rounds)
        .as[(Int, String, String, String, Long)].collect().toSeq
      val want = naiveLearn(docs, vocab, rounds)
      assert(got == want, s"docs=$docs rounds=$rounds")
    }
  }

  // ---- TTL'd LOCF vs linear scan -------------------------------------------
  test("locfTtl equals the per-key linear-scan oracle on random data") {
    val rnd = new Random(550002L)
    for (_ <- 0 until 5) {
      val rows = (0 until 60).map { i =>
        val k = s"k${rnd.nextInt(4)}"
        val ts = rnd.nextInt(500).toLong
        val v = if (rnd.nextBoolean()) Some(s"v${rnd.nextInt(3)}") else None
        (k, i, new Timestamp(ts * 1000L), v)
      }
      val ttl = 20L + rnd.nextInt(100)
      val w = Window.partitionBy("k").orderBy("ts", "idx")
      val got = Windows.locfTtl(
          rows.toDF("k", "idx", "ts", "v"), w, "v", "ts", ttl)
        .select(col("k"), col("idx"), col("v_ttl"))
        .as[(String, Int, Option[String])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(t => (t._3.getTime, t._2))
        var last: Option[(Long, String)] = None
        sorted.map { case (k, i, ts, v) =>
          v.foreach(x => last = Some((ts.getTime / 1000L, x)))
          val out = last.collect {
            case (ots, x) if ts.getTime / 1000L - ots <= ttl => x
          }
          (k, i) -> out
        }
      }
      assert(got == want)
    }
  }

  // ---- capped sessionize vs naive splitter ---------------------------------
  test("capped sessionize equals the naive gap+slice oracle on random " +
    "data") {
    val rnd = new Random(550003L)
    for (_ <- 0 until 5) {
      val rows = (0 until 50).map { i =>
        (s"k${rnd.nextInt(3)}", i, new Timestamp(rnd.nextInt(2000) * 1000L))
      }
      val gap = 50L + rnd.nextInt(200)
      val cap = 30L + rnd.nextInt(150)
      val got = Sessionize.capped(
          rows.toDF("k", "idx", "ts"), Seq("k"), "ts", gap, cap, Seq("idx"))
        .select(col("idx"), col("session_seq"), col("slice_seq"))
        .as[(Int, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(t => (t._3.getTime, t._2))
        var seq = -1L
        var prev = Long.MinValue
        var start = 0L
        sorted.map { case (_, i, ts) =>
          val t = ts.getTime / 1000L
          if (prev == Long.MinValue || t - prev > gap) { seq += 1; start = t }
          prev = t
          i -> ((seq, (t - start) / cap))
        }
      }
      assert(got == want, s"gap=$gap cap=$cap")
    }
  }
}
