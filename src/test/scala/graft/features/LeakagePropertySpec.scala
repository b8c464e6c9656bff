package graft.features

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-style tests: zero temporal leakage and session invariants
  * under adversarial random transcripts — duplicate timestamps,
  * out-of-order rows, tiny/empty sides (BASELINE.md "Temporal leakage:
  * zero"). Deterministic seeds, 15 trials each.
  */
class LeakagePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Random rows with heavy ts collisions: (conv, turn_idx, tsMillis). */
  private def genRows(seed: Int): List[(String, Int, Long)] = {
    val rnd = new Random(seed)
    val nConv = 1 + rnd.nextInt(4)
    List
      .fill(30)((s"c${rnd.nextInt(nConv)}", rnd.nextInt(15),
        rnd.nextInt(10).toLong * 1000L))
      .distinctBy(r => (r._1, r._2))
  }

  test("as-of join never reads right rows with ts > anchor ts (15 seeds)") {
    for (seed <- 1 to 15) {
      val rows = genRows(seed)
      val anchors = rows
        .map { case (c, i, t) => (c, i, new Timestamp(t)) }
        .toDF("conv_id", "turn_idx", "ts")
      val right = rows
        .map { case (c, i, t) =>
          (c, new Timestamp(t + (i % 3) * 500L - 500L), t + i)
        }
        .toDF("conv_id", "ts", "obs_val")
        .groupBy("conv_id", "ts")
        .agg(org.apache.spark.sql.functions.max("obs_val").as("obs_val"))
      val joined = AsOf.joinBackward(anchors, right, Seq("conv_id")).collect()
      val rightLocal = right.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      // output column order: conv_id, ts, turn_idx, obs_val
      joined.foreach { row =>
        if (!row.isNullAt(3)) {
          val conv = row.getString(0)
          val anchorTs = row.getTimestamp(1).getTime
          val v = row.getLong(3)
          val matched = rightLocal.filter(r => r._1 == conv && r._3 == v)
          assert(matched.exists(_._2 <= anchorTs),
            s"seed $seed leak: obs_val $v in $conv has no source ts <= $anchorTs")
          val best = rightLocal
            .filter(r => r._1 == conv && r._2 <= anchorTs)
            .maxBy(_._2)
          assert(matched.head._2 == best._2,
            s"seed $seed not latest: got ${matched.head._2}, best ${best._2}")
        }
      }
    }
  }

  test("forward join matches are always the EARLIEST right ts >= anchor " +
    "(15 seeds; union-merge and native agree)") {
    for (seed <- 200 to 214) {
      val rows = genRows(seed)
      val anchors = rows
        .map { case (c, i, t) => (c, i, new Timestamp(t)) }
        .toDF("conv_id", "turn_idx", "ts")
      val right = rows
        .map { case (c, i, t) =>
          (c, new Timestamp(t + (i % 3) * 500L - 500L), t + i)
        }
        .toDF("conv_id", "ts", "obs_val")
        .groupBy("conv_id", "ts")
        .agg(org.apache.spark.sql.functions.max("obs_val").as("obs_val"))
      val rightLocal = right.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      def check(df: org.apache.spark.sql.DataFrame, tag: String): Unit =
        df.select("conv_id", "ts", "obs_val").collect().foreach { row =>
          val conv = row.getString(0)
          val anchorTs = row.getTimestamp(1).getTime
          // RAW-precision eligibility: both forward implementations match
          // on full timestamp precision (sub-second offsets included)
          val candidates = rightLocal
            .filter(r => r._1 == conv && r._2 >= anchorTs)
          if (row.isNullAt(2))
            assert(candidates.isEmpty,
              s"$tag seed $seed: null match but ${candidates.length} candidates")
          else {
            val v = row.getLong(2)
            val earliest = candidates.minBy(_._2)
            assert(v == earliest._3,
              s"$tag seed $seed: got $v, earliest-at->=anchor is ${earliest._3}")
          }
        }
      check(AsOf.joinForward(anchors, right, Seq("conv_id")), "union")
      check(AsOfNative.joinForward(anchors, right, Seq("conv_id")), "native")
    }
  }

  test("sessionize ids are dense, start at 0, and respect the gap (15 seeds)") {
    for (seed <- 100 to 114) {
      val rows = genRows(seed)
      val df = rows
        .map { case (c, i, t) => (c, i, new Timestamp(t)) }
        .toDF("conv_id", "turn_idx", "ts")
      val out = Sessionize(df, Seq("conv_id"), "ts", 2L, Seq("turn_idx"))
        .select("conv_id", "turn_idx", "ts", "session_seq")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getTimestamp(2).getTime,
          r.getLong(3)))
      out.groupBy(_._1).foreach { case (_, convRows) =>
        val sorted = convRows.sortBy(r => (r._3, r._2))
        var prevTs = Long.MinValue
        var prevSeq = -1L
        sorted.foreach { case (_, _, ts, seq) =>
          if (prevSeq < 0) assert(seq == 0L, s"seed $seed: first session != 0")
          else if (ts / 1000 - prevTs / 1000 > 2L)
            assert(seq == prevSeq + 1, s"seed $seed: gap must open session")
          else assert(seq == prevSeq, s"seed $seed: session split w/o gap")
          prevTs = ts
          prevSeq = seq
        }
      }
    }
  }
}
