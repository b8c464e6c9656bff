package graft.streaming

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Seeded differential property for the stateless-output streaming
  * operators: random transcripts replayed through MemoryStream under
  * random micro-batch splits must equal an independent in-memory oracle.
  * The split respects only the documented cross-batch contract (rows
  * arrive in global (ts, turn_idx) — resp. doc_id — order; chunk
  * boundaries land anywhere, including mid-conversation and mid-duplicate-
  * pair), so every run exercises state carried across arbitrary batch
  * boundaries.
  */
class StreamingPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import StreamingFeatures.{DocEvent, TurnToolEvent}

  private def randomChunks[A](rows: Seq[A], rnd: Random): Seq[Seq[A]] = {
    if (rows.isEmpty) return Seq.empty
    val nCuts = rnd.nextInt(4) // 0..3 boundaries -> 1..4 batches
    val cuts = Seq.fill(nCuts)(rnd.nextInt(rows.size + 1)).sorted
    ((0 +: cuts) :+ rows.size).sliding(2).collect {
      case Seq(a, b) if b > a => rows.slice(a, b)
    }.toSeq
  }

  test("streaming LOCF equals the in-memory oracle under random batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new Random(420005L)
    for (round <- 0 until 5) {
      val keys = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      val rows = keys.flatMap { k =>
        val n = 1 + rnd.nextInt(8)
        (0 until n).map { i =>
          val tool =
            if (rnd.nextBoolean()) None
            else Some(Seq("search", "code", "fetch")(rnd.nextInt(3)))
          // duplicate timestamps across keys AND within a key are legal;
          // (ts, turn_idx) is the total order within a conversation
          TurnToolEvent(k, i, tool, new Timestamp(1000L * (1 + rnd.nextInt(5))))
        }
      }
      val arrival = rows.sortBy(t => (t.ts.getTime, t.conv_id, t.turn_idx))
      // oracle: per key in (ts, turn_idx) order, carry last non-null
      val want = rows.groupBy(_.conv_id).flatMap { case (k, ts) =>
        var last: Option[String] = None
        ts.sortBy(t => (t.ts.getTime, t.turn_idx)).map { t =>
          if (t.tool.isDefined) last = t.tool
          (k, t.turn_idx, last)
        }
      }.toSet
      val input = MemoryStream[TurnToolEvent]
      val q = StreamingFeatures.locf(input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName(s"prop_locf_$round").start()
      randomChunks(arrival, rnd).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"prop_locf_$round")
        .collect().map(r => (r.getString(0), r.getInt(1), Option(r.getString(2))))
        .toSet
      assert(got == want, s"round $round: " +
        s"missing=${(want -- got).toSeq.sortBy(x => (x._1, x._2))} " +
        s"extra=${(got -- want).toSeq.sortBy(x => (x._1, x._2))}")
    }
  }

  test("streaming dedup equals min-doc_id-wins under random batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new Random(420006L)
    for (round <- 0 until 5) {
      val nDocs = 5 + rnd.nextInt(15)
      // few hash values -> guaranteed collisions, some singletons
      val rows = (0 until nDocs).map { i =>
        DocEvent(i.toLong, s"h${rnd.nextInt(1 + nDocs / 3)}")
      }
      val arrival = rows.sortBy(_.doc_id) // documented contract
      val firstPerHash = rows.groupBy(_.hash).map { case (h, ds) =>
        h -> ds.map(_.doc_id).min
      }
      val want = rows.map(d =>
        (d.doc_id, d.hash, d.doc_id == firstPerHash(d.hash))).toSet
      val input = MemoryStream[DocEvent]
      val q = StreamingFeatures.dedupExact(input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName(s"prop_dedup_$round").start()
      randomChunks(arrival, rnd).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"prop_dedup_$round")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
        .toSet
      assert(got == want, s"round $round: " +
        s"missing=${(want -- got).toSeq.sortBy(_._1)} " +
        s"extra=${(got -- want).toSeq.sortBy(_._1)}")
    }
  }

  test("streaming FORWARD as-of equals the in-memory oracle under random " +
      "batch splits (with and without tolerance)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingFeatures.{AsOfEvent, AsOfOut}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new Random(420007L)
    def ts(s: Long) = new Timestamp(s * 1000L)
    for (round <- 0 until 6) {
      val keys = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      val tol = if (round % 2 == 0) None else Some(1000L * (3 + rnd.nextInt(8)))
      val anchors = (0 until (8 + rnd.nextInt(20))).map { i =>
        AsOfEvent(keys(rnd.nextInt(keys.size)), 1, i, None,
          ts(rnd.nextInt(50).toLong))
      }
      // feed pre-reduced to one row per (key, ts) — the documented contract
      val feeds = keys.flatMap { k =>
        (0 until 40).filter(_ => rnd.nextBoolean() && rnd.nextBoolean())
          .map(t => AsOfEvent(k, 0, 0, Some(s"v$k-$t"), ts(t.toLong)))
      }
      // far-future null-value sentinel per key flushes never-matching anchors
      val sentinels = keys.map(k => AsOfEvent(k, 0, 0, None, ts(1000000L)))
      // arrival contract: event-time order per key, anchors BEFORE feed at
      // equal ts (the equal-ts observation must see the pending anchor)
      val arrival = (anchors ++ feeds ++ sentinels)
        .sortBy(e => (e.ts.getTime, -e.src, e.turn_idx))
      val want = anchors.map { a =>
        val future = feeds.filter(f =>
          f.conv_id == a.conv_id && !f.ts.before(a.ts))
        val first = future.sortBy(_.ts.getTime).headOption
        val expected = first match {
          case Some(f)
              if tol.forall(t => f.ts.getTime - a.ts.getTime <= t) => f.value
          case _ => None // too far ahead, or only the sentinel remains
        }
        (a.conv_id, a.turn_idx) -> expected
      }.toMap
      val input = MemoryStream[AsOfEvent]
      val q = StreamingFeatures.asOfForward(input.toDS(), toleranceMs = tol)
        .writeStream.outputMode("append")
        .format("memory").queryName(s"prop_asof_fwd_$round").start()
      randomChunks(arrival, rnd).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"prop_asof_fwd_$round")
        .as[AsOfOut].collect()
        .map(o => (o.conv_id, o.turn_idx) -> o.tool_asof).toMap
      assert(got == want, s"round $round (tol=$tol): " +
        s"diff=${(want.toSet diff got.toSet) ++ (got.toSet diff want.toSet)}")
    }
  }
}
