package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Seeded differential properties for the curation family: random inputs
  * vs independent in-memory oracles. These cover the integer-arithmetic
  * corners the hand-checked cases cannot enumerate — rank selection at
  * every quantile boundary, packing with adversarial token sizes, and
  * n-gram overlap on random short texts.
  */
class CurationPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactGroupedQuantiles equals the sorted-seq oracle on random data") {
    val rnd = new Random(440001L)
    for (round <- 0 until 5) {
      val groups = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      val rows = groups.flatMap { g =>
        val n = 1 + rnd.nextInt(20)
        // duplicate values on purpose: ties must stay deterministic
        (0 until n).map(i => (g, (g.hashCode.abs * 100 + i).toLong,
          rnd.nextInt(8).toLong))
      }
      val qs = Seq(1 + rnd.nextInt(3333), 5000, 9000 + rnd.nextInt(1001))
      val got = Stats.exactGroupedQuantiles(
        rows.toDF("g", "id", "v"), "g", col("v"), "id", qs)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(t => (t._3, t._2)).sorted.map(_._1)
        val n = sorted.length
        def pick(q: Int): Long = {
          val rank = (q.toLong * n + 9999) / 10000 // ceil(q*n/1e4)
          sorted((rank - 1).toInt)
        }
        g -> ((n.toLong, pick(qs(0)), pick(qs(1)), pick(qs(2))))
      }
      assert(got == want, s"round $round qs=$qs: got=$got want=$want")
    }
  }

  test("packShards equals the sequential in-memory packer on random sizes") {
    val rnd = new Random(440002L)
    for (round <- 0 until 5) {
      val budget = 50L + rnd.nextInt(200)
      val rows = Seq("x", "y").flatMap { g =>
        (0 until (1 + rnd.nextInt(30))).map { i =>
          // adversarial sizes: zeros, exact-budget, oversize
          val tok = rnd.nextInt(4) match {
            case 0 => 0L
            case 1 => budget
            case 2 => budget * 2 + rnd.nextInt(50)
            case _ => 1L + rnd.nextInt(budget.toInt)
          }
          (g, (g.hashCode.abs * 1000 + i).toLong, tok)
        }
      }
      val got = Curation.packShards(
        rows.toDF("g", "id", "tok"), "g", "id", col("tok"), budget)
        .select("id", "shard_seq").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy(_._2).map { case (_, id, tok) =>
          val shard = cum / budget
          cum += tok
          id -> shard
        }
      }
      assert(got == want, s"round $round budget=$budget: " +
        s"diff=${(got.toSet -- want.toSet).toSeq.sortBy(_._1).take(5)}")
    }
  }

  test("ngramOverlap equals the set-intersection oracle on random texts") {
    val rnd = new Random(440003L)
    val vocab = Array("a", "b", "c", "d", "e")
    def randText() =
      (0 until (1 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(5)))
        .mkString(" ")
    for (round <- 0 until 3) {
      val corpus = (0L until 12L).map(i => (i, randText()))
      val probes = (100L until 104L).map(i => (i, randText()))
      val k = 2 + rnd.nextInt(2)
      def shingleSet(t: String): Set[String] = {
        val ws = t.toLowerCase.split(" ", -1)
        if (ws.length < k) Set.empty
        else ws.sliding(k).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (did, dt) <- corpus
        (pid, pt) <- probes
        ds = shingleSet(dt)
        ps = shingleSet(pt)
        if ps.nonEmpty
        shared = (ds & ps).size
        bp = math.floor(shared * 10000.0 / ps.size).toLong
        if bp >= 5000
      } yield (did, pid, shared.toLong, ps.size.toLong, bp)).toSet
      val got = Decontam.ngramOverlap(
        corpus.toDF("doc_id", "text"), probes.toDF("probe_id", "text"),
        "doc_id", "probe_id", "text", k = k, minContamBp = 5000,
        maxShingleDf = 10000)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"round $round k=$k: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("globalRank equals the in-memory sort on random data at random " +
    "chunk spans (including spans that collapse to one chunk)") {
    val rnd = new Random(440077L)
    for (round <- 0 until 5) {
      val n = 50 + rnd.nextInt(300)
      // heavy ties (scores mod small range) exercise the tiebreak; ids
      // are a shuffled dense range so ties span chunk boundaries
      val rows = rnd.shuffle((0L until n.toLong).toVector)
        .map(id => (id, rnd.nextInt(40).toLong - 20L))
      val span = Seq(1L, 7L, 64L, 100000L)(rnd.nextInt(4))
      val phases = 1 + rnd.nextInt(5)
      val got = Curation.globalRank(rows.toDF("id", "score"),
          "score", "id", nPhases = phases, chunkSpan = span)
        .select("id", "global_rank", "phase")
        .as[(Long, Long, Long)].collect().toSet
      val want = rows.sortBy(t => (t._2, t._1)).zipWithIndex.map {
        case ((id, _), rank) =>
          (id, rank.toLong, rank.toLong * phases / n)
      }.toSet
      assert(got == want, s"round $round span=$span phases=$phases: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }
}
