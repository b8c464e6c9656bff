package graft.streaming

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ops.Dedup

class StreamNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def indexOf(standing: org.apache.spark.sql.DataFrame) = (
    standing.select(md5(col("text").cast("binary")).as("hash")).distinct(),
    Dedup.minhashBands(standing, "doc_id", "text")
      .select("band_idx", "band_key").distinct()
  )

  test("live flags equal batch incrementalFlags under random batch splits " +
    "(exact dups, near dups, short docs, clean docs)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(520001L)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for (round <- 0 until 3) {
      val standingRows = (0 until 20).map { i =>
        (100L + i, s"$base doc$i tail${i % 4} extra${rnd.nextInt(3)}")
      }
      val deltaRows = (0 until 24).map { i =>
        val text = rnd.nextInt(4) match {
          case 0 => standingRows(rnd.nextInt(standingRows.size))._2 // exact
          case 1 => // near: perturb one word of a standing doc
            standingRows(rnd.nextInt(standingRows.size))._2 + " perturbed"
          case 2 => "ti ny" // too short for 3-shingles: no signature
          case _ => s"fresh unseen text number ${rnd.nextInt(1000)} doc$i " +
            s"with enough words to shingle properly here"
        }
        (i.toLong, text)
      }
      val standing = standingRows.toDF("doc_id", "text")
      val (oldHashes, oldBands) = indexOf(standing)
      val want = Dedup.incrementalFlags(
          deltaRows.toDF("doc_id", "text"), standing, "doc_id", "text")
        .as[(Long, Boolean, Boolean, Boolean)].collect().toSet

      val input = MemoryStream[(Long, String)]
      val q = StreamingFeatures.nearDupFlags(
          input.toDF().toDF("doc_id", "text"), oldHashes, oldBands,
          "doc_id", "text")
        .writeStream.outputMode("append")
        .format("memory").queryName(s"sneardup_$round").start()
      // random chunking: dups may straddle micro-batches freely — the
      // gate is stateless, so any split must give identical flags
      var rest = deltaRows
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(rest.size)
        input.addData(rest.take(n): _*)
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      q.stop()
      val got = spark.table(s"sneardup_$round")
        .as[(Long, Boolean, Boolean, Boolean)].collect().toSet
      assert(got == want, s"round $round: missing=${want -- got} " +
        s"extra=${got -- want}")
      // sanity: the fixture actually exercises every flag combination
      assert(want.exists(_._2), "no exact dup in fixture")
      assert(want.exists(r => r._3 && !r._2), "no near-only dup in fixture")
      assert(want.exists(_._4), "no kept doc in fixture")
    }
  }

  test("a standing/delta id collision never flags (flags key on content, " +
    "ids live in disjoint spaces)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val standing = Seq((7L, "standing only text with plenty of words here"))
      .toDF("doc_id", "text")
    val (oldHashes, oldBands) = indexOf(standing)
    val input = MemoryStream[(Long, String)]
    val q = StreamingFeatures.nearDupFlags(
        input.toDF().toDF("doc_id", "text"), oldHashes, oldBands,
        "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("sneardup_idcol").start()
    input.addData((7L, "completely different fresh content words entirely"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sneardup_idcol")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got == Seq((7L, false, false, true)))
  }
}
