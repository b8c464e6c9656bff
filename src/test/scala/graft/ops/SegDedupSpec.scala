package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class SegDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("line-split dedup: global first occurrence survives, later docs " +
    "lose the repeated line, reassembly preserves order") {
    val df = Seq(
      (1L, "keep me\nCOOKIE BANNER\nunique one"),
      (2L, "COOKIE BANNER\nsecond doc body"),
      (3L, "third doc\nCOOKIE BANNER\nsecond doc body")
    ).toDF("doc_id", "text")
    val got = SegDedup
      .dedupSegments(df, "doc_id", split(col("text"), "\n"), sep = "\n")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "keep me\nCOOKIE BANNER\nunique one", 3L, 0L)))
    assert(got(1) == ((2L, "second doc body", 2L, 1L)))
    assert(got(2) == ((3L, "third doc", 3L, 2L)))
  }

  test("stripBoilerplate: ubiquitous segment dropped EVERYWHERE (first " +
    "copy included), below-threshold repeats untouched") {
    val df = Seq(
      (1L, "BANNER\nbody one"),
      (2L, "BANNER\nbody two\nRARE PAIR"),
      (3L, "BANNER\nRARE PAIR\nbody three")
    ).toDF("doc_id", "text")
    val got = SegDedup
      .stripBoilerplate(df, "doc_id", split(col("text"), "\n"),
        minDf = 3, sep = "\n")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // BANNER df=3 -> gone everywhere; RARE PAIR df=2 -> survives both
    assert(got(0) == ((1L, "body one", 2L, 1L)))
    assert(got(1) == ((2L, "body two\nRARE PAIR", 3L, 1L)))
    assert(got(2) == ((3L, "RARE PAIR\nbody three", 3L, 1L)))
    // df counts DISTINCT docs: a within-doc repeat does not fake ubiquity
    val rep = Seq((1L, "X\nX\nX"), (2L, "other")).toDF("doc_id", "text")
    val kept = SegDedup.stripBoilerplate(rep, "doc_id",
        split(col("text"), "\n"), minDf = 3, sep = "\n")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(kept(0)._2 == "X\nX\nX", "3 copies in ONE doc is df=1, not 3")
    intercept[IllegalArgumentException] {
      SegDedup.stripBoilerplate(df, "doc_id", split(col("text"), "\n"), 1)
    }
  }

  test("within-document repeats drop too; a fully-duplicated document " +
    "reassembles to the empty string but keeps its row") {
    val df = Seq(
      (1L, "same\nsame\nsame"),
      (2L, "same")
    ).toDF("doc_id", "text")
    val got = SegDedup
      .dedupSegments(df, "doc_id", split(col("text"), "\n"), sep = "\n")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "same", 3L, 2L)))
    assert(got(1) == ((2L, "", 1L, 1L)))
  }

  test("wordBlocks: span-sized blocks, ragged tail, short text = one block") {
    val df = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        SegDedup.wordBlocks(col("text"), 3).as("b"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a b c", "d e f", "g"))
    assert(got(2L) == Seq("x y"))
  }

  test("invariant on random corpus: each distinct segment survives exactly " +
    "once, and n_segs/n_dropped add up") {
    val rnd = new scala.util.Random(11)
    val vocabWords = Vector("alpha", "beta", "gamma", "delta")
    val docsSeq = (0L until 40L).map { id =>
      val words = (0 until 3 + rnd.nextInt(25))
        .map(_ => vocabWords(rnd.nextInt(vocabWords.size)))
      (id, words.mkString(" "))
    }
    val df = docsSeq.toDF("doc_id", "text")
    val segs = SegDedup.wordBlocks(col("text"), 4)
    val out = SegDedup.dedupSegments(df, "doc_id", segs)
    // distinct input segments == total kept segments (each exactly once)
    val distinctIn = df.select(explode(segs).as("s")).distinct().count()
    val keptTotal = out.agg(sum(col("n_segs") - col("n_dropped"))).head().getLong(0)
    assert(keptTotal == distinctIn)
    // counts add up against the raw explode
    val totalIn = df.select(explode(segs)).count()
    val Seq(nSegs, nDropped) = out.agg(sum("n_segs"), sum("n_dropped"))
      .head().toSeq.map(_.asInstanceOf[Long])
    assert(nSegs == totalIn && nSegs - nDropped == distinctIn)
    // kept text per doc is a subsequence of the doc's own segments
    val rebuilt = out.filter(col("text") =!= "")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(rebuilt.keySet.subsetOf(vocabWords.toSet))
  }

  test("duplicatedSpans: adjacent duplicated blocks merge into one " +
    "maximal span; internal repeats surface; minBlocks filters singles") {
    def blk(tag: String) = (1 to 10).map(i => s"$tag$i").mkString(" ")
    val df = Seq(
      (1L, Seq(blk("x"), blk("y"), blk("z"), blk("u")).mkString(" ")),
      (2L, Seq(blk("v"), blk("x"), blk("y"), blk("z")).mkString(" ")),
      (3L, Seq(blk("w"), blk("q"), blk("w")).mkString(" "))
    ).toDF("doc_id", "text")
    val segs = SegDedup.wordBlocks(col("text"), 10)
    val got = SegDedup.duplicatedSpans(df, "doc_id", segs)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc1 blocks 0-2 (X Y Z) shared with doc2 blocks 1-3 -> one maximal
    // 3-block span each; doc3's W repeats WITHIN the doc at 0 and 2
    assert(got == Seq((1L, 0L, 3L), (2L, 1L, 3L), (3L, 0L, 1L), (3L, 2L, 1L)))
    val gotMin2 = SegDedup.duplicatedSpans(df, "doc_id", segs, minBlocks = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotMin2 == Seq((1L, 0L, 3L), (2L, 1L, 3L)))
  }
}
