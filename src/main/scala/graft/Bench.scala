package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query plus the flagship
  * feature pipeline on SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  * Headline metric = turns/sec through the as-of + window pipeline
  * (BASELINE.md primary throughput metric).
  */
object Bench {

  def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)

    // warm the JVM + parquet footers once (excluded from timings)
    spark.read.parquet(s"$sfDir/events.parquet").count()

    import org.apache.spark.sql.GraftBridge.forceEvaluate
    // cold = first evaluation (includes plan compile + codegen); warm =
    // second evaluation of a fresh plan. Cross-round per-query comparisons
    // should read WARM (cold is dominated by compile noise on sub-second
    // queries); cold stays the headline sweep for honesty about one-shot
    // cost.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = timed {
        try forceEvaluate(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      }._2
      val cold = once()
      val warm = once()
      (name, cold, warm)
    }

    // flagship throughput: full pipeline rows/sec over the derived turns.
    // Warm once (codegen + JIT) and report the best of two steady-state
    // runs — the number that projects to long-running production jobs.
    val nTurns = spark.read.parquet(s"$sfDir/events.parquet").count()
    forceEvaluate(Pipeline.features(spark, sfDir))
    val pipeSec = (1 to 2)
      .map(_ => timed(forceEvaluate(Pipeline.features(spark, sfDir)))._2)
      .min
    val turnsPerSec = nTurns / pipeSec

    // same pipeline over a bucketed copy of the transcript view: measures
    // the conv_id-exchange elimination the Bucketed layout buys (ingest
    // excluded — it is the once-per-corpus layout cost)
    val bucketedSec = {
      val path = java.nio.file.Files
        .createTempDirectory("graft_bench_bucketed").toString
      graft.io.Bucketed.writeTranscript(
        io.Tables.transcript(spark, sfDir), "bench_turns_bucketed", path, 16)
      val t = spark.table("bench_turns_bucketed")
      forceEvaluate(Pipeline.featuresFromTurns(t))
      (1 to 2).map(_ => timed(forceEvaluate(Pipeline.featuresFromTurns(t)))._2).min
    }

    val all = results :+
      ("pipeline_features", pipeSec, pipeSec) :+
      ("pipeline_bucketed", bucketedSec, bucketedSec)
    val qs = all
      .map { case (k, c, _) => "\"" + k + "\":" + f"$c%.3f" }
      .mkString("{", ",", "}")
    val qsDetail = all
      .map { case (k, c, w) =>
        "\"" + k + "\":{\"cold\":" + f"$c%.3f" + ",\"warm\":" + f"$w%.3f" + "}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipeSec + bucketedSec
    // scaling variance band (graft.ScalingBench writes it; stays absent
    // when the scaling sweep has not been run on this machine)
    val scaling = {
      val p = java.nio.file.Paths.get("docs/scaling_latest.json")
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readString(p).trim
      else "null"
    }
    println(
      s"""{"metric":"turns/sec","value":${f"$turnsPerSec%.1f"},"unit":"sec","total_sec":${f"$total%.2f"},"queries":$qs,"queries_detail":$qsDetail,"scaling":$scaling,"sf":"$sfDir","cpus":$cpus}"""
    )
    spark.stop()
  }
}
