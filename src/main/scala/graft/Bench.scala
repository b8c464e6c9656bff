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
    val allResults = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = timed {
        try forceEvaluate(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      }._2
      val cold = once()
      val warm = once()
      (name, cold, warm)
    }
    // split the sweep: operator math vs replay-harness-bound rows. The
    // streaming replays are dominated by micro-batch + state-store commit
    // cadence (±2x run-to-run) — keeping them in their own section stops
    // cross-round regressions in the operator rows from hiding in replay
    // noise.
    val isReplay = (n: String) => n.startsWith("q_stream_")
    val results = allResults.filterNot(r => isReplay(r._1))
    val replays = allResults.filter(r => isReplay(r._1))

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

    // IVF assignment runtime curve at real centroid counts: rows/sec of
    // the zero-shuffle ivf_probe_lists expression over every embedding,
    // at k = 64 / 1000 / 10000 centroids (dim 64). The plan is O(1) in k
    // (asserted in OpsSpec); this measures that the RUNTIME stays a
    // per-row O(k·dim) dot loop with flat setup cost — time should grow
    // ~linearly in k from a small intercept, not blow up in codegen.
    val ivfK = {
      import org.apache.spark.sql.functions.col
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nVecs = e.count()
      val dim = 64
      def syntheticCentroids(k: Int): Seq[(Int, Seq[Float])] =
        (0 until k).map { i =>
          (i, (0 until dim).map(d =>
            (((i * 31 + d * 7) % 97) - 48).toFloat / 97f))
        }
      Seq(64, 1000, 10000).map { k =>
        val cents = syntheticCentroids(k)
        val df = e.select(
          graft.ops.Similarity.ivfProbeLists(col("embedding"), cents, 4)
            .as("probes"))
        forceEvaluate(df) // warm (codegen + centroid ship)
        val sec = (1 to 2).map(_ => timed(forceEvaluate(df))._2).min
        (k, sec, nVecs / sec)
      }
    }
    val ivfJson = ivfK
      .map { case (k, sec, rps) =>
        s"""{"k":$k,"sec":${f"$sec%.3f"},"rows_per_sec":${f"$rps%.0f"}}""" }
      .mkString("[", ",", "]")

    val all = results :+
      ("pipeline_features", pipeSec, pipeSec) :+
      ("pipeline_bucketed", bucketedSec, bucketedSec)
    def section(rs: Seq[(String, Double, Double)]) = (
      rs.map { case (k, c, _) => "\"" + k + "\":" + f"$c%.3f" }
        .mkString("{", ",", "}"),
      rs.map { case (k, c, w) =>
        "\"" + k + "\":{\"cold\":" + f"$c%.3f" + ",\"warm\":" + f"$w%.3f" + "}" }
        .mkString("{", ",", "}"))
    val (qs, qsDetail) = section(all)
    val (rep, repDetail) = section(replays)
    val total = allResults.map(_._2).sum + pipeSec + bucketedSec
    // scaling variance band (graft.ScalingBench writes it; stays absent
    // when the scaling sweep has not been run on this machine)
    val scaling = {
      val p = java.nio.file.Paths.get("docs/scaling_latest.json")
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readString(p).trim
      else "null"
    }
    println(
      s"""{"metric":"turns/sec","value":${f"$turnsPerSec%.1f"},"unit":"sec","total_sec":${f"$total%.2f"},"queries":$qs,"queries_detail":$qsDetail,"replays":$rep,"replays_detail":$repDetail,"ivf_assignment":$ivfJson,"scaling":$scaling,"sf":"$sfDir","cpus":$cpus}"""
    )
    spark.stop()
  }
}
