package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.md): the same pipeline +
  * input at local[N] and local[4N]; reports throughput at both and
  * efficiency = (T_N / T_4N) / 4. Stands in for N → 4N executors in the
  * sandbox (no real cluster available), as directed by the driver.
  */
object ScalingBench {

  private def run(cores: Int, sfDir: String, reps: Int): Double = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession
      .builder(s"local[$cores]", shufflePartitions = math.max(cores, 8))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.GraftBridge.forceEvaluate
    try {
      spark.read.parquet(s"$sfDir/events.parquet").count() // warm-up
      forceEvaluate(Pipeline.features(spark, sfDir)) // warm-up full plan
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        forceEvaluate(Pipeline.features(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      secs.min
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val lo = sys.env.getOrElse("SPARK_GRAFT_CORES_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_CORES_HI", "32").toInt

    // count rows once for throughput math
    val probe = GraftSession.local(4)
    val n = probe.read.parquet(s"$sfDir/events.parquet").count()
    probe.stop()

    val tLo = run(lo, sfDir, reps)
    val tHi = run(hi, sfDir, reps)
    val thrLo = n / tLo
    val thrHi = n / tHi
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    println(
      s"""{"metric":"scaling","sf":"$sfDir","rows":$n,"cores_lo":$lo,"cores_hi":$hi,"sec_lo":${f"$tLo%.2f"},"sec_hi":${f"$tHi%.2f"},"turns_per_sec_lo":${f"$thrLo%.1f"},"turns_per_sec_hi":${f"$thrHi%.1f"},"efficiency":${f"$eff%.3f"}}"""
    )
  }
}
