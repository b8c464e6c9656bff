package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.schema.TranscriptGen

/** Two-parallelism scaling evidence (BASELINE.md): the same feature
  * pipeline + input at local[N] and local[4N]; reports throughput at both
  * and efficiency = (T_N / T_4N) / 4. Stands in for N → 4N executors in
  * the sandbox (no real cluster available), as directed by the driver.
  *
  * The input is a ~10^7-turn deterministic synthetic transcript table
  * (FIXTURES.md scale tier) staged once as parquet — large enough that the
  * measured region is dominated by distributed work, not session fixed
  * costs.
  */
object ScalingBench {

  private val stagedDir = "/tmp/graft_scale_turns"

  private def stage(nConvs: Long): Long = {
    val spark = GraftSession.local(32)
    try {
      if (!Files.exists(Paths.get(s"$stagedDir/_SUCCESS"))) {
        TranscriptGen
          .generateDF(spark, nConvs)
          .write.mode("overwrite").parquet(stagedDir)
      }
      spark.read.parquet(stagedDir).count()
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  /** (pipeline seconds, bare-scan seconds) at `cores`. The bare scan is
    * the hardware baseline: on a single box, memory bandwidth is shared
    * across all threads, so even a zero-logic parquet scan scales
    * sublinearly — the honest engine metric is the pipeline's efficiency
    * NORMALIZED by that scan ceiling (a real N→4N executor cluster adds
    * bandwidth with every node, so the ceiling does not exist there).
    */
  private def run(cores: Int, reps: Int): (Double, Double) = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession
      .builder(s"local[$cores]", shufflePartitions = cores * 2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.GraftBridge.forceEvaluate
    def timed(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def pipeline(): Long =
      forceEvaluate(Pipeline.featuresFromTurns(spark.read.parquet(stagedDir)))
    def scan(): Long = forceEvaluate(spark.read.parquet(stagedDir))
    try {
      pipeline() // warm-up: codegen + parquet footers
      val p = (1 to reps).map(_ => timed(pipeline())).min
      val s = (1 to reps).map(_ => timed(scan())).min
      (p, s)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "400000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val lo = sys.env.getOrElse("SPARK_GRAFT_CORES_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_CORES_HI", "32").toInt

    val n = stage(nConvs)
    val (tLo, sLo) = run(lo, reps)
    val (tHi, sHi) = run(hi, reps)
    val eff = (tLo / tHi) / (hi.toDouble / lo)
    val scanEff = (sLo / sHi) / (hi.toDouble / lo)
    val normEff = eff / scanEff
    println(
      s"""{"metric":"scaling","rows":$n,"cores_lo":$lo,"cores_hi":$hi,"sec_lo":${f"$tLo%.2f"},"sec_hi":${f"$tHi%.2f"},"turns_per_sec_lo":${f"${n / tLo}%.1f"},"turns_per_sec_hi":${f"${n / tHi}%.1f"},"efficiency":${f"$eff%.3f"},"scan_sec_lo":${f"$sLo%.2f"},"scan_sec_hi":${f"$sHi%.2f"},"hardware_scan_efficiency":${f"$scanEff%.3f"},"normalized_efficiency":${f"$normEff%.3f"}}"""
    )
  }
}
