package graft.jobs

import graft.{GraftSession, Pipeline}
import graft.io.Checkpoint
import graft.metrics.Lineage

/** The north-rule production entrypoint: spark-submit job that runs the
  * full feature pipeline over a transcript table and writes the feature
  * frame as a checkpoint-resumable bucketed dataset with per-partition
  * lineage + row-count/skew metrics.
  *
  * Usage: spark-submit --class graft.jobs.FeatureBackfillJob <jar> \
  *          <sfDir> <outDir> [nBuckets] [runId]
  *
  * Re-running after a kill resumes: committed buckets are skipped, output
  * converges to the clean-run result (CheckpointSpec proves equality).
  * In production the parquet source/sink swaps for Iceberg (the manifest
  * maps to snapshot commits — SURVEY.md §7.4 item 7); nothing else
  * changes.
  */
object FeatureBackfillJob {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val nBuckets = if (args.length > 2) args(2).toInt else 32
    val runId =
      if (args.length > 3) args(3)
      else s"run_${java.util.UUID.randomUUID().toString.take(8)}"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)

    val (features, obs) = Lineage.observed(Pipeline.features(spark, sfDir), "ts")
    val promoted =
      Checkpoint.write(features, "conv_id", outDir, nBuckets, sfDir, runId)
    val metrics = obs.get
    val (bucketRows, skew) = Checkpoint.metrics(outDir)
    println(
      s"""{"run_id":"$runId","input":"$sfDir","out":"$outDir","buckets_promoted":${promoted.size},"buckets_total":${bucketRows.size},"rows":${bucketRows.values.sum},"observed_rows":${metrics.getOrElse("rows", -1)},"null_ts":${metrics.getOrElse("null_ts", -1)},"bucket_skew":${f"$skew%.3f"}}"""
    )
    spark.stop()
  }
}
