package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftBridge.forceEvaluate

/** Plain-parquet vs bucketed-table pipeline comparison at the scale tier:
  * the same 25.2M-turn input and the same flagship pipeline, with the
  * only difference being the storage layout. Quantifies what
  * [[graft.io.Bucketed]] buys — the conv_id exchange(s) the bucketed scan
  * eliminates — and what the bucket layout costs at ingest.
  */
object BucketedBench {

  private val plainDir = "/tmp/graft_scale_turns"
  private val bucketedPath = "/tmp/graft_scale_turns_bucketed"
  private val tableName = "scale_turns_bucketed"

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "64").toInt
    val spark = GraftSession.local(cores)
    import spark.implicits._

    require(Files.exists(Paths.get(s"$plainDir/_SUCCESS")),
      s"stage the scale table first (graft.ScalingBench): $plainDir")

    // one-time bucketed ingest (measured — this is the cost side)
    val t0 = System.nanoTime()
    val staged =
      if (!spark.catalog.tableExists(tableName) ||
        !Files.exists(Paths.get(bucketedPath))) {
        graft.io.Bucketed.writeTranscript(
          spark.read.parquet(plainDir), tableName, bucketedPath, nBuckets)
        (System.nanoTime() - t0) / 1e9
      } else 0.0

    def timed(f: => Any): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    def best(f: => Any): Double = { timed(f); math.min(timed(f), timed(f)) }

    val n = spark.table(tableName).count()
    val plain = best(
      forceEvaluate(Pipeline.featuresFromTurns(spark.read.parquet(plainDir))))
    val bucketed = best(
      forceEvaluate(Pipeline.featuresFromTurns(spark.table(tableName))))

    println(
      s"""{"metric":"bucketed_pipeline","rows":$n,"cores":$cores,"n_buckets":$nBuckets,"ingest_sec":${f"$staged%.2f"},"plain_sec":${f"$plain%.2f"},"bucketed_sec":${f"$bucketed%.2f"},"speedup":${f"${plain / bucketed}%.2f"}}""")
    spark.stop()
  }
}
