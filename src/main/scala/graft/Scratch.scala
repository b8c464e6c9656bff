package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Throwaway micro-timing playground for the optimization round; not part
  * of any harness. Edit freely, delete at round end.
  */
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession.local(cpus)
    import graft.io.Tables
    s.read.parquet(s"$sfDir/events.parquet").count()

    (1 to 2).foreach { round =>
      import graft.streaming.StreamingFeatures
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_scratch_sjoin").toString
      val t0 = Tables.transcript(s, sfDir)
      val lBatch = t0.filter(col("role") === "user")
        .select(col("conv_id"), col("turn_idx").as("u_turn_idx"),
          col("ts").as("u_ts"))
      val rBatch = t0.filter(col("tool").isNotNull)
        .select(col("conv_id"), col("turn_idx").as("t_turn_idx"),
          col("tool"), col("ts").as("t_ts"))
      def stage(df: DataFrame, tsCol: String, sub: String): String = {
        val watched = s"$tmp/$sub"
        val nChunks = 2
        val ordered = df.withColumn("__chunk",
          ntile(nChunks).over(org.apache.spark.sql.expressions.Window
            .orderBy(col(tsCol)))).localCheckpoint(false)
        (1 to nChunks).foreach { i =>
          val chunk = ordered.filter(col("__chunk") === i).drop("__chunk")
          chunk.coalesce(1).write.mode("overwrite").parquet(s"$tmp/sc_${sub}_$i")
          val part = scala.util.Using.resource(
            java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/sc_${sub}_$i")))(
            it => { import scala.jdk.CollectionConverters._
              it.iterator.asScala.filter(_.getFileName.toString.endsWith(".parquet")).next() })
          val dest = java.nio.file.Paths.get(watched, s"chunk-$i.parquet")
          java.nio.file.Files.createDirectories(dest.getParent)
          java.nio.file.Files.move(part, dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
        }
        watched
      }
      val watchedL = t(s"r$round stage L")(stage(lBatch, "u_ts", "left"))
      val watchedR = t(s"r$round stage R")(stage(rBatch, "t_ts", "right"))
      val lStream = s.readStream.schema(lBatch.schema)
        .option("maxFilesPerTrigger", "1").parquet(watchedL)
      val rStream = s.readStream.schema(rBatch.schema)
        .option("maxFilesPerTrigger", "1").parquet(watchedR)
      val q = t(s"r$round start")(StreamingFeatures
        .intervalJoin(lStream, "u_ts", rStream, "t_ts", "conv_id",
          windowSec = 3600L, watermark = "2 hours")
        .select(col("conv_id"), col("u_turn_idx"), col("t_turn_idx"), col("tool"))
        .writeStream.outputMode("append")
        .format("memory").queryName(s"scr_$round")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      t(s"r$round awaitTermination")(q.awaitTermination())
      q.recentProgress.foreach(p =>
        println(s"[scratch] batch ${p.batchId}: ${p.durationMs} rows=${p.numInputRows}"))
      q.stop()
    }
    s.stop()
  }
}
