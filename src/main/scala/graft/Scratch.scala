package graft

import org.apache.spark.sql.functions._

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
    val d = Tables.read(s, sfDir, "documents")
    d.count()

    (1 to 2).foreach { round =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_scratch_compact").toString
      val stage = s"$tmp/small"
      t(s"r$round fixture write")(
        d.withColumn("file_seq", floor(col("doc_id") / 64))
          .repartition(32, col("lang"), col("file_seq"))
          .write.partitionBy("lang", "file_seq").mode("overwrite")
          .parquet(stage))
      val manifest = t(s"r$round manifest")(
        graft.ops.Layout.fileManifest(s, stage, "lang", "file_seq"))
      val assigned = t(s"r$round pack")(
        graft.ops.Curation.packShards(
          manifest, "lang", "file_seq", col("bytes"), budgetTokens = 16384L)
        .select(col("lang"), col("file_seq"), col("shard_seq").as("group_seq")))
      t(s"r$round compactExec")(
        graft.ops.Layout.compactExec(
          s.read.parquet(stage), assigned, "lang", "file_seq", "doc_id",
          s"$tmp/out"))
      t(s"r$round read back")(
        org.apache.spark.sql.GraftBridge.forceEvaluate(
          s.read.parquet(s"$tmp/out").select("doc_id", "lang", "n_chars", "source")))
    }
    s.stop()
  }
}
