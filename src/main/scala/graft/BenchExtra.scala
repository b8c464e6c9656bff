package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.GraftBridge.forceEvaluate

/** Per-query optimization probe (guide §1.4): isolates one query at a
  * time in a fresh-plan loop, splits plan-construction time from
  * evaluation time, and dumps the formatted physical plan to
  * plans/r06/<name>_current.txt. NOT part of the frozen bench contract —
  * graft.Bench stays the driver's harness; this exists so optimization
  * evidence (before/after seconds + plan shape) can be gathered without
  * touching it.
  *
  * Usage: runMain graft.BenchExtra q_lsh_curve q_merge_turns ...
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.read.parquet(s"$sfDir/events.parquet").count()

    val names =
      if (args.isEmpty) Seq("q_lsh_curve") else args.toSeq
    Files.createDirectories(Paths.get("plans/r06"))
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"probe: $name")
      def run(): (Double, Double) = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        forceEvaluate(df)
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val (b1, c) = run()
      val (b2, w1) = run()
      val (b3, w2) = run()
      val plan = fn(spark, sfDir)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r06/${name}_current.txt"), plan)
      val line = f"$name%-24s build=[$b1%.2f,$b2%.2f,$b3%.2f] cold=$c%.2f warm=[$w1%.2f,$w2%.2f]"
      println(line)
      line
    }
    println("== summary ==")
    rows.foreach(println)
    spark.stop()
  }
}
