package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.compile.WaryGate
import graft.features.{Sessionize, Windows}

/** Diagnostic: per-stage scaling (narrow gate vs window sort vs as-of) at
  * two core counts, to locate the efficiency ceiling.
  */
object ScalingProbe {
  private val stagedDir = "/tmp/graft_scale_turns"

  private def run(cores: Int): Map[String, Double] = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(s"local[$cores]", cores * 2).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.GraftBridge.forceEvaluate
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      val turns = spark.read.parquet(stagedDir)
      forceEvaluate(WaryGate(turns, Pipeline.turnSpec)) // warm
      val gate = (1 to 2).map(_ =>
        t(forceEvaluate(WaryGate(turns, Pipeline.turnSpec)))).min
      val win = (1 to 2).map(_ => t(forceEvaluate(
        Sessionize(
          Windows.locf(turns, Windows.turnWindow, "tool"),
          Seq("conv_id"), "ts", 1800L, Seq("turn_idx"))))).min
      val scan = (1 to 2).map(_ => t(forceEvaluate(turns))).min
      Map("scan" -> scan, "gate" -> gate, "window" -> win)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val lo = run(8)
    val hi = run(32)
    lo.keys.toSeq.sorted.foreach { k =>
      val eff = (lo(k) / hi(k)) / 4.0
      println(f"$k%-8s lo=${lo(k)}%6.2f hi=${hi(k)}%6.2f eff=$eff%.3f")
    }
  }
}
