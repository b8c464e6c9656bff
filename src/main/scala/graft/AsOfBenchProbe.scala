package graft

import org.apache.spark.sql.functions._

import graft.features.{AsOf, AsOfNative}

/** Head-to-head: union-merge as-of vs native sort-merge as-of on the
  * staged ~25M-turn transcript table.
  */
object AsOfBenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import org.apache.spark.sql.GraftBridge.forceEvaluate
    val turns = spark.read.parquet("/tmp/graft_scale_turns")
    val anchors = turns.filter(col("role") === "assistant")
      .select("conv_id", "turn_idx", "ts")
    val obs = turns.filter(col("tool").isNotNull)
      .groupBy(col("conv_id"), col("ts"))
      .agg(max_by(col("tool"), col("turn_idx")).as("last_tool"))
    def timed(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both
    forceEvaluate(AsOf.joinBackward(anchors, obs, Seq("conv_id")))
    forceEvaluate(AsOfNative.joinBackward(anchors, obs, Seq("conv_id")))
    val um = (1 to 3).map(_ =>
      timed(forceEvaluate(AsOf.joinBackward(anchors, obs, Seq("conv_id"))))).min
    val nat = (1 to 3).map(_ =>
      timed(forceEvaluate(
        AsOfNative.joinBackward(anchors, obs, Seq("conv_id"))))).min
    println(f"""{"union_merge_sec":$um%.2f,"native_sec":$nat%.2f,"speedup":${um / nat}%.2f}""")
    spark.stop()
  }
}
