package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge.forceEvaluate

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
    val d = graft.io.Tables.read(s, sfDir, "documents")
    d.count()
    (1 to 3).foreach { r =>
      val truth = t(s"r$r truth 5000bp")(graft.ops.SSJoin.jaccardJoinExact(
        d, "doc_id", "text", k = 3, tauBp = 5000, maxPrefixDf = 10000000L))
      println("truth rows=" + truth.count())
      val curve = t(s"r$r curve")(graft.ops.Dedup.lshTuningCurve(
        d, "doc_id", "text", k = 8, bandConfigs = Seq(1, 2, 4, 8),
        shingleLen = 3, truthPairs = truth))
      t(s"r$r curve eval")(forceEvaluate(curve))
    }
    s.stop()
  }
}
