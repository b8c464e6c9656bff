package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge.forceEvaluate

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
    val spark = GraftSession.local(cpus)
    import graft.io.Tables
    val d = Tables.read(spark, sfDir, "documents")
    t("docs count")(d.count())
    t("docs count 2")(d.count())

    val langs = Seq(
      "en" -> Seq("the", "a"),
      "db" -> Seq("data", "table", "row"),
      "qy" -> Seq("query", "join", "scan"))
    // plain scan+regex project, no window
    val proj = d.select(col("doc_id"),
      graft.ops.TextStats.langId(col("text"), langs).as("lang_pred"))
    t("langId proj cold")(forceEvaluate(proj))
    t("langId proj warm")(forceEvaluate(proj))
    // window only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val win = d.withColumn("__rank", row_number().over(w)).filter(col("__rank") === 1)
    t("md5 window cold")(forceEvaluate(win))
    t("md5 window warm")(forceEvaluate(win))
    // full corpus clean
    val cc = graft.ops.CorpusClean(d).select("doc_id", "n_chars_q", "n_words", "lang_pred")
    t("corpus_clean cold")(forceEvaluate(cc))
    t("corpus_clean warm")(forceEvaluate(cc))
    t("corpus_clean warm2")(forceEvaluate(cc))
    spark.stop()
  }
}
