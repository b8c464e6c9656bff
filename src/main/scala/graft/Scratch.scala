package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.GraftBridge.forceEvaluate
import graft.ops.{Dedup, SSJoin}

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
    d.count()

    val k = 3; val tauBp = 5000
    // piecewise replay of jaccardJoinExact(materialize=true)
    (1 to 2).foreach { round =>
      val toks = d.select(
        col("doc_id").cast("long").as("id"),
        explode(array_distinct(
          Dedup.shingles(Dedup.words(col("text")), k))).as("tok")).persist()
      t(s"r$round toks materialize")(toks.count())
      val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
      val byId = Window.partitionBy(col("id"))
      val ranked = toks.join(broadcast(dfreq), Seq("tok"))
        .withColumn("rn", row_number().over(byId.orderBy(col("tdf"), col("tok"))))
        .withColumn("n", count(lit(1)).over(
          byId.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val prefix = ranked
        .filter(col("rn") <= col("n") - SSJoin.ceilBp(col("n"), tauBp) + 1)
        .select(col("id"), col("tok"), col("n")).persist()
      val hot = t(s"r$round guard agg")(
        prefix.groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .agg(max(col("c")).as("m")).collect()(0))
      println(s"[scratch] hottest prefix df = $hot")


      val laa = prefix.select(col("id").as("a"), col("tok"), col("n").as("na"))
      val lbb = prefix.select(col("id").as("b"), col("tok"), col("n").as("nb"))
      val candidates = laa.join(lbb, Seq("tok"))
        .filter(col("a") < col("b"))
        .filter(least(col("na"), col("nb")) * 10000 >=
          greatest(col("na"), col("nb")) * tauBp)
        .select(col("a"), col("b"), col("na"), col("nb"))
        .distinct()
      t(s"r$round candidates count")(println("cand=" + candidates.count()))
      val inter = candidates
        .join(toks.select(col("id").as("a"), col("tok")), Seq("a"))
        .join(toks.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("inter"))
      val filtered = inter
        .withColumn("uni", col("na") + col("nb") - col("inter"))
        .filter(col("inter") * 10000 >= col("uni") * tauBp)
        .select(col("a"), col("b"), col("inter"), col("uni"))
      t(s"r$round verify+checkpoint")(filtered.localCheckpoint())
      toks.unpersist(); prefix.unpersist()
    }
    spark.stop()
  }
}
