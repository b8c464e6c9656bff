package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that contain
  * n-gram overlap with evaluation/benchmark items, the step every
  * training-data pipeline runs before a corpus ships. Contamination is
  * measured in the standard direction — what fraction of the PROBE's
  * (benchmark item's) distinct shingles appear in the document — so a
  * short leaked question inside a long document still scores 10000 bp.
  *
  * Scale shape: both sides reduce to DISTINCT (id, shingle) rows and meet
  * in ONE equi-join on the shingle string — the shuffle key is the
  * shingle, whose cardinality grows with the corpus, so the join
  * parallelizes like any dedup bucket join. Ubiquitous shingles (boiler-
  * plate, common phrases) are the skew risk: shingles appearing in more
  * than `maxShingleDf` corpus documents are dropped from matching, and
  * [[droppedHotShingles]] is the audit companion that makes that cap
  * observable rather than silent (same contract as the LSH hot-bucket
  * cap in [[Dedup.minhashPairsWithAudit]]).
  */
object Decontam {

  /** Distinct (id, shingle) pairs of `k`-word shingles. */
  private def shingleRows(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(
        col(idCol),
        explode(Dedup.shingles(Dedup.words(col(textCol)), k)).as("shingle"))
      .distinct()

  /** (doc_id, probe_id, n_shared, n_probe, contam_bp) for every pair with
    * contam_bp ≥ `minContamBp`, where contam_bp =
    * floor(shared-shingles · 10⁴ / probe-shingles).
    *
    * Probes with fewer than `k` words have no shingles and cannot match
    * (callers screen benchmark items that short separately — exact
    * substring checks, not n-gram overlap, are the tool below one
    * shingle).
    */
  def ngramOverlap(
      corpus: DataFrame, // (idCol, textCol)
      probes: DataFrame, // (probeIdCol, textCol)
      idCol: String,
      probeIdCol: String,
      textCol: String,
      k: Int = 3,
      minContamBp: Int = 5000,
      maxShingleDf: Int = 10000
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(minContamBp >= 0 && minContamBp <= 10000,
      "minContamBp is basis points in 0..10000")
    val c = shingleRows(corpus, idCol, textCol, k)
      .withColumnRenamed(idCol, "doc_id")
    val ok = c.groupBy("shingle")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxShingleDf)
      .select("shingle")
    val p = shingleRows(probes, probeIdCol, textCol, k)
      .withColumnRenamed(probeIdCol, "probe_id")
    val pSized = p.withColumn(
      "n_probe", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))))
    c.join(ok, Seq("shingle"))
      .join(pSized, Seq("shingle"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(
        count(lit(1)).as("n_shared"),
        max(col("n_probe")).as("n_probe"))
      .withColumn("contam_bp",
        floor(col("n_shared") * 10000L / col("n_probe")).cast("long"))
      .filter(col("contam_bp") >= minContamBp)
  }

  /** The shingles [[ngramOverlap]]'s `maxShingleDf` cap removed from
    * matching: one row per dropped shingle with its corpus document
    * frequency. Log/alert on this next to the overlap output.
    */
  def droppedHotShingles(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      maxShingleDf: Int = 10000
  ): DataFrame =
    shingleRows(corpus, idCol, textCol, k)
      .groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf)
}
