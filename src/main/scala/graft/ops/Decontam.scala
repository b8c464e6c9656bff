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
  * Scale shape: the probe side is a benchmark suite — small by
  * construction — so it is BROADCAST, and the raw corpus shingle stream
  * is pruned against it map-side BEFORE any distinct or aggregate: the
  * full corpus shingle stream NEVER crosses a shuffle. Everything
  * downstream (the per-(doc, shingle, probe) dedup, the document-
  * frequency cap, the final per-pair count) runs on the pruned stream,
  * whose volume is bounded by probe-shingle hits, not corpus size — the
  * whole operator is corpus-scan-bound. Ubiquitous shingles (boiler-
  * plate, common phrases) are the skew/false-positive risk: shingles
  * appearing in more than `maxShingleDf` corpus documents are dropped
  * from matching (their document frequency is computed exactly on the
  * pruned stream — membership pruning cannot change a shingle's df), and
  * [[droppedHotShingles]] is the audit companion that makes that cap
  * observable rather than silent (same contract as the LSH hot-bucket
  * cap in [[Dedup.minhashPairsWithAudit]]).
  */
object Decontam {

  /** The map-side prune at the heart of [[ngramOverlap]]: the raw corpus
    * shingle stream hash-joined against the BROADCAST probe set, then
    * deduped. Package-visible so the plan property ("corpus shingles
    * never cross a shuffle to match") stays spec-assertable now that
    * [[ngramOverlap]] materializes this stream behind a checkpoint.
    */
  private[ops] def prunedMatches(
      cRaw: DataFrame, pSized: DataFrame): DataFrame =
    cRaw.join(broadcast(pSized), Seq("shingle")).distinct()

  /** Distinct (id, shingle) pairs of `k`-word shingles. */
  private def shingleRows(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(
        col(idCol),
        explode(Dedup.shingleCol(col(textCol), k, distinct = true))
          .as("shingle"))
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
    // raw (doc, shingle) occurrences — NOT distinct'd yet: the distinct
    // would shuffle the full corpus shingle stream, and after the
    // broadcast pruning below it only has to process probe-shingle hits
    val cRaw = corpus.select(
      col(idCol).as("doc_id"),
      explode(Dedup.shingleCol(col(textCol), k, distinct = true))
        .as("shingle"))
    val p = shingleRows(probes, probeIdCol, textCol, k)
      .withColumnRenamed(probeIdCol, "probe_id")
    val pSized = p.withColumn(
      "n_probe", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))))
    // map-side hash join against the broadcast probe set prunes the
    // corpus stream before anything stateful touches it (plan-asserted
    // in OpsSpec); then dedup multiple occurrences of a shingle within
    // one document — tiny, post-pruning
    // bounded by probe-shingle hits, and read twice (df cap + final agg):
    // materialize once per evaluation so the full corpus shingle explode
    // runs a single time (lazy localCheckpoint, fresh per invocation)
    val matched = prunedMatches(cRaw, pSized).localCheckpoint(false)
    // exact per-shingle document frequency from the pruned stream: df(s)
    // counts distinct docs CONTAINING s, and pruning only dropped
    // shingles that are not s — the value is identical to the corpus-
    // wide df for every shingle that can match. Hot shingles are a
    // subset of probe shingles here, so the anti-join broadcasts too.
    val hot = matched.select(col("shingle"), col("doc_id")).distinct()
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxShingleDf)
      .select("shingle")
    matched.join(broadcast(hot), Seq("shingle"), "left_anti")
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(
        count(lit(1)).as("n_shared"),
        max(col("n_probe")).as("n_probe"))
      .withColumn("contam_bp",
        floor(col("n_shared") * 10000L / col("n_probe")).cast("long"))
      .filter(col("contam_bp") >= minContamBp)
  }

  /** MEMORIZATION score — [[ngramOverlap]]'s aggregation turned around:
    * per PROBE (a model generation, a suspected-regurgitation sample),
    * how many of its distinct `k`-word shingles appear ANYWHERE in the
    * corpus — the Carlini-style "was this emitted text memorized from
    * training data?" audit. Where decontamination asks "which corpus
    * docs contain benchmark text" (per-doc verdicts, drop them),
    * memorization asks "how much of THIS text is corpus-derived"
    * (per-probe score, flag the generation). Returns
    * (probe_id, n_probe, n_found, memorized_bp) for EVERY probe with
    * ≥ 1 shingle — a fully-novel generation reports 0 explicitly rather
    * than vanishing (absence-as-zero is exactly the bug an audit must
    * not have).
    *
    * Scale shape: identical to [[ngramOverlap]] — the probe shingle set
    * broadcasts, the corpus shingle stream is pruned map-side against
    * it BEFORE anything stateful (corpus shingles never shuffle), and
    * the found-set collapses to distinct matched PROBE shingles (probe-
    * bounded) before the per-probe count.
    */
  def memorizationScore(
      corpus: DataFrame, // (textCol) — ids irrelevant here
      probes: DataFrame, // (probeIdCol, textCol)
      probeIdCol: String,
      textCol: String,
      k: Int = 3
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val cSh = corpus.select(
      explode(Dedup.shingleCol(col(textCol), k, distinct = true))
        .as("shingle"))
    val p = shingleRows(probes, probeIdCol, textCol, k)
      .withColumnRenamed(probeIdCol, "probe_id")
    // corpus occurrences pruned against the broadcast probe set, then
    // collapsed to the distinct matched shingles (probe-bounded)
    val found = cSh
      .join(broadcast(p.select("shingle").distinct()), Seq("shingle"))
      .distinct()
    val counts = p.join(found, Seq("shingle"), "left_semi")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_found"))
    p.groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_probe"))
      .join(counts, Seq("probe_id"), "left")
      .withColumn("n_found", coalesce(col("n_found"), lit(0L)))
      .withColumn("memorized_bp",
        floor(col("n_found") * 10000L / col("n_probe")).cast("long"))
      .select(col("probe_id"), col("n_probe"), col("n_found"),
        col("memorized_bp"))
  }

  /** Maximal CONTIGUOUS contaminated runs per document: the positions
    * whose `k`-word shingle appears in ANY probe (benchmark) item,
    * merged into maximal runs — the "longest contaminated span" check
    * (contiguous n-gram overlap, the PaLM/GPT-3-style criterion) that
    * [[ngramOverlap]]'s set-overlap score cannot express: 50 scattered
    * shared shingles and one 50-shingle verbatim quote have the same
    * contam_bp but are different problems, and excision needs the WHERE.
    * The cross-set twin of [[SegDedup.duplicatedSpans]] (which finds
    * intra-corpus duplicated regions; this finds probe-set ones).
    *
    * Returns (doc_id, run_start, run_shingles, run_words) — `run_start`
    * is the 0-based WORD index of the run's first shingle,
    * `run_words = run_shingles + k − 1` is its width in words — one row
    * per maximal run with ≥ `minRunShingles` shingles.
    *
    * Scale shape: same geometry as [[ngramOverlap]] — the probe shingle
    * set is broadcast and the positional corpus shingle stream is pruned
    * map-side against it BEFORE anything stateful, so corpus shingles
    * never cross a shuffle; the df cap is exact on the pruned stream for
    * the same reason as there. The run merge is a gaps-and-islands
    * window PARTITIONED PER DOCUMENT over matched positions only —
    * bounded by one document's own match count, never the corpus.
    * Dropping a hot shingle can split a run in two (documented: the cap
    * excludes it from matching entirely, [[droppedHotShingles]] audits).
    */
  def contamSpans(
      corpus: DataFrame, // (idCol, textCol)
      probes: DataFrame, // (probeIdCol or any id, textCol)
      idCol: String,
      textCol: String,
      k: Int = 3,
      minRunShingles: Int = 1,
      maxShingleDf: Int = 10000
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(minRunShingles >= 1, "minRunShingles must be >= 1")
    val cPos = corpus.select(
      col(idCol).as("doc_id"),
      posexplode(Dedup.shingleCol(col(textCol), k, distinct = false))
        .as(Seq("pos", "shingle")))
    // the UNION of all probes' shingles — run detection is against the
    // whole suite (an excision does not care WHICH item leaked)
    val pSet = probes
      .select(explode(Dedup.shingleCol(col(textCol), k, distinct = true))
        .as("shingle"))
      .distinct()
    // bounded by probe-shingle hits and read twice (df cap + run merge):
    // one corpus shingle explode per evaluation, not two
    val matched = cPos.join(broadcast(pSet), Seq("shingle"))
      .localCheckpoint(false)
    val hot = matched.select(col("shingle"), col("doc_id")).distinct()
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxShingleDf)
      .select("shingle")
    val kept = matched.join(broadcast(hot), Seq("shingle"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    kept
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("pos")).cast("long").as("run_start"),
        count(lit(1)).as("run_shingles"))
      .filter(col("run_shingles") >= minRunShingles.toLong)
      .select(col("doc_id"), col("run_start"), col("run_shingles"),
        (col("run_shingles") + (k - 1).toLong).as("run_words"))
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
