package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval statistics over the corpus. Like the bigram-LM
  * surprisal family ([[TextStats]] q_lm_surprisal), the engine's job at
  * 100 TB is the exact INTEGER sufficient statistics — the float math
  * (logs, the BM25 saturation curve) is a per-row scalar the serving
  * layer applies to a result 10^6× smaller than the corpus, so it stays
  * downstream where engine-portability of float formatting doesn't
  * matter.
  */
object Retrieval {

  /** BM25 sufficient statistics for a term set: one row per
    * (term, doc_id) posting with every integer the BM25 formula
    * consumes —
    *
    *   score(t, d) = idf(df_docs, n_docs) · tf·(k1+1) /
    *                 (tf + k1·(1−b+b·dl·n_docs/total_dl))
    *
    * columns: tf (term count in doc), dl (doc word count), df_docs
    * (docs containing the term), n_docs and total_dl (corpus constants
    * repeated per row — they ride the small side of a broadcast, not a
    * shuffle).
    *
    * Scale shape: one scan builds (doc, term, tf) and dl in the same
    * partial-agg pass geometry as the inverted index; df is a term-keyed
    * partial agg; the two corpus constants are a 1-row cross join
    * (broadcast). Restricting to a query-term set first makes the
    * posting join term-selective — the 100 TB case scores a small query
    * vocabulary against the corpus, never all terms.
    */
  def bm25Stats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]
  ): DataFrame = {
    require(terms.nonEmpty, "bm25Stats needs a non-empty term set")
    val words = df.select(col(idCol).as("doc_id"),
      Dedup.words(col(textCol)).as("ws"))
    val dl = words.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val tf = words
      .select(col("doc_id"), explode(col("ws")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(corpus))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("df_docs"), col("n_docs"), col("total_dl"))
  }

  /** Lexical more-like-this ranking: for each query document, the top-k
    * corpus documents by word-SET Jaccard, scored in exact fixed point
    * (`(inter·scale) div union` — no float crosses the engine boundary),
    * ties to the smaller doc_id. Zero-overlap documents are never
    * candidates — candidate generation is an inverted-index join on
    * shared words, NOT a cross join, so each query only ever touches the
    * postings of its own vocabulary (the same term-selective contract as
    * [[bm25Stats]]).
    *
    * Scale shape: corpus postings are one scan + explode; the query side
    * (tiny) broadcasts onto them; intersections meet in one
    * (query, doc)-keyed partial agg. The per-query rank window partitions
    * on query_id over candidate sets bounded by the query's posting
    * fan-out, never the corpus.
    */
  def moreLikeThisJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qIdCol: String,
      qTextCol: String,
      topK: Int,
      scale: Long = 1000000000L
  ): DataFrame = {
    require(topK > 0, "topK must be positive")
    val corpusSets = df.select(col(idCol).cast("long").as("doc_id"),
      array_distinct(Dedup.words(col(textCol))).as("s"))
    val qSets = queries.select(col(qIdCol).cast("long").as("query_id"),
      array_distinct(Dedup.words(col(qTextCol))).as("qs"))
    val cPost = corpusSets.select(col("doc_id"), explode(col("s")).as("w"))
    val cSize = corpusSets.select(col("doc_id"), size(col("s")).cast("long").as("n"))
    val qPost = qSets.select(col("query_id"), explode(col("qs")).as("w"))
    val qSize = qSets.select(col("query_id"), size(col("qs")).cast("long").as("qn"))
    val inter = cPost.join(broadcast(qPost), Seq("w"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    inter.join(cSize, Seq("doc_id"))
      .join(broadcast(qSize), Seq("query_id"))
      .withColumn("uni", col("n") + col("qn") - col("inter"))
      .withColumn("score", expr(s"(inter * ${scale}L) DIV uni"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** Retrieval-evaluation sufficient statistics at cutoff k: for each
    * query, the rank of the FIRST relevant result in a ranked list plus
    * the relevant count within the cutoff — the exact integers behind
    * MRR@k and precision@k. The reciprocal 1/first_rel_rank is a per-row
    * scalar the eval notebook applies to a result |queries|-sized — it
    * stays downstream, same contract as [[bm25Stats]]. Queries with no
    * relevant result in the top k keep a row with NULL first_rel_rank
    * (they are the signal — dropping them would inflate MRR).
    *
    * Inputs: `ranked` (query_id, doc_id, rank) with rank 1-based within
    * each query; `rels` (query_id, doc_id) relevance pairs. Scale shape:
    * one (query, doc)-keyed join against the relevance set and one
    * query-keyed partial agg over ≤ k rows per query; the query universe
    * rides a broadcast back onto the agg so empty-hit queries survive.
    */
  def rankEvalAtK(
      ranked: DataFrame,
      rels: DataFrame,
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val hits = ranked.filter(col("rank") <= k)
      .join(rels.select(col("query_id"), col("doc_id")),
        Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(min(col("rank")).cast("long").as("first_rel_rank"),
        count(lit(1)).as("n_rel_topk"))
    ranked.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rel_rank"),
        coalesce(col("n_rel_topk"), lit(0L)).as("n_rel_topk"))
  }

  /** nDCG/MAP sufficient statistics — the full HIT-RANK table
    * [[rankEvalAtK]]'s (min, count) compression cannot reconstruct: one
    * row per relevant document found in the top `k` with its rank, plus
    * the query's TOTAL relevant count (the ideal-DCG / AP denominator —
    * without it a query with truncated recall scores the same as one
    * with perfect recall). From the sorted hit ranks every standard
    * graded metric derives exactly: DCG@k = Σ 1/log₂(r+1) over
    * hit_rank, IDCG from n_rel_total, AP@k from each hit's index/rank —
    * the logs and divisions (the only floats) stay downstream. Queries
    * with NO hit keep a NULL-rank row with their n_rel_total: they are
    * the metric's denominator ([[rankEvalAtK]]'s convention).
    *
    * Scale shape: rank lists are ≤ k per query by construction, so the
    * hit join and both left joins are rank-list-cardinality; the rel
    * totals are one partial agg over the relevance table.
    */
  def ndcgStatsAtK(
      ranked: DataFrame, // (query_id, doc_id, rank)
      rels: DataFrame, // (query_id, doc_id)
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val r = rels.select(col("query_id"), col("doc_id"))
    val relTotals = r.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel_total"))
    val hits = ranked.filter(col("rank") <= k)
      .join(r, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("rank").cast("long").as("hit_rank"))
    ranked.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .join(relTotals, Seq("query_id"), "left")
      .select(col("query_id"), col("hit_rank"),
        coalesce(col("n_rel_total"), lit(0L)).as("n_rel_total"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09) in
    * exact fixed point: each input list contributes
    * `scale div (k0 + rank)` per (query, doc) and contributions sum —
    * the hybrid-retrieval combiner that needs NO score calibration
    * between a dense (ANN) ranking and a lexical (BM25/Jaccard) ranking,
    * because it consumes only ranks. Integer floor division replaces the
    * float 1/(k0+r), so both engines agree bit-for-bit; fused ties break
    * to the smaller doc_id.
    *
    * Inputs: each list is (query_id, doc_id, rank). Scale shape: the
    * union + (query, doc)-keyed partial agg is rank-list-sized (≤ Σ per-
    * list k per query, never corpus-sized), and the final rank window
    * partitions on query_id over that bounded candidate set — fusing
    * 10^9 queries is embarrassingly parallel.
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      topK: Int,
      k0: Int = 60,
      scale: Long = 1000000000L
  ): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(topK > 0 && k0 >= 0, "topK must be positive, k0 non-negative")
    val tagged = lists.map(_.select(col("query_id"), col("doc_id"),
      expr(s"${scale}L DIV ($k0 + rank)").as("__c")))
    tagged.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .filter(col("rank") <= topK)
  }
}
