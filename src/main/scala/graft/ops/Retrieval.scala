package graft.ops

import org.apache.spark.sql.DataFrame
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
}
