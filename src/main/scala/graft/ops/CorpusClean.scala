package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline: exact dedup (keep lowest
  * id per identical text) + quality gates + language filter — the
  * standard "raw crawl → trainable corpus" pass, assembled from the ops
  * primitives so the whole thing stays one declarative plan.
  *
  * Shape at scale: ONE shuffle (dedup window on the text hash); quality
  * and language gates are narrow codegen'd predicates fused into the scan.
  */
object CorpusClean {

  /** Keeps rows that (a) are the first occurrence of their exact text,
    * (b) pass length/word-count quality thresholds, (c) match one of the
    * wanted marker-language predictions. Adds the signals as columns.
    */
  def apply(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minChars: Int = 50,
      maxChars: Int = 10000,
      minWords: Int = 8,
      langs: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "a"),
        "db" -> Seq("data", "table", "row"),
        "qy" -> Seq("query", "join", "scan")),
      keepLangs: Set[String] = Set("en", "db", "qy")
  ): DataFrame = {
    val t = col(textCol)
    val w = Window.partitionBy(md5(t.cast("binary"))).orderBy(col(idCol))
    docs
      .withColumn("__rank", row_number().over(w))
      .withColumn("n_chars_q", char_length(t).cast("long"))
      .withColumn("n_words", TextStats.wsTokenCount(t))
      .withColumn("lang_pred", TextStats.langId(t, langs))
      .filter(
        col("__rank") === 1 &&
          col("n_chars_q").between(minChars, maxChars) &&
          col("n_words") >= minWords &&
          col("lang_pred").isin(keepLangs.toSeq: _*))
      .drop("__rank")
  }
}
