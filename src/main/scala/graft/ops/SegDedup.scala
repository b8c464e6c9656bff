package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level exact deduplication: remove repeated SPANS (lines,
  * paragraphs, word blocks) across the whole corpus, keeping each
  * distinct segment's globally FIRST occurrence — the CCNet-style
  * line-dedup step that strips boilerplate (headers, cookie banners,
  * license blurbs) a document-level dedup can never see, because the
  * documents carrying them are otherwise distinct.
  *
  * Contract: segments are keyed by a 64-bit content hash (the first 16
  * md5 hex chars — md5 so the DuckDB oracle replays the key bit-for-bit);
  * the first occurrence in (id, segment-index) order survives, every
  * later occurrence of the same hash is dropped, and each document's
  * surviving segments are reassembled in their original order. Hash-keyed
  * is the production contract, not an approximation — at 10^12 segments
  * a 64-bit key's expected collision count is ~10^4 (birthday bound,
  * n²/2^65), i.e. a ~10^-8 false-drop rate, which segment dedup trades
  * for never shuffling segment text as a key.
  *
  * Scale shape (the point of the design): segment TEXT crosses exactly
  * ONE shuffle — the final per-document reassembly join. The
  * first-occurrence decision runs entirely on fixed-width rows:
  *   1. explode → (hash, id, seg_idx) — 24-byte rows, no text;
  *   2. groupBy(hash).min(struct(id, seg_idx)) — partial-agg friendly;
  *   3. the DROP set (occurrences that are not their hash's first) is
  *      re-derived by joining the fixed-width stream, still no text;
  *   4. drops collapse to one row per affected document
  *      (collect_set of dropped indexes — bounded by the document's own
  *      segment count), and a single id-keyed join back to the original
  *      table rebuilds the text with an index-filtered higher-order
  *      function. Documents with nothing dropped pass through the left
  *      join untouched; AQE broadcasts the drop side when it is small
  *      (the common case — boilerplate is concentrated).
  */
object SegDedup {

  /** Word-block segmentation: consecutive `span`-word blocks of the
    * single-space word split (the segmenter for corpora without line
    * structure; for line-structured text pass `split(col, "\n")`
    * instead — [[dedupSegments]] takes any array-of-strings column).
    */
  def wordBlocks(text: Column, span: Int): Column = {
    require(span > 0, "span must be positive")
    val ws = split(text, " ", -1)
    transform(
      sequence(lit(0), ceil(size(ws) / lit(span.toDouble)).cast("int") - 1),
      i => array_join(slice(ws, i * span + 1, lit(span)), " "))
  }

  private def segKey(seg: Column): Column = substring(md5(seg), 1, 16)

  /** Corpus-wide first-occurrence segment dedup over `segs` (an
    * array-of-strings column derived from `df`'s text). Returns one row
    * per input row: (idCol, text = surviving segments joined by `sep`,
    * n_segs, n_dropped). `idCol` must be unique and orderable — it
    * defines which occurrence is "first".
    */
  def dedupSegments(
      df: DataFrame,
      idCol: String,
      segs: Column,
      sep: String = " "
  ): DataFrame = {
    val reserved = Seq("__segs", "__idx", "__seg", "__h", "__first",
      "__dropped", "n_segs", "n_dropped")
    require(!reserved.exists(df.columns.contains),
      s"dedupSegments reserves the column names ${reserved.mkString(", ")}")
    val base = df.select(col(idCol), segs.as("__segs"))
    // fixed-width decision stream: (hash, id, seg_idx) only — segment
    // text never rides through the first-occurrence machinery
    // the fixed-width (hash, id, idx) decision stream is read twice
    // (threshold agg + drop/span derivation): hash the segments once per
    // evaluation (lazy localCheckpoint, fresh per invocation)
    val occ = occurrences(base, idCol).localCheckpoint(false)
    val firsts = occ.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__idx"))).as("__first"))
    val drops = occ.join(firsts, Seq("__h"))
      .filter(col(idCol) =!= col(s"__first.$idCol") ||
        col("__idx") =!= col("__first.__idx"))
      .select(col(idCol), col("__idx"))
    reassemble(base, drops, idCol, sep)
  }

  /** Boilerplate STRIP: remove every occurrence of any segment that
    * appears in at least `minDf` distinct documents — headers, cookie
    * banners, license blurbs are defined by ubiquity, and unlike
    * [[dedupSegments]] the first copy must go too (the "first"
    * occurrence of a cookie banner is still a cookie banner). Returns
    * the same (id, text, n_segs, n_dropped) shape.
    *
    * Scale shape: identical fixed-width geometry — the df count is a
    * hash-keyed partial agg (count_distinct of ids per hash), the hot
    * set is tiny by construction (segments repeated across ≥ minDf
    * docs), and AQE broadcasts it into the occurrence stream.
    */
  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      segs: Column,
      minDf: Long,
      sep: String = " "
  ): DataFrame = {
    require(minDf >= 2, s"minDf < 2 would strip every segment, got $minDf")
    val reserved = Seq("__segs", "__idx", "__seg", "__h", "__df",
      "__dropped", "n_segs", "n_dropped")
    require(!reserved.exists(df.columns.contains),
      s"stripBoilerplate reserves the column names ${reserved.mkString(", ")}")
    val base = df.select(col(idCol), segs.as("__segs"))
    // the fixed-width (hash, id, idx) decision stream is read twice
    // (threshold agg + drop/span derivation): hash the segments once per
    // evaluation (lazy localCheckpoint, fresh per invocation)
    val occ = occurrences(base, idCol).localCheckpoint(false)
    val hot = occ.groupBy(col("__h"))
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__h"))
    val drops = occ.join(hot, Seq("__h")).select(col(idCol), col("__idx"))
    reassemble(base, drops, idCol, sep)
  }

  /** Maximal duplicated-SPAN detection (the ExactSubstr shape: Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): flag every segment whose content hash occurs more than
    * once in the corpus — including twice within one document — then
    * merge ADJACENT flagged segments of each document into maximal
    * spans. Where [[dedupSegments]] decides block-by-block,
    * this reports the contiguous duplicated REGIONS (start block +
    * length ≥ `minBlocks`), the unit an excision or audit step works
    * with: one long quoted passage is one span, not thirty disconnected
    * block drops.
    *
    * Returns (idCol, span_start, span_blocks), one row per maximal span.
    *
    * Scale shape: the duplicate-hash set is a hash-keyed partial agg
    * (fixed-width, no text); the adjacency merge is a gaps-and-islands
    * window PARTITIONED PER DOCUMENT — bounded by a single document's
    * own segment count, never by the corpus, so no mega-task exists.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      segs: Column,
      minBlocks: Int = 1
  ): DataFrame = {
    require(minBlocks >= 1, s"minBlocks must be >= 1, got $minBlocks")
    val reserved = Seq("__segs", "__idx", "__seg", "__h", "__grp",
      "span_start", "span_blocks")
    require(!reserved.exists(df.columns.contains),
      s"duplicatedSpans reserves the column names ${reserved.mkString(", ")}")
    val base = df.select(col(idCol), segs.as("__segs"))
    // the fixed-width (hash, id, idx) decision stream is read twice
    // (threshold agg + drop/span derivation): hash the segments once per
    // evaluation (lazy localCheckpoint, fresh per invocation)
    val occ = occurrences(base, idCol).localCheckpoint(false)
    val hot = occ.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1L)
      .select(col("__h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__idx"))
    occ.join(hot, Seq("__h"))
      .withColumn("__grp", col("__idx") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__idx")).cast("long").as("span_start"),
        count(lit(1)).as("span_blocks"))
      .filter(col("span_blocks") >= minBlocks.toLong)
      .select(col(idCol), col("span_start"), col("span_blocks"))
  }

  /** Convert [[duplicatedSpans]]' BLOCK spans to BYTE spans over the
    * original text — the coordinate [[graft.ops.TextStats.mergeSpans]]
    * and the PII span index share. Block k of wordBlocks(text, span)
    * covers words [k·span, min((k+1)·span, n)); its bytes follow from
    * the word-offset array ([[graft.ops.TextStats.wordByteOffsets]],
    * whose sentinel makes the exclusive end offsets[j+1] − 1 uniform).
    * One id-keyed join of the fixed-width span stream back to a
    * scan-side offsets projection; text never re-shuffles.
    */
  def blockByteSpans(
      df: DataFrame,
      idCol: String,
      text: Column,
      spans: DataFrame, // (idCol, span_start [block], span_blocks)
      blockWords: Int
  ): DataFrame = {
    require(blockWords > 0, "blockWords must be positive")
    val off = df.select(col(idCol),
      graft.ops.TextStats.wordByteOffsets(text).as("__off"))
    // size(__off) = n_words + 1 (the sentinel)
    val nWords = (size(col("__off")) - 1).cast("long")
    val firstWord = col("span_start") * blockWords
    val endWord = least(
      (col("span_start") + col("span_blocks")) * blockWords, nWords)
    spans.join(off, Seq(idCol))
      .select(
        col(idCol),
        element_at(col("__off"), (firstWord + 1).cast("int")).as("start"),
        (element_at(col("__off"), (endWord + 1).cast("int")) - 1).as("end"))
  }

  private def occurrences(base: DataFrame, idCol: String): DataFrame =
    base
      .select(col(idCol), posexplode(col("__segs")).as(Seq("__idx", "__seg")))
      .select(col(idCol), col("__idx"), segKey(col("__seg")).as("__h"))

  /** Shared tail: collapse the fixed-width drop stream to one row per
    * affected document (bounded by that document's own segment count,
    * so collect_set is safe at any corpus size) and rebuild each text
    * with an index-filtered higher-order function in ONE id-keyed join.
    */
  private def reassemble(
      base: DataFrame, drops: DataFrame, idCol: String, sep: String
  ): DataFrame = {
    val dropsPerDoc = drops.groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__idx"))).as("__dropped"))
    base
      .join(dropsPerDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        array_join(
          filter(col("__segs"), (_, i) =>
            col("__dropped").isNull || !array_contains(col("__dropped"), i)),
          sep).as("text"),
        size(col("__segs")).cast("long").as("n_segs"),
        coalesce(size(col("__dropped")), lit(0)).cast("long").as("n_dropped"))
  }
}
