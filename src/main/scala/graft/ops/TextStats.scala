package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: quality scoring,
  * language ID (marker n-gram heuristic), token counting, fingerprinting.
  * All pure Catalyst expressions (codegen'd, shuffle-free projections);
  * integer outputs wherever an oracle compares them exactly.
  */
object TextStats {

  /** Whitespace token count (single-space split, empty tokens included —
    * matches DuckDB string_split semantics used by the oracle).
    */
  def wsTokenCount(text: Column): Column =
    size(split(text, " ", -1)).cast("long")

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val tokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit(tokenRegex)).cast("long")

  /** Unicode-script character classes as explicit CODEPOINT RANGES
    * (`\x{…}` — the one hex-escape syntax Java regex and RE2 read
    * identically), not `\p{script=…}` whose membership shifts with each
    * engine's Unicode table: the oracle must count the same characters.
    */
  val LatinClass = "[A-Za-z\\x{00C0}-\\x{024F}]"
  val HanClass = "[\\x{4E00}-\\x{9FFF}]"
  val CyrillicClass = "[\\x{0400}-\\x{04FF}]"
  val DigitClass = "[0-9]"

  /** Characters of `text` matching a one-char regex class, counted as
    * length minus length-after-removal — a scan-fused projection, no
    * split/explode.
    */
  def charClassCount(text: Column, oneCharClass: String): Column =
    (length(text) - length(regexp_replace(text, oneCharClass, "")))
      .cast("long")

  /** Script-mix histogram: per-script character counts (Latin incl.
    * Latin-1/Extended, Han, Cyrillic, ASCII digits) plus the total — the
    * cheap prior under language id and the standard mixed-script
    * spam/homoglyph signal (a "Latin" document with a Cyrillic 'о' in a
    * domain name lights up n_cyrillic). All scan-side; zero shuffles.
    */
  def scriptMix(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.select(
      col(idCol),
      length(text).cast("long").as("n_chars_total"),
      charClassCount(text, LatinClass).as("n_latin"),
      charClassCount(text, HanClass).as("n_han"),
      charClassCount(text, CyrillicClass).as("n_cyrillic"),
      charClassCount(text, DigitClass).as("n_digit"))

  /** Middle-out truncation to a word budget: keep the first `headWords`
    * and the last `tailWords` words with `marker` replacing the elided
    * middle — the context-window squeeze long-document SFT/RAG
    * pipelines apply (the head carries the instruction, the tail the
    * recent state). Texts already within budget pass through
    * byte-identical — including their exact whitespace, which a
    * split+rejoin would silently normalize. Pure scan-side array
    * slicing — no shuffle, no UDF.
    */
  def middleTruncate(
      text: Column,
      headWords: Int,
      tailWords: Int,
      marker: String = "<...>"
  ): Column = {
    require(headWords >= 1 && tailWords >= 1,
      s"head/tail word counts must be >= 1, got $headWords/$tailWords")
    val ws = split(text, " ", -1)
    when(size(ws) <= headWords + tailWords, text)
      .otherwise(array_join(
        concat(
          slice(ws, 1, headWords),
          array(lit(marker)),
          slice(ws, -tailWords, tailWords)),
        " "))
  }

  def digitCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("long")

  def upperCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("long")

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("long")

  /** Token-level PII scrub for training corpora: whitespace tokens that
    * look like an email, an IPv4 address, or a long bare number are
    * replaced with typed placeholders. Deliberately token-exact rules
    * (single '@' with nonempty local and dotted domain; 4 dot-separated
    * 1-3-digit groups; >=7-digit runs) so the DuckDB oracle reproduces
    * the decision byte-for-byte — recall-tuned patterns can widen the
    * rules without changing the operator shape. Pure narrow projection:
    * shuffle-free, codegen'd, scan-fused.
    */
  def scrubPii(text: Column): Column =
    array_join(
      transform(split(text, " ", -1), t =>
        when(isEmailToken(t), lit("<EMAIL>"))
          .when(isIpToken(t), lit("<IP>"))
          .when(isLongNumToken(t), lit("<NUM>"))
          .otherwise(t)),
      " ")

  // One predicate per category, shared by scrubPii and piiTokenCount so
  // the audit count can never desync from the redactions. Byte lengths
  // (octet_length <-> DuckDB strlen) and \\z anchors (Java's $ would also
  // match before a trailing newline; regexp_full_match would not) keep
  // the oracle byte-exact.
  private def isEmailToken(t: Column): Column = {
    val at = split(t, "@", -1)
    // get() (0-based, null on OOB) instead of element_at: ANSI mode
    // throws on out-of-bounds and predicate order is not guaranteed
    size(at) === 2 &&
      octet_length(get(at, lit(0))) >= 1 &&
      octet_length(get(at, lit(1))) >= 3 &&
      get(at, lit(1)).contains(".")
  }
  private def isIpToken(t: Column): Column =
    t.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}\\z")
  private def isLongNumToken(t: Column): Column =
    t.rlike("^[0-9]{7,}\\z")
  private def isPiiToken(t: Column): Column =
    isEmailToken(t) || isIpToken(t) || isLongNumToken(t)

  /** Count of tokens [[scrubPii]] would redact (the audit metric). */
  def piiTokenCount(text: Column): Column =
    size(filter(split(text, " ", -1), isPiiToken _)).cast("long")

  /** array<struct<start,end,kind>> of [start, end) BYTE spans for every
    * token [[scrubPii]] would redact — WHERE the PII sat, not just that
    * it did ([[graft.exprs.PiiSpans]]; classification is the scrub's
    * rules verbatim, so spans can never desync from redactions). The
    * release-audit artifact, and the input to span-level loss masking.
    */
  def piiSpans(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.PiiSpans(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Occurrences of a marker word (word-boundary anchored). */
  def markerCount(text: Column, word: String): Column =
    regexp_count(text, lit("\\b" + word + "\\b")).cast("long")

  /** Marker-based language score: total occurrences of the marker set. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(markerCount(text, _)).reduce(_ + _)

  /** Argmax language label over marker sets (first wins ties — the caller
    * passes languages in priority order).
    */
  def langId(text: Column, langs: Seq[(String, Seq[String])]): Column = {
    // One-pass argmax: every langScore (a chain of regexp counts — the
    // expensive part) appears EXACTLY once in the expression tree. The
    // previous greatest + CASE formulation repeated each score ~5x and
    // conditional-branch subexpression elimination does not collapse
    // them, so every row paid for the marker regexes several times over.
    // Encoding: array_min over (−score, priority, name) structs — struct
    // ordering compares fields left to right, so the minimum is the
    // highest score with earliest-language tie-break. The appended
    // ("und", s→0, priority −1) sentinel wins against every zero or null
    // score (nulls coalesce to Long.MaxValue), preserving the s > 0
    // requirement and the null-text fallback. Everything here is plain
    // (non-lambda) array/struct algebra, so it stays codegen-compatible —
    // an `aggregate` HOF variant was measured ~2x slower on a pure
    // projection.
    val scored = langs.zipWithIndex.map { case ((name, markers), i) =>
      struct(
        coalesce(-langScore(text, markers), lit(Long.MaxValue)).as("s"),
        lit(i).as("p"), lit(name).as("n"))
    }
    val und = struct(lit(0L).as("s"), lit(-1).as("p"), lit("und").as("n"))
    array_min(array(scored :+ und: _*)).getField("n")
  }

  /** Canonical-form fingerprint: md5 of lower-cased, whitespace-collapsed
    * text (rolling-hash-equivalent doc identity for exact-ish dedup).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[ \\t\\n]+", " ").cast("binary"))

  /** Polynomial rolling-hash fingerprint over codepoints (mod 1e9+7) —
    * a 64-bit doc identity computable incrementally over a stream; exact
    * DuckDB oracle via list_reduce (see [[graft.exprs.RollingHash]]).
    */
  def rollingFingerprint(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.RollingHash(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Unicode NFC normalization ([[graft.exprs.NfcNormalize]]): canonical
    * composition so that visually-identical text hashes identically —
    * run it BEFORE [[fingerprint]]/minhash/simhash or the corpus
    * under-deduplicates on decomposed vs composed encodings of the same
    * characters. Zero-shuffle codegen'd projection; already-normalized
    * (incl. pure-ASCII) strings pass through without allocation.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.NfcNormalize(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Tokenizer-accurate token count: greedy longest-match against an
    * ASCII vocabulary shipped as DATA (one reference-object expression,
    * the IvfProbeLists pattern) with a one-codepoint fallback token —
    * the count a shard packer should budget on when the real training
    * tokenizer's vocab is available (pass it here); see
    * [[graft.exprs.VocabTokenCount]] for the exact matching contract.
    */
  def vocabTokenCount(text: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.VocabTokenCount(
        org.apache.spark.sql.GraftBridge.expression(text), vocab.toArray))

  /** The greedy longest-match token SEQUENCE for `text` (the
    * [[vocabTokenCount]] walk, materialized). */
  def vocabTokenSeq(text: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.VocabTokenSeq(
        org.apache.spark.sql.GraftBridge.expression(text), vocab.toArray))

  /** BPE-training inner loop: corpus-wide counts of ADJACENT token
    * pairs under the current vocab — the statistic whose argmax is the
    * next merge a BPE trainer adds. Emits (t1, t2, n) for every
    * adjacent pair in the greedy tokenization of every document.
    *
    * Scale shape: tokenization is one scan-fused reference-object
    * expression; the pair expansion is a scan-side zip of the sequence
    * against its own tail (array expressions, no join); counts collapse
    * in ONE (t1, t2)-keyed partial agg. Each merge round re-runs this
    * with the grown vocab — rounds are embarrassingly sequential, the
    * count inside each round is embarrassingly parallel.
    */
  def bpePairCounts(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      vocab: Seq[String]
  ): org.apache.spark.sql.DataFrame =
    seqPairCounts(df, vocabTokenSeq(col(textCol), vocab))

  /** Adjacent-pair counts over an arbitrary token-SEQUENCE column (the
    * [[bpePairCounts]] core, reused by the learning loop on merged
    * sequences). One linear zip_with fan-out, one partial-agg shuffle.
    */
  private def seqPairCounts(
      df: org.apache.spark.sql.DataFrame,
      seq: Column
  ): org.apache.spark.sql.DataFrame = {
    val t = col("__toks")
    df.select(seq.as("__toks"))
      .select(explode(
        zip_with(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => struct(a.as("t1"), b.as("t2"))))
        .as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).as("n"))
  }

  /** One classic-BPE merge pass over a token-sequence column: leftmost
    * non-overlapping (t1, t2) occurrences collapse to t1+t2
    * ([[graft.exprs.BpeMergeApply]], a single codegen'd scan).
    */
  def bpeMergeApply(toks: Column, t1: String, t2: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.BpeMergeApply(
        org.apache.spark.sql.GraftBridge.expression(toks), t1, t2))

  /** BPE merge LEARNING — classic byte-pair-encoding training over the
    * token stream: tokenize ONCE with the base vocabulary (greedy
    * longest-match, [[vocabTokenSeq]]), then `rounds` times take the
    * most frequent adjacent token pair (ties broken by (t1, t2)
    * lexicographically, so the argmax is deterministic), record the
    * merge, and APPLY it to the sequences ([[bpeMergeApply]]: leftmost
    * non-overlapping collapse — the textbook BPE pairing rule) before
    * recounting. Merges therefore compose in learned order, exactly as
    * a BPE tokenizer replays them at encode time.
    *
    * Returns one row per learned merge: (round, t1, t2, merged, n) with
    * n the pair's corpus count AT SELECTION TIME. Stops early if no
    * adjacent pair remains. Sequential in `rounds` by nature (round
    * r+1 counts the sequences round r produced); each round is one
    * distributed count + TakeOrderedAndProject argmax collecting a
    * single row — the learned merges ARE the output, so the driver
    * holding them is the same contract as
    * [[graft.ops.Similarity.mmrSelect]]'s selections. Round r's plan
    * re-tokenizes and re-applies r−1 single-scan merge expressions
    * (recompute over cache, the scale-safe default); only (t1, t2,
    * count) partial aggs ever shuffle.
    */
  def bpeLearnMerges(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      baseVocab: Seq[String],
      rounds: Int
  ): org.apache.spark.sql.DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var seq = vocabTokenSeq(col(textCol), baseVocab)
    var learned = Vector.empty[(Int, String, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val top = seqPairCounts(df, seq)
        .orderBy(col("n").desc, col("t1").asc, col("t2").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (t1, t2) = (row.getString(0), row.getString(1))
        learned :+= ((r, t1, t2, t1 + t2, row.getLong(2)))
        seq = bpeMergeApply(seq, t1, t2)
      }
    }
    learned.toDF("round", "t1", "t2", "merged", "n")
  }

  /** Word-rarity quality signals: per document, the token count, how
    * many of its tokens occur fewer than `minCount` times in the WHOLE
    * corpus (the OOV/typo/garbage signal heuristic quality filters
    * threshold on), and the exact sum of the tokens' corpus frequencies
    * (the integer sufficient statistic of a unigram-LM score — rarer
    * words, lower sum; the float −Σlog p is one expression downstream).
    * Documents with no tokens report zeros.
    *
    * Scale shape: one token-keyed count agg (partial-agg friendly), a
    * count-payload join back to the token stream (8-byte payload per
    * row; a stopword's occurrences co-partition exactly like any
    * word-keyed agg), then one doc-keyed agg. Text never crosses a
    * shuffle — only (id, word) pairs do.
    */
  def rarityStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long
  ): org.apache.spark.sql.DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val toks = df
      .select(col(idCol).as("__id"), explode(Dedup.words(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
    val counts = toks.groupBy("__w").agg(count(lit(1)).as("__cnt"))
    val stats = toks
      .join(counts, "__w")
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("__nw"),
        sum(when(col("__cnt") < minCount, 1L).otherwise(0L)).as("__nr"),
        sum(col("__cnt")).as("__fs"))
    df.select(col(idCol))
      .join(stats.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nw"), lit(0L)).as("n_words"),
        coalesce(col("__nr"), lit(0L)).as("n_rare"),
        coalesce(col("__fs"), lit(0L)).as("freq_sum"))
  }

  /** Heaps-law vocabulary growth curve: per `bucketDocs`-document
    * bucket (in `idCol` order), how many NEW word types appear — types
    * whose first containing document falls in that bucket — plus the
    * bucket's document/token volume and running totals. cum_types vs
    * cum_tokens IS the V(n) ∝ n^β Heaps curve (the β fit, the only
    * float, stays downstream): a flattening curve says the corpus is
    * saturating its vocabulary (more data, few new words — crawl
    * overlap); a steepening one says the new data is out-of-domain or
    * garbage. Zero-token documents still count toward n_docs (position
    * on the x-axis is corpus volume, not token luck).
    *
    * `idCol` must be non-negative (fails loud otherwise): bucket
    * assignment is integer `div`, and a negative id would make Spark's
    * truncating div disagree with floor semantics.
    *
    * Scale shape: one word-keyed min agg gives each type's first
    * document (partial-agg friendly — "the" collapses map-side), then
    * everything is bucket-cardinality. The running sums are ONE
    * unpartitioned window over the bucket frame — bounded by
    * corpus_docs/bucketDocs rows (the chunk-frame convention of
    * [[Curation]]'s packing), never by document or token volume.
    */
  def vocabGrowth(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      bucketDocs: Long
  ): org.apache.spark.sql.DataFrame = {
    require(bucketDocs > 0, "bucketDocs must be positive")
    val guarded = when(col(idCol) >= 0L, col(idCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("vocabGrowth: negative id "), col(idCol).cast("string"),
        lit(" — ids must be >= 0"))))
    val bucket = call_function("div", guarded, lit(bucketDocs))
    val toks = df
      .select(bucket.as("__b"), explode(Dedup.words(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
    // each type's first containing bucket (min over doc buckets is the
    // bucket of the min doc id — div is monotone on non-negatives)
    val newTypes = toks.groupBy(col("__w"))
      .agg(min(col("__b")).as("__fb"))
      .groupBy(col("__fb").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val docSide = df
      .select(bucket.as("bucket"),
        size(filter(Dedup.words(col(textCol)), _ =!= "")).cast("long")
          .as("__tc"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tc")).as("bucket_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docSide
      .join(newTypes, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_types", sum(col("new_types")).over(w))
      .withColumn("cum_tokens", sum(col("bucket_tokens")).over(w))
      .select(col("bucket"), col("n_docs"), col("new_types"),
        col("cum_types"), col("bucket_tokens"), col("cum_tokens"))
  }

  /** Feature hashing ("hashing trick"): each whitespace word is routed
    * to `bucket = rollingHash(word) mod dims`, and the per-(doc, bucket)
    * counts ARE the document's sparse feature vector — fixed
    * dimensionality with no vocabulary to build, ship, or version,
    * which is what makes it the featurizer that still works when the
    * corpus is 100 TB and the vocab won't fit anywhere. Collisions are
    * the accepted trade (dims controls the rate) and are deterministic:
    * the bucket function is the polynomial rolling hash mod 1e9+7 that
    * [[rollingFingerprint]] exposes, replayed bit-exactly by the DuckDB
    * oracle (q_feature_hash).
    *
    * Scale shape: scan-fused explode + ONE (doc, bucket)-keyed partial
    * agg — the same geometry as term frequency; nothing driver-side,
    * no vocabulary broadcast.
    */
  def featureHash(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      dims: Int
  ): org.apache.spark.sql.DataFrame = {
    require(dims > 0, "dims must be positive")
    df.select(col(idCol), explode(Dedup.words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      // rolling hash is in [0, 1e9+7) — plain % is already non-negative
      .select(col(idCol), (rollingFingerprint(col("term")) % dims).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n_terms"))
  }

  /** [[featureHash]] assembled into a dense `array<long>` of length
    * `dims` per document — the model-input shape. Per-doc state is
    * bounded by dims (map_from_entries over ≤ dims buckets), never by
    * document length; docs with no tokens get the zero vector.
    */
  def featureHashVector(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      dims: Int
  ): org.apache.spark.sql.DataFrame = {
    val counts = featureHash(df, idCol, textCol, dims)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("n_terms"))))
        .as("__m"))
    df.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dims - 1L)),
          i => coalesce(try_element_at(col("__m"), i), lit(0L))).as("vec"))
  }

  /** Simple quality score components (integers; ratio left to consumers). */
  def qualityColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_chars_q" -> char_length(text).cast("long"),
    "n_bytes" -> octet_length(text).cast("long"),
    "n_ws_tokens" -> wsTokenCount(text),
    "n_digits" -> digitCount(text),
    "n_upper" -> upperCount(text),
    "n_punct" -> punctCount(text)
  )

  /** Repetition quality signals (the Gopher/RefinedWeb filter family):
    * per document, the fraction of word n-gram instances claimed by the
    * single most frequent n-gram (`top<n>_frac_bp`) and the fraction of
    * instances whose n-gram occurs more than once (`dup<n>_frac_bp`) —
    * both in basis points, both exact integers under the oracle
    * (q_repetition). Boilerplate, keyword-stuffed, and
    * generation-loop documents light up these two numbers long before a
    * perplexity model sees them.
    *
    * Scale shape: explode → two-level partial-aggregated groupBy keyed by
    * (doc, n-gram) — the same shuffle geometry as the MinHash shingle
    * path; no per-row quadratic work, no UDF. Documents with fewer than
    * n words have no n-grams and report 0 fractions over 0 totals.
    */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      nTop: Int = 2,
      nDup: Int = 3
  ): org.apache.spark.sql.DataFrame = {
    def grams(n: Int) = df.select(
      col(idCol),
      explode(Dedup.shingleCol(col(textCol), n, distinct = false)).as("g"))
    def counted(n: Int) = grams(n)
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
    def bp(num: Column, den: Column) =
      when(den > 0, floor(num * 10000L / den)).otherwise(0L).cast("long")
    val top = counted(nTop).groupBy(col(idCol)).agg(
      sum(col("c")).as(s"top${nTop}_total"),
      max(col("c")).as(s"top${nTop}_max"))
    val dup = counted(nDup).groupBy(col(idCol)).agg(
      sum(col("c")).as(s"dup${nDup}_total"),
      sum(when(col("c") > 1, col("c")).otherwise(0L)).as(s"dup${nDup}_dup"))
    df.select(col(idCol))
      .join(top, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col(s"top${nTop}_total"), lit(0L)).as(s"top${nTop}_total"),
        coalesce(col(s"top${nTop}_max"), lit(0L)).as(s"top${nTop}_max"),
        bp(coalesce(col(s"top${nTop}_max"), lit(0L)),
          coalesce(col(s"top${nTop}_total"), lit(0L))).as(s"top${nTop}_frac_bp"),
        coalesce(col(s"dup${nDup}_total"), lit(0L)).as(s"dup${nDup}_total"),
        coalesce(col(s"dup${nDup}_dup"), lit(0L)).as(s"dup${nDup}_dup"),
        bp(coalesce(col(s"dup${nDup}_dup"), lit(0L)),
          coalesce(col(s"dup${nDup}_total"), lit(0L))).as(s"dup${nDup}_frac_bp"))
  }

  /** CORPUS-level top-k n-gram heavy hitters: the boilerplate detector —
    * the n-grams that dominate a crawl (navigation chrome, license
    * blurbs, cookie banners) surface here first, and their counts feed
    * both the decontamination df-cap and segment-dedup tuning.
    *
    * Exact, not sketched: explode → two-level count (map-side partial
    * aggregation absorbs the heavy hitters by definition — the hotter the
    * n-gram, the more it collapses before the shuffle) → global top-k via
    * TakeOrderedAndProject (per-partition top-k, k rows to the driver —
    * never a full sort). Ties at the boundary break by n-gram text, so
    * the result is a deterministic total order.
    */
  def topNgrams(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      n: Int,
      k: Int
  ): org.apache.spark.sql.DataFrame = {
    require(n > 0 && k > 0, "n and k must be positive")
    df.select(
        explode(Dedup.shingleCol(col(textCol), n, distinct = false))
          .as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Overlapping word-window chunks — the document → embedding-unit
    * splitter: chunk i covers words [1 + i·stride, 1 + i·stride + chunk)
    * of the single-space word split, and windows are emitted until the
    * document's tail is covered (n = 1 + ceil(max(0, n_words − chunk) /
    * stride), so every doc yields ≥ 1 chunk and the last window may be
    * short). chunk ≥ stride ⇒ consecutive chunks overlap by
    * (chunk − stride) words of context.
    *
    * Scale shape: one scan-side Generate (explode over a computed index
    * sequence) + array-slice projections — no shuffle, no UDF; output
    * row count is Σ per-doc n, known from n_words before the explode.
    * Reconstruction-faithful on single-space text (split/join
    * round-trip); exact-integer geometry under the oracle
    * (q_chunk_words).
    */
  def chunkWords(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int,
      strideWords: Int
  ): org.apache.spark.sql.DataFrame = {
    require(chunkWords > 0 && strideWords > 0,
      "chunkWords and strideWords must be positive")
    require(strideWords <= chunkWords,
      "strideWords must be <= chunkWords — a stride past the window " +
        "would skip words AND the tail-coverage formula would emit a " +
        "phantom empty chunk past the document")
    val ws = split(col(textCol), " ", -1)
    val nw = size(ws)
    val n = lit(1L) +
      call_function("div",
        greatest(nw.cast("long") - chunkWords, lit(0L)) + (strideWords - 1),
        lit(strideWords.toLong))
    df.filter(col(textCol).isNotNull)
      .select(
        col(idCol),
        ws.as("__ws"),
        explode(sequence(lit(0L), n - 1L)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        (col("chunk_idx") * strideWords + 1L).as("word_start"),
        least(lit(chunkWords.toLong),
          size(col("__ws")).cast("long") - col("chunk_idx") * strideWords)
          .as("n_words"),
        concat_ws(" ",
          slice(col("__ws"), (col("chunk_idx") * strideWords + 1L).cast("int"),
            lit(chunkWords))).as("chunk_text"))
  }

  /** Per-document top-k salient terms: the exact-integer core of tf-idf.
    * Each document's terms are ranked by (tf DESC, df ASC, term ASC) —
    * term frequency first, corpus rarity as the tiebreak — a
    * deterministic total order over integers, so it sits under the hard
    * oracle where a float idf weight (ln((N+1)/(df+1)), whose last-ulp
    * differs across engines) could not. Callers who want true tf·idf
    * scores multiply the returned (tf, df) off the exact path; the
    * RANKING here is the part a keyword-extraction / topic-labeling
    * stage consumes.
    *
    * Scale shape: tf is one (doc, term)-keyed partial agg; df derives
    * from the tf table by a term-keyed partial agg (count of docs, not a
    * re-scan); the join back is term-co-partitioned with it; the final
    * top-k window partitions by doc — bounded by a document's own
    * distinct-term count, never corpus-sized. No collect, no full sort.
    */
  def topTermsPerDoc(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): org.apache.spark.sql.DataFrame = {
    require(k > 0, "k must be positive")
    val tf = df
      .select(col(idCol), explode(Dedup.words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Bigram language-model SUFFICIENT STATISTICS — the CCNet-style
    * perplexity filter kept on the hard-oracle path. The MLE bigram
    * log-probability of a document is Σ (ln n_ab − ln n_a) over its
    * adjacent word pairs, with n_ab the corpus count of the pair and n_a
    * the corpus count of the left word; logs don't linearize, so the
    * exact integer sufficient statistic per document is the MULTISET of
    * its (n_ab, n_a) values — emitted here as one row per distinct
    * (doc, n_ab, n_a) with its multiplicity `n_pairs`. The float
    * surprisal −Σ n_pairs·(ln n_ab − ln n_a) (and per-token perplexity)
    * is one expression downstream. Documents with < 2 non-empty words
    * emit nothing (no bigram to score). n_a counts ALL corpus
    * occurrences of the left word (the standard denominator
    * approximation — doc-final occurrences included), replayed
    * identically by the oracle.
    *
    * Scale shape: adjacent pairs explode scan-side (doc-length-bounded
    * fan-out), corpus bigram + unigram counts are two partial-agg tables
    * (bigram-vocabulary sized) joined back onto the (id, a, b) pair
    * stream by key, then one doc-keyed agg of 3 longs/row — text never
    * crosses a shuffle, the same geometry as [[rarityStats]] one order
    * higher.
    */
  def lmSurprisalStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String
  ): org.apache.spark.sql.DataFrame = {
    val ws = Dedup.words(col(textCol))
    val n = greatest(size(ws) - 1, lit(0))
    val prs = df
      .select(col(idCol).as("__id"),
        explode(zip_with(
          slice(ws, lit(1), n), slice(ws, lit(2), n),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("__id"), col("p.a").as("__a"), col("p.b").as("__b"))
      .filter(col("__a") =!= "" && col("__b") =!= "")
    val bi = prs.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("n_ab"))
    val uni = df
      .select(explode(ws).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("n_a"))
    prs
      .join(bi, Seq("__a", "__b"))
      .join(uni.withColumnRenamed("__w", "__a"), Seq("__a"))
      .groupBy(col("__id"), col("n_ab"), col("n_a"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("__id").as(idCol), col("n_ab"), col("n_a"),
        col("n_pairs"))
  }

  /** Corpus word co-occurrence: for every ordered word pair (a, b) with b
    * at most `maxDist` positions after a, the pair count `n_ab` plus both
    * words' corpus unigram counts `n_a` / `n_b` and the corpus token
    * total `n_total` — the exact integer sufficient statistics of PMI
    * (`log(n_ab·n_total / (n_a·n_b))`) and of phrase/collocation mining,
    * emitted without the log so the output sits under the hard oracle
    * (PMI ORDER is already decidable from these by integer
    * cross-multiplication).
    *
    * Scale shape: window pairs explode scan-side (≤ maxDist rows per
    * token — bounded fan-out, no quadratic doc blow-up), then ONE
    * pair-keyed partial agg; unigram counts are a second word-keyed agg
    * (vocabulary-sized output) joined back on each side — at web scale
    * the vocabulary table is orders of magnitude smaller than the pair
    * stream, and `minCount` prunes the hapax tail before the joins.
    */
  def cooccurrence(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      maxDist: Int,
      minCount: Long = 1L
  ): org.apache.spark.sql.DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(minCount >= 1L, "minCount must be >= 1")
    val ws = Dedup.words(col(textCol))
    val pairArrays = (1 to maxDist).map { o =>
      val n = greatest(size(ws) - o, lit(0))
      zip_with(
        slice(ws, lit(1), n), slice(ws, lit(o + 1), n),
        (x, y) => struct(x.as("a"), y.as("b")))
    }
    val pairs = df
      .select(explode(concat(pairArrays: _*)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val uni = df
      .select(explode(ws).as("wd"))
      .groupBy(col("wd"))
      .agg(count(lit(1)).as("n_w"))
    val total = uni.agg(sum(col("n_w")).as("n_total"))
    val ua = uni.select(col("wd").as("__ca"), col("n_w").as("n_a"))
    val ub = uni.select(col("wd").as("__cb"), col("n_w").as("n_b"))
    pairs
      .join(ua, col("a") === col("__ca"))
      .join(ub, col("b") === col("__cb"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_total"))
  }

  /** Byte start offsets of each single-space-split token plus the
    * uniform end sentinel ([[graft.exprs.WordByteOffsets]]) — the bridge
    * from word/block coordinates to [[piiSpans]]' byte-span convention.
    */
  def wordByteOffsets(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.WordByteOffsets(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Interval UNION per document: merge overlapping and abutting
    * [start, end) spans — from ANY mix of sources (PII spans, duplicate
    * excisions, policy redactions) — into maximal disjoint intervals,
    * with n_spans counting how many source spans each interval absorbed.
    * This is the composed "do not train on these bytes" loss mask: span
    * producers stay independent and this one operator owns the merge.
    *
    * Scale shape: gaps-and-islands over a window PARTITIONED PER
    * DOCUMENT — bounded by one document's own span count, never the
    * corpus, so no mega-task exists (same argument as duplicatedSpans).
    */
  def mergeSpans(spans: DataFrame, idCol: String): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("start"), col("end"))
    // running max of PRIOR ends: a span starting strictly past it opens
    // a new island (equality abuts -> merges)
    val prevMax = max(col("end")).over(ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    spans
      .withColumn("__new",
        when(prevMax.isNull || col("start") > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(ord))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("start")).as("start"), max(col("end")).as("end"),
        count(lit(1)).as("n_spans"))
      .select(col(idCol), col("start"), col("end"), col("n_spans"))
  }

  /** array<bigint> of per-term SUBSTRING occurrence counts (overlapping
    * included), index-aligned with `terms` — all terms matched in ONE
    * Aho–Corasick pass over the text ([[graft.exprs.MultiMatchCounts]]),
    * not one scan per term. The C4/RefinedWeb badwords-filter shape: at
    * 100 TB, k regex passes is k full-corpus scans; this is one, with
    * the term list riding along as a single reference object (plan size
    * O(1) in k).
    */
  def multiMatchCounts(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.exprs.MultiMatchCounts(
        org.apache.spark.sql.GraftBridge.expression(text),
        new graft.exprs.AcAutomaton(terms.toArray)))

  /** Blocklist tagging: one row per (document, matched term) with its
    * exact overlapping occurrence count — the audit artifact behind a
    * badwords filter (which term fired, where, how often) rather than a
    * bare drop bit. Matching is substring (phrases with spaces work),
    * case-sensitive; callers wanting case-folds pass `lower(text)` and
    * lowercase terms.
    *
    * Scale shape: ONE scan-fused automaton pass per row, then a
    * posexplode of the k-length count vector filtered to hits — output
    * is hit-sized, never |docs|×k; no shuffle at all.
    */
  def blocklistCounts(
      df: DataFrame,
      idCol: String,
      text: Column,
      terms: Seq[String]
  ): DataFrame =
    df.select(
        col(idCol),
        posexplode(multiMatchCounts(text, terms)).as(Seq("pos", "n")))
      .filter(col("n") > 0)
      .select(
        col(idCol),
        element_at(
          lit(terms.toArray), col("pos").cast("int") + 1).as("term"),
        col("n"))

  /** Blocklist match SPANS: one row per (document, occurrence) with
    * [start, end) BYTE offsets and the matched term — the third span
    * source for the [[mergeSpans]] do-not-train mask (PII, duplicate
    * excisions, and now blocklist hits share one byte axis). Same
    * automaton, overlapping occurrences all emitted; hit-sized output.
    */
  def blocklistSpans(
      df: DataFrame,
      idCol: String,
      text: Column,
      terms: Seq[String]
  ): DataFrame =
    df.select(
        col(idCol),
        explode(org.apache.spark.sql.GraftBridge.column(
          graft.exprs.MultiMatchSpans(
            org.apache.spark.sql.GraftBridge.expression(text),
            new graft.exprs.AcAutomaton(terms.toArray)))).as("sp"))
      .select(col(idCol), col("sp.start").as("start"),
        col("sp.end").as("end"), col("sp.term").as("term"))

  /** The filter the tags exist for: rows whose text contains NO
    * blocklist term survive (C4's badwords drop). Zero-shuffle
    * scan-fused predicate on the scalar total-hit expression
    * ([[graft.exprs.MultiMatchTotal]] — stays in whole-stage codegen
    * and allocates nothing per row, unlike an `aggregate` HOF over the
    * per-term count array), one array load per character regardless of
    * the blocklist size.
    */
  def blocklistGate(
      df: DataFrame,
      text: Column,
      terms: Seq[String]
  ): DataFrame =
    // null text contains no blocklist term, so it SURVIVES — without the
    // isNull arm the null-intolerant total would null the predicate and
    // silently drop the row, diverging from the gate's stated contract
    // (and from the oracle's NOT EXISTS, which keeps null-text rows)
    df.filter(text.isNull ||
      org.apache.spark.sql.GraftBridge.column(
        graft.exprs.MultiMatchTotal(
          org.apache.spark.sql.GraftBridge.expression(text),
          new graft.exprs.AcAutomaton(terms.toArray))) === 0L)
}
