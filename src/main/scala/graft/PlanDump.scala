package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Dumps formatted physical plans of the flagship pipeline and key
  * operators to docs/PLANS.md — the shuffle-count / pushdown / codegen
  * review artifact (the plan we WANT, checked in so regressions show up
  * in diffs).
  */
object PlanDump {
  private def fmt(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.001"
    val sections = Seq(
      "pipeline_features (gate → lag/LOCF/session → as-of)" ->
        Pipeline.features(spark, dir),
      "q_asof_tool (union-merge as-of join)" ->
        SparkEntry.queries("q_asof_tool")(spark, dir),
      "q_gate_normalize (wary gate projection)" ->
        SparkEntry.queries("q_gate_normalize")(spark, dir),
      "q_minhash_pairs (signature → bucket pairs)" ->
        SparkEntry.queries("q_minhash_pairs")(spark, dir),
      "q_ann_topk (broadcast brute-force top-k)" ->
        SparkEntry.queries("q_ann_topk")(spark, dir),
      "q_ann_ivf (zero-shuffle IVF assign via centroids-as-data expression " +
        "→ broadcast probe join; plan O(1) in centroid count)" ->
        SparkEntry.queries("q_ann_ivf")(spark, dir),
      "q_ann_lsh_mp (multi-probe sign-LSH: query side exploded to the " +
        "Hamming-1 ball, corpus never expanded)" ->
        SparkEntry.queries("q_ann_lsh_mp")(spark, dir),
      "nearDupPairsLsh (id-only bucket self-join, embeddings joined back)" -> {
        val e = io.Tables.read(spark, dir, "embeddings")
        graft.ops.Similarity.nearDupPairsLsh(e, minDot = 0L, dim = 64, nBits = 6)
      },
      "q_cosine_dup (shared LSH candidates + decimal(38) integer cosine " +
        "predicate — no sqrt, no float division)" ->
        SparkEntry.queries("q_cosine_dup")(spark, dir),
      "q_ann_recall (window top-k both sides → hash-join intersection; " +
        "per-query cardinality is k, never corpus-sized)" ->
        SparkEntry.queries("q_ann_recall")(spark, dir),
      "q_sample_mix (stratified sampling: fmix64 gate as a scan-fused " +
        "filter — zero shuffles, zero RNG state)" ->
        SparkEntry.queries("q_sample_mix")(spark, dir),
      "q_pack_shards (token-budget packing: one window per stratum, " +
        "no global sort)" ->
        SparkEntry.queries("q_pack_shards")(spark, dir),
      "q_pack_split (concat-and-chop: the same two-phase cumsum, then a " +
        "scan-fused generate over each document's piece range — fan-out " +
        "only where a document truly spans shards)" ->
        SparkEntry.queries("q_pack_split")(spark, dir),
      "q_dsir_select (DSIR selection: dims-bounded profile aggs; the " +
        "weight table BROADCAST onto the corpus token stream — corpus " +
        "tokens never shuffle for the weights)" ->
        SparkEntry.queries("q_dsir_select")(spark, dir),
      "q_tree_order (branched-transcript DFS linearization: O(log depth) " +
        "doubling joins + ONE per-conversation sort over the padded key)" ->
        SparkEntry.queries("q_tree_order")(spark, dir),
      "q_corpus_pipeline (composed clean → decontam anti-join → sample → " +
        "pack: one Catalyst job, every exchange keyed by its stage)" ->
        SparkEntry.queries("q_corpus_pipeline")(spark, dir),
      "q_conv_features (gap window + aggregation sharing ONE conv_id " +
        "exchange)" ->
        SparkEntry.queries("q_conv_features")(spark, dir),
      "q_mixture_apply (plan computed from data, broadcast back: corpus " +
        "never shuffles, gate stays a scan-side filter)" ->
        SparkEntry.queries("q_mixture_apply")(spark, dir),
      "q_incr_dedup (delta vs standing-corpus index: hash + band joins " +
        "keyed narrow, old side reduced to distinct index rows)" ->
        SparkEntry.queries("q_incr_dedup")(spark, dir),
      "q_top_terms (tf partial agg → df derived from tf, no re-scan → " +
        "term-keyed join → per-doc top-k window)" ->
        SparkEntry.queries("q_top_terms")(spark, dir),
      "q_semdedup (zero-shuffle IVF assignment; id-only list pairs; " +
        "embeddings join back by single id; component rounds vertex-keyed)" ->
        SparkEntry.queries("q_semdedup")(spark, dir),
      "q_kmv_distinct (KMV sketch: partial ObjectHashAggregate — only " +
        "k-long arrays cross the exchange)" ->
        SparkEntry.queries("q_kmv_distinct")(spark, dir),
      "q_bloom_filter (bloom-gated membership: misses filtered before the " +
        "confirm join; probe is a zero-shuffle reference-object expression)" ->
        SparkEntry.queries("q_bloom_filter")(spark, dir),
      "q_pps_sample (weight-proportional sampling: broadcast totals + " +
        "scan-fused exact-decimal predicate)" ->
        SparkEntry.queries("q_pps_sample")(spark, dir),
      "q_skew_join (hot keys broadcast, cold keys shuffled; union ≡ plain " +
        "join)" ->
        SparkEntry.queries("q_skew_join")(spark, dir),
      "q_neg_sample (hash-drawn negatives: scan → broadcast count → " +
        "generate, zero shuffle)" ->
        SparkEntry.queries("q_neg_sample")(spark, dir),
      "q_turn_context (bounded strictly-preceding frame over one conv_id " +
        "exchange)" ->
        SparkEntry.queries("q_turn_context")(spark, dir),
      "q_chunk_words (scan-side generate + slice projections, no shuffle)" ->
        SparkEntry.queries("q_chunk_words")(spark, dir),
      "q_example_factory (context + label + split: two frames over ONE " +
        "conv_id exchange)" ->
        SparkEntry.queries("q_example_factory")(spark, dir),
      "q_range_join (bin-bucketed point-in-interval: equi-join on time " +
        "bins, no BroadcastNestedLoopJoin)" ->
        SparkEntry.queries("q_range_join")(spark, dir),
      "q_conv_dedup (ordered digest in one conv_id exchange; keeper " +
        "window over one row per conversation)" ->
        SparkEntry.queries("q_conv_dedup")(spark, dir),
      "q_cms_freq (Count-Min: word-keyed partial agg to <= depth*width " +
        "counters; broadcast lookup)" ->
        SparkEntry.queries("q_cms_freq")(spark, dir),
      "q_drift_stats (drift gate: ONE bin-keyed conditional agg — the " +
        "slice split never forces an outer join; totals broadcast back)" ->
        SparkEntry.queries("q_drift_stats")(spark, dir),
      "q_simhash_pairs (4x16-bit band buckets over an 8-byte signature; " +
        "popcount confirm joins signatures, never text)" ->
        SparkEntry.queries("q_simhash_pairs")(spark, dir),
      "q_rarity (word-keyed count agg + count-payload join back + doc " +
        "agg; text never crosses a shuffle)" ->
        SparkEntry.queries("q_rarity")(spark, dir),
      "q_bpe_pairs (scan-fused reference-object tokenizer + scan-side " +
        "pair zip; ONE (t1,t2)-keyed partial agg)" ->
        SparkEntry.queries("q_bpe_pairs")(spark, dir),
      "q_boilerplate (ubiquity strip: fixed-width (hash,id,idx) decision " +
        "stream, hot set broadcast, one id-keyed reassembly join)" ->
        SparkEntry.queries("q_boilerplate")(spark, dir),
      "q_pq_encode (PQ codes via ONE codebooks-as-data expression; zero " +
        "shuffles, plan O(1) in m*k)" ->
        SparkEntry.queries("q_pq_encode")(spark, dir),
      "q_pq_adc (ADC scan: per-query distance tables as ONE literal; all " +
        "queries served by a single pass over the coded corpus)" ->
        SparkEntry.queries("q_pq_adc")(spark, dir),
      "q_lm_surprisal (bigram + unigram partial-agg tables joined back " +
        "onto the pair stream; text never crosses a shuffle)" ->
        SparkEntry.queries("q_lm_surprisal")(spark, dir),
      "q_zorder_prune (z-bucket manifest agg → broadcast semi-join file " +
        "pruning → exact scan-side filter; the key is pure codegen'd " +
        "shift/and/or terms)" ->
        SparkEntry.queries("q_zorder_prune")(spark, dir),
      "q_dup_spans (duplicate-hash partial agg, fixed-width no-text " +
        "stream; gaps-and-islands merge bounded per document)" ->
        SparkEntry.queries("q_dup_spans")(spark, dir),
      "q_interleave (stride schedule over the file-count-sized shard " +
        "manifest; the corpus is touched only by the pack)" ->
        SparkEntry.queries("q_interleave")(spark, dir),
      "q_auc (exact per-segment ROC-AUC: (seg, score) histogram, " +
        "two-phase chunk-carry prefix — no global sort)" ->
        SparkEntry.queries("q_auc")(spark, dir),
      "q_spearman (exact rank correlation: two two-phase rank maps " +
        "joined back, one global partial agg)" ->
        SparkEntry.queries("q_spearman")(spark, dir),
      "q_hll (HyperLogLog registers: scan-fused rho projection, one " +
        "map-side-max exchange capped at 2^p rows per task)" ->
        SparkEntry.queries("q_hll")(spark, dir),
      "q_kappa (joint contingency cells once over the wire; marginals " +
        "and pe_num from cells, AQE reuses the joint exchange)" ->
        SparkEntry.queries("q_kappa")(spark, dir),
      "q_pref_pairs (DPO pairs: ONE struct-min/max partial agg, no " +
        "window — a mega-conversation costs its scan)" ->
        SparkEntry.queries("q_pref_pairs")(spark, dir),
      "q_funnel (ordered funnel: min-agg + user-keyed join per stage; " +
        "per-user state is one timestamp)" ->
        SparkEntry.queries("q_funnel")(spark, dir),
      "q_interval_join (interval×interval overlap: binned equi join, " +
        "exactly-once left-edge-bin pick, no BroadcastNestedLoop)" ->
        SparkEntry.queries("q_interval_join")(spark, dir),
      "q_grounding (tool side collapsed to first occurrence per (conv, " +
        "word) — partial-agg min — before ONE fine-grained word join)" ->
        SparkEntry.queries("q_grounding")(spark, dir),
      "q_self_repeat (stuck-loop detector: md5 digests shuffle, text " +
        "never does; no window — a mega-conversation costs its scan)" ->
        SparkEntry.queries("q_self_repeat")(spark, dir),
      "q_order_audit (ingest QC: lag window and distinct rollup share " +
        "ONE conv_id exchange)" ->
        SparkEntry.queries("q_order_audit")(spark, dir),
      "q_ssjoin LAZY plan (exact PPJoin: rarest-first prefix postings " +
        "self-join + posting-list verify; df order broadcast back; the " +
        "per-doc rank window partitions by doc, never corpus)" -> {
        val d = io.Tables.read(spark, dir, "documents")
        graft.ops.SSJoin.jaccardJoinExact(d, "doc_id", "text",
          k = 3, tauBp = 8000, materialize = false)
      },
      "q_bm25 (posting tf partial agg filtered to query terms at the " +
        "scan; df + corpus constants ride broadcasts)" ->
        SparkEntry.queries("q_bm25")(spark, dir),
      "q_rrf_fuse (hybrid RRF: tiny query side BROADCAST onto corpus " +
        "postings, (query, doc)-keyed partial aggs, rank windows over " +
        "rank-list-sized partitions — never corpus-sized)" ->
        SparkEntry.queries("q_rrf_fuse")(spark, dir),
      "q_scd2_read (point-in-time dimension read: conv_id equi key + " +
        "range refinement — hash/sort-merge route, never " +
        "BroadcastNestedLoopJoin)" ->
        SparkEntry.queries("q_scd2_read")(spark, dir),
      "q_quantile_norm (per-group two-phase ranks, broadcast n_ref, one " +
        "rank-keyed lookup join into the reference group)" ->
        SparkEntry.queries("q_quantile_norm")(spark, dir),
      "q_bloom_prune (feed filtered by a packed-Bloom reference-object " +
        "probe BEFORE the as-of shuffle; answer byte-equal to unpruned)" ->
        SparkEntry.queries("q_bloom_prune")(spark, dir),
      "q_gram_stats (codegen'd pair-fanout inline → ONE partial-agg " +
        "shuffle to d(d+1)/2 keys; exchange O(d²·tasks), not O(d²·rows))" ->
        SparkEntry.queries("q_gram_stats")(spark, dir),
      "q_loghist (two half-corpus log₂-histograms merged counter-wise; " +
        "windows over ≤65-row groups)" ->
        SparkEntry.queries("q_loghist")(spark, dir),
      "pageRank ONE power-iteration round (ranks ⋈ out-degreed edges on " +
        "src → dst-keyed partial agg + teleport; the loop localCheckpoints " +
        "so the plan stays O(1) in rounds)" -> {
        val d = io.Tables.read(spark, dir, "documents")
        val e = graft.ops.Graph.wordAdjacencyEdges(d, "text")
        val eo = e.join(
          e.groupBy(org.apache.spark.sql.functions.col("src"))
            .agg(org.apache.spark.sql.functions.sum("w").as("wout")), Seq("src"))
        val nodes = e.select(org.apache.spark.sql.functions.col("src").as("node"))
          .union(e.select(org.apache.spark.sql.functions.col("dst").as("node")))
          .distinct()
        val r0 = nodes.withColumn("r", org.apache.spark.sql.functions.lit(1000000000L))
        val contrib = eo.join(r0.withColumnRenamed("node", "src"), Seq("src"))
          .select(org.apache.spark.sql.functions.col("dst"),
            org.apache.spark.sql.functions
              .expr("CAST((CAST((8500 * r) DIV 10000 AS DECIMAL(38,0)) * w) DIV wout AS BIGINT)").as("c"))
          .groupBy("dst")
          .agg(org.apache.spark.sql.functions.sum("c").as("cin"))
        nodes.join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
      },
      "q_dataset_digest (multiset checksum: scan-fused md5-u64 projection " +
        "→ source-keyed partial-agg sum, both sides; NO sort anywhere)" ->
        SparkEntry.queries("q_dataset_digest")(spark, dir),
      "q_join_size (join-size forecast: two per-key COUNT frames meet — " +
        "inputs scanned once each, never shuffled row-wise; 1-row total " +
        "broadcast back; TakeOrdered top-k)" ->
        SparkEntry.queries("q_join_size")(spark, dir),
      "q_top_per_group (mega-group-safe top-k: (group, salt) window over " +
        "bounded sub-partitions, then a fanout·k survivor merge window)" ->
        SparkEntry.queries("q_top_per_group")(spark, dir),
      "q_neyman (variance-proportional plan: ONE moment partial agg, " +
        "1-row weight total broadcast, gate stays a scan-side filter)" ->
        SparkEntry.queries("q_neyman")(spark, dir),
      "q_record_link (blocked linkage: equi-join on (nation, suffix) " +
        "blocks — candidates |block|², never |A|·|B|; scoring is a " +
        "scan-fused projection over the candidate stream)" ->
        SparkEntry.queries("q_record_link")(spark, dir),
      "q_source_overlap (KMV overlap matrix: full data touched once by " +
        "the sketch partial agg; the pair join is |groups|² rows of " +
        "k-long arrays with codegen'd array math)" ->
        SparkEntry.queries("q_source_overlap")(spark, dir),
      "q_decay_agg (anchor-decayed profile: broadcast 1-row anchor, " +
        "scan-fused integer weight, ONE conv-keyed partial agg — no " +
        "window, no sort)" ->
        SparkEntry.queries("q_decay_agg")(spark, dir),
      "q_cluster_split (leakage-free split: component labels left-join " +
        "back to the corpus, codegen'd fmix64 gate on the CLUSTER id — " +
        "no window, no extra shuffle beyond the label-propagation rounds)" ->
        SparkEntry.queries("q_cluster_split")(spark, dir),
      "q_blocklist_gate (one-scan Aho–Corasick drop gate: k terms, ONE " +
        "whole-stage-codegen scan→filter span, the automaton a single " +
        "reference object — zero shuffle, plan O(1) in the list size)" ->
        SparkEntry.queries("q_blocklist_gate")(spark, dir),
      "q_mask_spans (composed do-not-train mask: PII spans + duplicated " +
        "blocks on one byte axis, merged per-document — the islands " +
        "window is bounded by a doc's own span count, never the corpus)" ->
        SparkEntry.queries("q_mask_spans")(spark, dir),
      "q_triplets (contrastive mining: ONE broadcast-scored corpus " +
        "pass, one (query, band)-keyed window, one pivot agg — the " +
        "positive/negative bands split on a single decimal predicate)" ->
        SparkEntry.queries("q_triplets")(spark, dir),
      "q_decontam_spans (positional decontamination: corpus shingle " +
        "stream pruned map-side against the broadcast probe set before " +
        "anything stateful; the islands window partitions per document)" ->
        SparkEntry.queries("q_decontam_spans")(spark, dir),
      "q_kn_stats (Kneser–Ney table: corpus collapses to the distinct-" +
        "bigram table in one partial agg; continuation counts are " +
        "windows OVER that vocab-bounded table, never the corpus)" ->
        SparkEntry.queries("q_kn_stats")(spark, dir),
      "q_bt_stats (Bradley–Terry table: comparisons collapse to the " +
        "pair table in one partial agg; margins re-aggregate the pair " +
        "table only — every join side is pair/item-cardinality)" ->
        SparkEntry.queries("q_bt_stats")(spark, dir),
      "q_tcloseness (ordered-EMD audit: ONE data-sized (quasi, bucket) " +
        "partial agg; the grid, cumsums and per-combo windows are all " +
        "aggregate-cardinality — combo space x bucket space)" ->
        SparkEntry.queries("q_tcloseness")(spark, dir),
      "q_nb_classify (NB train+predict in one DAG: the gram stream " +
        "collapses map-side into a (label, bucket) agg, the model " +
        "broadcast-joins back, argmax is a second id-keyed agg)" ->
        SparkEntry.queries("q_nb_classify")(spark, dir),
      "q_nb_crossval (k-fold CV in ONE pass: leave-fold-out counts by " +
        "subtraction in the dense grid, all k models one cell agg, " +
        "out-of-fold scoring joins on (bucket, fold))" ->
        SparkEntry.queries("q_nb_crossval")(spark, dir),
      "q_ndcg (graded-relevance stats: rank lists are <= k per query " +
        "by construction, so every join is rank-list-cardinality; rel " +
        "totals are one partial agg)" ->
        SparkEntry.queries("q_ndcg")(spark, dir),
      "q_locf_ttl (TTL'd carry: the observation ts rides the SAME " +
        "window frame as the value in one struct last() — no second " +
        "window, no join; expiry is a scan-fused age predicate)" ->
        SparkEntry.queries("q_locf_ttl")(spark, dir),
      "q_sessionize_capped (gap boundaries + session-start min + " +
        "fixed-width slice: two conv-keyed windows sharing one " +
        "exchange, slicing closed-form — no sequential splitter)" ->
        SparkEntry.queries("q_sessionize_capped")(spark, dir),
      "pipeline over a BUCKETED transcript table (conv_id exchanges elided)" -> {
        // fixed temp location + overwrite: rerunning the dump does not
        // accumulate table copies; the table is dropped after formatting
        val path = "/tmp/graft_plandump_bucketed"
        graft.io.Bucketed.writeTranscript(
          io.Tables.transcript(spark, dir), "plandump_bucketed", path, 8)
        Pipeline.featuresFromTurns(spark.table("plandump_bucketed"))
      }
    )
    val body = sections.map { case (title, df) =>
      s"## $title\n\n```\n${fmt(df)}\n```\n"
    }.mkString(
      "# Physical plans (generated by graft.PlanDump; review artifact)\n\n",
      "\n", "")
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"), body)
    println(s"wrote docs/PLANS.md (${body.length} chars)")
    spark.sql("DROP TABLE IF EXISTS plandump_bucketed")
    spark.stop()
  }
}
