package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-dup PAIR → CLUSTER resolution: the step that turns candidate
  * pairs ([[Dedup.minhashPairs]], [[Similarity.nearDupPairsLsh]],
  * [[Similarity.nearDupPairsCosine]]) into an actual keep/drop decision.
  * Pairwise similarity is not transitive-closed — a~b and b~c duplicate
  * means ONE of {a, b, c} should survive — so every real dedup run needs
  * connected components over the pair stream before it can drop rows.
  *
  * Algorithm: bounded-iteration hash-min label propagation. Every vertex
  * starts labeled with itself; each round takes the min of its own label
  * and its neighbors' labels; a fixpoint (no label changed) means every
  * vertex carries the MINIMUM id of its component — a canonical,
  * pair-order- and relabeling-stable cluster id (ClustersPropertySpec).
  *
  * Scale shape: each round is one join (labels ⋈ edges, keyed on the
  * vertex id) plus one groupBy(vertex).min — both shuffle on the vertex
  * id and are partial-agg friendly; nothing is ever collected to the
  * driver except the one `changed` counter per round. Lineage is
  * truncated every round (localCheckpoint), so the plan stays O(1) in
  * the iteration count. Rounds needed = O(max component diameter):
  * near-dup components are short chains/cliques in practice, so a
  * handful of rounds; a pathological million-hop chain would need the
  * alternating large-star/small-star variant (O(log n) rounds) — out of
  * scope here, and `maxIters` FAILS LOUD instead of silently emitting
  * half-merged clusters if that assumption ever breaks.
  */
object Clusters {

  /** Connected components over an undirected pair stream: one row per
    * distinct vertex id appearing in `pairs`, labeled
    * `(id, cluster_id)` where cluster_id = min vertex id of the
    * component. Vertices in no pair are trivially their own cluster and
    * are NOT emitted (join the output back to the full table with a
    * coalesce-to-self for a total assignment — [[dropNearDuplicates]]
    * does exactly that).
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): DataFrame = {
    require(maxIters > 0, "maxIters must be positive")
    // symmetrize + dedup parallel edges (distinct bounds the per-round
    // join fan-out to the true degree)
    val edges = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      // neighbor minimum per vertex: edges carry (src, dst); look up each
      // dst's current label, take the min per src
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("lbl")).as("nlbl"))
        .withColumnRenamed("src", "id")
      val stepped = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint() // eager: materializes + truncates lineage
      converged = stepped.filter(col("lbl") < col("old")).isEmpty
      labels = stepped.select("id", "lbl")
      it += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds — " +
          "a component has diameter > maxIters; raise maxIters (rounds " +
          "are O(diameter)) or pre-split the graph")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Canonical keep-one dedup: drop from `df` every row whose id sits in
    * a pair-connected component but is NOT the component's minimum id
    * (the keeper). Rows in no pair survive untouched. One broadcast-free
    * anti-join on the id — the drop set is component-members-minus-
    * keepers, far smaller than the corpus.
    */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): DataFrame = {
    val drops = connectedComponents(pairs, aCol, bCol, maxIters)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Cross-source dedup ATTRIBUTION: for every dropped near-duplicate,
    * which source lost it and which source's copy won — aggregated into a
    * (src_from = loser's source, src_to = winner's source) flow matrix
    * with drop counts and a summed cost column (e.g. chars or tokens
    * lost). This is the curation debugging gauge behind "why did crawl-B
    * shrink 40%?": a heavy off-diagonal cell means one source is
    * systematically shadowed by another's copies; a heavy diagonal cell
    * is intra-source duplication the ingest should have caught.
    *
    * Keeper policy matches [[keepBestInClusters]] (highest `score`, ties
    * to smallest id) so the matrix explains exactly what that dedup did.
    *
    * Scale shape: components over the pair stream (id-only rows), one
    * lookup join against (id, source, score), a per-COMPONENT window
    * (component size is duplication depth, never corpus size), then a
    * partial-agg groupBy on the source pair — output is
    * |sources|²-bounded.
    */
  def dedupFlow(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      score: Column,
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIters)
    val scored = df
      .select(col(idCol).cast("long").as("id"), col(sourceCol).as("__src"),
        score.as("__score"))
      .join(comp, Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("__score").desc, col("id").asc)
    val ranked = scored.withColumn("__rn", row_number().over(w))
    val winners = ranked.filter(col("__rn") === 1)
      .select(col("cluster_id"), col("__src").as("src_to"))
    ranked.filter(col("__rn") > 1)
      .join(winners, Seq("cluster_id"))
      .groupBy(col("__src").as("src_from"), col("src_to"))
      .agg(
        count(lit(1)).as("n_dropped"),
        sum(col("__score")).as("cost_dropped"))
  }

  /** Cluster-consistent flag propagation: a row-level boolean (PII hit,
    * spam verdict, takedown request, license taint) spreads to EVERY
    * member of the row's near-dup component — if one copy of a document
    * is tainted, all its copies are, whichever copy the dedup later
    * keeps. This is the release-gate semantics behind "removing the
    * flagged URL is not enough; remove its mirrors too".
    *
    * Output: one row per input row — (id, flag_self, flag_cluster,
    * cluster_id) where flag_cluster = OR over the component (= flag_self
    * for rows in no pair, whose cluster_id is their own id).
    *
    * Scale shape: components over the pair stream (id-only), one
    * partial-agg max per cluster (bool_or as max of 0/1 — partial-agg
    * friendly, a mega-cluster combines map-side), two id-keyed joins
    * back. No windows, no per-cluster sort.
    */
  def spreadFlag(
      df: DataFrame,
      idCol: String,
      flag: Column,
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIters)
    val flagged = df.select(col(idCol).cast("long").as("id"),
      flag.cast("boolean").as("flag_self"))
    val withComp = flagged
      .join(comp, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
    val clusterFlag = withComp
      .groupBy(col("cluster_id"))
      .agg(max(col("flag_self").cast("int")).as("__f"))
      .select(col("cluster_id"), (col("__f") === 1).as("flag_cluster"))
    withComp.join(clusterFlag, Seq("cluster_id"))
      .select(col("id"), col("flag_self"), col("flag_cluster"),
        col("cluster_id"))
  }

  /** Policy-pluggable keep-one dedup: per pair-connected component, keep
    * the member with the HIGHEST `score` (ties to the smallest id) and
    * drop the rest — "keep the longest / highest-quality copy", the
    * policy real curation runs want where [[dropNearDuplicates]]'s
    * keep-lowest-id is arbitrary. Rows in no pair survive untouched.
    *
    * Scale shape: components over the pair stream (id-only rows), one
    * score lookup join, a per-COMPONENT window (components are near-dup
    * groups — bounded by duplication depth, never corpus size), then the
    * same anti-join as dropNearDuplicates.
    */
  def keepBestInClusters(
      df: DataFrame,
      idCol: String,
      score: Column,
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIters)
    val scored = df
      .select(col(idCol).cast("long").as("id"), score.as("__score"))
      .join(comp, Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("__score").desc, col("id").asc)
    val drops = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Leakage-free train/test split: each row is routed by the
    * deterministic fmix64 gate ([[Curation.sampleGateBp]]) applied to its
    * near-dup COMPONENT id (component min id; the row's own id when it
    * sits in no pair) rather than to its own id — so all copies of a
    * near-duplicate always land on the SAME side. Splitting by per-row
    * hash leaks: a test document's mirror lands in train with
    * probability 1 − testBp/10⁴, and the eval measures memorization of
    * the mirror, not generalization. Keying the gate by the cluster id
    * closes that hole while staying seedless and reproducible (the same
    * corpus always splits identically, and splits at different rates
    * nest, both inherited from the gate).
    *
    * Output: one row per input row — (idCol, split_key, split) with
    * split ∈ {"test", "train"} and split_key the gated component id.
    *
    * Scale shape: components over the id-only pair stream (bounded
    * label-propagation rounds), ONE left join back to the corpus keyed
    * on the id, then a codegen'd scan-side gate — no window, no extra
    * shuffle beyond the component rounds.
    */
  def clusterSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      testBp: Int,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): DataFrame = {
    require(testBp > 0 && testBp < 10000, "testBp must be in (0, 10000)")
    val cc = connectedComponents(pairs, aCol, bCol, maxIters)
      .select(col("id").as(idCol), col("cluster_id"))
    df.join(cc, Seq(idCol), "left")
      .withColumn("split_key",
        coalesce(col("cluster_id"), col(idCol).cast("long")))
      .withColumn("split",
        when(Curation.sampleGateBp(col("split_key")) < testBp, "test")
          .otherwise("train"))
      .drop("cluster_id")
  }
}
