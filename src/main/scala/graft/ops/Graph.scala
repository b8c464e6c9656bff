package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph compute as plain DataFrame joins (Pregel-shaped):
  * PageRank over a corpus-derived graph, bit-exact in integer arithmetic
  * so the oracle can replay every iteration.
  *
  * The instance queried here is TextRank (Mihalcea & Tarau 2004): nodes =
  * vocabulary words, directed edges = adjacent-word bigrams weighted by
  * corpus count. A word's stationary mass is a keyword-centrality score —
  * the unsupervised keyword extractor a curation pipeline runs where no
  * labeled quality data exists.
  *
  * Exactness: float PageRank cannot cross the Spark/DuckDB engine
  * boundary bit-for-bit, so all mass is integer. Total mass `scale`
  * (default 10^12) is floor-split: rank(v) starts at `scale div N`; each
  * round a node keeps `((10000-dampBp)·scale div 10000) div N` teleport
  * mass and every edge (u→v, w) carries
  * `((dampBp·r(u) div 10000) · w) div wout(u)` — the one multiply that
  * can exceed int64 at corpus scale runs in decimal(38,0) (HUGEINT in
  * the oracle). Both engines truncate toward zero on positive operands,
  * so three chained CTEs replay the three Spark rounds exactly. Floor
  * division leaks ≤1 unit of mass per edge per round — PageRank up to a
  * vanishing normalization, deterministic in both engines.
  *
  * Scale shape: each round is ONE join (ranks ⋈ edges, keyed on src) and
  * ONE partial-agg groupBy(dst) — both shuffle on the node id; nothing
  * driver-side except the single node count N (a legitimate input to the
  * teleport constant) and the per-round localCheckpoint that keeps the
  * plan O(1) in the iteration count. Edges join their out-degree ONCE
  * before the loop. A 10^9-node graph runs the same plan with more
  * partitions; hot nodes (stopwords) are partial-agg-combined on the map
  * side like any groupBy key.
  */
object Graph {

  /** Directed weighted word-adjacency edges over a text corpus:
    * (src, dst, w) where w = corpus-wide count of the bigram src→dst.
    * Bigrams are built INSIDE the token array (one traversal, no per-doc
    * window, no posexplode self-join) and meet in one partial-agg
    * groupBy — the only shuffle.
    */
  def wordAdjacencyEdges(df: DataFrame, textCol: String): DataFrame = {
    // zip_with over two shifted slices, NOT transform+element_at: a HOF
    // lambda re-evaluates non-lambda-var subtrees per element, so an
    // inline words() would re-split the document once per bigram (O(n²)
    // per doc). Here the lambda touches lambda vars only — O(n).
    val ws = Dedup.words(col(textCol))
    val n = greatest(size(ws) - 1, lit(0))
    df.select(explode(zip_with(
        slice(ws, lit(1), n), slice(ws, lit(2), n),
        (a, b) => struct(a.as("src"), b.as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"))
  }

  /** Fixed-iteration integer PageRank over (src, dst, w) edges; returns
    * one row per node: (node, rank) with rank a BIGINT share of `scale`.
    * Dangling nodes (no out-edges) keep only teleport mass — their
    * outbound share evaporates, the standard simplification; nodes with
    * no in-edges likewise hold exactly the teleport constant.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      dampBp: Int = 8500,
      scale: Long = 1000000000000L
  ): DataFrame = {
    require(iters > 0, "iters must be positive")
    require(dampBp > 0 && dampBp < 10000, "dampBp must be in (0, 10000)")
    // the caller's edge relation is referenced four times below (node
    // union ×2, out-degree join ×2) — persist so an expensive upstream
    // (e.g. corpus bigram extraction) runs once, not four times
    val edgesP = edges.persist()
    val nodes = edgesP.select(col("src").as("node"))
      .union(edgesP.select(col("dst").as("node")))
      .distinct()
      .persist()
    val n = nodes.count() // the teleport constant's one driver-side input
    require(n > 0, "pageRank needs a non-empty graph")
    val teleport = ((10000L - dampBp) * scale / 10000L) / n
    // out-degree joined ONCE; every round reuses the same (src, dst, w,
    // wout) edge relation
    val edgesOut = edgesP
      .join(edgesP.groupBy(col("src")).agg(sum(col("w")).as("wout")), Seq("src"))
      .persist()
    var ranks = nodes.withColumn("r", lit(scale / n)).localCheckpoint()
    (1 to iters).foreach { _ =>
      val contrib = edgesOut
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr(
          // r85·w can exceed int64 at corpus scale → decimal(38,0)
          // (HUGEINT in the oracle); DIV truncates identically in both
          s"CAST((CAST(($dampBp * r) DIV 10000 AS DECIMAL(38,0)) * w) DIV wout AS BIGINT)"
        ).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("cin"), lit(0L))).as("r"))
        .localCheckpoint() // eager: truncates lineage, plan stays O(1)
    }
    nodes.unpersist()
    edgesOut.unpersist()
    edgesP.unpersist()
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Ancestor resolution over a FOREST of parent-pointer trees — the
    * shape agent transcripts have once tool calls and branched retries
    * reply to earlier turns instead of forming a flat sequence. For
    * every node: its root, its depth, and the full ancestor path
    * ("/parent/…/root"; "" for roots).
    *
    * Algorithm: pointer doubling (recursive doubling). Each node carries
    * (anc, depth, path) = a CONTIGUOUS prefix of its ancestor chain;
    * one round composes every chain with its endpoint's chain — anc ←
    * anc(anc), depth ← depth + depth(anc), path ← path ∥ path(anc) —
    * so covered distance DOUBLES per round and a depth-d forest resolves
    * in ⌈log₂ d⌉+1 rounds, not d. A per-level iterate (or a Spark
    * `Window` — there is none that walks pointers) would serialize on
    * the deepest chain; doubling is the scale-correct form: each round
    * is ONE self-join keyed on (tree, anc) plus a changed-count, with
    * lineage truncated per round so the plan stays O(1) in rounds.
    *
    * Contract: parents must be existing nodes of the same tree (a
    * dangling parent FAILS LOUD via left-join + null check rather than
    * silently dropping the subtree) and the structure must be acyclic —
    * a cycle never converges and is reported by the maxRounds guard.
    * maxRounds bounds DOUBLINGS: the default 20 covers depth 2^19.
    */
  def treePaths(
      df: DataFrame,
      treeCol: String,
      idCol: String,
      parentCol: String,
      maxRounds: Int = 20
  ): DataFrame = {
    require(maxRounds > 0, "maxRounds must be positive")
    val init = df.select(
      col(treeCol).as("__t"), col(idCol).as("__id"),
      coalesce(col(parentCol), col(idCol)).as("anc"),
      when(col(parentCol).isNull, 0L).otherwise(1L).as("depth"),
      when(col(parentCol).isNull, "")
        .otherwise(concat(lit("/"), col(parentCol).cast("string"))).as("path"))
    var state = init.localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val lookup = state.select(
        col("__t").as("__t2"), col("__id").as("__a"),
        col("anc").as("__anc2"), col("depth").as("__d2"),
        col("path").as("__p2"))
      // left join + fail-loud: an anc that is not a node of its tree is
      // a broken input, not a row to drop silently
      val stepped = state
        .join(lookup, col("__t") === col("__t2") && col("anc") === col("__a"),
          "left")
        .select(col("__t"), col("__id"),
          when(col("__a").isNull, raise_error(concat(
            lit("treePaths: dangling parent pointer "), col("anc").cast("string"),
            lit(" in tree "), col("__t").cast("string"))))
            .otherwise(col("__anc2")).as("anc"),
          (col("depth") + col("__d2")).as("depth"),
          concat(col("path"), col("__p2")).as("path"),
          (col("anc") =!= col("__anc2")).as("__moved"))
        .localCheckpoint() // eager: truncates lineage, plan stays O(1)
      converged = stepped.filter(col("__moved")).isEmpty
      state = stepped.drop("__moved")
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"treePaths did not converge within $maxRounds doublings — either " +
          "a parent cycle, or depth > 2^" + (maxRounds - 1) +
          "; raise maxRounds (rounds are O(log depth)) after ruling out a cycle")
    state.select(col("__t").as(treeCol), col("__id").as(idCol),
      col("anc").as("root"), col("depth"), col("path"))
  }

  /** DFS (pre-order) linearization of a reply forest: the order in which
    * a branched transcript renders into ONE training sequence — every
    * subtree contiguous, each node directly after its parent's earlier
    * subtrees, siblings in id order, roots in id order. This is the
    * missing step between [[treePaths]] (structure) and the SFT
    * rendering family (q_render_sft renders LINEAR conversations; a
    * branched agent trace has to be linearized first or parent/child
    * turns interleave across branches).
    *
    * Construction: each node's sort key is its root-to-node id chain
    * ([[treePaths]]' child-to-root `path`, reversed, plus the node's own
    * id), zero-padded per component so lexicographic string order equals
    * numeric order. A parent's key is a strict '/'-prefix of its
    * children's ('/' < '0' in ASCII), so pre-order falls out of ONE sort
    * — no per-level iteration. `dfs_pos` is the 0-based rank of that key
    * within the tree.
    *
    * Ids must be non-negative and fit `padWidth` digits (fails loud,
    * not mis-sorts). Scale shape: [[treePaths]]' O(log depth) doubling
    * joins, then one window partitioned by TREE — bounded by the
    * largest single conversation (the same per-conversation unit every
    * window feature in this engine sorts), never by the corpus.
    */
  def dfsOrder(
      df: DataFrame,
      treeCol: String,
      idCol: String,
      parentCol: String,
      maxRounds: Int = 20,
      padWidth: Int = 7
  ): DataFrame = {
    require(padWidth > 0 && padWidth <= 18, "padWidth must be in 1..18")
    val paths = treePaths(df, treeCol, idCol, parentCol, maxRounds)
    def padded(x: Column): Column =
      when(length(x) > padWidth || substring(x, 1, 1) === "-",
        raise_error(concat(lit("dfsOrder: id "), x,
          lit(s" does not fit $padWidth non-negative digits"))))
        .otherwise(lpad(x, padWidth, "0"))
    val chain = concat(
      reverse(filter(split(col("path"), "/"), x => x =!= "")),
      array(col(idCol).cast("string")))
    val key = concat_ws("/", transform(chain, padded(_)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(treeCol)).orderBy(col("__dfs_key"))
    paths.withColumn("__dfs_key", key)
      .withColumn("dfs_pos", (row_number().over(w) - 1).cast("long"))
      .select(col(treeCol), col(idCol), col("depth"), col("dfs_pos"))
  }
}
