package graft.ops

import org.apache.spark.sql.DataFrame
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
    val ws = Dedup.words(col(textCol))
    val bigrams = when(size(ws) < 2, array().cast("array<struct<src:string,dst:string>>"))
      .otherwise(transform(
        sequence(lit(0), size(ws) - 2),
        i => struct(
          element_at(ws, i + 1).as("src"),
          element_at(ws, i + 2).as("dst"))))
    df.select(explode(bigrams).as("e"))
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
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .persist()
    val n = nodes.count() // the teleport constant's one driver-side input
    require(n > 0, "pageRank needs a non-empty graph")
    val teleport = ((10000L - dampBp) * scale / 10000L) / n
    // out-degree joined ONCE; every round reuses the same (src, dst, w,
    // wout) edge relation
    val edgesOut = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("wout")), Seq("src"))
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
    ranks.select(col("node"), col("r").as("rank"))
  }
}
