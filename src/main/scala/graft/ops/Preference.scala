package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference rating statistics at corpus scale — the exact
  * sufficient statistics a Bradley–Terry model (the standard
  * paired-comparison rating model; Hunter 2004's MM fit consumes
  * exactly these counts) is estimated from. The preference-pair
  * builder ([[graft.features.ExampleFactory.preferencePairs]],
  * q_pref_pairs) EMITS comparisons; this op aggregates them into the
  * rating-fit inputs, the same produce-the-model's-table relationship
  * q_kn_stats has to q_lm_surprisal:
  *
  *   - `n_ab`    comparisons between the pair (a, b)
  *   - `wins_a`  a's wins within the pair (b's are `n_ab - wins_a`)
  *   - `w_a/w_b` each item's TOTAL corpus-wide wins — the MM
  *               numerator w_i
  *   - `n_a/n_b` each item's TOTAL corpus-wide comparisons — with the
  *               per-pair n_ij, the MM denominator Σ_j n_ij/(p_i+p_j)
  *
  * All exact integers; the rating iteration (the only floats) stays
  * downstream, the q_kn_stats / q_lm_surprisal / q_bm25 contract.
  */
object Preference {

  /** One row per unordered item pair that was ever compared, with the
    * pair canonicalized lexicographically (`item_a < item_b`). Rows
    * where winner and loser are the same item, or either is null,
    * carry no preference signal and are excluded (documented, not
    * engine luck).
    *
    * Scale shape: comparisons collapse to the distinct-pair table P in
    * ONE scan + partial-agg-friendly groupBy (P is item-pair-bounded —
    * orders of magnitude smaller than the comparison stream). The
    * margins are a second groupBy OVER P's lineage (item-bounded),
    * joined back twice; every join side is pair/item-cardinality, never
    * comparison-cardinality, so a viral item costs its pair row count,
    * not its comparison count.
    */
  def bradleyTerryStats(
      comparisons: DataFrame, // (winnerCol, loserCol)
      winnerCol: String,
      loserCol: String
  ): DataFrame = {
    val w = col(winnerCol)
    val l = col(loserCol)
    val c = comparisons
      .filter(w.isNotNull && l.isNotNull && w =!= l)
      .select(least(w, l).as("item_a"), greatest(w, l).as("item_b"),
        (w < l).cast("long").as("__a_won"))
    // the distinct-pair table with within-pair tallies
    val p = c.groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"), sum(col("__a_won")).as("wins_a"))
    // per-item margins over P (item-bounded, exact): total wins and
    // total comparisons, from each item's pair rows on either side
    val m = p
      .select(col("item_a").as("item"), col("wins_a").as("__w"),
        col("n_ab").as("__n"))
      .union(p.select(col("item_b").as("item"),
        (col("n_ab") - col("wins_a")).as("__w"), col("n_ab").as("__n")))
      .groupBy(col("item"))
      .agg(sum(col("__w")).as("w_tot"), sum(col("__n")).as("n_tot"))
    p
      .join(m.select(col("item").as("item_a"), col("w_tot").as("w_a"),
        col("n_tot").as("n_a")), Seq("item_a"))
      .join(m.select(col("item").as("item_b"), col("w_tot").as("w_b"),
        col("n_tot").as("n_b")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("wins_a"),
        col("w_a"), col("n_a"), col("w_b"), col("n_b"))
  }
}
