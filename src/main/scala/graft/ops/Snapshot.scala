package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-version diffing: what changed between two corpus snapshots —
  * the audit a release pipeline runs before shipping v(N+1) (release
  * notes, regression triage, incremental-retrain triggers). The
  * companion to [[graft.io.Checkpoint]] (same-version resume) and
  * incremental dedup (delta-vs-standing): this one compares two full
  * versions.
  */
object Snapshot {

  /** Row-level diff of two snapshots keyed by `idCol`: one output row
    * per id present in either side, with
    * `status ∈ {added, removed, changed, unchanged}` and both content
    * digests. `digest` is caller-supplied (e.g. `md5(col("text"))`, or a
    * hash over a struct of columns) — the caller owns null/column
    * semantics, the diff owns the set algebra.
    *
    * `idCol` must be unique per side (it is the diff key); a null digest
    * on a PRESENT row is indistinguishable from absence, so digests must
    * be non-null — feed `coalesce` if the content can be null.
    *
    * Scale shape: both sides reduce to fixed-width (id, digest) rows at
    * the scan (text is hashed scan-side, never shuffled), then ONE
    * id-keyed full-outer sort-merge join — the minimal geometry for a
    * full-corpus compare; output is id-count-sized.
    */
  def diffSnapshots(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      digest: Column
  ): DataFrame = {
    val o = oldDf.select(col(idCol), digest.as("old_digest"))
    val n = newDf.select(col(idCol), digest.as("new_digest"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") =!= col("new_digest"), "changed")
          .otherwise("unchanged"))
  }

  /** The release-notes rollup of [[diffSnapshots]]: one row per status
    * with its count — tiny, partial-agg friendly.
    */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** CDC latest-wins merge (Iceberg MERGE INTO semantics, SCD-1): apply a
    * delta of upserts/deletes to a standing table and return the new
    * standing table. Both frames share one schema:
    * `(keyCol, versionCols…, opCol, payload…)`, `opCol ∈ {'u','d'}`
    * (anything else FAILS LOUD — a corrupt op silently treated as upsert
    * would resurrect deleted rows). Per key the row with the highest
    * `(versionCols…)` tuple wins; if that row is a delete, the key
    * disappears. `versionCols` must totally order each key's rows (e.g.
    * `(ts, event_id)`) — a version tie is caller error and picks an
    * unspecified winner.
    *
    * The merge is ASSOCIATIVE: `merge(merge(∅, A), B) = latest(A ∪ B)`
    * with deletes dropped — so deltas can land one at a time or batched,
    * same result (differential-tested in Scd2CdcSpec). Note the standing
    * table keeps only 'u' survivors, which is lossy in exactly the right
    * way: a standing delete can never outrank a strictly-newer delta row.
    *
    * Scale shape: one union (no shuffle) + ONE key-grouped `max_by` over
    * a struct of the full row — partial-agg (map-side combine), so even
    * a key carrying a billion delta rows reduces before the exchange;
    * output is live-key-sized.
    */
  def cdcMergeLatest(
      standing: DataFrame,
      delta: DataFrame,
      keyCol: String,
      versionCols: Seq[String],
      opCol: String = "op"
  ): DataFrame = {
    require(standing.columns.sorted.sameElements(delta.columns.sorted),
      "standing and delta must share one schema")
    latestWins(standing.unionByName(delta), keyCol, versionCols, opCol)
  }

  /** The latest-wins kernel [[cdcMergeLatest]] wraps: per key, the
    * highest-(versionCols) row, deletes dropped. Shared verbatim by the
    * STREAMING twin (q_stream_cdc): the same groupBy + max_by is a legal
    * complete-mode streaming aggregation with O(live keys) state — the
    * live materialized view of an upsert feed needs no bespoke operator.
    */
  def latestWins(
      feed: DataFrame,
      keyCol: String,
      versionCols: Seq[String],
      opCol: String = "op"
  ): DataFrame = {
    require(versionCols.nonEmpty, "versionCols must order each key's rows")
    val cols = feed.columns.toSeq
    val guarded = feed
      .withColumn(opCol,
        when(col(opCol).isin("u", "d"), col(opCol))
          .otherwise(raise_error(concat(
            lit(s"cdcMergeLatest: bad $opCol value "), col(opCol),
            lit(" — must be 'u' (upsert) or 'd' (delete)")))))
    guarded
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(cols.filterNot(_ == keyCol).map(col): _*),
        struct(versionCols.map(col): _*)).as("__r"))
      .filter(col(s"__r.$opCol") === "u")
      .select(col(keyCol) +: cols.filterNot(_ == keyCol)
        .map(c => col(s"__r.$c").as(c)): _*)
  }
}
