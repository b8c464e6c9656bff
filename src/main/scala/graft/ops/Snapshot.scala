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
}
