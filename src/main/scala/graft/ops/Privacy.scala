package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy gates beyond regex PII scrubbing ([[TextStats]]): consistent
  * key pseudonymization and k-anonymity suppression — the two operations
  * a corpus release runs before transcripts leave the trust boundary.
  */
object Privacy {

  /** Deterministic pseudonym for an identifier column: a salted
    * 64-bit md5 surrogate (`u_<16 hex>`). The same id always maps to the
    * same pseudonym, so joinability and per-entity grouping SURVIVE the
    * relabeling — the property naive redaction destroys — while rotating
    * `salt` per release makes pseudonyms unlinkable ACROSS releases.
    * Null ids stay null. md5 keeps the mapping engine-portable (the
    * oracle replays it literally, q_pseudonymize); one-wayness holds
    * only while the salt is secret, which is the standard surrogate-key
    * trade, not an encryption claim.
    */
  def pseudonym(id: Column, salt: String, prefix: String = "u_"): Column =
    concat(lit(prefix), substring(md5(concat(lit(salt), id)), 1, 16))

  /** Replace each of `keyCols` with its [[pseudonym]], in place. A
    * zero-shuffle scan projection — at 100 TB this rides the export scan
    * for free.
    */
  def pseudonymizeKeys(
      df: DataFrame,
      keyCols: Seq[String],
      salt: String
  ): DataFrame =
    keyCols.foldLeft(df)((d, c) => d.withColumn(c, pseudonym(col(c), salt)))

  /** k-anonymity suppression: keep only rows whose quasi-identifier
    * combination (`quasiCols`) occurs in at least `k` rows — a row whose
    * (lang, source, …) combo is near-unique re-identifies its author even
    * with ids pseudonymized. Adds `k_count` (the combo's cardinality) for
    * release auditing; the complement is the caller's suppressed set.
    *
    * NULL-SAFE: a combo containing nulls is a combo like any other (the
    * join matches with `<=>`), so null-heavy rows are suppressed or kept
    * by their true frequency rather than silently dropped by null
    * equality.
    *
    * Scale shape: ONE partial-agg shuffle on the quasi columns for the
    * combo counts, then an equi-join back on the same key — both
    * exchanges share the (quasi) partitioning, and AQE broadcasts the
    * count side when the combo space is small (the common case: quasi
    * columns are low-cardinality by definition).
    */
  def kAnonFilter(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("k_count"),
      "kAnonFilter reserves the column name k_count")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k_count"))
      .filter(col("k_count") >= k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("k_count"): _*)
    val cond = quasiCols
      .map(c => col(c) <=> col(s"__q_$c"))
      .reduce(_ && _)
    df.join(counts, cond)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
  }

  /** l-diversity audit — k-anonymity's companion gate: a quasi-identifier
    * combo can be k-anonymous yet still leak if all k rows share one
    * sensitive value (the homogeneity attack). Per combo: row count,
    * DISTINCT sensitive-value count (`diversity`; NULL sensitive values
    * are excluded, the standard count-distinct rule in both engines), and
    * `meets_l`. Release gates join the failing combos back for
    * suppression, exactly like [[kAnonFilter]].
    *
    * Scale shape: ONE exact count-distinct aggregation — Catalyst plans
    * it as two partial aggs (first keyed (quasi…, sensitive), then
    * (quasi…)), both map-side combinable, so a billion-row combo reduces
    * before either exchange.
    */
  def lDiversityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      l: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        count_distinct(sensitive).as("diversity"))
      .withColumn("meets_l", col("diversity") >= l)
  }
}
