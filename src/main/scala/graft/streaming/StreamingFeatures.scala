package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the feature operators: the same
  * transcript schema consumed incrementally (north-rule engines run both
  * backfill and live paths off one codebase).
  */
object StreamingFeatures {

  final case class TurnEvent(
      conv_id: String,
      turn_idx: Int,
      role: String,
      ts: Timestamp
  )

  final case class SessionOut(
      conv_id: String,
      session_seq: Long,
      n_turns: Long,
      session_start: Timestamp,
      session_end: Timestamp
  )

  /** O(1) summary accumulator for the still-open tail session — NOT a turn
    * buffer: a never-idle conversation must not grow state. Bounds are
    * kept as Timestamps (not epoch millis) so MICROSECOND precision
    * survives into the emitted session bounds — the batch oracle's
    * min(ts)/max(ts) carries micros.
    */
  final case class OpenSess(start: Timestamp, end: Timestamp, n: Long)

  /** flatMapGroupsWithState state: the open-session accumulator (None after
    * a timeout emitted the tail) + how many sessions were already emitted
    * for the key (kept so session_seq stays batch-consistent if the
    * conversation resumes after an idle timeout).
    */
  final case class SessState(open: Option[OpenSess], emitted: Long)

  /** Full-precision event-time sort key: (millis, nanos). Timestamp.getTime
    * alone truncates to milliseconds, which would tie sub-millisecond-
    * distinct timestamps and break the documented `ORDER BY ts, turn_idx`
    * batch-parity contract — parquet timestamps carry MICROS.
    */
  private def tsKey(t: Timestamp): (Long, Int) = (t.getTime, t.getNanos)

  /** A transcript turn carrying its (nullable) tool observation — the
    * input row for the streaming LOCF path.
    */
  final case class TurnToolEvent(
      conv_id: String,
      turn_idx: Int,
      tool: Option[String],
      ts: Timestamp
  )

  final case class LocfOut(
      conv_id: String,
      turn_idx: Int,
      tool_locf: Option[String]
  )

  /** Per-conversation LOCF state: the last non-null observation seen, in
    * (ts, turn_idx) order — O(1) per key, never a buffer.
    */
  final case class LocfState(tool: Option[String])

  /** Streaming LOCF (last-observation-carried-forward) — the LIVE-path
    * twin of [[graft.features.Windows.locf]]: each turn is emitted
    * immediately with the latest non-null `tool` at or before it. State is
    * one Option[String] per conversation; no watermark or timeout is
    * needed because every input row produces exactly one output row in
    * the same micro-batch (nothing is held back for event time).
    *
    * Matches batch output exactly when each conversation's turns arrive in
    * event-time order across micro-batches (the same cross-batch contract
    * as [[sessionize]]); within a batch rows are sorted by (ts, turn_idx)
    * so intra-batch disorder is absorbed.
    */
  def locf(turns: Dataset[TurnToolEvent]): Dataset[LocfOut] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[TurnToolEvent],
         state: GroupState[LocfState]) => {
          val sorted = rows.toSeq.sortBy(t => (tsKey(t.ts), t.turn_idx))
          var last = state.getOption.getOrElse(LocfState(None)).tool
          val out = sorted.map { t =>
            if (t.tool.isDefined) last = t.tool
            LocfOut(key, t.turn_idx, last)
          }
          state.update(LocfState(last))
          out.iterator
        }
      )
  }

  final case class CapSessState(seq: Long, startSec: Long, prevSec: Long)

  final case class CapSessionOut(
      conv_id: String,
      turn_idx: Int,
      session_seq: Long,
      slice_seq: Long,
      capped_session_id: String
  )

  /** Streaming per-turn CAPPED session assignment — the live twin of
    * [[graft.features.Sessionize.capped]]: each turn emits immediately
    * with its gap-session ordinal and its fixed-width duration slice
    * from that session's first event. State is THREE longs per
    * conversation (session counter, session-start seconds, previous
    * seconds); same cross-batch ordered-arrival contract as [[locf]]
    * (within a batch, rows sort by (ts, turn_idx)). Unlike
    * [[sessionize]] — which emits closed-session SUMMARIES and so needs
    * watermark timeouts — the per-turn assignment holds nothing back,
    * so no watermark is involved.
    */
  def sessionizeCapped(
      turns: Dataset[TurnEvent],
      gapSeconds: Long,
      maxSeconds: Long
  ): Dataset[CapSessionOut] = {
    import turns.sparkSession.implicits._
    require(maxSeconds > 0, s"maxSeconds must be positive, got $maxSeconds")
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[TurnEvent],
         state: GroupState[CapSessState]) => {
          val sorted = rows.toSeq.sortBy(t => (tsKey(t.ts), t.turn_idx))
          var st = state.getOption.orNull
          val out = sorted.map { t =>
            val sec = Math.floorDiv(t.ts.getTime, 1000L)
            st =
              if (st == null) CapSessState(0L, sec, sec)
              else if (sec - st.prevSec > gapSeconds)
                CapSessState(st.seq + 1L, sec, sec)
              else CapSessState(st.seq, st.startSec, sec)
            val slice = (sec - st.startSec) / maxSeconds
            CapSessionOut(key, t.turn_idx, st.seq, slice,
              s"$key#${st.seq}#$slice")
          }
          if (st != null) state.update(st)
          out.iterator
        }
      )
  }

  final case class LocfTtlState(tool: Option[String], obsTsSec: Option[Long])

  final case class LocfTtlOut(
      conv_id: String,
      turn_idx: Int,
      tool_ttl: Option[String]
  )

  /** Streaming LOCF with EXPIRY — the live twin of
    * [[graft.features.Windows.locfTtl]]: the per-conversation state
    * carries the last observation's value AND its event-time seconds,
    * and each turn emits the carry only while it is at most
    * `ttlSeconds` old at the turn's own event time. Same O(1)
    * state/conversation and same cross-batch ordered-arrival contract
    * as [[locf]]; a null-ts observation (or anchor) has no timeline
    * position, so its carry never serves (matching the batch null
    * semantics).
    */
  def locfTtl(
      turns: Dataset[TurnToolEvent],
      ttlSeconds: Long
  ): Dataset[LocfTtlOut] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[TurnToolEvent],
         state: GroupState[LocfTtlState]) => {
          val sorted = rows.toSeq.sortBy(t => (tsKey(t.ts), t.turn_idx))
          var st = state.getOption.getOrElse(LocfTtlState(None, None))
          val out = sorted.map { t =>
            // a null-ts observation has no timeline position: ignored
            // outright, never shadowing a dated carry (batch parity)
            if (t.tool.isDefined && t.ts != null)
              st = LocfTtlState(t.tool,
                Some(Math.floorDiv(t.ts.getTime, 1000L)))
            val cur = Option(t.ts).map(ts => Math.floorDiv(ts.getTime, 1000L))
            val v = for {
              tool <- st.tool
              ots <- st.obsTsSec
              ts <- cur
              if ts - ots <= ttlSeconds
            } yield tool
            LocfTtlOut(key, t.turn_idx, v)
          }
          state.update(st)
          out.iterator
        }
      )
  }

  /** One tagged arrival of the live as-of merge: `src` 0 = right/feed
    * observation (its payload in `value`), 1 = left/anchor row needing
    * the point-in-time feature. `turn_idx` identifies anchors (and
    * tiebreaks equal-ts feed rows — the later index wins, matching the
    * batch side's max_by(tool, turn_idx) pre-aggregation).
    */
  final case class AsOfEvent(
      conv_id: String,
      src: Int,
      turn_idx: Int,
      value: Option[String],
      ts: Timestamp
  )

  final case class AsOfOut(
      conv_id: String,
      turn_idx: Int,
      tool_asof: Option[String]
  )

  /** Per-key as-of carry: the latest feed payload and its event time —
    * O(1) per conversation, never a buffer.
    */
  final case class AsOfCarry(value: Option[String], feedTs: Option[Timestamp])

  /** Streaming BACKWARD as-of join — the LIVE twin of
    * [[graft.features.AsOf.joinBackward]], the north rule's core operator
    * on the incremental path: feed rows and anchor rows arrive as ONE
    * tagged stream per key; each anchor is emitted immediately with the
    * latest feed payload at-or-before its event time (`allowExactMatches`
    * semantics: at equal ts the feed row sorts FIRST, so the anchor sees
    * it — the same `(ts, src)` tie rule as the batch union-merge).
    * `toleranceMs` drops matches staler than the anchor by more than the
    * tolerance, exactly like the batch parameter.
    *
    * State is one (payload, feed ts) pair per conversation — O(1), never
    * a row buffer; every anchor emits in its own micro-batch so no
    * watermark is needed. Matches batch output exactly when a key's rows
    * arrive in event-time order across micro-batches AND an equal-ts
    * cohort never straddles a batch boundary (the replay cuts files at
    * distinct-ts boundaries; a production feed keyed by ingest time
    * satisfies it by construction). Null-ts rows have no place on a live
    * timeline — callers filter them, mirroring the batch exec's
    * null-ts-right skip.
    */
  def asOfBackward(
      events: Dataset[AsOfEvent],
      toleranceMs: Option[Long] = None
  ): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[AsOfEvent],
         state: GroupState[AsOfCarry]) => {
          // feed-before-anchor at equal ts; equal-ts feed rows apply in
          // turn_idx order so the last (highest idx) wins
          val sorted = rows.toSeq.sortBy(e => (tsKey(e.ts), e.src, e.turn_idx))
          var carry = state.getOption.getOrElse(AsOfCarry(None, None))
          val out = Seq.newBuilder[AsOfOut]
          sorted.foreach { e =>
            if (e.src == 0) carry = AsOfCarry(e.value, Some(e.ts))
            else {
              val fresh = carry.feedTs.exists(f =>
                toleranceMs.forall(t => e.ts.getTime - f.getTime <= t))
              out += AsOfOut(key, e.turn_idx,
                if (fresh) carry.value else None)
            }
          }
          state.update(carry)
          out.result().iterator
        }
      )
  }

  /** One pending forward-join anchor: its event time (millis + nanos,
    * [[tsKey]]'s exact decomposition) and identity.
    */
  final case class FwdAnchor(tsMs: Long, tsNs: Int, turnIdx: Int)

  /** Anchors awaiting their first at-or-after observation, per key. */
  final case class FwdState(pending: Seq[FwdAnchor])

  /** Streaming FORWARD as-of join — the label join live: each anchor
    * waits for the FIRST feed observation at-or-after its event time
    * (`allowExactMatches`: an equal-ts observation counts, so anchors
    * sort BEFORE feed rows at equal ts — the mirror of [[asOfBackward]]'s
    * tie rule), then emits with its value; `toleranceMs` turns matches
    * farther ahead than the tolerance into None, exactly like the batch
    * [[graft.features.AsOfNative.joinForward]].
    *
    * State is the PENDING ANCHOR LIST per key — not O(1) like backward,
    * and that is intrinsic: a forward join cannot emit an anchor before
    * its future arrives. It is bounded by the anchors-per-observation
    * cadence (every observation flushes ALL pending anchors, because any
    * later observation is farther ahead), and in production by the
    * tolerance horizon. Anchors with no future observation at all flush
    * via a far-future SENTINEL observation with a null value per key
    * (emitting None — the batch NULL), the same end-of-stream idiom as
    * the windowed-agg and anomaly gauges. Feed rows are expected
    * pre-reduced to one per (key, ts) (the batch queries' max_by
    * pre-aggregation); same cross-batch contract as [[asOfBackward]]:
    * event-time order per key, ts cohorts never straddling a micro-batch.
    */
  def asOfForward(
      events: Dataset[AsOfEvent],
      toleranceMs: Option[Long] = None
  ): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[AsOfEvent],
         state: GroupState[FwdState]) => {
          // anchor-before-feed at equal ts: the anchor must be pending
          // when its equal-ts observation processes
          val sorted = rows.toSeq
            .sortBy(e => (tsKey(e.ts), -e.src, e.turn_idx))
          var pending = state.getOption.map(_.pending).getOrElse(Seq.empty)
          val out = Seq.newBuilder[AsOfOut]
          sorted.foreach { e =>
            if (e.src == 1)
              pending = pending :+
                FwdAnchor(e.ts.getTime, e.ts.getNanos, e.turn_idx)
            else {
              // every pending anchor has ts <= this observation's ts (the
              // per-key event-time-order contract), and no later
              // observation can be nearer — flush them all
              pending.foreach { a =>
                val within = toleranceMs.forall(t =>
                  e.ts.getTime - a.tsMs <= t)
                out += AsOfOut(key, a.turnIdx, if (within) e.value else None)
              }
              pending = Seq.empty
            }
          }
          state.update(FwdState(pending))
          out.result().iterator
        }
      )
  }

  /** A turn carrying a training label on the live path. */
  final case class TurnLabelEvent(
      conv_id: String,
      turn_idx: Int,
      role: String,
      label: Option[Long],
      ts: Timestamp
  )

  final case class EncOut(
      conv_id: String,
      turn_idx: Int,
      role: String,
      enc_cnt: Long,
      enc_sum: Option[Long]
  )

  /** Per-key running label stats — two longs, O(1) per key. */
  final case class EncState(cnt: Long, sum: Long)

  /** Streaming target encoding — the LIVE twin of
    * [[graft.features.Encode.targetEncode]]: each arriving turn is emitted
    * immediately with the count/sum of labels seen STRICTLY EARLIER on
    * its key, then its own label joins the state. Same-timestamp ties are
    * processed as one cohort — every tied row sees the pre-cohort state
    * and none sees a tied sibling — reproducing the batch range frame's
    * tie exclusion exactly.
    *
    * State is two longs per key; every input row is emitted in its own
    * micro-batch, so no watermark is needed. Matches batch output exactly
    * when a key's rows arrive in event-time order across micro-batches
    * AND same-timestamp cohorts never straddle a batch boundary (the
    * replay stages files cut at distinct-epoch boundaries; a production
    * feed keyed by ingest time satisfies it by construction).
    */
  def targetEncode(turns: Dataset[TurnLabelEvent]): Dataset[EncOut] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.role)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (role: String, rows: Iterator[TurnLabelEvent],
         state: GroupState[EncState]) => {
          val sorted = rows.toSeq
            .sortBy(t => (tsKey(t.ts), t.conv_id, t.turn_idx))
          var st = state.getOption.getOrElse(EncState(0L, 0L))
          val out = Seq.newBuilder[EncOut]
          // epoch-second cohorts: emit all, then absorb all
          sorted.groupBy(t => t.ts.getTime / 1000L).toSeq.sortBy(_._1)
            .foreach { case (_, cohort) =>
              cohort.foreach { t =>
                out += EncOut(t.conv_id, t.turn_idx, role, st.cnt,
                  if (st.cnt == 0L) None else Some(st.sum))
              }
              cohort.foreach(_.label.foreach { l =>
                st = EncState(st.cnt + 1L, st.sum + l)
              })
            }
          state.update(st)
          out.result().iterator
        }
      )
  }

  /** A keyed event-time arrival for the live volume-anomaly gate. */
  final case class HourEvent(role: String, ts: Timestamp)

  final case class AnomOut(
      role: String,
      bucket: Long,
      n: Long,
      trail_n: Long,
      trail_sum: Long,
      is_spike: Boolean
  )

  /** Per-key state: the still-OPEN time bucket's (id, count) plus the
    * last ≤ `trailing` CLOSED bucket counts, oldest first — O(trailing)
    * longs per key, never row-bounded.
    */
  final case class AnomState(
      openBucket: Option[Long],
      openN: Long,
      hist: Seq[Long]
  )

  /** Streaming ingest-volume anomaly gate — the LIVE twin of
    * [[graft.ops.Analytics.volumeAnomaly]]: per-key time-bucket counts
    * judged against the trailing `trailing` OBSERVED buckets, spike ⇔
    * n·trail_n > factor·trail_sum (the same division-free
    * cross-multiply). A bucket stays OPEN (accumulating across
    * micro-batches) until a LATER bucket arrives on its key; closing
    * emits its verdict and pushes its count into the bounded history.
    * The final open bucket therefore needs a far-future sentinel arrival
    * per key to flush — the sentinel's own bucket never closes, so it is
    * never emitted and never pollutes the history (q_stream_anomaly's
    * replay stages exactly that).
    *
    * Matches batch output exactly when each key's arrivals are
    * event-time-ordered ACROSS micro-batches (within a batch this
    * operator sorts); a bucket older than the open one FAILS LOUD
    * instead of silently double-counting a closed bucket.
    *
    * Bucketing floors epoch seconds (`floorDiv(ms, 1000)` — identical to
    * the batch side's `unix_timestamp`), then floor-divides by
    * `bucketSeconds`.
    */
  def volumeAnomalyLive(
      events: Dataset[HourEvent],
      bucketSeconds: Long,
      trailing: Int,
      factor: Long
  ): Dataset[AnomOut] = {
    require(bucketSeconds > 0 && trailing > 0 && factor > 0,
      "bucketSeconds, trailing and factor must be positive")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.role)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (role: String, rows: Iterator[HourEvent],
         state: GroupState[AnomState]) => {
          val counts = rows
            .map(e => Math.floorDiv(
              Math.floorDiv(e.ts.getTime, 1000L), bucketSeconds))
            .toSeq.groupBy(identity).view.mapValues(_.size.toLong)
            .toSeq.sortBy(_._1)
          var st = state.getOption.getOrElse(AnomState(None, 0L, Nil))
          val out = Seq.newBuilder[AnomOut]
          counts.foreach { case (b, cnt) =>
            st.openBucket match {
              case Some(ob) if b == ob =>
                st = st.copy(openN = st.openN + cnt)
              case Some(ob) if b > ob =>
                val trailN = st.hist.size.toLong
                val trailSum = st.hist.sum
                out += AnomOut(role, ob, st.openN, trailN, trailSum,
                  trailN > 0L && st.openN * trailN > factor * trailSum)
                st = AnomState(Some(b), cnt,
                  (st.hist :+ st.openN).takeRight(trailing))
              case Some(ob) =>
                throw new IllegalStateException(
                  s"volumeAnomalyLive: bucket $b for key $role arrived " +
                    s"after bucket $ob closed — feed must be event-time-" +
                    "ordered per key across micro-batches")
              case None =>
                st = AnomState(Some(b), cnt, st.hist)
            }
          }
          state.update(st)
          out.result().iterator
        }
      )
  }

  /** A document arriving on the live path, already reduced to its content
    * fingerprint (hash the text BEFORE the stateful shuffle so only the
    * digest moves, never the payload).
    */
  final case class DocEvent(doc_id: Long, hash: String)

  final case class DedupOut(doc_id: Long, hash: String, kept: Boolean)

  /** Per-fingerprint dedup state: whether this content hash has been seen.
    * One boolean per distinct hash — the minimum any exact first-wins
    * dedup can hold.
    */
  final case class SeenState(seen: Boolean)

  /** Streaming exact dedup with audit — the LIVE twin of
    * [[graft.ops.Dedup.exactGroups]]: every arriving document is emitted
    * immediately with `kept = true` iff its content hash was never seen
    * before (first occurrence wins). Nothing is suppressed, so the output
    * doubles as the drop AUDIT a training-data firehose needs: filter
    * `kept` for the clean stream, count `!kept` for the dedup rate.
    *
    * State is one boolean per distinct fingerprint, grouped BY the hash —
    * the stateful shuffle moves (doc_id, digest) pairs only, never text.
    * "First" is (arrival order, then doc_id within a micro-batch): equal
    * to the batch `min(doc_id)` winner whenever duplicates arrive in
    * doc_id order across batches — the same cross-batch ordering contract
    * as [[locf]] and [[sessionize]].
    *
    * State never expires here (exact dedup is unbounded by definition);
    * production deployments bound it by keying on (hash, day) or routing
    * through the batch-side [[graft.ops.Dedup]] compaction — see
    * docs/ICEBERG.md for the lifecycle split.
    */
  def dedupExact(docs: Dataset[DocEvent]): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.hash)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (hash: String, rows: Iterator[DocEvent],
         state: GroupState[SeenState]) => {
          val sorted = rows.toSeq.sortBy(_.doc_id)
          var seen = state.getOption.exists(_.seen)
          val out = sorted.map { d =>
            val kept = !seen
            seen = true
            DedupOut(d.doc_id, hash, kept)
          }
          state.update(SeenState(seen))
          out.iterator
        }
      )
  }

  /** LIVE incremental near-dup gate: each streaming document is flagged
    * against a STANDING corpus's write-once index artifacts — its exact
    * hash set and its MinHash band table (exactly what
    * [[graft.ops.Dedup.incrementalFlags]] reads batch-side; this is that
    * operator's live twin, and must emit identical flags). The crawl
    * firehose shape: "is this new page a copy (exact or near) of
    * anything we already hold?" answered per micro-batch, without
    * waiting for the nightly batch pass.
    *
    * Statelessness is the design point: the per-doc "shares ANY band
    * with the standing corpus" test is NOT an explode + aggregate (that
    * would need a stateful per-doc re-aggregation in append mode) but
    * `bands` row-level left joins — the signature's band keys stay as
    * columns ([[graft.ops.Dedup.bandKeysFromSig]], null-guarded for
    * short docs, and a null key never joins) and each joins the standing
    * band set for its own band index. Zero streaming state; every
    * micro-batch is a pure stream-static join, so kill/restart needs no
    * recovery beyond the source offsets.
    *
    * At scale the standing index is huge and the micro-batch small: the
    * joins hash-partition on hash/band_key and only the BATCH side of
    * each exchange is per-trigger work; a production deployment snapshots
    * the index bucketed by those keys so the static side's shuffle is
    * elided (io.Bucketed), exactly like the batch path.
    */
  def nearDupFlags(
      newDocs: DataFrame, // streaming (idCol, textCol)
      oldHashes: DataFrame, // static index: (hash) distinct md5(text)
      oldBands: DataFrame, // static index: (band_idx, band_key) distinct
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      shingleLen: Int = 3
  ): DataFrame = {
    import graft.ops.Dedup
    val ex = oldHashes.select(col("hash")).distinct()
      .withColumn("__ex", lit(true))
    val bandSets = (0 until bands).map { b =>
      oldBands.filter(col("band_idx") === b)
        .select(col("band_key").as(s"__bk$b")).distinct()
        .withColumn(s"__nr$b", lit(true))
    }
    val keyed = newDocs.select(
        col(idCol),
        md5(col(textCol).cast("binary")).as("hash"),
        Dedup.minhashSigCol(col(textCol), k, shingleLen).as("__sig"))
    val withKeys = Dedup.bandKeysFromSig(col("__sig"), k, bands).zipWithIndex
      .foldLeft(keyed) { case (d, (kc, b)) =>
        d.withColumn(s"__bk$b", when(col("__sig").isNotNull, kc))
      }
    val joined = (0 until bands).foldLeft(
      withKeys.join(ex, Seq("hash"), "left")) { (d, b) =>
      d.join(bandSets(b), Seq(s"__bk$b"), "left")
    }
    val near = (0 until bands)
      .map(b => coalesce(col(s"__nr$b"), lit(false)))
      .reduce(_ || _)
    val exact = coalesce(col("__ex"), lit(false))
    joined.select(
      col(idCol),
      exact.as("drop_exact"),
      near.as("drop_near"),
      (exact || near).unary_!.as("kept"))
  }

  /** BOUNDED-STATE streaming dedup: first occurrence per `keyCols` wins,
    * but state for a key is evicted once the event-time watermark passes
    * it — the trade [[dedupExact]]'s scaladoc documents ("exact dedup is
    * unbounded by definition") made concrete: this variant holds only
    * (watermark delay) of traffic's keys and in exchange a duplicate
    * arriving more than `delay` after its original is re-emitted as
    * fresh. That is the right contract for a firehose where duplicates
    * cluster in time (retries, replays, crawler revisits) and the
    * standing corpus catches stragglers in batch compaction.
    *
    * Emission is immediate (no watermark buffering on output) and only
    * kept rows flow downstream; within a micro-batch the winner among
    * same-key rows follows per-partition arrival order, so a
    * deterministic replay must arrive key-sorted (q_stream_dedup_wm
    * stages single-part files sorted by (key, id)).
    */
  def dedupWithinWatermark(
      docs: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      delay: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one dedup key column")
    docs.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** Event-time windowed role counts with a watermark (late rows beyond
    * the watermark are dropped, bounding state).
    */
  def windowedRoleCounts(turns: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("role"))
      .agg(count(lit(1)).as("n"))

  /** STREAM-STREAM event-time interval join: each left row pairs with
    * the right rows of the same `key` whose `rightTs` lies in
    * [leftTs, leftTs + windowSec] — e.g. "tool results within an hour of
    * the user turn". Both sides carry a watermark, so Spark's symmetric
    * hash join can evict buffered state once the watermark passes a
    * row's last possible match; state is bounded by (watermark delay +
    * window) of traffic per side, not the stream's history.
    *
    * Correctness constraint (stated, and what q_stream_join pins): the
    * watermark delay must be at least the join window plus the maximum
    * event-time disorder between the two sources — a smaller delay
    * silently evicts left rows whose matches have not arrived. The
    * right-side key column is renamed internally; output columns are the
    * left columns then the right's non-key columns.
    */
  def intervalJoin(
      left: DataFrame,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      key: String,
      windowSec: Long,
      watermark: String
  ): DataFrame = {
    require(windowSec >= 0, "windowSec must be non-negative")
    val shared = left.columns.toSet.intersect(right.columns.toSet) - key
    require(shared.isEmpty,
      s"left/right column names must be disjoint apart from '$key', " +
        s"both have: $shared — rename before joining (ambiguous " +
        "resolution would silently compare a column against itself)")
    require(leftTs != rightTs,
      "leftTs and rightTs must have distinct names")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(key, "__rkey")
      .withWatermark(rightTs, watermark)
    l.join(r,
        col(key) === col("__rkey") &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) +
            expr(s"INTERVAL $windowSec SECOND"))
      .drop("__rkey")
  }

  /** Stateful gap sessionization via flatMapGroupsWithState with BOUNDED
    * state: per conversation the state is a 3-long summary accumulator for
    * the open session (count/min/max ts) plus the emitted-session counter —
    * never a turn buffer, so a never-idle conversation holds O(1) state.
    *
    * Sessions closed by an in-batch gap are emitted immediately; the open
    * tail session is emitted by an EVENT-TIME TIMEOUT once the watermark
    * passes `session end + gap` (an idle conversation flushes its tail
    * instead of buffering forever). After a timeout the state keeps only
    * the tiny (None, emitted) tombstone so session_seq stays consistent
    * with batch [[graft.features.Sessionize]] if the conversation resumes.
    *
    * Matches batch output exactly when each conversation's turns arrive in
    * event-time order across micro-batches. Late rows (within the
    * watermark): a row inside the open session's span or within one gap
    * before its start merges into it (same result as batch); a row MORE
    * than a gap before the open session's start is dropped — in batch it
    * would be its own earlier session, and emitting it late would
    * renumber sessions already emitted downstream.
    *
    * State retention: after a timeout flushes the tail, the (None,
    * emitted) tombstone is by default kept FOREVER so `session_seq` stays
    * batch-consistent if the conversation resumes — total state therefore
    * grows with conversation-key cardinality (O(1) per key, not globally
    * bounded). Pass `tombstoneTtlSeconds` to remove tombstones after that
    * much further event-time idleness: state becomes globally bounded, at
    * the cost that a conversation resuming after the TTL restarts
    * session_seq at 0 (an explicit, documented trade).
    */
  def sessionize(
      turns: Dataset[TurnEvent],
      gapSeconds: Long,
      watermark: String = "10 minutes",
      tombstoneTtlSeconds: Option[Long] = None
  ): Dataset[SessionOut] = {
    import turns.sparkSession.implicits._
    require(tombstoneTtlSeconds.forall(_ > 0L),
      "tombstoneTtlSeconds must be positive (the expiry timeout must land " +
        "strictly beyond the current watermark)")
    turns
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[TurnEvent], state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            if (st.open.isEmpty) {
              // a tombstone timing out again is the TTL expiry: drop it
              // (only reachable when tombstoneTtlSeconds is set)
              state.remove()
              Iterator.empty
            } else {
              // idle past the gap: flush the open tail, keep the counter
              val out = st.open.map(o => SessionOut(key, st.emitted, o.n,
                o.start, o.end))
              state.update(SessState(None, st.emitted + out.size))
              tombstoneTtlSeconds.foreach { ttl =>
                state.setTimeoutTimestamp(
                  state.getCurrentWatermarkMs() + ttl * 1000L)
              }
              out.iterator
            }
          } else {
            // bounded by the micro-batch's rows for this key (i.e. by the
            // trigger interval), NOT by conversation length — a long
            // conversation still holds O(1) state between batches
            val sorted = rows.toSeq.sortBy(t => (tsKey(t.ts), t.turn_idx))
            val st0 = state.getOption.getOrElse(SessState(None, 0L))
            var emitted = st0.emitted
            var open = st0.open
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              val ms = t.ts.getTime
              open = open match {
                case None => Some(OpenSess(t.ts, t.ts, 1L))
                case Some(o) =>
                  // same second-granularity gap rule as batch Sessionize
                  if (ms / 1000L - o.end.getTime / 1000L > gapSeconds) {
                    out += SessionOut(key, emitted, o.n, o.start, o.end)
                    emitted += 1
                    Some(OpenSess(t.ts, t.ts, 1L))
                  } else if (o.start.getTime / 1000L - ms / 1000L > gapSeconds) {
                    // a row MORE than a gap BEFORE the open session would
                    // be its own earlier session in batch — emitting it
                    // now would renumber already-emitted sessions, so it
                    // is dropped (the per-key analogue of a watermark
                    // discard; the summary accumulator cannot reorder
                    // history it no longer holds)
                    open
                  } else
                    Some(OpenSess(
                      if (t.ts.compareTo(o.start) < 0) t.ts else o.start,
                      if (t.ts.compareTo(o.end) > 0) t.ts else o.end,
                      o.n + 1))
              }
            }
            state.update(SessState(open, emitted))
            open.foreach { o =>
              // fire once the watermark passes the gap after the last turn
              // (Spark requires the timeout to be beyond the watermark)
              val fire = o.end.getTime + gapSeconds * 1000L + 1000L
              state.setTimeoutTimestamp(
                math.max(fire, state.getCurrentWatermarkMs() + 1000L))
            }
            out.result().iterator
          }
        }
      )
  }
}
