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

  /** flatMapGroupsWithState buffer: the still-open tail session + how many
    * sessions were already emitted for the key.
    */
  final case class SessState(buffered: Seq[TurnEvent], emitted: Long)

  /** Event-time windowed role counts with a watermark (late rows beyond
    * the watermark are dropped, bounding state).
    */
  def windowedRoleCounts(turns: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("role"))
      .agg(count(lit(1)).as("n"))

  private def gapSplit(
      sorted: Seq[TurnEvent],
      gapSeconds: Long
  ): Seq[Seq[TurnEvent]] = {
    if (sorted.isEmpty) return Nil
    val out = Seq.newBuilder[Seq[TurnEvent]]
    var cur = Seq.newBuilder[TurnEvent]
    var prev = sorted.head
    cur += prev
    sorted.tail.foreach { t =>
      if (t.ts.getTime / 1000L - prev.ts.getTime / 1000L > gapSeconds) {
        out += cur.result()
        cur = Seq.newBuilder[TurnEvent]
      }
      cur += t
      prev = t
    }
    out += cur.result()
    out.result()
  }

  /** Stateful gap sessionization via flatMapGroupsWithState: per
    * conversation, buffered turns are gap-split in event-time order;
    * CLOSED sessions are emitted, the open tail session stays in state
    * (it may still grow). Matches batch Sessionize for emitted sessions.
    */
  def sessionize(
      turns: Dataset[TurnEvent],
      gapSeconds: Long
  ): Dataset[SessionOut] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[TurnEvent], state: GroupState[SessState]) => {
          val prev = state.getOption.getOrElse(SessState(Nil, 0L))
          val all = (prev.buffered ++ rows)
            .sortBy(t => (t.ts.getTime, t.turn_idx))
          val sessions = gapSplit(all, gapSeconds)
          if (sessions.isEmpty) Iterator.empty
          else {
            val closed = sessions.dropRight(1)
            state.update(SessState(sessions.last, prev.emitted + closed.size))
            closed.iterator.zipWithIndex.map { case (s, i) =>
              SessionOut(key, prev.emitted + i, s.size.toLong,
                s.head.ts, s.last.ts)
            }
          }
        }
      )
  }
}
