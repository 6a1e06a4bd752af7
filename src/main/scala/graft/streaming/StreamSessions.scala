package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` counterpart of [[graft.operators.Events.sessionize]]:
  * events group by key, open sessions live in the state store, and a session
  * is emitted exactly once, when the event-time watermark passes its end by
  * more than the gap (no later event can extend it). State per key is the
  * OPEN sessions only — bounded by the watermark horizon, not the stream
  * length — and event-time timeouts wake idle keys so sessions close even
  * when the key never receives another event.
  *
  * All session arithmetic runs in epoch milliseconds (`Timestamp.getTime`
  * truncates Spark's microsecond timestamps), so an external oracle must
  * truncate the same way.
  */
object StreamSessions {

  /** An open or closed session: [start, end] in epoch ms, n events. */
  final case class Session(start: Long, end: Long, n: Long)

  /** Emitted row: one closed session per key. */
  final case class ClosedSession(key: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Merge sorted-by-start intervals, joining neighbors whose gap is within
    * `gapMs` (a bridging late event re-merges previously separate opens).
    */
  private[streaming] def mergeSessions(all: Seq[Session], gapMs: Long): List[Session] =
    all.sortBy(s => (s.start, s.end)).foldLeft(List.empty[Session]) {
      case (acc @ (prev :: rest), s) if s.start - prev.end <= gapMs =>
        Session(prev.start, math.max(prev.end, s.end), prev.n + s.n) :: rest
      case (acc, s) => s :: acc
    }.reverse

  /** One state-machine step for a key: fold new events in, close every
    * session the watermark has passed (end + gap <= watermark), and arm an
    * event-time timeout for the earliest still-open session so the key
    * wakes up even with no further input.
    */
  private def step(gapMs: Long)(
      key: Long, events: Iterator[(Long, java.sql.Timestamp)],
      state: GroupState[List[Session]]): Iterator[ClosedSession] = {
    val wm = state.getCurrentWatermarkMs()
    val incoming = events.map { case (_, ts) =>
      Session(ts.getTime, ts.getTime, 1L)
    }.toSeq
    val sessions = mergeSessions(state.getOption.getOrElse(Nil) ++ incoming, gapMs)
    val (closed, open) = sessions.partition(_.end + gapMs <= wm)
    if (open.nonEmpty) {
      state.update(open)
      // earliest possible close; max(wm+1) because Spark requires the
      // timeout to sit strictly beyond the current watermark
      state.setTimeoutTimestamp(math.max(open.map(_.end).min + gapMs, wm + 1))
    } else state.remove()
    closed.iterator.map(s => ClosedSession(key, s.start, s.end, s.n))
  }

  /** Sessionize a stream: `df` needs `keyCol` (long) and an event-time
    * `timeCol` (timestamp) ALREADY carrying a watermark
    * (`df.withWatermark(timeCol, delay)`), which both drops late events and
    * drives session-close timeouts. Output: one row per closed session.
    */
  def sessionize(df: DataFrame, keyCol: String, timeCol: String,
      gapMs: Long): Dataset[ClosedSession] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(timeCol))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        step(gapMs))
  }
}
