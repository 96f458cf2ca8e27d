package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset custom-state exemplar (SURVEY §2.10 absent
  * row): gap-based user sessions over the events stream.
  *
  * State per user is O(1) (running session bounds), emitted when the
  * gap elapses — in streaming mode via event-time timeout against the
  * watermark; the batch path (`sessionizeBatch`) computes identical
  * sessions declaratively with a gap-flag window cumulative sum, which
  * is the 100 TB-friendly formulation (one shuffle+sort per user, no
  * state store).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int)

  /** Declarative batch sessionization: a new session starts when the
    * gap to the previous event exceeds `gapSeconds`; session id is the
    * cumulative count of session-starts per user. The gap compares
    * MILLISECONDS (unix_millis) — unix_timestamp truncates to whole
    * seconds, which would split sub-second feeds differently from the
    * stream twin's millisecond arithmetic. Null-ts events are DROPPED:
    * an event without a time belongs to no session, and Spark's native
    * session_window filters them the same way (its analyzer rule adds
    * IsNotNull) — so all three formulations agree on dirty feeds
    * instead of this one emitting a (null, null) pseudo-session. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .filter(col("ts").isNotNull)
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        // the cast lifts TIMESTAMP_NTZ (the parquet fixture type) to
        // TIMESTAMP for unix_millis; the session-tz shift cancels in
        // the subtraction, so the gap is tz-invariant
        when(col("__prev").isNull ||
          unix_millis(col("ts").cast("timestamp")) -
            unix_millis(col("__prev").cast("timestamp")) > gapSeconds * 1000L, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new_session")).over(byUser))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"))
      .drop("__sid")
  }

  /** Sessionization via Spark's NATIVE `session_window` grouping — the
    * built-in the custom formulations are benchmarked against (prefer
    * the built-in where it expresses the semantics; the gap-flag
    * cumulative sum and the flatMapGroupsWithState stream exist for
    * the shapes it cannot serve: session ids joined back onto events,
    * custom per-session state). Emits the same
    * (user_id, session_start, session_end, n_events) rows as
    * [[sessionizeBatch]] — EXACTLY, boundary included: the built-in's
    * merge test is inclusive at prev + gap (measured and spec-pinned;
    * easy to misremember as exclusive), matching the gap-flag form's
    * `diff > gap` split. Its window END is last-event + gap though, so
    * session_end reports max(ts) explicitly, not window.end. Works on
    * a stream too (with a watermark) — the built-in state store
    * handles merging. */
  def sessionizeNative(events: DataFrame, gapSeconds: Long): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"))
      .drop("session_window")

  /** Streaming sessionization with custom state: sessions are emitted
    * once the event-time timeout (gap) fires past the watermark.
    *
    * Out-of-order arrivals within the lateness window are merged by
    * INTERVAL arithmetic, not append-only: an event EARLIER than the
    * open session's start extends the session backward (min-start, the
    * same session_start the batch twin computes), an event within the
    * gap on either side merges, and a within-batch event that bridges
    * two intervals fuses them. Documented limitation of the O(1)
    * per-user state: only the LATEST interval survives a batch —
    * older intervals emit at batch end, so a bridge event arriving in
    * a LATER batch (two out-of-order stragglers split across batches)
    * cannot re-open them; the batch twin over the same kept rows would
    * merge. FunnelStream escapes this by buffering raw events; here
    * the O(1) state is the point. */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long,
                       lateness: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n))
          } else {
            // fold sorted points into a SORTED interval list (existing
            // state included): merge within gap on either side, fusing
            // a bridged successor interval
            var intervals = state.getOption.toList
            rows.toSeq.map(_.ts.getTime).sorted.foreach { t =>
              val (before, rest) = intervals.span(iv => iv.end + gapMs < t)
              intervals = rest match {
                case Nil => before :+ SessionState(t, t, 1)
                case head :: tail if t < head.start - gapMs =>
                  before ++ (SessionState(t, t, 1) :: head :: tail)
                case head :: tail =>
                  var merged = SessionState(math.min(head.start, t),
                    math.max(head.end, t), head.n + 1)
                  var remaining = tail
                  while (remaining.nonEmpty &&
                      remaining.head.start - merged.end <= gapMs) {
                    val nxt = remaining.head
                    merged = SessionState(math.min(merged.start, nxt.start),
                      math.max(merged.end, nxt.end), merged.n + nxt.n)
                    remaining = remaining.tail
                  }
                  before ++ (merged :: remaining)
              }
            }
            // all but the newest interval emit now (gap-closed within
            // this batch, modulo the cross-batch bridge limitation);
            // the newest stays open in state
            intervals.lastOption.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            intervals.dropRight(1).iterator.map(s =>
              Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
          }
      }
  }
}
