package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset custom-state exemplar (SURVEY §2.10 absent
  * row): gap-based user sessions over the events stream.
  *
  * State per user is a bounded interval list (open session bounds,
  * capped at `maxOpenIntervals`), each interval emitted once the gap
  * elapses past the watermark — in streaming mode via event-time
  * timeout; the batch path (`sessionizeBatch`) computes identical
  * sessions declaratively with a gap-flag window cumulative sum, which
  * is the 100 TB-friendly formulation (one shuffle+sort per user, no
  * state store).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Int)
  case class SessionListState(intervals: List[SessionState])

  /** `forced = true` marks a DEGRADED early emission: the interval was
    * pushed out by the `maxOpenIntervals` state cap, not closed by the
    * watermark, so a later in-watermark event may re-create (part of)
    * its time range and emit again — downstream consumers assuming
    * disjoint per-user sessions must filter or reconcile on this flag
    * (ADVICE r10: the degradation was documented but invisible in the
    * data). Watermark-closed sessions are always `forced = false` and
    * keep the disjointness guarantee. */
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int,
                     forced: Boolean = false)

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

  /** Streaming sessionization with custom state: a BOUNDED per-user
    * list of open intervals, each emitted only once no in-watermark
    * event can still touch it.
    *
    * Out-of-order arrivals within the lateness window are merged by
    * INTERVAL arithmetic, not append-only: an event EARLIER than an
    * open interval's start extends it backward (min-start, the same
    * session_start the batch twin computes), an event within the gap
    * on either side merges, and a bridge event fuses the two intervals
    * it lands between — INCLUDING a bridge arriving in a LATER
    * micro-batch than the intervals it fuses (the pre-r10 O(1) state
    * kept only the newest interval and broke stream==batch parity on
    * exactly that case; spec-pinned now). The close rule is the merge
    * rule inverted: an event t merges with [s, e] iff
    * s − gap ≤ t ≤ e + gap, and events below the watermark are
    * dropped, so an interval with e + gap < watermark can never change
    * again and emits.
    *
    * State is bounded by `maxOpenIntervals` (open intervals per user —
    * each a 3-field struct, NOT raw events; FunnelStream buffers raw
    * events where that is the need). A user exceeding the cap —
    * pathological out-of-order depth — force-emits its OLDEST
    * intervals early, degrading to the pre-r10 semantics for that user
    * rather than growing state without bound; those rows carry
    * `forced = true` (see [[Session]]) so the degradation is visible
    * in the data, not just this doc. */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long,
                       lateness: String,
                       maxOpenIntervals: Int = 64): Dataset[Session] = {
    require(maxOpenIntervals >= 1,
      s"maxOpenIntervals must be >= 1, got $maxOpenIntervals")
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionListState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionListState]) =>
          // fold sorted points into a SORTED interval list (existing
          // state included): merge within gap on either side, fusing
          // a bridged successor interval. On a timeout invocation the
          // iterator is empty and this is a no-op re-partition.
          var intervals = state.getOption.map(_.intervals).getOrElse(Nil)
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
          // close every interval no future in-watermark event can
          // touch (merge needs t <= end + gap; events below the
          // watermark drop), newest stays open
          val wm = state.getCurrentWatermarkMs()
          val (closed, openAll) = intervals.partition(_.end + gapMs < wm)
          // state-size rail: beyond the cap the OLDEST intervals emit
          // early (bounded state beats unbounded parity)
          val excess = openAll.length - maxOpenIntervals
          val (forced, open) =
            if (excess > 0) openAll.splitAt(excess) else (Nil, openAll)
          if (open.nonEmpty) {
            state.update(SessionListState(open))
            // wake when the earliest-closing open interval passes the
            // watermark (must be strictly ahead of the current one)
            state.setTimeoutTimestamp(
              math.max(open.map(_.end).min + gapMs, wm + 1))
          } else if (state.exists) {
            state.remove()
          }
          (closed.map((_, false)) ++ forced.map((_, true))).iterator.map {
            case (s, wasForced) =>
              Session(userId, new Timestamp(s.start), new Timestamp(s.end),
                s.n, wasForced)
          }
      }
  }
}
