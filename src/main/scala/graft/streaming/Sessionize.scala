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
    * cumulative count of session-starts per user. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new_session")).over(byUser))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"))
      .drop("__sid")
  }

  /** Streaming sessionization with custom state: sessions are emitted
    * once the event-time timeout (gap) fires past the watermark. */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long,
                       lateness: String): Dataset[Session] = {
    import events.sparkSession.implicits._
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
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var emitted = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  emitted ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapSeconds * 1000)
            }
            emitted.reverseIterator
          }
      }
  }
}
