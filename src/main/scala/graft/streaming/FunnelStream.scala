package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Funnel.stageTimes]] — "did the user
  * convert, and when" over a live event feed.
  *
  * The batch funnel is S narrow hash-joins; a stream can't re-join
  * itself per step, so the streaming shape is per-key custom state
  * (`flatMapGroupsWithState`, same exemplar as [[Sessionize]]): each
  * key buffers its (ts, step) events — fixed-width, never the payload —
  * and when the key has been quiet for `quiesceSeconds` PAST the
  * watermark (event-time timeout, so late data within `lateness` still
  * lands first), the buffer is replayed in event-time order through the
  * same greedy machine the batch operator expresses relationally:
  * stage 1 at the key's earliest step-1 event, stage i at the earliest
  * step-i event strictly after stage i−1 (and within `withinSeconds`
  * of stage 1 when bounded). On a ts-sorted replay, "first qualifying
  * event" IS "min qualifying ts", so emitted rows match
  * `Funnel.stageTimes` exactly — spec-asserted, including events
  * arriving out of order across micro-batches.
  *
  * State bound: one (long, string) pair per buffered event per key,
  * held only until the key's quiesce timeout fires — proportional to a
  * single key's activity inside its funnel window, not to stream
  * volume. Each key emits its funnel AT MOST ONCE (state removed on
  * flush); events for a key arriving after its flush are treated as a
  * fresh key lifecycle, which matches the batch semantics only for
  * keys that had fully quiesced — the documented append-mode contract.
  */
object FunnelStream {

  case class Event(user_id: Long, ts: Timestamp, step: String)
  case class FunnelBuffer(events: List[(Long, String)])
  case class StageHit(user_id: Long, step: Long, stage: String, step_ts: Timestamp)

  /** Greedy stage machine over ts-sorted (ts, step) events — the exact
    * relational semantics of [[graft.ops.Funnel.stageTimes]]. */
  private[graft] def replay(sorted: Seq[(Long, String)], steps: Seq[String],
                            withinMs: Option[Long]): Seq[(Int, String, Long)] = {
    val out = Seq.newBuilder[(Int, String, Long)]
    var idx = 0
    var t1 = 0L
    var prev = 0L
    sorted.foreach { case (t, st) =>
      if (idx < steps.size && st == steps(idx)) {
        val ok =
          if (idx == 0) true
          else t > prev && withinMs.forall(h => t <= t1 + h)
        if (ok) {
          if (idx == 0) t1 = t
          prev = t
          out += ((idx + 1, st, t))
          idx += 1
        }
      }
    }
    out.result()
  }

  /** Per-key funnel stage times over a stream. Output rows match
    * `Funnel.stageTimes(df, "user_id", "ts", "step", steps,
    * withinSeconds)` for every key that has quiesced past the
    * watermark. */
  def stageTimesStream(events: Dataset[Event], steps: Seq[String],
                       withinSeconds: Option[Long], lateness: String,
                       quiesceSeconds: Long): Dataset[StageHit] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    import events.sparkSession.implicits._
    val withinMs = withinSeconds.map(_ * 1000L)
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuffer, StageHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelBuffer]) =>
          if (state.hasTimedOut) {
            val buffered = state.get.events
            state.remove()
            replay(buffered.sortBy(identity), steps, withinMs).iterator
              .map { case (i, st, t) =>
                StageHit(userId, i.toLong, st, new Timestamp(t)) }
          } else {
            val incoming = rows.map(e => (e.ts.getTime, e.step)).toList
            val all = state.getOption.map(_.events).getOrElse(Nil) ::: incoming
            state.update(FunnelBuffer(all))
            // flush once the watermark passes the key's last activity
            // plus the quiesce horizon (timeout must sit past the
            // current watermark for the registration to be legal)
            val flushAt = all.iterator.map(_._1).max + quiesceSeconds * 1000L
            state.setTimeoutTimestamp(
              math.max(flushAt, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
