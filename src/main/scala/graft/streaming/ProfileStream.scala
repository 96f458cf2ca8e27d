package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.Profile

/** Streamed maintenance for the mergeable column-profile state — the
  * `foreachBatch` face of [[Profile.appendProfileState]]: rows arriving
  * on a stream absorb into the SAME state layout the batch profiler
  * seeds ([[Profile.writeProfileState]]) and serves
  * ([[Profile.readProfileState]]), so data-quality monitoring keeps up
  * with arrivals without ever rescanning the profiled corpus — each
  * micro-batch costs one pass over the BATCH plus a state-sized merge.
  *
  * Exactly-once posture: a blind re-absorb would double-count (counts
  * sum, HLL sketches union), so the writer stages the shared
  * [[StreamOnce]] per-batch markers under `statePath/_stream_batches`
  * (committed replays skip) AND passes a `stream-batch-N` tag through
  * the absorb's atomic manifest commit ([[graft.ops.StateStore]]) —
  * a started-without-committed marker retries SAFELY because the
  * re-applied absorb re-checks the tag under the state's writer lock
  * and no-ops if the prior attempt's commit landed (the
  * [[IndexStream]] retrySafe contract, inherited for free from the
  * manifest-versioned state layout). HLL union is register-wise max,
  * so the streamed state equals the one-shot profile over the same
  * rows BIT-EXACTLY (StreamingProfileSpec asserts it across a
  * restart).
  */
object ProfileStream {

  /** foreachBatch writer absorbing each micro-batch into the persisted
    * profile state at `statePath` (seed it with
    * [[Profile.writeProfileState]] first — possibly over zero rows). */
  def profileAppendBatch(statePath: String,
                         cols: Seq[String]): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      StreamOnce.appliedOnce(batchDf.sparkSession, statePath, batchId,
        "profile state", retrySafe = true) {
        if (!batchDf.isEmpty)
          Profile.appendProfileState(batchDf, cols, statePath,
            streamTag = Some(s"stream-batch-$batchId"))
      }

  /** foreachBatch writer absorbing each micro-batch into the persisted
    * fixed-bound histogram state at `statePath` (seed with
    * [[Profile.writeHistState]] first). Integer bin counts add, so the
    * streamed state equals the one-shot histogram EXACTLY — same
    * marker+tag exactly-once posture as the profile state. */
  def histAppendBatch(statePath: String): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      StreamOnce.appliedOnce(batchDf.sparkSession, statePath, batchId,
        "histogram state", retrySafe = true) {
        if (!batchDf.isEmpty)
          Profile.appendHistState(batchDf, statePath,
            streamTag = Some(s"stream-batch-$batchId"))
      }
}
