package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.AggState

/** Streamed maintenance for the persisted keyed rollup state — the
  * `foreachBatch` face of [[AggState.appendAggState]]: rows arriving on
  * a stream absorb into the SAME bucket layout the batch job seeds
  * ([[AggState.writeAggState]]) and serves ([[AggState.readAggState]]),
  * each micro-batch costing one pass over the batch plus a rewrite of
  * only the touched key-hash buckets.
  *
  * Exactly-once posture: a blind re-absorb would double-count, so the
  * writer stages the shared [[StreamOnce]] per-batch markers under
  * `path/_stream_batches` (committed replays skip) AND passes a
  * `stream-batch-N` tag through the absorb's atomic manifest commit
  * ([[graft.ops.StateStore]]) — a started-without-committed marker
  * retries SAFELY because the re-applied absorb re-checks the tag
  * under the state's writer lock and no-ops if the prior attempt's
  * commit landed (the [[IndexStream]] retrySafe contract, inherited
  * for free from the manifest-versioned state layout). Decimal sums
  * make the streamed state equal the one-shot aggregate EXACTLY across
  * any batch split (StreamingRollupSpec asserts it across a restart).
  */
object RollupStream {

  /** foreachBatch writer absorbing each micro-batch into the persisted
    * aggregate state at `path` (seed with [[AggState.writeAggState]]
    * first — possibly over zero rows). */
  def rollupAppendBatch(path: String): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      StreamOnce.appliedOnce(batchDf.sparkSession, path, batchId,
        "rollup state", retrySafe = true) {
        if (!batchDf.isEmpty)
          AggState.appendAggState(batchDf, path,
            streamTag = Some(s"stream-batch-$batchId"))
      }
}
