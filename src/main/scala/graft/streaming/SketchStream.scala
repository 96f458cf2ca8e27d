package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.Sketch

/** Streamed maintenance for the persisted KMV sketch state — the
  * `foreachBatch` face of [[Sketch.absorbKmvState]]: keys arriving on a
  * stream absorb into the SAME state layout the batch job seeds
  * ([[Sketch.writeKmvState]]) and serves ([[Sketch.readKmvState]]), so
  * the corpus-distinct estimate keeps up with arrivals at a cost of one
  * min-k pass per batch plus a ≤ 2k re-trim — completing the streamed-
  * twin roster for the mergeable-state family (profile, histogram,
  * rollup, and now the distinct-count sketch).
  *
  * Exactly-once posture: a blind re-absorb is actually HARMLESS for
  * KMV (min-k over a distinct set is idempotent — re-seen hashes
  * occupy one slot), but the shared [[StreamOnce]] markers + commit
  * tag are staged anyway: they keep every state family under ONE
  * replay contract (an operator reasoning about a mixed pipeline never
  * needs a per-family exception list), and they skip the redelivered
  * batch's scan work, not just its effect. Min-k associativity makes
  * the streamed state BIT-IDENTICAL to the one-shot sketch over
  * everything seen (StreamingSketchSpec asserts it across a restart).
  */
object SketchStream {

  /** foreachBatch writer absorbing each micro-batch's `keyCol` into the
    * persisted KMV state at `statePath` (seed with
    * [[Sketch.writeKmvState]] first). */
  def kmvAppendBatch(statePath: String,
                     keyCol: String): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      StreamOnce.appliedOnce(batchDf.sparkSession, statePath, batchId,
        "KMV state", retrySafe = true) {
        if (!batchDf.isEmpty)
          Sketch.absorbKmvState(batchDf, keyCol, statePath,
            streamTag = Some(s"stream-batch-$batchId"))
      }
}
