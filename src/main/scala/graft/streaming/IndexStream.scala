package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Ann, TextIndex}

/** Streamed maintenance for the persisted retrieval indexes — the
  * `foreachBatch` face of [[Ann.appendToIvfIndex]] and
  * [[TextIndex.appendToBm25Index]] (VERDICT r7 item 5): vectors or
  * documents arriving on a stream append into the SAME layouts the
  * batch probes serve, so the index a nightly job built keeps absorbing
  * daily arrivals without a rebuild — the index-lifecycle twin of
  * [[CurationStream.refreshBatch]]'s corpus refresh.
  *
  * Exactly-once posture: `foreachBatch` delivery is at-least-once and
  * a BLIND re-append would add its postings/lists segment twice, so
  * each writer stages the shared [[StreamOnce]] per-batch markers under
  * `indexPath/_stream_batches` (committed replays skip) AND hands the
  * append a `stream-batch-N` tag that rides inside the manifest
  * commit's atomic publication: a started-without-committed marker
  * retries SAFELY because the re-applied append first checks the tag
  * under the index writer lock and no-ops when the prior attempt's
  * commit did land (the double-count window the markers alone could
  * not close). One stream per index layout — the marker directory and
  * the batch-id tag space are both layout-scoped. State across
  * restarts rides the stream checkpoint (offsets) plus the markers
  * (applied-batch set); both live outside the executors, so a new
  * cluster resumes correctly.
  */
object IndexStream {

  /** foreachBatch writer appending each (id, vec) micro-batch to a
    * persisted [[Ann.writeIvfIndex]]-family layout via stored-centroid
    * assignment. Works for the float, SQ8, and PQ variants through
    * `variant` ("flat" | "sq8" | "pq"). Appended cells are identical to
    * a rebuild over corpus ∪ batches (the append contract), so a
    * stream of N micro-batches converges to exactly the index a batch
    * job would build — StreamingIndexSpec asserts probe equality after
    * a 3-micro-batch run with a restart. */
  def ivfAppendBatch(indexPath: String,
                     variant: String = "flat"): (DataFrame, Long) => Unit = {
    val append: (DataFrame, Option[String]) => Unit = variant match {
      case "flat" => Ann.appendToIvfIndex(_, indexPath, _)
      case "sq8"  => Ann.appendToIvfIndexSq8(_, indexPath, _)
      case "pq"   => Ann.appendToIvfIndexPq(_, indexPath, _)
      case "bin"  => Ann.appendToIvfIndexBin(_, indexPath, _)
      case other  => throw new IllegalArgumentException(
        s"unknown IVF variant '$other' (flat | sq8 | pq | bin)")
    }
    (batchDf, batchId) =>
      appliedOnce(batchDf.sparkSession, indexPath, batchId, "IVF") { tag =>
        if (!batchDf.isEmpty) append(batchDf, tag)
      }
  }

  /** foreachBatch writer appending each (idCol, textCol) document
    * micro-batch to a persisted [[TextIndex.writeBm25Index]] layout:
    * only the batch tokenizes; stored segments are never rewritten. */
  def bm25AppendBatch(indexPath: String, idCol: String,
                      textCol: String): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      appliedOnce(batchDf.sparkSession, indexPath, batchId, "BM25") { tag =>
        if (!batchDf.isEmpty)
          TextIndex.appendToBm25Index(batchDf, idCol, textCol, indexPath, tag)
      }

  /** Run `append` exactly once per (indexPath, batchId): skip committed
    * replays via the [[StreamOnce]] markers; a started-but-uncommitted
    * marker retries SAFELY because the appends are idempotent-checkable
    * — the per-batch tag handed to `append` rides inside the manifest
    * commit and is re-checked under the index writer lock, so a prior
    * attempt that committed but died before its marker no-ops instead
    * of double-applying (retrySafe contract, [[StreamOnce]]). */
  private def appliedOnce(spark: SparkSession, indexPath: String,
                          batchId: Long, what: String)
                         (append: Option[String] => Unit): Unit =
    StreamOnce.appliedOnce(spark, indexPath, batchId, s"$what index",
      retrySafe = true)(append(Some(s"stream-batch-$batchId")))
}
