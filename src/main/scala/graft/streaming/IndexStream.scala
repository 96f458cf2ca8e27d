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
  * both appends are NON-IDEMPOTENT (postings/lists append files; BM25
  * df counts merge additively), so each writer stages per-batch
  * markers under `indexPath/_stream_batches`:
  *
  *  - `batch_id=N.committed` exists → the batch already applied fully;
  *    a redelivery SKIPS it (the restart-recovery path — Spark replays
  *    the last micro-batch after a crash-stop);
  *  - `batch_id=N.started` without `.committed` → a previous attempt
  *    died MID-APPEND and the index may hold a partial batch; the
  *    writer fails LOUDLY naming the rebuild remedy instead of
  *    double-appending (the append ops' documented no-retry contract —
  *    multi-directory parquet writes have no cross-directory
  *    transaction to roll back);
  *  - neither → append, then mark committed.
  *
  * The marker pair narrows the unsafe window to a crash between append
  * completion and the committed-marker write, which surfaces as the
  * loud partial-append failure — never as silent double counts. State
  * across restarts rides the stream checkpoint (offsets) plus the
  * markers (applied-batch set); both live outside the executors, so a
  * new cluster resumes correctly.
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
    val append: DataFrame => Unit = variant match {
      case "flat" => Ann.appendToIvfIndex(_, indexPath)
      case "sq8"  => Ann.appendToIvfIndexSq8(_, indexPath)
      case "pq"   => Ann.appendToIvfIndexPq(_, indexPath)
      case other  => throw new IllegalArgumentException(
        s"unknown IVF variant '$other' (flat | sq8 | pq)")
    }
    (batchDf, batchId) =>
      appliedOnce(batchDf.sparkSession, indexPath, batchId, "IVF") {
        if (!batchDf.isEmpty) append(batchDf)
      }
  }

  /** foreachBatch writer appending each (idCol, textCol) document
    * micro-batch to a persisted [[TextIndex.writeBm25Index]] layout:
    * only the batch tokenizes, only touched term buckets rewrite. */
  def bm25AppendBatch(indexPath: String, idCol: String,
                      textCol: String): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      appliedOnce(batchDf.sparkSession, indexPath, batchId, "BM25") {
        if (!batchDf.isEmpty)
          TextIndex.appendToBm25Index(batchDf, idCol, textCol, indexPath)
      }

  /** Run `append` exactly once per (indexPath, batchId): skip committed
    * replays, loudly refuse started-but-uncommitted ones. */
  private def appliedOnce(spark: SparkSession, indexPath: String,
                          batchId: Long, what: String)(append: => Unit): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$indexPath/_stream_batches")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val started = new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId.started")
    val committed = new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId.committed")
    if (fs.exists(committed)) return
    if (fs.exists(started))
      throw new IllegalStateException(
        s"$what index at $indexPath holds a PARTIAL append of stream batch " +
          s"$batchId (started marker without committed) — a previous attempt " +
          "died mid-append and the layout may be inconsistent; do not retry: " +
          "rebuild the index (or restore it from a snapshot), clear " +
          "_stream_batches, and restart the stream")
    fs.mkdirs(dir)
    fs.create(started, false).close()
    append
    fs.create(committed, false).close()
  }
}
