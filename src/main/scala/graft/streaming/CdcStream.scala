package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Merge, Reliable, Scale}

/** Streamed change-data-capture — the `foreachBatch` face of
  * [[Merge.snapshotDiff]] / [[Merge.applyDiff]]: an UPSERT stream (new
  * row images, plus optional tombstone rows for deletes) maintains a
  * persisted keyed snapshot AND an append-only change log, so every
  * downstream consumer reads deltas (`batch_id`-stamped
  * insert/update/delete rows with before/after images) instead of
  * re-diffing snapshots. The batch/stream pair is closed by the replay
  * theorem: folding [[Merge.applyDiff]] over the log in `batch_id`
  * order reconstructs the state exactly (StreamingCdcSpec).
  *
  * Per micro-batch cost is change-sized: the diff joins the batch
  * against the key-RESTRICTED state (`state ⋉ batch-keys` — a
  * broadcastable semi join at daily-delta scale), never state × state.
  * One snapshotDiff classifies everything: a tombstoned key present in
  * state diffs to a `delete` row (it is in the restricted state but
  * absent from the upsert side); a tombstone for an unknown key is a
  * no-op.
  *
  * Batches must be unique per key ([[graft.ops.Dedup.firstSeen]]
  * upstream — the same contract as [[Merge.upsert]]). Exactly-once:
  * the log append and state rewrite are non-atomic parquet writes, so
  * each batch stages [[StreamOnce]] markers under
  * `logPath/_stream_batches` — committed replays skip, a
  * started-without-committed marker fails loudly naming the remedy. */
object CdcStream {

  /** foreachBatch writer. `tombstoneCol`, when set, names a boolean
    * column on the stream: true rows are delete requests (their other
    * non-key columns are ignored); the column is stripped before
    * diffing. State lives at `statePath` (keyed parquet snapshot, the
    * schema of the stream minus the tombstone column); the change log
    * appends to `logPath` with snapshotDiff's schema + `batch_id`. */
  def changeLogBatch(statePath: String, logPath: String, keys: Seq[String],
                     tombstoneCol: Option[String] = None)
      : (DataFrame, Long) => Unit = (batchDf, batchId) =>
    StreamOnce.appliedOnce(batchDf.sparkSession, logPath, batchId, "CDC") {
      if (!batchDf.isEmpty) {
        val spark = batchDf.sparkSession
        val incoming = Reliable.checkpoint(batchDf)
        val ups = tombstoneCol.map(t =>
          incoming.filter(!coalesce(col(t), lit(false))).drop(t))
          .getOrElse(incoming)
        val batchKeys = incoming.select(keys.map(col): _*).distinct()
        val (fs, root) = Scale.resolve(spark, statePath)
        val state =
          if (fs.exists(root)) spark.read.parquet(statePath)
          else ups.filter(lit(false))
        val touched = state.join(batchKeys, keys, "left_semi")
        val diff = Reliable.checkpoint(
          Merge.snapshotDiff(touched, ups, keys))
        diff.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(logPath)
        val newState = Reliable.checkpoint(Merge.applyDiff(state, diff, keys))
        newState.write.mode("overwrite").parquet(statePath)
      }
    }
}

/** Exactly-once markers for non-idempotent multi-write foreachBatch
  * writers (shared by [[IndexStream]] and [[CdcStream]]): `foreachBatch`
  * delivery is at-least-once, so each writer stages per-batch markers
  * under `path/_stream_batches` —
  *
  *  - `batch_id=N.committed` exists → the batch already applied fully;
  *    a redelivery SKIPS it (the restart-recovery path);
  *  - `batch_id=N.started` without `.committed` → a previous attempt
  *    died MID-WRITE and the layout may be inconsistent; fail LOUDLY
  *    naming the rebuild remedy instead of double-applying;
  *  - neither → apply, then mark committed.
  *
  * The marker pair narrows the unsafe window to a crash between apply
  * completion and the committed-marker write, which surfaces as the
  * loud partial failure — never as silent double counts. */
object StreamOnce {

  /** True when `batchId` already committed at `path` — lets a writer
    * skip a redelivered batch BEFORE paying any batch materialization
    * (checkpoint, validation scans); `appliedOnce` re-checks under its
    * own marker protocol either way. */
  def isCommitted(spark: SparkSession, path: String, batchId: Long): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_stream_batches")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId.committed"))
  }

  /** `retrySafe = true` is for sinks whose apply publishes ATOMICALLY
    * (the manifest-versioned index layouts and [[graft.ops.StateStore]]
    * state layouts: a crash before the manifest commit changed
    * nothing) AND is itself idempotent-CHECKABLE: the apply records a
    * per-batch tag inside its atomic commit and, under the layout's
    * writer lock, skips when the tag is already committed
    * ([[IndexStream]], [[ProfileStream]] and [[RollupStream]] pass
    * `stream-batch-N` through the appends' `streamTag`). A stale started-without-committed marker from a
    * crashed attempt is then cleared and the batch re-APPLIED — where
    * "re-applied" cannot double-count, whatever the prior attempt
    * reached:
    *
    *  - died before its manifest commit → no tag, the retry appends;
    *  - committed but died before its committed marker (the window the
    *    marker protocol alone cannot close) → the tag is committed, the
    *    retry's apply no-ops under the lock and only the marker lands;
    *  - a ZOMBIE (partitioned, not crashed) still mid-apply → it holds
    *    the writer lock, the retry refuses loudly;
    *  - a zombie that would commit after the retry's tag check → its
    *    manifest base is stale and its commit collides loudly.
    *
    * The committed marker is additionally re-checked after clearing the
    * stale started marker, as the cheap fast path. */
  def appliedOnce(spark: SparkSession, path: String,
                  batchId: Long, what: String,
                  retrySafe: Boolean = false)(apply: => Unit): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_stream_batches")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val started = new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId.started")
    val committed = new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId.committed")
    if (fs.exists(committed)) return
    if (fs.exists(started)) {
      if (!retrySafe)
        throw new IllegalStateException(
          s"$what state at $path holds a PARTIAL apply of stream batch " +
            s"$batchId (started marker without committed) — a previous attempt " +
            "died mid-write and the layout may be inconsistent; do not retry: " +
            "rebuild the state (or restore it from a snapshot), clear " +
            "_stream_batches, and restart the stream")
      fs.delete(started, false) // crashed attempt published nothing
      if (fs.exists(committed)) return // a zombie attempt just finished
    }
    fs.mkdirs(dir)
    fs.create(started, false).close()
    apply
    fs.create(committed, false).close()
  }
}
