package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.Text
import graft.ops.{Curation, Dedup, Reliable, Scale}

/** Streaming curation (SURVEY §2.11 × §2.10): every per-row curation
  * signal — quality score, language id, repetition ratio, content-hash
  * split — is STATELESS, so the exact batch transform runs over a
  * readStream frame unchanged: score/route/redact documents as they
  * land instead of in a nightly pass. (Stateful curation — dedup
  * against history, contamination vs a benchmark — pairs this with
  * dropDuplicatesWithinWatermark / a broadcast benchmark set.)
  */
object CurationStream {

  /** doc frame (batch OR stream) → curated frame: quality + language +
    * repetition + split columns, filtered to the keepable band. Buckets
    * are fixed at 100 (percent grain) because the split thresholds are
    * percents — a configurable bucket count silently skews the
    * 90/5/5 split. */
  def curate(docs: DataFrame, textCol: Column,
             minQuality: Double = 0.2, maxDupRatio: Double = 0.5,
             trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val scored = Curation
      .withDupNgramRatio(docs, textCol, 5, "dup5_ratio")
      .withColumn("quality", Text.qualityScore(textCol))
      .withColumn("lang_pred", Text.langId(textCol))
      .withColumn("bucket", Curation.hashBucket(textCol, 100))
      .withColumn("split", Curation.splitLabel(col("bucket"), trainPct, valPct))
    scored.filter(col("quality") >= minQuality
      && col("dup5_ratio") <= maxDupRatio)
  }

  /** Stateful exact-dedup for a DOCUMENT stream — the streaming twin of
    * `Dedup.exactByHash` (VERDICT r2 item 8): key the state on the
    * 32-byte sha2 of the content (never the text itself — same shuffle
    * posture as batch), keep the first arrival per hash, and bound the
    * state store with an event-time watermark on `tsCol`: a duplicate
    * arriving within `lateness` of the original is dropped; state older
    * than the watermark is evicted, so re-crawls separated by more than
    * the lateness window re-admit one copy (the documented semantics of
    * `dropDuplicatesWithinWatermark` — unbounded-history dedup belongs
    * in the nightly batch pass over the accumulated corpus).
    *
    * Equivalence to batch (spec-asserted): for in-window duplicates,
    * stream output == `Dedup.exactByHash` with arrival-order tiebreak. */
  def dedupByContent(docs: DataFrame, textCol: Column, tsCol: String,
                     lateness: String): DataFrame =
    docs.withColumn("__h", sha2(textCol, 256))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Seed the curated-corpus + band-index layouts that [[refreshBatch]]
    * maintains, from an existing curated corpus: both land as
    * `batch_id=-1` partitions of the same batch_id-partitioned parquet
    * layout the stream appends to. Run once before starting the
    * stream; mode=overwrite, so re-seeding resets the whole layout. */
  def seedRefresh(corpus: DataFrame, idCol: String, textCol: String,
                  corpusPath: String, indexPath: String,
                  shingleSize: Int = 3, k: Int = 12, bandRows: Int = 2): Unit = {
    corpus.select(col(idCol), col(textCol))
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id").parquet(corpusPath)
    Dedup.bandIndex(corpus, idCol, textCol, shingleSize, k, bandRows)
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id").parquet(indexPath)
  }

  /** Continuous incremental corpus refresh — the streaming face of
    * [[Curation.refreshDispositions]], for use with `foreachBatch`
    * (e.g. via [[EventStream.incrementalWriter]]): each micro-batch is
    * gated by `lq`, probed against the STORED corpus band index, and
    * every doc's disposition lands under `dispPath`; accepted docs
    * append to the curated corpus (`corpusPath`) and their band rows to
    * the index (`indexPath`), so micro-batch N+1 deduplicates against
    * everything batch N accepted — the stream MAINTAINS the index it
    * probes, which is [[Dedup.bandIndex]]'s sign-once contract running
    * forever.
    *
    * Replay safety (foreachBatch delivery is at-least-once): all three
    * writes are partitioned by batch_id under dynamic partition
    * overwrite, so a replayed micro-batch REWRITES its own partitions
    * instead of appending duplicates — idempotent wherever directory
    * replacement is atomic (object-store caveat and the transactional
    * alternative: ops.MergeSink). Idempotent WRITES are not enough,
    * though: the corpus/index reads are restricted to partitions
    * `batch_id < batchId` (a pruning partition filter, so it is free),
    * because an unrestricted replay would see the batch's OWN
    * first-execution output — every accepted doc would match itself in
    * the index and flip to dup_corpus. With the restriction, a replay
    * reads exactly the state the original execution read, so the
    * dispositions are a pure function of (input, batchId, prior
    * batches). The dispositions frame is eagerly materialized BEFORE
    * the first write: it is derived from the very layouts being
    * written, and without the checkpoint the second consumer would
    * re-read a path mid-overwrite. */
  def refreshBatch(corpusPath: String, indexPath: String, dispPath: String,
                   idCol: String, textCol: String, lq: Column,
                   shingleSize: Int = 3, k: Int = 12, bandRows: Int = 2,
                   confirmThreshold: Double = 0.8): (DataFrame, Long) => Unit =
    // the shared StreamOnce markers on top of the per-partition
    // idempotence: a COMMITTED batch's redelivery now skips outright
    // (no rewrite racing an external reader of corpus/index), and the
    // one replay contract covers every stream in the library. retrySafe
    // without a commit tag is sound HERE because the apply is
    // idempotent by construction — a re-run writes the identical
    // dispositions/corpus/index partitions (a pure function of the
    // input batch and the prior partitions), so even the zombie window
    // the tagged sinks defend against degrades to a harmless rewrite.
    (batchDf, batchId) => StreamOnce.appliedOnce(batchDf.sparkSession,
      dispPath, batchId, "curation refresh", retrySafe = true) {
      val spark = batchDf.sparkSession
      def writeDyn(df: DataFrame, path: String): Unit =
        Scale.withDynamicOverwrite(spark) {
          df.write.mode("overwrite").partitionBy("batch_id").parquet(path)
        }
      val gated = batchDf.select(col(idCol), col(textCol))
        .withColumn("__lq", lq)
      def priorOnly(path: String): DataFrame =
        spark.read.parquet(path).filter(col("batch_id") < batchId)
      val disp = Reliable.checkpoint(
        Curation.refreshDispositions(gated, idCol, textCol, "__lq",
            priorOnly(corpusPath), priorOnly(indexPath),
            shingleSize, k, bandRows, confirmThreshold)
          .withColumn("batch_id", lit(batchId)))
      writeDyn(disp, dispPath)
      // accepted rows re-sign here (their dedup-stage signatures are
      // band-exploded, not reusable rows) — |accepted| ≤ |batch| work
      val accepted = gated
        .join(disp.filter(col("status") === "accepted").select(col(idCol)),
          Seq(idCol))
        .select(col(idCol), col(textCol))
      writeDyn(accepted.withColumn("batch_id", lit(batchId)), corpusPath)
      writeDyn(Dedup.bandIndex(accepted, idCol, textCol, shingleSize, k, bandRows)
        .withColumn("batch_id", lit(batchId)), indexPath)
    }
}
