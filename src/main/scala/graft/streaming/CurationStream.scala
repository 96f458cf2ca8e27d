package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.Text
import graft.ops.Curation

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
}
