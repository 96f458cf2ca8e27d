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
    * repetition + split columns, filtered to the keepable band. */
  def curate(docs: DataFrame, textCol: Column,
             minQuality: Double = 0.2, maxDupRatio: Double = 0.5,
             nBuckets: Int = 100): DataFrame = {
    val scored = Curation
      .withDupNgramRatio(docs, textCol, 5, "dup5_ratio")
      .withColumn("quality", Text.qualityScore(textCol))
      .withColumn("lang_pred", Text.langId(textCol))
      .withColumn("bucket", Curation.hashBucket(textCol, nBuckets))
      .withColumn("split", Curation.splitLabel(col("bucket"), 90, 5))
    scored.filter(col("quality") >= minQuality
      && col("dup5_ratio") <= maxDupRatio)
  }
}
