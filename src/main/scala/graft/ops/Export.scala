package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-corpus export: deterministic sharding plus a fixity
  * manifest — the hand-off artifact between a curation pipeline and a
  * trainer. The trainer (and any later audit) must be able to answer
  * "did I read exactly what was exported?" without trusting transport:
  * per-shard document/token counts and an order-independent content
  * checksum, recomputable from the shard bytes alone.
  *
  * Scale posture: shard assignment is a per-row content hash
  * ([[Curation.hashBucket]] — deterministic across runs/retries, no
  * rand(), no global sort), so the write is one shuffle partitioned by
  * shard; the manifest is one map-side-combined aggregate of
  * fixed-width facts. Checksums sum per-doc md5 prefixes into
  * DECIMAL(38,0) — associative and overflow-free, so manifest
  * verification can itself run incrementally or distributed.
  *
  * Layout under `path`:
  *   shards/shard=<k>/…  the corpus rows, id-sorted within files
  *   manifest/           one row per shard + facts
  */
object Export {

  private def shardsDir(path: String) = s"$path/shards"
  private def manifestDir(path: String) = s"$path/manifest"

  /** Per-doc fixity term: the first 15 hex digits of md5(text) as a
    * number — summed per shard it forms an order-independent checksum
    * (any flipped/lost/duplicated document changes the sum). */
  private def docChecksum(text: org.apache.spark.sql.Column) =
    conv(substring(md5(text), 1, 15), 16, 10).cast(DecimalType(38, 0))

  private def shardFacts(rows: DataFrame): DataFrame =
    rows.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.expr.Text.tokenCount(col("__text")).cast("long")).as("n_tokens"),
        sum(length(col("__text")).cast("long")).as("n_chars"),
        sum(docChecksum(col("__text"))).cast(DecimalType(38, 0)).as("checksum"))

  /** Export `df` as `nShards` deterministic shards + manifest.
    * Every column of `df` is carried into the shard files; `textCol`
    * drives token counts and checksums, `idCol` the shard assignment
    * and the reproducible within-file order. */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
                  path: String, nShards: Int): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val rows = df
      .withColumn("shard",
        Curation.hashBucket(col(idCol).cast("string"), nShards).cast("int"))
    rows
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(shardsDir(path))
    // the manifest is computed from the WRITTEN files, never by
    // re-evaluating the input plan (the writeBm25Index posture): a
    // nondeterministic upstream (sample, rand-derived column, source
    // mutated between actions) would otherwise produce a manifest that
    // disagrees with the shards it claims to describe — and the
    // read-back is also cheaper than a second full input evaluation
    shardFacts(df.sparkSession.read.parquet(shardsDir(path))
        .withColumn("__text", col(textCol)))
      .coalesce(1).write.mode("overwrite").parquet(manifestDir(path))
  }

  /** The stored manifest: (shard, n_docs, n_tokens, n_chars, checksum). */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(manifestDir(path))

  /** Fixity check: recompute every shard's facts FROM THE SHARD BYTES
    * and compare with the stored manifest — (shard, ok, plus both
    * sides' counts) with ok=false on any divergence, missing shard, or
    * unmanifested shard. One scan of the export; at 100 TB run it
    * shard-parallel exactly as written (the facts aggregate
    * map-side). */
  def validateShards(spark: SparkSession, path: String,
                     textCol: String): DataFrame = {
    val actual = shardFacts(
      spark.read.parquet(shardsDir(path)).withColumn("__text", col(textCol)))
    val m = readManifest(spark, path)
    m.select(col("shard"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("checksum"))
      .join(actual.select(col("shard"), col("n_docs").as("actual_docs"),
        col("n_tokens").as("actual_tokens"), col("n_chars").as("actual_chars"),
        col("checksum").as("actual_checksum")), Seq("shard"), "full_outer")
      .withColumn("ok",
        col("n_docs") === col("actual_docs") &&
          col("n_tokens") === col("actual_tokens") &&
          col("n_chars") === col("actual_chars") &&
          col("checksum") === col("actual_checksum"))
      .withColumn("ok", coalesce(col("ok"), lit(false)))
  }
}
