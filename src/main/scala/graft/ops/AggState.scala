package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted keyed additive aggregate state — incremental
  * materialized-view maintenance for the rollup tables a warehouse
  * serves (daily per-type counts/sums, per-key min/max watermarks).
  *
  * Aggregating 100 TB once is affordable; re-aggregating it on every
  * daily drop is not. The state here is MERGEABLE per key: counts and
  * decimal sums add, min/max fold — so absorbing a batch costs one
  * pass over the BATCH plus a rewrite of only the key-hash buckets the
  * batch touches. The aggregated corpus is never rescanned, and
  * untouched bucket directories are never read or written (the
  * [[TextIndex.appendToBm25Index]] posture for plain rollups).
  *
  * Sums are DECIMAL(38,6): decimal addition is associative, so the
  * absorbed state equals the one-shot aggregate EXACTLY regardless of
  * batch arrival order — double sums would drift by summation order
  * and break the absorb==one-shot contract (AggStateSpec pins it).
  *
  * Layout under `path`:
  *   state/kb=<bucket>/…  aggregate rows partitioned by key-hash bucket
  *   meta/                keys, value columns, bucket count
  * The path ROOT stays free for sibling metadata (RollupStream's
  * _stream_batches markers).
  *
  * The append is read-merge-overwrite on the touched buckets; it is
  * NOT atomic across buckets and NOT idempotent — do not blindly
  * retry a failed append: rebuild the state (or restore a snapshot).
  * Streamed absorption gets exactly-once via [[graft.streaming
  * .RollupStream]]'s per-batch markers.
  */
object AggState {

  private def stateDir(path: String) = s"$path/state"
  private def metaDir(path: String) = s"$path/meta"

  private def bucketOf(keys: Seq[String], nBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int")

  /** One pass over `df`: per-key additive measures for each value
    * column — (n_rows, <v>_cnt, <v>_sum DECIMAL(38,6), <v>_min,
    * <v>_max). Map-side partial aggregation; one shuffle on the keys. */
  private def aggregate(df: DataFrame, keys: Seq[String],
                        valueCols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ valueCols.flatMap { v =>
      Seq(count(col(v)).as(s"${v}_cnt"),
        sum(col(v).cast(DecimalType(38, 6))).cast(DecimalType(38, 6))
          .as(s"${v}_sum"),
        min(col(v)).as(s"${v}_min"), max(col(v)).as(s"${v}_max"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two aggregate frames with identical schemas: counts and
    * sums add, min/max fold. */
  private def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
                    valueCols: Seq[String]): DataFrame = {
    val aggs = Seq(sum(col("n_rows")).as("n_rows")) ++ valueCols.flatMap { v =>
      Seq(sum(col(s"${v}_cnt")).as(s"${v}_cnt"),
        sum(col(s"${v}_sum")).cast(DecimalType(38, 6)).as(s"${v}_sum"),
        min(col(s"${v}_min")).as(s"${v}_min"),
        max(col(s"${v}_max")).as(s"${v}_max"))
    }
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Seed the state at `path` from `df` (overwrite). `nBuckets` fixes
    * the key-hash partitioning for the state's lifetime — size it so
    * one bucket's aggregate rows fit an executor comfortably (buckets
    * hold KEYS, not rows: 4096 buckets cover billions of keys). */
  def writeAggState(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
                    path: String, nBuckets: Int = 64): Unit = {
    require(keys.nonEmpty, "aggregate state requires at least one key")
    require(valueCols.nonEmpty, "aggregate state requires at least one value column")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(keys.intersect(valueCols).isEmpty, "keys and valueCols must be disjoint")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = Reliable.checkpoint(
      aggregate(df, keys, valueCols).withColumn("kb", bucketOf(keys, nBuckets)))
    // a partitioned write of an EMPTY frame loses the schema (no
    // partition dirs to read back) — an empty seed writes meta only
    // (including the full state schema as JSON, so an empty-seeded
    // state is still READABLE), and the first non-empty append lays
    // the state down
    if (!agg.isEmpty)
      agg.write.partitionBy("kb").mode("overwrite").parquet(stateDir(path))
    // keys/value_cols persist as array<string> — a comma-joined string
    // would silently mis-split a column name containing ','
    Seq((keys, valueCols, nBuckets, agg.drop("kb").schema.json))
      .toDF("keys", "value_cols", "n_buckets", "state_schema")
      .coalesce(1).write.mode("overwrite").parquet(metaDir(path))
  }

  private case class Meta(keys: Seq[String], valueCols: Seq[String],
                          nBuckets: Int,
                          stateSchema: org.apache.spark.sql.types.StructType)

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val df = spark.read.parquet(metaDir(path))
    // format detection: the pre-array-meta layout stored keys/value_cols
    // as comma-joined strings and had no state_schema column — surface
    // a named, actionable error instead of an unresolved-column
    // AnalysisException deep inside a select
    val legacy = !df.columns.contains("state_schema") ||
      df.schema("keys").dataType == org.apache.spark.sql.types.StringType
    if (legacy) throw new IllegalStateException(
      s"agg state at $path was written by an older graft meta format " +
        "(comma-joined keys, no state_schema); re-seed it with " +
        "writeAggState from the source data — the meta format is not " +
        "auto-migrated because the old comma-split keys may be wrong " +
        "for column names containing ','")
    val m = df.select("keys", "value_cols", "n_buckets", "state_schema").first()
    Meta(m.getSeq[String](0), m.getSeq[String](1), m.getInt(2),
      org.apache.spark.sql.types.DataType.fromJson(m.getString(3))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Absorb a batch: one pass over the BATCH, then read ONLY the state
    * buckets whose keys the batch touches (partition-pruned scan),
    * merge additively, and dynamic-overwrite those buckets alone.
    * Cost is O(batch + touched buckets) at any corpus size. */
  def appendAggState(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val Meta(keys, valueCols, nBuckets, _) = readMeta(spark, path)
    val batchAgg = Reliable.checkpoint(
      aggregate(batch, keys, valueCols).withColumn("kb", bucketOf(keys, nBuckets)))
    // touched bucket ids collect to the driver (<= nBuckets ints — the
    // bounded-scalar-read exception, same as the BM25 append)
    val touched = batchAgg.select(col("kb")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    // an empty-seeded state has meta but no state dir yet — this first
    // non-empty batch lays it down
    val stateExists = new org.apache.hadoop.fs.Path(stateDir(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(stateDir(path)))
    if (!stateExists) {
      batchAgg.write.partitionBy("kb").mode("overwrite").parquet(stateDir(path))
      return
    }
    val existing = spark.read.parquet(stateDir(path))
      .filter(col("kb").isin(touched.map(Integer.valueOf): _*))
    val merged = Reliable.checkpoint(
      merge(existing.drop("kb"), batchAgg.drop("kb"), keys, valueCols)
        .withColumn("kb", bucketOf(keys, nBuckets)))
    Scale.withDynamicOverwrite(spark) {
      merged.write.partitionBy("kb").mode("overwrite").parquet(stateDir(path))
    }
  }

  /** Read the state as a rollup: keys + n_rows + per-value cnt/sum/
    * min/max/avg (avg derived as sum/cnt — DECIMAL(38,6)-exact). */
  def readAggState(spark: SparkSession, path: String): DataFrame = {
    val meta = readMeta(spark, path)
    val derived = meta.valueCols.map { v =>
      (col(s"${v}_sum") / col(s"${v}_cnt")).cast(DecimalType(38, 6)).as(s"${v}_avg")
    }
    // an empty-seeded state has meta but no state dir yet (the case
    // writeAggState documents) — read it as the EMPTY rollup with the
    // persisted schema, not a path-not-found failure
    val stateExists = new org.apache.hadoop.fs.Path(stateDir(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(stateDir(path)))
    val st =
      if (stateExists) spark.read.parquet(stateDir(path)).drop("kb")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        meta.stateSchema)
    st.select(st.columns.map(col) ++ derived: _*)
  }
}
