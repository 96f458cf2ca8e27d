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
  * Layout under `path` (manifest-versioned — [[StateStore]] /
  * [[IndexManifest]]): component `state` holds kb-partitioned segment
  * directories; component `meta` holds keys, value columns, bucket
  * count. An append writes the merged TOUCHED buckets as one NEW
  * segment and annotates the old segments' touched buckets out of the
  * logical view (the BM25-purge exclude posture — no stored file
  * moves), publishing ONE atomic manifest commit. Consequences the
  * r12 in-place layout could not offer: a reader pinned mid-append
  * sees fully-old state; a crash before the commit changes nothing,
  * so a failed append is SAFE TO RETRY BLINDLY; and the streamed twin
  * ([[graft.streaming.RollupStream]]) passes a `streamTag` through the
  * commit for idempotent-checkable retries. Superseded segments are
  * reclaimed by [[vacuumAggState]].
  */
object AggState {

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
    StateStore.seed(spark, path, "writeAggState")(
      // writeBucketed: an EMPTY seed writes unpartitioned, preserving
      // the schema, so an empty-seeded state reads back as the empty
      // rollup instead of a path failure
      "state" -> (d => IndexManifest.writeBucketed(agg, d, "kb")),
      // keys/value_cols persist as array<string> — a comma-joined
      // string would silently mis-split a column name containing ','
      "meta" -> (d => IndexManifest.writeSingleSegment(
        Seq((keys, valueCols, nBuckets, agg.drop("kb").schema.json))
          .toDF("keys", "value_cols", "n_buckets", "state_schema"),
        d, coalesce1 = true)))
  }

  private case class Meta(keys: Seq[String], valueCols: Seq[String],
                          nBuckets: Int,
                          stateSchema: org.apache.spark.sql.types.StructType)

  private def readMeta(spark: SparkSession,
                       snap: IndexManifest.Snapshot): Meta = {
    // one cached head-row read (meta is one immutable row) — the
    // readSingle(...).first() form re-collected it on every append and
    // read, one job each (r17 item 4)
    val m = snap.headRow(spark, "meta")
    val sch = m.schema
    // format detection: the pre-array-meta layout stored keys/value_cols
    // as comma-joined strings and had no state_schema column — surface
    // a named, actionable error instead of an unresolved-column
    // AnalysisException deep inside a select
    val legacy = !sch.fieldNames.contains("state_schema") ||
      sch("keys").dataType == org.apache.spark.sql.types.StringType
    if (legacy) throw new IllegalStateException(
      s"agg state at ${snap.root} was written by an older graft meta format " +
        "(comma-joined keys, no state_schema); re-seed it with " +
        "writeAggState from the source data — the meta format is not " +
        "auto-migrated because the old comma-split keys may be wrong " +
        "for column names containing ','")
    Meta(m.getSeq[String](sch.fieldIndex("keys")),
      m.getSeq[String](sch.fieldIndex("value_cols")),
      m.getInt(sch.fieldIndex("n_buckets")),
      org.apache.spark.sql.types.DataType.fromJson(
        m.getString(sch.fieldIndex("state_schema")))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Absorb a batch: one pass over the BATCH, then read ONLY the state
    * buckets whose keys the batch touches (partition-pruned scan
    * through the pinned snapshot), merge additively, and publish the
    * merged buckets as one NEW segment with the old segments' touched
    * buckets excluded — one atomic manifest commit; no stored file
    * moves. Cost is O(batch + touched buckets) at any corpus size. */
  def appendAggState(batch: DataFrame, path: String,
                     streamTag: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    StateStore.mutate(spark, path, "appendAggState", streamTag) { snap =>
      val Meta(keys, valueCols, nBuckets, _) = readMeta(spark, snap)
      val batchAgg = Reliable.checkpoint(
        aggregate(batch, keys, valueCols).withColumn("kb", bucketOf(keys, nBuckets)))
      // touched bucket ids collect to the driver (<= nBuckets ints —
      // the bounded-scalar-read exception, same as the BM25 append)
      val touched = batchAgg.select(col("kb")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) Map.empty
      else {
        val existing = snap.read(spark, "state", Some("kb")).get
          .filter(col("kb").isin(touched.map(Integer.valueOf): _*))
        // NOT checkpointed (r17 item 4): writeBucketed detects
        // emptiness from the written file set since r16, so the merge
        // plan runs exactly once — the old pre-probe was the reason a
        // checkpoint job sat between every append's merge and write
        val merged =
          merge(existing.drop("kb"), batchAgg.drop("kb"), keys, valueCols)
            .withColumn("kb", bucketOf(keys, nBuckets))
        val seg = IndexManifest.newSegment("state")
        IndexManifest.writeBucketed(merged, s"$path/$seg", "kb")
        // annotate the old segments; a fully-excluded segment (e.g. the
        // empty seed) drops so vacuum can reclaim it (shared seam)
        val olds = IndexManifest.excludeTouched(spark, path, snap,
          "state", "kb", touched.map(_.toLong).toSet)
        Map("state" -> (olds :+ IndexManifest.Segment(seg)))
      }
    }
  }

  /** Read the state as a rollup: keys + n_rows + per-value cnt/sum/
    * min/max/avg (avg derived as sum/cnt — DECIMAL(38,6)-exact). One
    * pin: meta and every state segment come from the same snapshot —
    * of the current version, or of an explicit earlier one (time
    * travel; valid until vacuum). */
  def readAggState(spark: SparkSession, path: String,
                   asOfVersion: Option[Long] = None): DataFrame = {
    val snap = StateStore.snapshot(spark, path, asOfVersion)
    val meta = readMeta(spark, snap)
    val derived = meta.valueCols.map { v =>
      (col(s"${v}_sum") / col(s"${v}_cnt")).cast(DecimalType(38, 6)).as(s"${v}_avg")
    }
    val st = snap.read(spark, "state", Some("kb")).map(_.drop("kb"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.stateSchema))
    st.select(st.columns.map(col) ++ derived: _*)
  }

  /** Reclaim superseded state segments and manifest versions
    * ([[StateStore.vacuum]]); callers own the reader-grace contract. */
  def vacuumAggState(spark: SparkSession, path: String,
                     keepVersions: Int = 1): Seq[String] =
    StateStore.vacuum(spark, path, "vacuumAggState", keepVersions)
}
