package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** The reference's local-MySQL star schema as a value: dims + facts
  * (SURVEY §1.1 family B). Pipelines are pure Warehouse => Warehouse
  * functions — no I/O inside; callers persist however they like
  * (parquet rewrite per date partition, Delta MERGE, …).
  */
case class Warehouse(dimChains: DataFrame, dimTokens: DataFrame,
                     factTokenDailyStats: DataFrame, factYieldStats: DataFrame)

object Warehouse {

  def empty(spark: SparkSession): Warehouse = {
    def e(s: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    Warehouse(e(Schemas.dimChains), e(Schemas.dimTokens),
      e(Schemas.factTokenDailyStats), e(Schemas.factYieldStats))
  }

  /** Truncate lineage after a task/batch: chaining many task DAGs over
    * one warehouse value grows the logical plan multiplicatively and
    * Catalyst re-optimizes the whole history on every action. In
    * production each batch ends with a write to storage (which cuts
    * lineage naturally — see ops.Scale.writeDatePartitioned); for
    * in-memory chaining, [[graft.ops.Reliable.checkpoint]] gives the
    * same cut (reliable when a checkpoint dir is configured, local
    * otherwise). */
  def materialize(wh: Warehouse): Warehouse =
    Warehouse(
      graft.ops.Reliable.checkpoint(wh.dimChains),
      graft.ops.Reliable.checkpoint(wh.dimTokens),
      graft.ops.Reliable.checkpoint(wh.factTokenDailyStats),
      graft.ops.Reliable.checkpoint(wh.factYieldStats))

  /** Seed chains like the reference's dim_chains refresh (SqlDbEtl.py:159-167). */
  def withChains(spark: SparkSession, chains: Seq[(Int, String)]): Warehouse = {
    import spark.implicits._
    val w = empty(spark)
    val df = chains.map { case (id, n) => (id, n, java.sql.Timestamp.valueOf("2025-05-01 00:00:00")) }
      .toDF("chain_id", "name", "updated_at")
    w.copy(dimChains = df)
  }

  /** dim_chains incremental refresh — SqlDbEtl.py:131-169: every
    * DISTINCT chain name seen in the watermark slice touches its
    * existing dim row (`updated_at = NOW()` via `ON DUPLICATE KEY
    * UPDATE`); names with no dim row are NOT inserted — the reference
    * logs a warning and skips, so here they land in a side output
    * instead of vanishing into a log file. Returns (refreshed dim,
    * unknown names). */
  def refreshChains(sliceNames: DataFrame, dimChains: DataFrame,
                    batchTs: Column): (DataFrame, DataFrame) = {
    val names = sliceNames.select(col("name")).distinct()
    val unknown = names.join(dimChains, Seq("name"), "left_anti")
    val refreshed = dimChains
      .join(names.withColumn("__touched", lit(1)), Seq("name"), "left")
      .withColumn("updated_at",
        when(col("__touched").isNotNull, batchTs).otherwise(col("updated_at")))
      .drop("__touched")
      .select(dimChains.columns.map(col): _*)
    (refreshed, unknown)
  }

  /** SCD-1 dim_tokens upsert with surrogate-id assignment — the
    * set-oriented equivalent of the reference's per-row
    * `INSERT … ON DUPLICATE KEY UPDATE` + id readback (U1+J2;
    * Bifrost.py:116-130). `incoming` columns: chain_id, address, symbol,
    * name, decimals, asset_type_id — unique per (chain_id, address)
    * (callers dedupe first with the task's arrival-order policy).
    *
    * Existing natural keys keep their surrogate id and update the
    * attribute columns; new keys get ids maxId+1.. in (chain_id,
    * address) order — deterministic, unlike AUTO_INCREMENT under
    * concurrency. Id numbering is two-phase (ops.Scale.zipWithOrderedIndex:
    * range-partitioned sort + per-partition counts + offset cumsum), so a
    * dim BACKFILL with millions of new keys numbers in parallel instead
    * of funnelling through a single-partition global window (VERDICT r1
    * item 4); at steady state the frame is ~0 rows and the extra count
    * job is noise.
    */
  def upsertDimTokens(dim: DataFrame, incoming: DataFrame, batchTs: Column): DataFrame = {
    val keys = Seq("chain_id", "address")
    val in = incoming.select(
      col("chain_id"), col("address"), col("symbol"), col("name"),
      col("decimals"), col("asset_type_id"))

    val matched = in.join(dim.select(col("chain_id"), col("address"), col("id")),
      keys, "inner")
    val fresh = in.join(dim.select(col("chain_id"), col("address")), keys, "left_anti")

    val maxId = dim.agg(coalesce(max(col("id")), lit(0L)).as("__max"))
    val freshWithIds = graft.ops.Scale
      .zipWithOrderedIndex(fresh, Seq(col("chain_id"), col("address")), "__idx")
      .crossJoin(broadcast(maxId))
      .withColumn("id", col("__max") + col("__idx") + 1)
      .drop("__max", "__idx")

    val updatedOrNew = matched.unionByName(freshWithIds)
      .withColumn("updated_at", batchTs)
      .select(dim.columns.map(col): _*)

    // (USING-column joins reorder key columns first; restore dim order)
    val untouched = dim.join(in.select(keys.map(col): _*), keys, "left_anti")
      .select(dim.columns.map(col): _*)
    untouched.unionByName(updatedOrNew)
  }
}
