package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit StructTypes for every table the engine touches.
  *
  * Two families (see /root/repo/FIXTURES.md):
  *  - A: driver-generated parquet fixtures under /root/testdata/sf*
  *    (parquet carries its own schema; these are documented expectations
  *    used by tests to assert fixture shape).
  *  - B: reference-shaped tables (schemas inferred from the SELECT /
  *    INSERT column lists of the reference, cited per field group) used
  *    by the pipeline replay tests and by the JDBC-source path at scale.
  *
  * The reference relies on MySQL DDL that is not in its repo; schemas are
  * derived from column lists, e.g. Bifrost.py:89, Stellar.py:30-33,
  * Hydration.py:124-126. Never rely on inference for JDBC-shaped tables.
  */
object Schemas {

  // ---- family B: reference source tables (remote DB) ----

  /** Bifrost.py:35, Bifrost.py:89 */
  val bifrostSite: StructType = StructType(Seq(
    StructField("batch_id", LongType),
    StructField("Asset", StringType),
    StructField("Value", DoubleType),
    StructField("tvl", DoubleType),
    StructField("tvm", DoubleType),
    StructField("holders", LongType),
    StructField("apy", DoubleType),
    StructField("apyBase", DoubleType),
    StructField("apyReward", DoubleType),
    StructField("totalIssuance", LongType),
    StructField("created_at", TimestampType),
  ))

  /** Bifrost.py:211 */
  val bifrostStaking: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("contractAddress", StringType),
    StructField("apr", DoubleType),
    StructField("fee", DoubleType),
    StructField("price", DoubleType),
    StructField("exchangeRatio", DoubleType),
    StructField("supply", LongType),
    StructField("created_at", TimestampType),
  ))

  /** Hydration.py:31 */
  val hydrationPrice: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("batch_id", LongType),
    StructField("asset_id", StringType),
    StructField("symbol", StringType),
    StructField("price_usdt", DecimalType(38, 18)),
    StructField("created_at", TimestampType),
  ))

  /** Hydration.py:124-126 */
  val hydrationData: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("batch_id", LongType),
    StructField("asset_id", StringType),
    StructField("symbol", StringType),
    StructField("farm_apr", DoubleType),
    StructField("pool_apr", DoubleType),
    StructField("total_apr", DoubleType),
    StructField("tvl_usd", DoubleType),
    StructField("volume_usd", DoubleType),
    StructField("timestamp", TimestampType),
    StructField("created_at", TimestampType),
  ))

  /** Stellar.py:30-33; sqrt_price is Uniswap-V3 Q64.96 (utils.py:130-148) */
  val poolData: StructType = StructType(Seq(
    StructField("token0_id", StringType),
    StructField("token0_symbol", StringType),
    StructField("token0_name", StringType),
    StructField("token0_decimals", IntegerType),
    StructField("token1_id", StringType),
    StructField("token1_symbol", StringType),
    StructField("token1_name", StringType),
    StructField("token1_decimals", IntegerType),
    StructField("volume_usd_current", DoubleType),
    StructField("pool_id", StringType),
    StructField("tx_count", LongType),
    StructField("amount_token0", DecimalType(38, 0)),
    StructField("amount_token1", DecimalType(38, 0)),
    StructField("sqrt_price", DecimalType(38, 0)),
    StructField("final_apr", DoubleType),
    StructField("created_at", TimestampType),
  ))

  // ---- family B: warehouse tables (local DB) ----

  /** SqlDbEtl.py:159-167; natural key: name */
  val dimChains: StructType = StructType(Seq(
    StructField("chain_id", IntegerType),
    StructField("name", StringType),
    StructField("updated_at", TimestampType),
  ))

  /** Bifrost.py:116-130; natural key: (chain_id, address), surrogate id */
  val dimTokens: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("chain_id", IntegerType),
    StructField("address", StringType),
    StructField("symbol", StringType),
    StructField("name", StringType),
    StructField("decimals", IntegerType),
    StructField("asset_type_id", IntegerType),
    StructField("updated_at", TimestampType),
  ))

  /** Stellar.py:138-148 (widest insert); key (token_id, date) */
  val factTokenDailyStats: StructType = StructType(Seq(
    StructField("token_id", LongType),
    StructField("date", DateType),
    StructField("volume", DoubleType),
    StructField("volume_usd", DoubleType),
    StructField("volume_yoy", DoubleType),
    StructField("volume_qoq", DoubleType),
    StructField("txns_count", LongType),
    StructField("txns_yoy", DoubleType),
    StructField("txns_qoq", DoubleType),
    StructField("price_usd", DecimalType(38, 18)),
    StructField("created_at", TimestampType),
  ))

  /** Bifrost.py:172-180; key (token_id, pool_address, date) per Bifrost.py:168 */
  val factYieldStats: StructType = StructType(Seq(
    StructField("token_id", LongType),
    StructField("return_type_id", IntegerType),
    StructField("pool_address", StringType),
    StructField("date", DateType),
    StructField("apy", DecimalType(10, 2)),
    StructField("tvl", DoubleType),
    StructField("tvl_usd", DoubleType),
    StructField("created_at", TimestampType),
  ))

  /** SqlDbEtl.py:23-28 (in-code DDL) */
  val etlControl: StructType = StructType(Seq(
    StructField("task_name", StringType),
    StructField("last_run", TimestampType),
  ))
}

/** Fixture-table loader: one parquet file per table under a sf dir. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    // rejects; read nanos as long and convert (fixture nanos are all
    // whole microseconds, so the truncating div is exact).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
