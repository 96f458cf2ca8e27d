package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.pipeline.{Stellar, Warehouse}
import graft.schema.Tables

/** End-to-end pipeline queries: the full Stellar task DAG (SURVEY §3.3,
  * the reference's richest pipeline) over reference-shaped inputs
  * synthesized deterministically from the `part` fixture, verified
  * against a DuckDB restatement of the same loop semantics. This is the
  * flagship correctness artifact: scan → filters → broadcast dim join →
  * latest-price top-1 → APY/TVL derivation → token0/token1 unpivot →
  * first-seen dedup → surrogate-id dim upsert → keyed merges.
  */
object PipelineQueries {

  /** pool_data synthesized from part (column expressions mirrored in the
    * oracle CTE verbatim). pool_id carries p_partkey so the first-seen
    * dedup order (created_at, pool_id, side) is total (SURVEY §7.7 #4). */
  private def synthPool(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part").select(
      concat(lit("T0_"), col("p_brand")).as("token0_id"),
      col("p_brand").as("token0_symbol"),
      col("p_brand").as("token0_name"),
      (col("p_size") % 6 + 10).as("token0_decimals"),
      concat(lit("T1_"), col("p_type")).as("token1_id"),
      col("p_type").as("token1_symbol"),
      col("p_type").as("token1_name"),
      (col("p_size") % 5 + 6).as("token1_decimals"),
      col("p_retailprice").cast("double").as("volume_usd_current"),
      concat(col("p_brand"), lit("/"), col("p_type"), lit("/"), col("p_partkey"))
        .as("pool_id"),
      col("p_size").cast("long").as("tx_count"),
      (col("p_partkey") * 1000).cast(DecimalType(38, 0)).as("amount_token0"),
      (col("p_partkey") * 2000).cast(DecimalType(38, 0)).as("amount_token1"),
      (col("p_retailprice") * lit(1.0e6)).cast(DecimalType(38, 0)).as("sqrt_price"),
      (col("p_size") % 10).cast("double").as("final_apr"),
      (lit("2025-05-01 00:00:00").cast("timestamp") +
        expr("make_interval(0, 0, 0, 0, p_partkey % 72, 0, 0)")).as("created_at"))

  /** Hydration_price synthesized for even p_size brands only, so odd
    * brands exercise the 1.0-default fallback. */
  private def synthPrice(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .filter(col("p_size") % 2 === 0)
      .select(
        col("p_partkey").as("id"),
        lit(0L).as("batch_id"),
        concat(lit("a"), col("p_partkey")).as("asset_id"),
        col("p_brand").as("symbol"),
        (col("p_size") % 7 + 1).cast(DecimalType(38, 18)).as("price_usdt"),
        (lit("2025-04-01 00:00:00").cast("timestamp") +
          expr("make_interval(0, 0, 0, 0, 0, 0, p_partkey)")).as("created_at"))

  // q_stellar_daily and q_stellar_yield are two sinks of ONE pipeline
  // run — memoize the Warehouse per (session, dir) and persist the two
  // small fact frames so the shared lineage computes once (the batch
  // analogue of a pipeline writing both tables in one pass).
  private val whCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Warehouse]()

  private def runStellar(s: SparkSession, dir: String): Warehouse =
    whCache.computeIfAbsent((s, dir), _ => {
      val wh = Stellar.run(synthPool(s, dir), synthPrice(s, dir),
        Warehouse.withChains(s, Seq((7, "stellaswap"))))
      wh.copy(
        factTokenDailyStats = wh.factTokenDailyStats.persist(),
        factYieldStats = wh.factYieldStats.persist())
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_stellar_daily" -> ((s, dir) => {
      runStellar(s, dir).factTokenDailyStats.select(
        col("token_id"), col("date").cast("timestamp").as("date"),
        col("volume"), col("volume_usd"), col("volume_yoy"),
        col("txns_count"),
        col("price_usd").cast("double").as("price_usd"),
        col("created_at"))
        .orderBy(col("token_id"))
    }),

    "q_stellar_yield" -> ((s, dir) => {
      runStellar(s, dir).factYieldStats.select(
        col("token_id"), col("pool_address"),
        col("date").cast("timestamp").as("date"),
        col("apy").cast("double").as("apy"),
        col("tvl"), col("tvl_usd"), col("created_at"))
        .orderBy(col("token_id"))
    }),
  )

  /** Shared oracle CTEs: the Stellar loop semantics restated in SQL. */
  private val stellarCtes =
    """WITH pool AS (
      |  SELECT 'T0_' || p_brand AS token0_id, p_brand AS token0_symbol,
      |    p_size % 6 + 10 AS token0_decimals,
      |    'T1_' || p_type AS token1_id, p_type AS token1_symbol,
      |    p_size % 5 + 6 AS token1_decimals,
      |    CAST(p_retailprice AS DOUBLE) AS volume_usd_current,
      |    p_brand || '/' || p_type || '/' || p_partkey AS pool_id,
      |    CAST(p_size AS BIGINT) AS tx_count,
      |    CAST(p_partkey * 1000 AS DECIMAL(38,0)) AS amount_token0,
      |    CAST(p_partkey * 2000 AS DECIMAL(38,0)) AS amount_token1,
      |    CAST(p_retailprice * 1e6 AS DECIMAL(38,0)) AS sqrt_price,
      |    CAST(p_size % 10 AS DOUBLE) AS final_apr,
      |    TIMESTAMP '2025-05-01 00:00:00' + INTERVAL 1 HOUR * (p_partkey % 72) AS created_at
      |  FROM part),
      |price AS (
      |  SELECT p_partkey AS id, p_brand AS symbol,
      |    CAST(p_size % 7 + 1 AS DOUBLE) AS price_usdt,
      |    TIMESTAMP '2025-04-01 00:00:00' + INTERVAL 1 SECOND * p_partkey AS created_at
      |  FROM part WHERE p_size % 2 = 0),
      |latest AS (
      |  SELECT symbol, price_usdt FROM price
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY created_at DESC, id DESC) = 1),
      |enriched AS (
      |  SELECT p.*, COALESCE(l.price_usdt, 1.0) AS token0_usd,
      |    CASE WHEN final_apr IS NULL OR final_apr = 0 THEN 0.0
      |      ELSE ROUND(LEAST((POW(1.0 + final_apr / 100 / 365.0, 365.0) - 1.0) * 100,
      |                       99999999.99), 2) END AS apy,
      |    CAST(amount_token0 AS DOUBLE) / POW(10.0, token0_decimals)
      |      + CAST(amount_token1 AS DOUBLE) / POW(10.0, token1_decimals)
      |        * CAST(sqrt_price AS DOUBLE) AS tvl
      |  FROM pool p LEFT JOIN latest l ON l.symbol = p.token0_symbol),
      |unpivoted AS (
      |  SELECT 0 AS side, token0_id AS address, token0_symbol AS symbol,
      |    volume_usd_current, pool_id, tx_count, apy, tvl, token0_usd,
      |    created_at, CAST(created_at AS DATE) AS date
      |  FROM enriched
      |  UNION ALL
      |  SELECT 1, token1_id, token1_symbol, volume_usd_current, pool_id,
      |    tx_count, apy, tvl, token0_usd, created_at, CAST(created_at AS DATE)
      |  FROM enriched),
      |firstseen AS (
      |  SELECT * FROM unpivoted WHERE address IS NOT NULL AND address <> ''
      |  QUALIFY ROW_NUMBER() OVER (
      |    PARTITION BY address ORDER BY created_at, pool_id, side) = 1),
      |dim AS (
      |  SELECT address, ROW_NUMBER() OVER (ORDER BY address) AS token_id
      |  FROM firstseen),
      |keyed AS (
      |  SELECT d.token_id, f.* FROM firstseen f JOIN dim d ON d.address = f.address)
      |""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q_stellar_daily" -> (stellarCtes +
      """SELECT token_id, CAST(date AS TIMESTAMP) AS date,
        |  volume_usd_current AS volume, volume_usd_current AS volume_usd,
        |  CAST(NULL AS DOUBLE) AS volume_yoy, tx_count AS txns_count,
        |  token0_usd AS price_usd, created_at
        |FROM keyed ORDER BY token_id""".stripMargin),

    "q_stellar_yield" -> (stellarCtes +
      """SELECT token_id, pool_id AS pool_address,
        |  CAST(date AS TIMESTAMP) AS date, apy, tvl, tvl AS tvl_usd, created_at
        |FROM keyed ORDER BY token_id""".stripMargin),
  )
}
