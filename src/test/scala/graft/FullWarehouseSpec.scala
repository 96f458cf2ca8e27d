package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.{Stellar, Tasks, Warehouse}

/** The reference's full job graph (main.py:40-50): all five tasks run
  * against ONE shared warehouse — dims accumulate across chains, later
  * tasks see earlier tasks' rows, and cross-task merge interactions
  * (staking price_usd surviving a site replay, per-task update-column
  * sets) behave like the sequential MySQL upserts they replace. */
class FullWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("five tasks compose over one warehouse; dims accumulate; updates stay scoped") {
    var wh = Warehouse.withChains(spark,
      Seq((4, "Bifrost"), (3, "Hydration"), (7, "stellaswap")))

    // 1. Bifrost site: creates vDOT with apy/tvl in yield, zeroed daily
    wh = Warehouse.materialize(Tasks.bifrostSite(Seq(
      (1L, "vDOT", 0.0, 1000.0, 0.0, 10L, 12.5, 0.0, 0.0, 0L, ts("2025-05-01 01:00:00"))
    ).toDF("batch_id", "Asset", "Value", "tvl", "tvm", "holders", "apy",
      "apyBase", "apyReward", "totalIssuance", "created_at"), wh))

    // 2. Bifrost staking: same chain+address (vDOT) -> same token id;
    //    writes price_usd into the SAME daily row (update-col scoping)
    wh = Warehouse.materialize(Tasks.bifrostStaking(Seq(
      ("vDOT", "0xabc", 5.0, 0.1, 4.0, 1.25, 1000L, ts("2025-05-01 01:10:00"))
    ).toDF("symbol", "contractAddress", "apr", "fee", "price", "exchangeRatio",
      "supply", "created_at"), wh))

    // 3. Hydration price: different chain -> NEW token even for same symbol
    wh = Warehouse.materialize(Tasks.hydrationPrice(Seq(
      (1L, 1L, "a1", "vDOT", new java.math.BigDecimal("3.5"), ts("2025-05-01 01:20:00"))
    ).toDF("id", "batch_id", "asset_id", "symbol", "price_usdt", "created_at")
      .withColumn("price_usdt", col("price_usdt").cast("decimal(38,18)")), wh))

    // 4. Hydration data: volume into the Hydration-chain token's daily row
    wh = Warehouse.materialize(Tasks.hydrationData(Seq(
      (2L, 1L, "a1", "vDOT", 0.0, 0.0, 20.0, 6000.0, 300.0,
        ts("2025-05-01 01:30:00"), ts("2025-05-01 01:30:00"))
    ).toDF("id", "batch_id", "asset_id", "symbol", "farm_apr", "pool_apr",
      "total_apr", "tvl_usd", "volume_usd", "timestamp", "created_at"), wh))

    // 5. Stellar: two more tokens on the stellaswap chain
    val q96 = java.math.BigInteger.ONE.shiftLeft(96).toString
    wh = Warehouse.materialize(Stellar.run(Seq(
      ("g1", "GLMR", "Glimmer", 18, "u1", "USDC", "USD Coin", 6,
        500.0, "p1", 9L, q96, q96, q96, 7.3, ts("2025-05-01 01:40:00"))
    ).toDF("token0_id", "token0_symbol", "token0_name", "token0_decimals",
      "token1_id", "token1_symbol", "token1_name", "token1_decimals",
      "volume_usd_current", "pool_id", "tx_count", "amount_token0",
      "amount_token1", "sqrt_price", "final_apr", "created_at")
      .withColumn("amount_token0", col("amount_token0").cast("decimal(38,0)"))
      .withColumn("amount_token1", col("amount_token1").cast("decimal(38,0)"))
      .withColumn("sqrt_price", col("sqrt_price").cast("decimal(38,0)")),
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.schema.Schemas.hydrationPrice), wh))

    // dims: vDOT@Bifrost, vDOT@Hydration, g1+u1@stellaswap = 4 tokens,
    // ids unique and stable
    val dim = wh.dimTokens.orderBy("id").collect()
    assert(dim.length === 4)
    assert(dim.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(dim.map(r => (r.getInt(1), r.getString(2))).toSet ===
      Set((4, "vDOT"), (3, "vDOT"), (7, "g1"), (7, "u1")))

    // Bifrost vDOT daily row: site created it; staking's price_usd
    // update (5.0 = 4.0*1.25) survived and volume stayed 0
    val bifrostId = dim.filter(r => r.getInt(1) === 4).map(_.getLong(0)).head
    val d1 = wh.factTokenDailyStats.filter($"token_id" === bifrostId).collect()(0)
    assert(d1.getDecimal(9).doubleValue === 5.0)
    assert(d1.getDouble(2) === 0.0)

    // Hydration vDOT daily row: price task wrote 3.5, data task then
    // updated volume columns but NOT price_usd (per-task update scoping)
    val hydId = dim.filter(r => r.getInt(1) === 3).map(_.getLong(0)).head
    val d2 = wh.factTokenDailyStats.filter($"token_id" === hydId).collect()(0)
    assert(d2.getDecimal(9).doubleValue === 3.5)
    assert(d2.getDouble(2) === 300.0)

    // yield rows: site (vDOT@Bifrost, pool ""), staking (same key ->
    // updated apy 5.13), hydration (pool a1), stellar (2 tokens, pool p1)
    val y = wh.factYieldStats.collect()
    assert(y.length === 4)
    val bifrostYield = y.filter(_.getLong(0) == bifrostId)
    assert(bifrostYield.length === 1)
    assert(bifrostYield(0).getDecimal(4).doubleValue === 5.13) // staking overwrote 12.5
  }
}
