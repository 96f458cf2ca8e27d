package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Stellar, Tasks, Warehouse}

/** Replay the reference task semantics (SURVEY §3) on synthetic batches
  * and compare against hand-computed loop results, including the
  * preserved quirks (§7.5 Q1/Q2) and idempotent re-application (§2.10 T5). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def wh0 = Warehouse.withChains(spark,
    Seq((4, "Bifrost"), (3, "Hydration"), (7, "stellaswap")))

  private def siteBatch: DataFrame = Seq(
    // (batch_id, Asset, Value, tvl, tvm, holders, apy, apyBase, apyReward, totalIssuance, created_at)
    (1L, "vDOT", 1.0, 1000.0, 0.0, 10L, 12.5, 10.0, 2.5, 99L, ts("2025-05-01 01:00:00")),
    (1L, "TVL", 1.0, 0.0, 0.0, 0L, 0.0, 0.0, 0.0, 0L, ts("2025-05-01 01:00:00")),  // blocklisted
    (1L, "", 1.0, 0.0, 0.0, 0L, 0.0, 0.0, 0.0, 0L, ts("2025-05-01 01:00:00")),     // blank
    (2L, "vDOT", 1.0, 2000.0, 0.0, 11L, 13.0, 10.0, 3.0, 99L, ts("2025-05-01 02:00:00")), // later wins
    (2L, "vKSM", 1.0, 500.0, 0.0, 5L, null.asInstanceOf[Double], 0.0, 0.0, 9L, ts("2025-05-01 02:00:00"))
  ).toDF("batch_id", "Asset", "Value", "tvl", "tvm", "holders", "apy",
    "apyBase", "apyReward", "totalIssuance", "created_at")

  test("bifrostSite: filters, dim upsert, yield merge (last write wins)") {
    val wh = Tasks.bifrostSite(siteBatch, wh0)
    val dim = wh.dimTokens.orderBy("id").collect()
    assert(dim.map(_.getString(2)).toSeq === Seq("vDOT", "vKSM")) // address col
    assert(dim.map(_.getLong(0)).toSeq === Seq(1L, 2L))           // ids assigned

    val yld = wh.factYieldStats.orderBy("token_id").collect()
    assert(yld.length === 2)
    val vdot = yld(0)
    assert(vdot.getDecimal(4).doubleValue === 13.0)  // apy: later row won
    assert(vdot.getDouble(5) === 2000.0)             // tvl
    assert(vdot.getDouble(6) === 2000.0)             // tvl_usd := tvl
    val vksm = yld(1)
    assert(vksm.getDecimal(4).doubleValue === 0.0)   // null apy -> 0

    val daily = wh.factTokenDailyStats.orderBy("token_id").collect()
    assert(daily.length === 2)
    assert(daily(0).getDouble(2) === 0.0)            // volume literal 0
  }

  test("bifrostSite: replay is idempotent; daily merge updates only created_at") {
    val once = Tasks.bifrostSite(siteBatch, wh0)
    // seed a price into the daily row (as the staking task would), then replay
    val seeded = once.copy(factTokenDailyStats =
      once.factTokenDailyStats.withColumn("price_usd",
        lit(7.5).cast("decimal(38,18)")))
    val replayed = Tasks.bifrostSite(siteBatch, seeded)
    val prices = replayed.factTokenDailyStats.select("price_usd").collect()
    assert(prices.forall(_.getDecimal(0).doubleValue === 7.5)) // survived replay
    assert(replayed.factTokenDailyStats.count() === 2)
    assert(replayed.factYieldStats.count() === 2)
    assert(replayed.dimTokens.count() === 2)
    // ids stable across replay
    val ids1 = once.dimTokens.select("address", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids2 = replayed.dimTokens.select("address", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids1 === ids2)
  }

  test("bifrostStaking: apy compounding, tvl=supply*price, price_usd=price*ratio") {
    val batch = Seq(
      ("vDOT", "0xabc", 5.0, 0.1, 4.0, 1.25, 1000L, ts("2025-05-01 01:00:00"))
    ).toDF("symbol", "contractAddress", "apr", "fee", "price", "exchangeRatio",
      "supply", "created_at")
    val wh = Tasks.bifrostStaking(batch, wh0)
    val y = wh.factYieldStats.collect()(0)
    assert(y.getDecimal(4).doubleValue === 5.13)  // APY(5%/100, 365)
    assert(y.getDouble(5) === 4000.0)             // tvl = supply*price
    val d = wh.factTokenDailyStats.collect()(0)
    assert(d.getDecimal(9).doubleValue === 5.0)   // price_usd = 4.0*1.25
  }

  test("hydrationData: yoy/qoq against prior volume at -14d") {
    // pre-existing daily row 14 days earlier with volume=200
    val pre = Tasks.hydrationData(Seq(
      (1L, 1L, "a1", "HDX", 0.0, 0.0, 10.0, 5000.0, 200.0,
        ts("2025-04-17 01:00:00"), ts("2025-04-17 01:00:00"))
    ).toDF("id", "batch_id", "asset_id", "symbol", "farm_apr", "pool_apr",
      "total_apr", "tvl_usd", "volume_usd", "timestamp", "created_at"), wh0)
    val wh = Tasks.hydrationData(Seq(
      (2L, 2L, "a1", "HDX", 0.0, 0.0, 20.0, 6000.0, 300.0,
        ts("2025-05-01 01:00:00"), ts("2025-05-01 01:00:00"))
    ).toDF("id", "batch_id", "asset_id", "symbol", "farm_apr", "pool_apr",
      "total_apr", "tvl_usd", "volume_usd", "timestamp", "created_at"), pre)

    val rows = wh.factTokenDailyStats.orderBy("date").collect()
    assert(rows.length === 2)
    val cur = rows(1)
    assert(cur.getDouble(2) === 300.0)   // volume := volume_usd
    assert(cur.getDouble(4) === 50.0)    // yoy: (300-200)/200*100
    assert(cur.getDouble(5) === 50.0)    // qoq: same 14d offset (quirk Q3)
    val y = wh.factYieldStats.orderBy("date").collect()
    assert(y.length === 2)
    assert(y(1).getInt(1) === 2)                    // return_type_id=2
    assert(y(1).getString(2) === "a1")              // pool_address=asset_id
    assert(y(1).getDouble(5) === 6000.0)            // tvl := tvl_usd
  }

  private def poolBatch: DataFrame = {
    val q96 = java.math.BigInteger.ONE.shiftLeft(96).toString
    Seq(
      ("t0addr", "GLMR", "Glimmer", 18, "t1addr", "USDC", "USD Coin", 6,
        12345.0, "pool1", 42L, q96, q96, q96, 7.3, ts("2025-05-01 01:00:00"))
    ).toDF("token0_id", "token0_symbol", "token0_name", "token0_decimals",
      "token1_id", "token1_symbol", "token1_name", "token1_decimals",
      "volume_usd_current", "pool_id", "tx_count", "amount_token0",
      "amount_token1", "sqrt_price", "final_apr", "created_at")
      .withColumn("amount_token0", col("amount_token0").cast("decimal(38,0)"))
      .withColumn("amount_token1", col("amount_token1").cast("decimal(38,0)"))
      .withColumn("sqrt_price", col("sqrt_price").cast("decimal(38,0)"))
  }

  test("stellar: unpivot to both sides, Q96 pricing, quirks Q1/Q2 preserved") {
    val price = Seq(
      (1L, 1L, "x", "GLMR", new java.math.BigDecimal("2.500000000000000000"),
        ts("2025-04-30 00:00:00"))
    ).toDF("id", "batch_id", "asset_id", "symbol", "price_usdt", "created_at")
      .withColumn("price_usdt", col("price_usdt").cast("decimal(38,18)"))

    val wh = Stellar.run(poolBatch, price, wh0)

    val dim = wh.dimTokens.orderBy("id").collect()
    assert(dim.map(_.getString(2)).toSeq === Seq("t0addr", "t1addr"))

    val daily = wh.factTokenDailyStats.orderBy("token_id").collect()
    assert(daily.length === 2)
    // Q2: BOTH sides carry token0's (latest Hydration) price 2.5
    assert(daily(0).getDecimal(9).doubleValue === 2.5)
    assert(daily(1).getDecimal(9).doubleValue === 2.5)
    assert(daily(0).getDouble(3) === 12345.0)  // volume_usd

    val yld = wh.factYieldStats.orderBy("token_id").collect()
    assert(yld.length === 2)
    assert(yld(0).getString(2) === "pool1")
    // tvl = 2^96/10^18·1 + 2^96/10^6·sqrt_price(=2^96): dominated by 2nd term
    val expectedTvl = math.pow(2.0, 96) / 1e6 * math.pow(2.0, 96) +
      math.pow(2.0, 96) / 1e18
    assert(math.abs(yld(0).getDouble(5) / expectedTvl - 1.0) < 1e-9)
    // apy from final_apr=7.3
    assert(yld(0).getDecimal(4).doubleValue === 7.57) // ((1+0.073/365)^365-1)*100
  }

  test("stellar: idempotent replay keeps ids and row counts") {
    val price = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.schema.Schemas.hydrationPrice)
    val once = Stellar.run(poolBatch, price, wh0)
    val twice = Stellar.run(poolBatch, price, once)
    assert(twice.dimTokens.count() === once.dimTokens.count())
    assert(twice.factTokenDailyStats.count() === once.factTokenDailyStats.count())
    assert(twice.factYieldStats.count() === once.factYieldStats.count())
  }
}
