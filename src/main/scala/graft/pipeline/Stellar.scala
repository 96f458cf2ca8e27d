package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

import graft.expr.Financial
import graft.ops.{Dedup, Merge}

/** Stellar pool task — Stellar.py:16-266, the reference's richest DAG
  * (SURVEY §3.3, §7.2): pool_data slice → latest-price top-1 join (J3/W1)
  * → Q96 two-sided pricing (F4) → token0/token1 unpivot → YoY/QoQ
  * point-in-time self-joins (J4/J5) → merges into dim_tokens,
  * fact_token_daily_stats, fact_yield_stats.
  *
  * Reference quirks preserved deliberately (SURVEY §7.5):
  *  - Q1: token0 rows write txns_count_qoq into BOTH txns_yoy and
  *    txns_qoq; token1 rows write yoy correctly.
  *  - Q2: token1 rows store token0's price as their price_usd.
  *  - Q5: token1's qoq misread nets out to the token0 formula — no
  *    divergence to port.
  *  - processed-set: FIRST occurrence of a token address across both
  *    sides wins (token0 side of a row processed before its token1
  *    side), pinned to (created_at, pool_id, side) order.
  */
object Stellar {

  /** latestPrice: the full Hydration_price table (not the batch slice —
    * Stellar.py:68-78 queries unbounded ORDER BY created_at DESC LIMIT 1). */
  def run(poolData: DataFrame, hydrationPrice: DataFrame, wh: Warehouse,
          chainName: String = "stellaswap"): Warehouse = {

    val chain = wh.dimChains.filter(col("name") === chainName).select(col("chain_id"))

    // J3/W1: latest price per symbol, deterministic tiebreak on id
    val latest = Dedup.top1PerKey(hydrationPrice, Seq("symbol"),
        Seq(col("created_at"), col("id")))
      .select(col("symbol").as("token0_symbol"),
        col("price_usdt").cast(DecimalType(38, 18)).as("latest_price"))

    val base = poolData
      .join(broadcast(chain))
      .join(broadcast(latest), Seq("token0_symbol"), "left")
      .withColumn("date", to_date(col("created_at")))
      .withColumn("token0_usd",
        coalesce(col("latest_price"), lit(1.0).cast(DecimalType(38, 18))))
      // F4: ratio at 50-digit context; token1 = token0_usd · ratio·10^(d0−d1),
      // both ROUND_DOWN to 18 dp (utils.py:130-171)
      .withColumn("q96_ratio", Financial.q96RatioDecimal(col("sqrt_price")))
      .withColumn("token0_price", Financial.roundDown18(col("token0_usd")))
      // token1_price is NOT computed: the reference derives it
      // (calculate_token_prices, Stellar.py:81) but stores token0_price
      // for BOTH unpivot sides (Stellar.py:147,241 — quirk Q2), so the
      // value is dead there too; restating it through the Decimal ×
      // double pow coercion would also silently degrade the Q96Ratio
      // kernel's 50-digit fidelity to ~16 significant digits — if a
      // fork ever stores token1_price, do the whole product inside a
      // decimal kernel (the Q96Kernel pattern), not in plan arithmetic
      .withColumn("apy",
        when(col("final_apr").isNull || col("final_apr") === 0, lit(0.0))
          .otherwise(Financial.apyFromAprPct(col("final_apr"))).cast(DecimalType(10, 2)))
      // F2: tvl with price ≡ raw sqrt_price (utils.py:41-54 — the
      // reference multiplies by the UNSCALED sqrt_price, quirk kept)
      .withColumn("tvl", Financial.tvl(
        col("amount_token0").cast("double"), col("token0_decimals"),
        col("amount_token1").cast("double"), col("token1_decimals"),
        col("sqrt_price").cast("double")))

    // token0/token1 unpivot — the generator step (SURVEY §3.3): one row
    // per (pool snapshot, side)
    val unpivoted = base.select(
      col("chain_id"), col("date"), col("created_at"), col("pool_id"),
      col("volume_usd_current"), col("tx_count"), col("apy"), col("tvl"),
      // Q2: BOTH sides store token0's price
      col("token0_price").as("price_usd"),
      expr("""stack(2,
        0, token0_id, token0_symbol, token0_name, token0_decimals,
        1, token1_id, token1_symbol, token1_name, token1_decimals
      ) as (side, address, symbol, name, decimals)"""))
      .filter(col("address").isNotNull && col("address") =!= "")

    // processed-set semantics: first occurrence per address across sides
    val firstPerToken = Dedup.firstSeen(unpivoted, Seq("chain_id", "address"),
      Seq(col("created_at"), col("pool_id"), col("side")))

    val dimIn = firstPerToken.select(col("chain_id"), col("address"),
      col("symbol"), col("name"), col("decimals").cast(IntegerType),
      lit(1).cast(IntegerType).as("asset_type_id"))
    val dim = Warehouse.upsertDimTokens(wh.dimTokens, dimIn, lit(current_timestamp()))

    // no broadcast hint on the dim readback: dim_tokens is unbounded
    // (millions-of-keys backfills) — AQE broadcasts it when small
    val keyed = firstPerToken.join(dim.select(col("chain_id"),
      col("address"), col("id").as("token_id")), Seq("chain_id", "address"))

    // J4/J5: −14d point-in-time lookup against pre-batch facts
    val prev = wh.factTokenDailyStats.select(col("token_id").as("p_tid"),
      col("date").as("p_date"), col("volume").as("p_volume"),
      col("txns_count").as("p_txns"))
    val joined = keyed.join(prev,
        keyed("token_id") === col("p_tid") &&
          Financial.lastYear(keyed("date")) === col("p_date"), "left")
      .withColumn("volume_yoy", Financial.yoy(col("volume_usd_current"), col("p_volume")))
      .withColumn("volume_qoq", Financial.qoq(col("volume_usd_current"), col("p_volume")))
      .withColumn("txns_yoy_true", Financial.yoy(col("tx_count"), col("p_txns")))
      .withColumn("txns_qoq_v", Financial.qoq(col("tx_count"), col("p_txns")))
      .drop("p_tid", "p_date", "p_volume", "p_txns")

    val daily = joined.select(
      col("token_id"), col("date"),
      col("volume_usd_current").as("volume"),
      col("volume_usd_current").as("volume_usd"),
      col("volume_yoy"), col("volume_qoq"),
      col("tx_count").as("txns_count"),
      // Q1: token0 writes qoq into the yoy slot; token1 writes true yoy
      when(col("side") === 0, col("txns_qoq_v")).otherwise(col("txns_yoy_true"))
        .as("txns_yoy"),
      col("txns_qoq_v").as("txns_qoq"),
      col("price_usd").cast(DecimalType(38, 18)), col("created_at"))
      .select(graft.schema.Schemas.factTokenDailyStats.fieldNames.map(col): _*)
    val newDaily = Merge.upsert(wh.factTokenDailyStats, daily,
      Seq("token_id", "date"),
      Seq("price_usd", "volume_usd", "volume_yoy", "volume_qoq",
        "txns_count", "txns_yoy", "txns_qoq", "created_at"))

    val yld = joined.select(
      col("token_id"), lit(1).cast(IntegerType).as("return_type_id"),
      col("pool_id").as("pool_address"), col("date"),
      col("apy"), col("tvl"), col("tvl").as("tvl_usd"), col("created_at"))
      .select(graft.schema.Schemas.factYieldStats.fieldNames.map(col): _*)
    val newYield = Merge.upsert(wh.factYieldStats, yld,
      Seq("token_id", "pool_address", "date"),
      Seq("return_type_id", "apy", "tvl", "tvl_usd"))

    wh.copy(dimTokens = dim, factTokenDailyStats = newDaily, factYieldStats = newYield)
  }
}
