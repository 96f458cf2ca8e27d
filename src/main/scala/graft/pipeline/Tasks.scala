package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

import graft.expr.Financial
import graft.ops.{Dedup, Merge}

/** The reference's five ETL tasks re-expressed as set-oriented
  * Warehouse => Warehouse DataFrame DAGs (SURVEY §3, §7.1). Each task:
  * one pass over the (already watermark-sliced) source batch — filters,
  * broadcast dim join, derived metrics, then keyed merges into the
  * three warehouse tables. No per-row loops, no N+1 lookups: the
  * reference's ~6 round-trips/row become 3 shuffles/batch.
  *
  * Arrival-order semantics (SURVEY §7.7 #4): where the reference has no
  * dedup set, the LAST row per key in batch order wins update columns
  * (each row fires its own upsert); where it keeps a `processed` set,
  * the FIRST wins. "Batch order" is pinned to (created_at, source id)
  * — the reference's MySQL result order is nondeterministic in
  * principle, so we impose the only order it could reproducibly mean.
  */
object Tasks {

  private val DimCols = Seq("chain_id", "address", "symbol", "name",
    "decimals", "asset_type_id")

  private def chainId(wh: Warehouse, chainName: String): DataFrame =
    wh.dimChains.filter(col("name") === chainName).select(col("chain_id"))

  private def dailyDefaults(extra: (String, Column)*): Seq[(String, Column)] = {
    val base = Map(
      "volume" -> lit(0.0), "volume_usd" -> lit(0.0),
      "volume_yoy" -> lit(null).cast("double"), "volume_qoq" -> lit(null).cast("double"),
      "txns_count" -> lit(0L), "txns_yoy" -> lit(null).cast("double"),
      "txns_qoq" -> lit(null).cast("double"),
      "price_usd" -> lit(0.0).cast(DecimalType(38, 18)))
    (base ++ extra.toMap).toSeq
  }

  private def toDaily(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val all = Seq("token_id" -> col("token_id"), "date" -> col("date"),
      "created_at" -> col("created_at")) ++ cols
    df.select(all.map { case (n, c) => c.as(n) }: _*)
      .select(graft.schema.Schemas.factTokenDailyStats.fieldNames.map(col): _*)
  }

  private def toYield(df: DataFrame): DataFrame =
    df.select(graft.schema.Schemas.factYieldStats.fieldNames.map(col): _*)

  /** Join batch rows (with address col) to post-upsert dim for the
    * surrogate id (J2 readback). NO broadcast hint: dim_tokens is
    * unbounded — `upsertDimTokens` is built for backfills of millions
    * of keys, and a forced broadcast would pin the whole dim to driver
    * memory (and the 8 GB broadcast cap) on EVERY task run. AQE
    * broadcasts it at runtime whenever it is actually small, which is
    * the common steady state. */
  private def withTokenId(batch: DataFrame, dim: DataFrame): DataFrame =
    batch.join(dim.select(col("chain_id"), col("address"),
      col("id").as("token_id")), Seq("chain_id", "address"))

  // ---------------------------------------------------------------
  // Bifrost site task — Bifrost.py:58-185. chain 'Bifrost', P5/P6
  // filters, dims from asset, daily stats (update: created_at only),
  // yield stats (update: tvl, apy, tvl_usd; tvl_usd := tvl).
  // ---------------------------------------------------------------
  def bifrostSite(site: DataFrame, wh: Warehouse,
                  chainName: String = "Bifrost"): Warehouse = {
    val batch0 = site
      .filter(col("Asset").isNotNull && col("Asset") =!= "")
      .filter(!lower(col("Asset")).isin("tvl", "addresses", "revenue"))
      .join(broadcast(chainId(wh, chainName)))
      .withColumn("address", col("Asset"))
      .withColumn("date", to_date(col("created_at")))

    // no processed-set in the reference -> last write per key wins
    val lastPerToken = Merge.lastWriterWins(batch0, Seq("chain_id", "address"),
      Seq(col("created_at")))

    val dimIn = lastPerToken.select(col("chain_id"), col("address"),
      col("Asset").as("symbol"), col("Asset").as("name"),
      lit(18).cast(IntegerType).as("decimals"), lit(1).cast(IntegerType).as("asset_type_id"))
    val batchTs = lit(current_timestamp())
    val dim = Warehouse.upsertDimTokens(wh.dimTokens, dimIn, batchTs)

    val keyed = withTokenId(batch0, dim)

    val daily = toDaily(
      Merge.lastWriterWins(keyed, Seq("token_id", "date"), Seq(col("created_at"))),
      dailyDefaults())
    val newDaily = Merge.upsert(wh.factTokenDailyStats, daily,
      Seq("token_id", "date"), Seq("created_at"))

    val yld = toYield(
      Merge.lastWriterWins(keyed, Seq("token_id", "date"), Seq(col("created_at")))
        .withColumn("return_type_id", lit(1).cast(IntegerType))
        .withColumn("pool_address", lit(""))
        .withColumn("apy", Financial.orZero(col("apy")).cast(DecimalType(10, 2)))
        .withColumn("tvl", Financial.orZero(col("tvl")))
        .withColumn("tvl_usd", Financial.orZero(col("tvl"))))
    val newYield = Merge.upsert(wh.factYieldStats, yld,
      Seq("token_id", "pool_address", "date"), Seq("tvl", "apy", "tvl_usd"))

    wh.copy(dimTokens = dim, factTokenDailyStats = newDaily, factYieldStats = newYield)
  }

  // ---------------------------------------------------------------
  // Bifrost staking task — Bifrost.py:188-295. address := symbol,
  // daily price_usd = price·exchangeRatio (update: price_usd), yield
  // apy = APY(apr/100, 365) (0 when apr falsy), tvl = supply·price
  // (0 when supply null), tvl_usd := tvl
  // (update: apy, tvl, tvl_usd, return_type_id).
  // ---------------------------------------------------------------
  def bifrostStaking(staking: DataFrame, wh: Warehouse,
                     chainName: String = "Bifrost"): Warehouse = {
    val batch0 = staking
      .filter(col("symbol").isNotNull && col("symbol") =!= "")
      .join(broadcast(chainId(wh, chainName)))
      .withColumn("address", col("symbol"))
      .withColumn("date", to_date(col("created_at")))

    val lastPerToken = Merge.lastWriterWins(batch0, Seq("chain_id", "address"),
      Seq(col("created_at")))
    val dimIn = lastPerToken.select(col("chain_id"), col("address"),
      col("symbol"), col("symbol").as("name"),
      lit(18).cast(IntegerType).as("decimals"), lit(1).cast(IntegerType).as("asset_type_id"))
    val dim = Warehouse.upsertDimTokens(wh.dimTokens, dimIn, lit(current_timestamp()))

    val keyed = withTokenId(batch0, dim)
    val lastDaily = Merge.lastWriterWins(keyed, Seq("token_id", "date"),
      Seq(col("created_at")))

    val daily = toDaily(lastDaily, dailyDefaults(
      "price_usd" -> Financial.stakingPriceUsd(col("price"), col("exchangeRatio"))
        .cast(DecimalType(38, 18))))
    val newDaily = Merge.upsert(wh.factTokenDailyStats, daily,
      Seq("token_id", "date"), Seq("price_usd"))

    val yld = toYield(lastDaily
      .withColumn("return_type_id", lit(1).cast(IntegerType))
      .withColumn("pool_address", lit(""))
      .withColumn("apy",
        when(col("apr").isNull || col("apr") === 0, lit(0.0))
          .otherwise(Financial.apyFromAprPct(col("apr"))).cast(DecimalType(10, 2)))
      .withColumn("tvl",
        when(col("supply").isNull, lit(0.0))
          .otherwise(Financial.stakingTvl(col("supply"), col("price"))))
      .withColumn("tvl_usd", col("tvl")))
    val newYield = Merge.upsert(wh.factYieldStats, yld,
      Seq("token_id", "pool_address", "date"),
      Seq("apy", "tvl", "tvl_usd", "return_type_id"))

    wh.copy(dimTokens = dim, factTokenDailyStats = newDaily, factYieldStats = newYield)
  }

  // ---------------------------------------------------------------
  // Hydration price task — Hydration.py:18-109. Dedup on source id
  // (first seen), address := symbol, daily price_usd = price_usdt
  // (update: price_usd).
  // ---------------------------------------------------------------
  def hydrationPrice(price: DataFrame, wh: Warehouse,
                     chainName: String = "Hydration"): Warehouse = {
    val batch0 = Dedup.firstSeen(
        price.filter(col("id").isNotNull),
        Seq("id"), Seq(col("created_at"), col("id")))
      .join(broadcast(chainId(wh, chainName)))
      .withColumn("address", col("symbol"))
      .withColumn("date", to_date(col("created_at")))

    val lastPerToken = Merge.lastWriterWins(batch0, Seq("chain_id", "address"),
      Seq(col("created_at"), col("id")))
    val dimIn = lastPerToken.select(col("chain_id"), col("address"),
      col("symbol"), col("symbol").as("name"),
      lit(18).cast(IntegerType).as("decimals"), lit(1).cast(IntegerType).as("asset_type_id"))
    val dim = Warehouse.upsertDimTokens(wh.dimTokens, dimIn, lit(current_timestamp()))

    val keyed = withTokenId(batch0, dim)
    val daily = toDaily(
      Merge.lastWriterWins(keyed, Seq("token_id", "date"), Seq(col("created_at"), col("id"))),
      dailyDefaults("price_usd" -> col("price_usdt").cast(DecimalType(38, 18))))
    val newDaily = Merge.upsert(wh.factTokenDailyStats, daily,
      Seq("token_id", "date"), Seq("price_usd"))

    wh.copy(dimTokens = dim, factTokenDailyStats = newDaily)
  }

  // ---------------------------------------------------------------
  // Hydration data task — Hydration.py:111-323. Dedup on source id,
  // YoY/QoQ vs `volume` at date−14d (quirk Q3/Q4), daily update:
  // volume, volume_usd, volume_yoy, volume_qoq, created_at; yield:
  // return_type_id=2, pool_address=asset_id, apy from total_apr,
  // tvl := tvl_usd, tvl_usd := tvl_usd (update: apy, tvl, tvl_usd).
  // ---------------------------------------------------------------
  def hydrationData(data: DataFrame, wh: Warehouse,
                    chainName: String = "Hydration"): Warehouse = {
    val batch0 = Dedup.firstSeen(
        data.filter(col("id").isNotNull),
        Seq("id"), Seq(col("created_at"), col("id")))
      .join(broadcast(chainId(wh, chainName)))
      .withColumn("address", col("symbol"))
      .withColumn("date", to_date(col("created_at")))

    val lastPerToken = Merge.lastWriterWins(batch0, Seq("chain_id", "address"),
      Seq(col("created_at"), col("id")))
    val dimIn = lastPerToken.select(col("chain_id"), col("address"),
      col("symbol"), col("symbol").as("name"),
      lit(18).cast(IntegerType).as("decimals"), lit(1).cast(IntegerType).as("asset_type_id"))
    val dim = Warehouse.upsertDimTokens(wh.dimTokens, dimIn, lit(current_timestamp()))

    val enriched = withTokenId(batch0, dim)
    val keyed = Merge.lastWriterWins(enriched,
      Seq("token_id", "date"), Seq(col("created_at"), col("id")))

    // point-in-time self-join at the −14d offset (J4/J5 as equi-join on
    // shifted date, SURVEY §7.6) against the pre-batch warehouse state —
    // the prev row's `volume` column (quirk Q4: yoy compares volume_usd
    // against prior `volume`)
    val prev = wh.factTokenDailyStats
      .select(col("token_id"), col("date").as("prev_date"), col("volume").as("prev_volume"))
    val joined = keyed
      .join(prev, keyed("token_id") === prev("token_id") &&
        Financial.lastYear(keyed("date")) === prev("prev_date"), "left")
      .drop(prev("token_id"))
      .withColumn("volume_yoy", Financial.yoy(col("volume_usd"), col("prev_volume")))
      .withColumn("volume_qoq", Financial.qoq(col("volume_usd"), col("prev_volume")))
      .drop("prev_date", "prev_volume")

    val daily = toDaily(joined, dailyDefaults(
      "volume" -> col("volume_usd"), "volume_usd" -> col("volume_usd"),
      "volume_yoy" -> col("volume_yoy"), "volume_qoq" -> col("volume_qoq")))
    val newDaily = Merge.upsert(wh.factTokenDailyStats, daily,
      Seq("token_id", "date"),
      Seq("volume", "volume_usd", "volume_yoy", "volume_qoq", "created_at"))

    // the yield merge key is the FINER (token_id, pool_address=asset_id,
    // date): the reference upserts fact_yield_stats per source row
    // (Hydration.py:286-307, processed-set check commented out), so one
    // symbol/date carrying several asset_ids must land one yield row
    // PER pool — deduping at the daily grain (`keyed`) would silently
    // drop all but one pool
    val yieldKeyed = Merge.lastWriterWins(enriched,
      Seq("token_id", "asset_id", "date"), Seq(col("created_at"), col("id")))
    val yld = toYield(yieldKeyed
      .withColumn("return_type_id", lit(2).cast(IntegerType))
      .withColumn("pool_address", col("asset_id"))
      .withColumn("apy",
        when(col("total_apr").isNull || col("total_apr") === 0, lit(0.0))
          .otherwise(Financial.apyFromAprPct(col("total_apr"))).cast(DecimalType(10, 2)))
      .withColumn("tvl", Financial.orZero(col("tvl_usd")))
      .withColumn("tvl_usd", Financial.orZero(col("tvl_usd"))))
    val newYield = Merge.upsert(wh.factYieldStats, yld,
      Seq("token_id", "pool_address", "date"), Seq("apy", "tvl", "tvl_usd"))

    wh.copy(dimTokens = dim, factTokenDailyStats = newDaily, factYieldStats = newYield)
  }
}
