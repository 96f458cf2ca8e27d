package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.Financial
import graft.schema.Tables

/** Financial scalar surface (reference utils.py, SURVEY §2.7) exercised
  * over fixture columns: APY compounding, TVL, Q96 pricing, staking
  * derivations, pct-change. All native expressions — the whole query
  * stays inside whole-stage codegen.
  *
  * Oracle-parity notes: pow(1 + apr/n, n) is bit-identical between
  * Java's and libm's pow for these domains (verified empirically);
  * integer pow(10, d) matches only for d ≤ 22, so synthesized decimals
  * stay below that. Q96 ratio uses x*x (exact IEEE), not pow(x, 2).
  */
object FinancialQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F1 APY from APR (daily compounding, capped, HALF_UP to 2 dp) +
    // F7 null-to-zero — over lineitem discount rates as APR%.
    "q_apy" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_discount") * 100).as("apr_pct"))
        .select(col("l_orderkey"), col("l_linenumber"), col("apr_pct"),
          Financial.orZero(Financial.apyFromAprPct(col("apr_pct"))).as("apy"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // F2 TVL + F4 Q96 pricing (double formulation for the oracle; the
    // Decimal(38,18) path is unit-tested against Python decimal outputs).
    // sqrt_price synthesized deterministically from part columns; token
    // decimals ≤ 18 (pow-parity bound).
    "q_tvl_q96" -> ((s, dir) => {
      val p = t(s, dir, "part").select(
        col("p_partkey"),
        (col("p_retailprice").cast("double") * lit(1.0e21)).as("sqrt_price"),
        (col("p_size") % 6 + 10).as("d0"),
        (col("p_size") % 5 + 6).as("d1"),
        (col("p_retailprice").cast("double") * 1000).as("a0"),
        (col("p_retailprice").cast("double") * 2000).as("a1"))
      val ratio = Financial.q96RatioDouble(col("sqrt_price"))
      p.select(col("p_partkey"),
          ratio.as("ratio"),
          Financial.priceToken0InToken1(ratio, col("d0"), col("d1")).as("price_t0_in_t1"),
          Financial.tvl(col("a0"), col("d0"), col("a1"), col("d1"), ratio).as("tvl"))
        .orderBy(col("p_partkey"))
    }),

    // F6 staking derivations: tvl = supply · price,
    // price_usd = price · exchangeRatio (Bifrost.py:280-283, :264).
    "q_staking" -> ((s, dir) => {
      t(s, dir, "supplier")
        .select(col("s_suppkey"),
          Financial.stakingTvl(col("s_acctbal"), lit(1.5)).as("tvl"),
          Financial.stakingPriceUsd(col("s_acctbal"), lit(0.97)).as("price_usd"))
        .orderBy(col("s_suppkey"))
    }),
  )

  def oracleSql: Map[String, String] = Map(

    "q_apy" ->
      """SELECT l_orderkey, l_linenumber, l_discount * 100 AS apr_pct,
        |  COALESCE(
        |    ROUND(LEAST((POW(1.0 + (l_discount * 100) / 100 / 365.0, 365.0) - 1.0) * 100,
        |                99999999.99), 2),
        |    0.0) AS apy
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_tvl_q96" ->
      """WITH p AS (
        |  SELECT p_partkey,
        |    CAST(p_retailprice AS DOUBLE) * 1e21 AS sqrt_price,
        |    p_size % 6 + 10 AS d0,
        |    p_size % 5 + 6 AS d1,
        |    CAST(p_retailprice AS DOUBLE) * 1000 AS a0,
        |    CAST(p_retailprice AS DOUBLE) * 2000 AS a1
        |  FROM part),
        |r AS (
        |  SELECT *, (sqrt_price / 79228162514264337593543950336.0)
        |          * (sqrt_price / 79228162514264337593543950336.0) AS ratio FROM p)
        |SELECT p_partkey, ratio,
        |  ratio * POW(10.0, CAST(d0 AS DOUBLE) - CAST(d1 AS DOUBLE)) AS price_t0_in_t1,
        |  a0 / POW(10.0, d0) + a1 / POW(10.0, d1) * ratio AS tvl
        |FROM r ORDER BY p_partkey""".stripMargin,

    "q_staking" ->
      """SELECT s_suppkey, s_acctbal * 1.5 AS tvl, s_acctbal * 0.97 AS price_usd
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
  )
}
