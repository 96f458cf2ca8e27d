package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Financial scalar functions (reference: src/utils/utils.py), re-expressed
  * as native Column expressions so they stay inside whole-stage codegen —
  * no Scala UDFs anywhere on this surface.
  */
object Financial {

  /** APY cap — utils.py:32-34 caps at DECIMAL(10,2) max. */
  val ApyCap: Double = 99999999.99

  /** APY = ((1 + apr/n)^n − 1) · 100, capped and rounded HALF_UP to 2 dp.
    * Reference: utils.py:11-38 (cap :32-34, quantize HALF_UP :36).
    * Callers pass apr already divided by 100 and n=365 (Bifrost.py:274-278,
    * Hydration.py:289-293, Stellar.py:62-65). Null/zero n yields null here
    * (the reference raises; in a set-oriented engine a poisoned row must
    * not kill the batch — filter or side-output invalid rows instead).
    */
  def apy(apr: Column, n: Column): Column =
    when(n.isNotNull && n =!= 0 && apr.isNotNull,
      round(least((pow(lit(1.0) + apr / n, n) - lit(1.0)) * 100, lit(ApyCap)), 2))

  /** Convenience: annual daily-compounded APY from a percent APR,
    * matching every call site in the reference (apr/100, n=365). */
  def apyFromAprPct(aprPct: Column): Column = apy(aprPct / 100, lit(365.0))

  /** TVL with token0 as the $1 numeraire — utils.py:41-54:
    * tvl = a0/10^d0 + (a1/10^d1) · price. */
  def tvl(a0: Column, d0: Column, a1: Column, d1: Column, price: Column): Column =
    a0 / pow(lit(10.0), d0) + a1 / pow(lit(10.0), d1) * price

  /** TVL in USD — utils.py:69-85: use both prices when known, else derive
    * the missing side from the Q96 ratio; null when neither price known
    * (reference raises — same set-oriented null policy as apy()).
    */
  def tvlUsd(a0: Column, d0: Column, p0: Column,
             a1: Column, d1: Column, p1: Column,
             sqrtPrice: Column): Column = {
    val q0 = a0 / pow(lit(10.0), d0)
    val q1 = a1 / pow(lit(10.0), d1)
    val ratio = pow(sqrtPrice.cast(DoubleType) / lit(Q96Double), 2)
    when(p0.isNotNull && p1.isNotNull, q0 * p0 + q1 * p1)
      .when(p0.isNotNull, q0 * p0 + q1 * (p0 / ratio))
      .when(p1.isNotNull, q0 * (p1 * ratio) + q1 * p1)
  }

  /** 2^96, the Q64.96 fixed-point divisor — utils.py:137-138. */
  val Q96: java.math.BigDecimal = new java.math.BigDecimal(
    java.math.BigInteger.ONE.shiftLeft(96))
  val Q96Double: Double = Q96.doubleValue()

  /** token1-per-token0 price from Uniswap-V3 sqrtPriceX96 —
    * utils.py:130-148: ratio = (sqrt_price / 2^96)^2 · 10^(d0 − d1).
    *
    * Decimal fidelity (SURVEY §7.7 #1): sqrtPriceX96 can reach 2^160,
    * which exceeds Decimal(38), and staging the division through
    * Decimal(38,·) intermediates loses relative precision to the
    * 38-digit cap on large ticks. Native kernel expression
    * (graft.expr.catalyst.Q96Ratio) computes at the reference's
    * 50-digit context and HALF_UP-quantizes to 18 dp; out-of-range → 0
    * (utils.py:160-169 InvalidOperation policy). */
  def q96RatioDecimal(sqrtPrice: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.Q96Ratio(
      expression(sqrtPrice.cast(DecimalType(38, 0)))))
  }

  /** Double-precision variant of the Q96 ratio — for oracle-parity queries
    * and non-monetary derived metrics (tvl heuristics). r·r instead of
    * pow(r, 2): multiplication is exactly-rounded IEEE in every engine,
    * pow is libm-dependent. */
  def q96RatioDouble(sqrtPrice: Column): Column = {
    val r = sqrtPrice.cast(DoubleType) / lit(Q96Double)
    r * r
  }

  /** Price of token0 in token1 units, decimal-adjusted — utils.py:144-148.
    * `ratio · 10^(d0−d1)`; pass q96RatioDecimal(sqrt) or q96RatioDouble(sqrt). */
  def priceToken0InToken1(ratio: Column, d0: Column, d1: Column): Column =
    ratio * pow(lit(10.0), d0.cast(DoubleType) - d1.cast(DoubleType))

  /** ROUND_DOWN (truncate) to 18 dp — utils.py:160-169 quantizes with
    * ROUND_DOWN and maps decimal overflow to 0. `floor(x, 18)` truncates
    * at 18 dp directly on the input's full scale (no pre-rounding cast —
    * a Decimal(38,18) cast first would HALF_UP round digit 19 and could
    * round UP, violating ROUND_DOWN); prices are non-negative here so
    * floor == truncate. */
  def roundDown18(c: Column): Column =
    floor(c, lit(18)).cast(DecimalType(38, 18))

  /** Percent change (cur − prev)/prev · 100 rounded to 2 dp; null when any
    * input is null or prev == 0 — utils.py:101-110 (yoy), :112-121 (qoq). */
  def pctChange(cur: Column, prev: Column): Column =
    when(cur.isNotNull && prev.isNotNull && prev =!= 0,
      round((cur - prev) / prev * 100, 2))

  def yoy(cur: Column, prev: Column): Column = pctChange(cur, prev)
  def qoq(cur: Column, prev: Column): Column = pctChange(cur, prev)

  /** The reference's period offsets: "last year" and "last quarter" are
    * BOTH currently 14 days (utils.py:92, :99 — real offsets commented
    * out). Quirk Q3 (SURVEY §7.5): default preserves observed behavior;
    * `intent = true` gives the documented −3mo/−12mo intent. */
  def lastYear(d: Column, intent: Boolean = false): Column =
    if (intent) add_months(d, -12) else date_sub(d, 14)
  def lastQuarter(d: Column, intent: Boolean = false): Column =
    if (intent) add_months(d, -3) else date_sub(d, 14)

  /** Staking derivations — Bifrost.py:280-283, :264. */
  def stakingTvl(supply: Column, price: Column): Column = supply * price
  def stakingPriceUsd(price: Column, exchangeRatio: Column): Column =
    price * exchangeRatio

  /** Null-to-zero coalescing (`apy or 0`) — Bifrost.py:179, :275-284.
    * Python `or` also zeroes 0.0, which coalesce preserves trivially. */
  def orZero(c: Column): Column = coalesce(c, lit(0.0))

  /** F9 'v'-prefix symbol normalization — Hydration.py:13-16: prepend
    * 'v' unless the symbol already starts with it (case-insensitive).
    * DEAD CODE in the reference (its only call site, Hydration.py:73,
    * is commented out) — implemented to close the §2 inventory row.
    * Null symbol → null (the reference would raise on None; set-
    * oriented null policy as elsewhere). */
  def normalizeSymbol(symbol: Column): Column =
    when(lower(symbol).startsWith("v"), symbol)
      .otherwise(concat(lit("v"), symbol))
}
