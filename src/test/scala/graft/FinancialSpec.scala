package graft

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import org.apache.spark.sql.functions._

import graft.expr.Financial

/** Financial scalar edges (reference utils.py; SURVEY §7.7 #1/#5):
  * APY cap + rounding, Q96 decimal fidelity vs BigDecimal ground truth,
  * pct-change null policy, ROUND_DOWN quantization. */
class FinancialSpec extends SparkSpec {
  import spark.implicits._

  test("apy: zero apr -> 0.00; null n -> null; huge apr -> capped") {
    val df = Seq(
      (0.0, Some(365.0)),
      (0.05, Some(365.0)),
      (500.0, Some(365.0)),   // e^500-ish: far past cap
      (0.05, None)).toDF("apr", "n")
    val got = df.select(Financial.apy($"apr", $"n")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) === 0.0)
    assert(got(1) === 5.13)   // ((1+0.05/365)^365 - 1)*100 = 5.1267% -> 5.13
    assert(got(2) === Financial.ApyCap)
    assert(got(3) === null)
  }

  test("apyFromAprPct matches reference call shape (apr/100, n=365)") {
    val got = Seq(Tuple1(5.0)).toDF("apr_pct")
      .select(Financial.apyFromAprPct($"apr_pct")).first().getDouble(0)
    assert(got === 5.13)
  }

  test("q96RatioDecimal matches BigDecimal ground truth across magnitudes") {
    // ground truth: (sp / 2^96)^2 at high precision, 18-dp HALF_UP on
    // the final cast (Spark Decimal cast semantics)
    val q96 = new JBD(java.math.BigInteger.ONE.shiftLeft(96))
    def truth(sp: JBD): JBD = {
      val half = sp.divide(q96, new MathContext(50))
      half.multiply(half).setScale(18, RoundingMode.HALF_UP)
    }
    // sqrtPriceX96 magnitudes: ~1:1 pools, extreme-price pools
    val sps = Seq(
      new JBD("79228162514264337593543950336"),       // exactly 2^96 -> 1.0
      new JBD("158456325028528675187087900672"),      // 2^97 -> 4.0
      new JBD("2505414483750479311864138015"),        // ~0.001
      new JBD("1461446703485210103287273052203988"))  // large tick
    // build via strings: the Seq[BigDecimal] encoder would force the
    // system default Decimal(38,18) and overflow the large magnitudes
    val df = sps.map(sp => Tuple1(sp.toPlainString)).toDF("s")
      .select($"s".cast("decimal(38,0)").as("sp"))
    val got = df.select(Financial.q96RatioDecimal($"sp")).collect().map(_.getDecimal(0))
    sps.zip(got).foreach { case (sp, g) =>
      val t = truth(sp)
      assert(t.compareTo(g) === 0, s"sp=$sp truth=$t got=$g")
    }
  }

  test("q96RatioDecimal: near-max magnitude stays exact; null propagates") {
    // 2^126 ≈ 8.5e37 is the largest power-of-two tick inside decimal(38,0)
    val sp2 = java.math.BigInteger.ONE.shiftLeft(126).toString
    val df2 = Seq(Tuple1(sp2)).toDF("s").select($"s".cast("decimal(38,0)").as("sp"))
    val got2 = df2.select(Financial.q96RatioDecimal($"sp")).first().getDecimal(0)
    val q96 = new JBD(java.math.BigInteger.ONE.shiftLeft(96))
    val half = new JBD(java.math.BigInteger.ONE.shiftLeft(126))
      .divide(q96, new MathContext(50))
    val expect = half.multiply(half, new MathContext(50))
      .setScale(18, RoundingMode.HALF_UP)
    assert(expect.compareTo(got2) === 0)
    val gotNull = Seq(Tuple1(Option.empty[String])).toDF("s")
      .select($"s".cast("decimal(38,0)").as("sp"))
      .select(Financial.q96RatioDecimal($"sp")).first()
    assert(gotNull.isNullAt(0))
  }

  test("roundDown18 truncates (never rounds up)") {
    // 19th dp = 5: HALF_UP would give 2.0; ROUND_DOWN must keep ...999
    val df = Seq(Tuple1("1.9999999999999999995")).toDF("s")
      .select($"s".cast("decimal(38,19)").as("x"))
    val got = df.select(Financial.roundDown18($"x")).first().getDecimal(0)
    assert(got.toPlainString === "1.999999999999999999")
  }

  test("pctChange: null prev or zero prev -> null; rounding to 2dp") {
    val df = Seq(
      (110.0, Some(100.0)),
      (110.0, Some(0.0)),
      (110.0, None),
      (100.0, Some(300.0))).toDF("cur", "prev")
    val got = df.select(Financial.pctChange($"cur", $"prev")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) === 10.0)
    assert(got(1) === null)
    assert(got(2) === null)
    assert(got(3) === -66.67)
  }

  test("lastYear/lastQuarter: observed 14d behavior vs documented intent") {
    val df = Seq(Tuple1(java.sql.Date.valueOf("2025-05-15"))).toDF("d")
    val obs = df.select(
      Financial.lastYear($"d"), Financial.lastQuarter($"d"),
      Financial.lastYear($"d", intent = true),
      Financial.lastQuarter($"d", intent = true)).first()
    assert(obs.getDate(0).toString === "2025-05-01")  // -14d (quirk Q3)
    assert(obs.getDate(1).toString === "2025-05-01")  // -14d
    assert(obs.getDate(2).toString === "2024-05-15")  // intent: -1y
    assert(obs.getDate(3).toString === "2025-02-15")  // intent: -3mo
  }

  test("orZero zeroes nulls only") {
    val df = Seq(Some(2.5), None).map(Tuple1(_)).toDF("x")
    val got = df.select(Financial.orZero($"x")).collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(2.5, 0.0))
  }

  test("normalizeSymbol (F9, dead code in reference): 'v'-prefix idempotent") {
    val df = Seq(Some("DOT"), Some("vDOT"), Some("VGLMR"), Some("v"),
        Some(""), None).map(Tuple1(_)).toDF("s")
    val got = df.select(Financial.normalizeSymbol($"s")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq === Seq("vDOT", "vDOT", "VGLMR", "v", "v", null))
  }
}
