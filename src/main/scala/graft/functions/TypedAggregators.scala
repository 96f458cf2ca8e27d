package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (the user-facing typed
  * aggregation API; see SURVEY §1.3 — the engine is DataFrame-first,
  * but typed aggregators are part of the complete API story and are
  * what a Dataset[T] caller would reach for).
  *
  * Exact decimal accumulation: weighted sums carry
  * java.math.BigDecimal, so results are order-independent across
  * partitions (double accumulation would make merge order observable).
  */
object TypedAggregators {

  /** Weighted mean of (value, weight) pairs: Σwx / Σw. Each term is
    * quantized to 18 dp once at reduce time, so partition merge order
    * cannot change the result. */
  class WeightedMean extends Aggregator[(Double, Double), (java.math.BigDecimal, java.math.BigDecimal), Double] {
    private def dec(v: Double, what: String): java.math.BigDecimal = {
      // BigDecimal.valueOf(NaN/Infinity) throws a bare
      // NumberFormatException — name the offender instead
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        throw new IllegalArgumentException(
          s"WeightedMean: non-finite $what $v — decimal-exact " +
            "accumulation cannot represent NaN/Infinity; filter or " +
            "degrade non-finite inputs upstream")
      java.math.BigDecimal.valueOf(v)
    }

    private def term(x: Double, w: Double) =
      dec(x, "value").multiply(dec(w, "weight"))
        .setScale(18, java.math.RoundingMode.HALF_UP)

    override def zero: (java.math.BigDecimal, java.math.BigDecimal) =
      (java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)

    override def reduce(b: (java.math.BigDecimal, java.math.BigDecimal),
                        a: (Double, Double)): (java.math.BigDecimal, java.math.BigDecimal) =
      (b._1.add(term(a._1, a._2)), b._2.add(dec(a._2, "weight")))

    override def merge(x: (java.math.BigDecimal, java.math.BigDecimal),
                       y: (java.math.BigDecimal, java.math.BigDecimal)): (java.math.BigDecimal, java.math.BigDecimal) =
      (notOverflowed(x._1).add(notOverflowed(y._1)),
        notOverflowed(x._2).add(notOverflowed(y._2)))

    /** The buffer crosses the shuffle as Decimal(38,18)
      * (Encoders.DECIMAL): a weighted sum beyond 20 integer digits
      * serializes to NULL there, which would surface as a bare NPE —
      * name the overflow instead. */
    private def notOverflowed(v: java.math.BigDecimal): java.math.BigDecimal = {
      if (v == null) throw new IllegalStateException(
        "WeightedMean: accumulated sum overflowed Decimal(38,18) at the " +
          "shuffle boundary (over 20 integer digits) — rescale the " +
          "inputs; the buffer encoder cannot carry larger sums")
      v
    }

    override def finish(r: (java.math.BigDecimal, java.math.BigDecimal)): Double =
      if (r._2 == null || r._1 == null) notOverflowed(null).doubleValue()
      else if (r._2.signum() == 0) Double.NaN
      else r._1.divide(r._2, java.math.MathContext.DECIMAL64).doubleValue()

    override def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
