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
    private def term(x: Double, w: Double) =
      java.math.BigDecimal.valueOf(x).multiply(java.math.BigDecimal.valueOf(w))
        .setScale(18, java.math.RoundingMode.HALF_UP)

    override def zero: (java.math.BigDecimal, java.math.BigDecimal) =
      (java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)

    override def reduce(b: (java.math.BigDecimal, java.math.BigDecimal),
                        a: (Double, Double)): (java.math.BigDecimal, java.math.BigDecimal) =
      (b._1.add(term(a._1, a._2)), b._2.add(java.math.BigDecimal.valueOf(a._2)))

    override def merge(x: (java.math.BigDecimal, java.math.BigDecimal),
                       y: (java.math.BigDecimal, java.math.BigDecimal)): (java.math.BigDecimal, java.math.BigDecimal) =
      (x._1.add(y._1), x._2.add(y._2))

    override def finish(r: (java.math.BigDecimal, java.math.BigDecimal)): Double =
      if (r._2.signum() == 0) Double.NaN
      else r._1.divide(r._2, java.math.MathContext.DECIMAL64).doubleValue()

    override def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
