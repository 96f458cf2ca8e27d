package graft

import org.apache.spark.sql.functions._

import graft.functions.TypedAggregators

/** Typed Aggregator API: WeightedMean agrees with the expression
  * formulation and is invariant to partitioning (decimal accumulation). */
class TypedAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean == sum(w*x)/sum(w) and is partition-order invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(4).toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 10 + 0.1))
    val ds = rows.toDF("g", "x", "w").as[(Long, Double, Double)]

    val wm = udaf(new TypedAggregators.WeightedMean)
    val got1 = ds.repartition(1).groupBy("g").agg(wm(col("x"), col("w")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got8 = ds.repartition(8).groupBy("g").agg(wm(col("x"), col("w")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got1 === got8, "decimal accumulation must make merge order invisible")

    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val num = rs.map { case (_, x, w) =>
        java.math.BigDecimal.valueOf(x).multiply(java.math.BigDecimal.valueOf(w))
          .setScale(18, java.math.RoundingMode.HALF_UP) }
        .reduce(_.add(_))
      val den = rs.map { case (_, _, w) => java.math.BigDecimal.valueOf(w) }
        .reduce(_.add(_))
      g -> num.divide(den, java.math.MathContext.DECIMAL64).doubleValue()
    }
    expected.foreach { case (g, m) =>
      assert(math.abs(got1(g) - m) < 1e-12, s"group $g")
    }
  }

  test("WeightedMean on typed Dataset via toColumn") {
    val ds = Seq((1.0, 1.0), (3.0, 3.0)).toDS()
    val m = ds.select(new TypedAggregators.WeightedMean().toColumn).first()
    assert(math.abs(m - 2.5) < 1e-12)  // (1*1 + 3*3) / 4
  }
}
