package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit, caller-controlled form of
  * Spark's runtime row-level filter (InjectRuntimeFilter): build a
  * bloom sketch over the (small) build side's join keys with ONE tiny
  * aggregate, broadcast the sketch as a one-row frame, pre-filter the
  * huge probe side with might_contain BEFORE its shuffle, then run the
  * exact join to remove the sketch's false positives.
  *
  * Semantics are IDENTICAL to the plain join (the exact join is still
  * there — the bloom only discards rows that cannot match;
  * oracle-checked by q_bloom_semi). At 100 TB the win is that only the
  * ~selectivity fraction of the probe side reaches the shuffle: the
  * sketch is a few MB broadcast against a scan, the same trade Spark's
  * automatic runtime filters make, but available deterministically at
  * plan-authoring time (the auto-injection bails on many shapes — e.g.
  * when the build side is itself an aggregate).
  *
  * Keys are hashed with xxhash64 on both sides, the same convention
  * Spark's runtime filter uses, so any key type works.
  */
object Bloom {

  /** Bloom sketch of `key` over `build`, materialized to the driver as
    * the serialized filter (numBits/8 bytes — the bounded-scalar
    * posture of the watermark reads; might_contain REQUIRES its filter
    * side to be a constant or scalar subquery, and this byte array is
    * exactly that scalar). The aggregation itself runs distributed
    * with map-side partial sketches; only the final binary lands on
    * the driver. */
  def sketch(build: DataFrame, key: Column,
             expectedItems: Long, numBits: Long): Array[Byte] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
    build.agg(agg.as("__bloom")).first().getAs[Array[Byte]](0)
  }

  /** might_contain predicate of `key` against the sketch column. */
  def mightContain(sketchCol: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      expression(sketchCol), expression(xxhash64(key))))
  }

  /** Inner semi join of `probe` on `probeKey` against `build`'s
    * `buildKey`, with the probe side bloom-pruned before its shuffle.
    * Output: probe rows whose key exists in build — identical to
    * `probe.join(build, probe(probeKey) === build(buildKey),
    * "left_semi")`. */
  def semiJoinPruned(probe: DataFrame, build: DataFrame,
                     probeKey: String, buildKey: String,
                     expectedItems: Long = 1000000L,
                     numBits: Long = 8388608L): DataFrame = {
    val bf = sketch(build, col(buildKey), expectedItems, numBits)
    val pruned = probe.filter(mightContain(lit(bf), col(probeKey)))
    pruned.join(build.select(col(buildKey)).distinct(),
      pruned(probeKey) === col(buildKey), "left_semi")
  }
}
