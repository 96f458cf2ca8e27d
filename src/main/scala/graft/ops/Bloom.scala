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
  * sketch is a few MB delivered to the scan via a scalar subquery
  * (computed distributed, never rendered into plan strings the way a
  * byte-array Literal would be), the same trade Spark's automatic
  * runtime filters make, but available deterministically at
  * plan-authoring time (the auto-injection bails on many shapes — e.g.
  * when the build side is itself an aggregate).
  *
  * Keys are hashed with xxhash64 on both sides, the same convention
  * Spark's runtime filter uses, so any key type works.
  */
object Bloom {

  /** One-row frame holding the bloom sketch of `key` over `build` —
    * a distributed aggregation with map-side partial sketches. */
  def sketchFrame(build: DataFrame, key: Column,
                  expectedItems: Long, numBits: Long): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
    build.agg(agg.as("__bloom"))
  }

  /** The sketch as a SCALAR SUBQUERY column — the form might_contain
    * accepts that keeps the (potentially MBs-large) filter out of the
    * driver and out of plan strings (a byte-array Literal hex-prints
    * in full into every explain/UI description). */
  def sketchScalar(build: DataFrame, key: Column,
                   expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.column
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      sketchFrame(build, key, expectedItems, numBits).queryExecution.logical))
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
    * "left_semi")`.
    *
    * `build` MUST be deterministic: it evaluates twice (once into the
    * bloom sketch, once in the exact semi join), and a nondeterministic
    * build side — rand()/sample/unordered limit — could sketch one key
    * set and join another, silently dropping probe rows the exact join
    * would match. Same caveat as Spark's own runtime filters. Callers
    * that cannot guarantee it should pass
    * `Reliable.checkpoint(build)` so both consumers read one
    * materialized copy. */
  def semiJoinPruned(probe: DataFrame, build: DataFrame,
                     probeKey: String, buildKey: String,
                     expectedItems: Long = 1000000L,
                     numBits: Long = 8388608L): DataFrame = {
    val bf = sketchScalar(build, col(buildKey), expectedItems, numBits)
    val pruned = probe.filter(mightContain(bf, col(probeKey)))
    // no distinct: left_semi is invariant to build-side duplicates;
    // dataset-qualified refs keep same-named keys unambiguous
    val b = build.select(col(buildKey))
    pruned.join(b, pruned(probeKey) === b(buildKey), "left_semi")
  }
}
