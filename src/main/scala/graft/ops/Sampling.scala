package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order operators: reproducible epoch shuffle
  * with shard assignment, and weighted up/down-sampling. Every
  * "random" decision is a pure function of (row id, declared seed)
  * via xxhash64, so two runs — or two engines — agree bit-for-bit:
  * the property a training pipeline needs to resume mid-epoch, re-run
  * a job after a failure, or audit exactly which documents a model
  * saw. No RNG state, no rand(): `rand()` re-draws on task retry and
  * changes with partitioning — it can never be the shuffle key of a
  * reproducible data order.
  *
  * The reference has no training surface (its scope ends at warehouse
  * ETL, `Stellar.py:16-266`); this is north-star mandate surface.
  */
object Sampling {

  /** Reproducible epoch shuffle: (shuffle_key, shard, pos_in_shard)
    * for every row, keyed by xxhash64(id, epoch) — a different
    * pseudorandom permutation each epoch, the same permutation every
    * time that epoch is re-run. shard = pmod(key, nShards)
    * (statistically balanced); within-shard order is (key, id)
    * ascending, the id tie-break making the order total even if two
    * ids collide on the 64-bit key.
    *
    * Scale shape: one hash-shuffle on `shard` and a shard-local sort
    * (the window never sees more than one shard) — no global total
    * order is materialized, because trainers only consume per-shard
    * order. nShards should be sized so one shard's keys sort in one
    * executor (at 100 TB: thousands of shards, not 8). */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val added = Seq("shuffle_key", "shard", "pos_in_shard")
    require(!df.columns.exists(added.contains),
      s"columns ${added.mkString(", ")} are produced by epochShuffle — " +
        "rename the input's clashing column (withColumn would silently " +
        "overwrite it)")
    // contract: idCol is unique and non-null. A duplicate id collides
    // on the key and ties on the (key, id) sort, so the relative order
    // of its copies — and their pos_in_shard — would be partitioning-
    // dependent; null ids all hash to one key with the same tie.
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", xxhash64(col(idCol), lit(epoch.toLong)))
      .withColumn("shard",
        pmod(col("shuffle_key"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
  }

  /** Deterministic weighted up/down-sampling: a row with weight `w`
    * emits floor(w) + (u < frac(w) ? 1 : 0) copies, where u ∈ [0,1)
    * is the row's xxhash64(id, salt) mapped to the unit interval —
    * E[copies] = w exactly, per row, with no RNG state. Weights < 1
    * subsample (the temperature-mix down-weighting case), weights > 1
    * replicate; each surviving copy carries `rep` 0..n-1 so
    * downstream shuffles and dedups can tell copies apart.
    *
    * The unit draw compares INTEGERS, not floats: u53 = key >>> 11
    * (the top 53 bits, exactly representable) against
    * floor(frac(w)·2^53) — the same comparison any engine reproduces
    * bit-for-bit, which a float `u < frac` threshold would not
    * guarantee at the boundary.
    *
    * Scale shape: per-row work plus one bounded explode (≤ ceil(max
    * w) copies); no shuffle, no state. */
  def weightedUpsample(df: DataFrame, idCol: String, weight: Column,
                       salt: Long = 0L, maxWeight: Double = 1000.0): DataFrame = {
    require(!df.columns.contains("rep"),
      "column rep is produced by weightedUpsample — rename the input's")
    require(maxWeight > 0 && !maxWeight.isInfinite && !maxWeight.isNaN,
      s"maxWeight must be a positive finite rail, got $maxWeight")
    // a null/NaN/negative weight would otherwise DROP the row silently
    // (null copies fails the >0 filter; ANSI would kill the whole scan
    // on cast(NaN as long)); a +Infinity or runaway-large weight (the
    // x/0.0 upstream bug) would explode the row into a Long.MaxValue
    // sequence and die with an opaque array-size error. Both violate
    // the fail-loudly contract — refuse per offending row with the id
    // in the message. maxWeight is the replication rail: genuine
    // upsampling factors are small; raise it deliberately if not.
    val checked = when(weight.isNull || isnan(weight) || weight < 0 ||
          weight > maxWeight,
        raise_error(concat(
          lit("weightedUpsample: null/NaN/negative/over-rail (max "),
          lit(maxWeight), lit(") weight "),
          coalesce(weight.cast("string"), lit("null")),
          lit(" for id "),
          coalesce(col(idCol).cast("string"), lit("null")))).cast("double"))
      .otherwise(weight)
    val key = xxhash64(col(idCol), lit(salt))
    val base = floor(checked).cast("long")
    val thresh = floor((checked - floor(checked)) * lit(9007199254740992.0))
      .cast("long") // floor(frac(w) * 2^53)
    val copies = base +
      when(shiftrightunsigned(key, 11) < thresh, 1L).otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("rep",
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }
}
