package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic training-order operators: the properties a training
  * pipeline actually relies on — reproducibility across runs AND
  * partitionings, per-epoch permutation independence, dense shard
  * positions, exact expected copy counts. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("epochShuffle: deterministic, partitioning-invariant, dense per shard") {
    val d = ids(500)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.epochShuffle(df, "id", epoch = 1, nShards = 4)
        .select("id", "shuffle_key", "shard", "pos_in_shard")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val a = run(d)
    assert(a === run(d), "same epoch must reproduce bit-for-bit")
    assert(a === run(d.repartition(13)),
      "the permutation must not depend on input partitioning")
    // positions are dense 1..n within each shard
    val byShard = a.groupBy(_._3)
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._4).toSeq.sorted === (1L to rows.size).toSeq)
    }
    // every shard populated, roughly balanced (500 rows / 4 shards)
    assert(byShard.keySet === Set(0, 1, 2, 3))
    assert(byShard.values.forall(s => s.size > 60 && s.size < 190))
    // within-shard order follows (key, id) ascending
    byShard.values.foreach { rows =>
      val inPos = rows.toSeq.sortBy(_._4).map(r => (r._2, r._1))
      assert(inPos === inPos.sorted, "pos order must equal (key, id) order")
    }
  }

  test("epochShuffle: different epochs give different permutations") {
    val d = ids(300)
    def order(e: Int) =
      Sampling.epochShuffle(d, "id", epoch = e, nShards = 1)
        .orderBy("pos_in_shard").select("id").collect().map(_.getLong(0)).toSeq
    val e1 = order(1)
    val e2 = order(2)
    assert(e1.sorted === e2.sorted, "same rows every epoch")
    assert(e1 !== e2, "epochs must permute differently")
    assert(e1 !== e1.sorted, "the shuffle must actually shuffle")
  }

  test("weightedUpsample: integer weights replicate exactly, 0 drops") {
    val d = Seq((1L, 0.0), (2L, 1.0), (3L, 2.0), (4L, 3.0))
      .toDF("id", "w")
    val out = Sampling.weightedUpsample(d, "id", col("w"))
      .groupBy("id").agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("rep"))).as("reps"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toSeq)).sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq === Seq((2L, 1L), (3L, 2L), (4L, 3L)))
    out.foreach { case (_, n, reps) => assert(reps === (0L until n)) }
  }

  test("weightedUpsample: fractional weights are deterministic and unbiased-ish") {
    val d = ids(2000).withColumn("w", lit(0.5))
    def counts(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedUpsample(df, "id", col("w"), salt = 3L)
        .groupBy("id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = counts(d)
    assert(a === counts(d.repartition(7)),
      "the coin must not depend on partitioning")
    // every surviving row has exactly 1 copy at w=0.5; about half survive
    assert(a.values.forall(_ === 1L))
    assert(a.size > 800 && a.size < 1200, s"got ${a.size} of 2000 at w=0.5")
    // different salt draws a different subset of the same expected size
    val b = Sampling.weightedUpsample(d, "id", col("w"), salt = 4L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(b !== a.keySet)
  }

  test("weightedUpsample: null/NaN weight fails loudly instead of dropping rows") {
    val bad = Seq((1L, Some(1.5)), (2L, None)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedUpsample(bad, "id", col("w")).collect()
    }
    assert(e.getMessage.contains("weightedUpsample"), e.getMessage)
    val nan = Seq((1L, Double.NaN)).toDF("id", "w")
    val e2 = intercept[Exception] {
      Sampling.weightedUpsample(nan, "id", col("w")).collect()
    }
    assert(e2.getMessage.contains("weightedUpsample"), e2.getMessage)
    // +Infinity (the x/0.0 upstream bug) and runaway weights hit the
    // maxWeight rail with the id in the message — not an opaque
    // Long.MaxValue explode
    val inf = Seq((7L, Double.PositiveInfinity)).toDF("id", "w")
    val e3 = intercept[Exception] {
      Sampling.weightedUpsample(inf, "id", col("w")).collect()
    }
    assert(e3.getMessage.contains("weightedUpsample"), e3.getMessage)
    val big = Seq((8L, 5000.0)).toDF("id", "w")
    val e4 = intercept[Exception] {
      Sampling.weightedUpsample(big, "id", col("w")).collect()
    }
    assert(e4.getMessage.contains("over-rail") ||
      e4.getMessage.contains("weightedUpsample"), e4.getMessage)
    // a deliberately raised rail admits the same weight
    assert(Sampling.weightedUpsample(big, "id", col("w"),
      maxWeight = 10000.0).count() === 5000L)
  }

  test("output column collisions are refused up front") {
    val d = ids(3).withColumn("shard", lit(1))
    val e = intercept[IllegalArgumentException] {
      Sampling.epochShuffle(d, "id", epoch = 1, nShards = 2)
    }
    assert(e.getMessage.contains("shard"))
    val r = ids(3).withColumn("rep", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.weightedUpsample(r, "id", lit(1.0))
    }
    assert(e2.getMessage.contains("rep"))
  }

  test("weightedUpsample: fractional arm adds at most one copy over floor") {
    val d = ids(1000).withColumn("w", lit(1.75))
    val n = Sampling.weightedUpsample(d, "id", col("w"))
      .groupBy("id").count().collect().map(_.getLong(1))
    assert(n.forall(c => c == 1L || c == 2L))
    val total = n.sum
    assert(total > 1650 && total < 1850, s"E[total]=1750, got $total")
  }
}
