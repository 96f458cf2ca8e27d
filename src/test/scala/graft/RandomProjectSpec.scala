package graft

import org.apache.spark.sql.functions._

import graft.expr.Vectors
import graft.ops.Ann

/** JL random-projection kernel semantics: determinism from (outDim,
  * seed) alone, shape, zero/null handling, norm concentration on the
  * fixture corpus, and the two-stage rpTopK contract. */
class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private def emb = schema.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("deterministic in (outDim, seed); different seed differs") {
    val p1 = emb.select(Vectors.randomProject(col("vec"), 16).as("p"))
      .collect().map(_.getSeq[Double](0).toList)
    val p2 = emb.select(Vectors.randomProject(col("vec"), 16).as("p"))
      .collect().map(_.getSeq[Double](0).toList)
    assert(p1.toSeq === p2.toSeq)
    assert(p1.forall(_.length === 16))
    val other = emb.select(Vectors.randomProject(col("vec"), 16, seed = 7L).as("p"))
      .collect().map(_.getSeq[Double](0).toList)
    assert(p1.toSeq !== other.toSeq)
  }

  test("zero vector projects to zero; null elements read as 0") {
    val z = Seq(Seq.fill(8)(0.0f)).toDF("vec")
      .select(Vectors.randomProject(col("vec"), 4).as("p"))
      .collect().head.getSeq[Double](0)
    assert(z.forall(_ === 0.0))
    val withNull = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS vec")
      .select(Vectors.randomProject(col("vec"), 4).as("p"))
    val sansNull = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS vec")
      .select(Vectors.randomProject(col("vec"), 4).as("p"))
    assert(withNull.collect().head.getSeq[Double](0) ===
      sansNull.collect().head.getSeq[Double](0))
  }

  test("JL norm concentration on the fixture corpus (outDim 32)") {
    // ±1/√d projections concentrate |Px| around |x|; the fixture is
    // deterministic, so loose 2× bounds are a stable regression net
    val ratios = emb.limit(200)
      .select((Vectors.l2Norm(Vectors.randomProject(col("vec"), 32)) /
        Vectors.l2Norm(col("vec"))).as("r"))
      .collect().map(_.getDouble(0))
    assert(ratios.forall(r => r > 0.5 && r < 2.0),
      s"norm ratio escaped [0.5, 2.0]: min=${ratios.min} max=${ratios.max}")
  }

  test("rpTopK returns k exact-cosine-ranked rows per query") {
    val got = Ann.rpTopK(emb.filter(col("id") < 3), emb, k = 4,
      outDim = 32, rerankFactor = 6)
    val byQ = got.collect().groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length === 4)
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.toSeq === sims.sortBy(-_).toSeq, "rank must follow exact sim")
    }
  }

  test("non-numeric array input fails type check") {
    val e = intercept[Exception] {
      Seq(Seq("a", "b")).toDF("vec")
        .select(Vectors.randomProject(col("vec"), 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_random_project") ||
      e.getMessage.toLowerCase.contains("requires array"))
  }
}
