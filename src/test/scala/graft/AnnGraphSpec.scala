package graft

import org.apache.spark.sql.functions._

import graft.ops.Ann

/** NN-descent k-NN graph (Ann.knnGraph): shape, determinism, and the
  * property that makes it worth having — neighbor recall against the
  * brute-force truth rises monotonically-in-practice with rounds and
  * reaches near-convergence by round 2 on the fixture embeddings. */
class AnnGraphSpec extends SparkSpec {

  private def emb = schema.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("knnGraph emits exactly k ranked neighbors per node, no self-loops, deterministically") {
    val g = Ann.knnGraph(emb, k = 5, rounds = 2).cache()
    val n = emb.count()
    assert(g.count() === n * 5)
    assert(g.filter(col("id") === col("nid")).count() === 0)
    val badRank = g.groupBy(col("id"))
      .agg(count(lit(1)).as("c"), min("rank").as("lo"), max("rank").as("hi"))
      .filter(col("c") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
    assert(badRank.count() === 0, "every node must hold ranks 1..5")
    // determinism: a rebuild is row-identical (hash init, exact cosine,
    // deterministic tie-breaks — nothing samples)
    val g2 = Ann.knnGraph(emb, k = 5, rounds = 2)
    assert(g.exceptAll(g2).count() === 0)
    assert(g2.exceptAll(g).count() === 0)
    g.unpersist()
  }

  /** Mean over the first 32 nodes of |graph top-5 ∩ brute top-5| / 5
    * (brute truth for every node is the O(n²) join the graph build
    * exists to avoid). */
  private def recallAt5(corpus: org.apache.spark.sql.DataFrame,
                        g: org.apache.spark.sql.DataFrame): Double = {
    val truth = Ann.bruteTopK(corpus.filter(col("id") < 32), corpus, k = 5)
      .select(col("qid").as("id"), col("nid"))
    val hit = g.filter(col("id") < 32 && col("rank") <= 5)
      .select(col("id"), col("nid")).join(truth, Seq("id", "nid")).count()
    hit.toDouble / truth.count()
  }

  /** 500 points in 25 tight gaussian clusters (seeded — deterministic):
    * the structured case NN-descent's neighbor-of-neighbor iteration
    * exploits. Real embedding corpora are clustered; the fixture's
    * i.i.d. random vectors are the algorithm's documented worst case
    * (Dong et al. 2011 tie convergence to intrinsic dimensionality),
    * which is why the quality gate runs here and the driver oracle
    * (q_ann_graph) pins the algorithm value-exactly instead. */
  private def clustered: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(25)(Array.fill(16)(rnd.nextGaussian().toFloat))
    (0 until 500).map { i =>
      val c = cents(i % 25)
      (i.toLong, c.map(v => v + 0.15f * rnd.nextGaussian().toFloat))
    }.toDF("id", "vec")
  }

  test("neighbor recall converges on a structured corpus: ring init is near-zero, six local-join rounds reach brute truth") {
    val corpus = clustered.cache()
    val r0 = recallAt5(corpus, Ann.knnGraph(corpus, k = 10, rounds = 0, reverseCap = 10))
    val r6 = recallAt5(corpus, Ann.knnGraph(corpus, k = 10, rounds = 6, reverseCap = 10))
    assert(r0 < 0.5, s"ring init unexpectedly good: $r0")
    assert(r6 >= 0.95, s"converged neighbor recall too low: $r6 (init $r0)")
    corpus.unpersist()
  }

  test("reverseCap = 0 disables reverse sampling instead of crashing; the graph still holds shape") {
    val g = Ann.knnGraph(emb, k = 3, rounds = 1, reverseCap = 0)
    assert(g.groupBy("id").count().filter(col("count") =!= 3).count() === 0)
  }

  test("recall rises with rounds on the fixture too — the unstructured worst case improves monotonically") {
    val r0 = recallAt5(emb, Ann.knnGraph(emb, k = 5, rounds = 0))
    val r2 = recallAt5(emb, Ann.knnGraph(emb, k = 5, rounds = 2))
    assert(r2 >= r0, s"rounds must not hurt recall: $r0 -> $r2")
  }

  test("graph index: persisted layout serves deterministic beam-search top-k; rebuild advances the manifest version") {
    val p = java.nio.file.Files.createTempDirectory("graft-gidx-spec").toString
    Ann.writeGraphIndex(emb, p, k = 5, rounds = 2, reverseCap = 5,
      nBuckets = 8, nSeeds = 4)
    val q = emb.filter(col("id") < 8)
    val a = Ann.probeGraphIndex(q, p, k = 5, beamWidth = 8, hops = 2).cache()
    // shape: exactly k ranked rows per query, no self-matches
    assert(a.count() === 8 * 5)
    assert(a.filter(col("qid") === col("nid")).count() === 0)
    val badRank = a.groupBy("qid")
      .agg(count(lit(1)).as("c"), min("rank").as("lo"), max("rank").as("hi"))
      .filter(col("c") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
    assert(badRank.count() === 0)
    // determinism: a second probe of the same layout is row-identical
    val b = Ann.probeGraphIndex(q, p, k = 5, beamWidth = 8, hops = 2)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    // lifecycle: a rebuild commits a NEW manifest version (probes pin)
    val v1 = graft.ops.IndexManifest.pin(spark, p).version
    Ann.writeGraphIndex(emb, p, k = 5, rounds = 2, reverseCap = 5,
      nBuckets = 8, nSeeds = 4)
    assert(graft.ops.IndexManifest.pin(spark, p).version > v1)
    a.unpersist()
  }

  test("graph-index beam search: entry coverage is the dial — starved seeds miss clusters, covering seeds reach brute truth") {
    // the design's honest limit, pinned as a SPEC: a converged k-NN
    // graph on clustered data is disconnected ACROSS clusters, so beam
    // search reaches only clusters a seed lands in. 8 hash-random
    // seeds over 25 clusters must miss most of them; 128 seeds cover
    // every cluster (coupon-collector: P(miss) ≈ 25·e^(-128·20/500)
    // ≈ 0.15) and the probe then finds the exact top-5 of every query.
    val corpus = clustered.cache()
    def recallWithSeeds(nSeeds: Int): Double = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-gidx-q$nSeeds").toString
      Ann.writeGraphIndex(corpus, p, k = 10, rounds = 6, reverseCap = 10,
        nBuckets = 8, nSeeds = nSeeds)
      val q = corpus.filter(col("id") < 32)
      val served = Ann.probeGraphIndex(q, p, k = 5, beamWidth = 16, hops = 3)
        .select(col("qid").as("id"), col("nid"))
      val truth = Ann.bruteTopK(q, corpus, k = 5)
        .select(col("qid").as("id"), col("nid"))
      served.join(truth, Seq("id", "nid")).count().toDouble / truth.count()
    }
    val starved = recallWithSeeds(8)
    val covered = recallWithSeeds(128)
    assert(starved < 0.7, s"8 seeds over 25 clusters should starve: $starved")
    assert(covered >= 0.95, s"beam-search recall too low at 128 seeds: $covered")
    corpus.unpersist()
  }
}
