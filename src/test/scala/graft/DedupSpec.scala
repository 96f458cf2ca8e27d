package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dedup operator semantics + near-dup detection quality (planted
  * duplicates must be found; unrelated docs must not pair up). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("firstSeen keeps exactly the first row per key under the given order") {
    val df = Seq(
      (1L, 3, "c"), (1L, 1, "a"), (1L, 2, "b"),
      (2L, 5, "e")).toDF("k", "seq", "v")
    val out = Dedup.firstSeen(df, Seq("k"), Seq(col("seq"))).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq((1L, "a"), (2L, "e")))
  }

  test("top1PerKey keeps the latest row per key") {
    val df = Seq(
      ("btc", 1, 100.0), ("btc", 3, 300.0), ("btc", 2, 200.0),
      ("eth", 7, 7.0)).toDF("sym", "t", "price")
    val out = Dedup.top1PerKey(df, Seq("sym"), Seq(col("t"))).orderBy("sym")
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(out.toSeq === Seq(("btc", 300.0), ("eth", 7.0)))
  }

  test("exactByHash collapses identical content, keeps smallest tiebreak") {
    val df = Seq(
      (10L, "same text here"), (3L, "same text here"), (7L, "other text")
    ).toDF("id", "text")
    val out = Dedup.exactByHash(df, "text", col("id"))
      .orderBy("id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(3L, 7L))
  }

  private def corpus(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 200).map(i => s"w$i")
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.fill(50)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // planted near-dups: copy docs 0..9 with one word changed
    val nearDups = (0 until 10).map { i =>
      val words = base(i)._2.split(" ")
      words(25) = "CHANGED"
      ((100 + i).toLong, words.mkString(" "))
    }
    base ++ nearDups
  }

  test("minhashLshPairs finds planted near-dups with high recall, few false pairs") {
    val df = corpus().toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(i => (i.toLong, (100 + i).toLong)).toSet
    val recall = planted.count(pairs.contains).toDouble / planted.size
    assert(recall >= 0.8, s"recall $recall, pairs found: $pairs")
    // false-pair rate: random 50-word docs over 200-word vocab share few
    // 3-gram shingles; allow a handful of band collisions
    assert((pairs -- planted).size <= 5, s"too many false pairs: ${pairs -- planted}")
  }

  test("plannedBanding picks the margin-maximal divisor pair (brute-force ground truth)") {
    // independent scalar restatement of the S-curve margin over every
    // divisor pair — the planner must agree for several (k, profile)s
    def prob(s: Double, r: Int, b: Int): Double = {
      val sr = (1 to r).map(_ => s).reduce(_ * _)
      1.0 - (1 to b).map(_ => 1.0 - sr).reduce(_ * _)
    }
    for ((k, t, n) <- Seq((12, 0.8, 0.3), (12, 0.95, 0.6), (16, 0.7, 0.2),
                          (24, 0.85, 0.4), (8, 0.9, 0.1))) {
      val expected = (1 to k).filter(k % _ == 0)
        .map(r => (r, k / r))
        .maxBy { case (r, b) => (prob(t, r, b) - prob(n, r, b), -r) }
      assert(Dedup.plannedBanding(spark, k, t, n) === expected,
        s"k=$k target=$t noise=$n")
    }
    // the q_lsh_plan_applied configuration specifically: (r=3, b=4)
    assert(Dedup.plannedBanding(spark, 12, 0.8, 0.3) === ((3, 4)))
  }

  test("minhashLshPairsPlanned: planner config's pairs are a subset of the hand-picked r=2 pairs and keep planted recall") {
    // r=3 bands each CONTAIN a whole r=2 band ([1-3]⊇[1-2], [4-6]⊇[5-6],
    // [7-9]⊇[7-8], [10-12]⊇[11-12]), so the stricter planned config can
    // only drop pairs, never invent them
    val df = corpus().toDF("doc_id", "text")
    val planned = Dedup.minhashLshPairsPlanned(df, "doc_id", "text",
        targetSim = 0.8, noiseSim = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hand = Dedup.minhashLshPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planned.subsetOf(hand),
      s"planned pairs not a subset: ${planned -- hand}")
    val planted = (0 until 10).map(i => (i.toLong, (100 + i).toLong)).toSet
    val recall = planted.count(planned.contains).toDouble / planted.size
    assert(recall >= 0.8, s"planned-config recall $recall")
  }

  test("minhashLshCandidates: boilerplate cluster is flagged, not paired") {
    // 30 identical boilerplate docs + the normal corpus with planted dups
    val boiler = (500 until 530).map(i =>
      (i.toLong, "standard legal disclaimer text repeated verbatim in every doc " * 3))
    val df = (corpus() ++ boiler).toDF("doc_id", "text")
    val res = Dedup.minhashLshCandidates(df, "doc_id", "text", maxBucket = 10)
    val pairs = res.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no O(n²) explosion: zero pairs among the boilerplate cluster
    assert(!pairs.exists { case (a, b) => a >= 500 && b >= 500 },
      s"boilerplate pairs leaked: ${pairs.filter(p => p._1 >= 500)}")
    // the cluster surfaces in the side output with a bounded sample
    val flagged = res.flaggedBuckets.collect()
    assert(flagged.nonEmpty, "expected flagged oversized buckets")
    assert(flagged.forall(r => r.getAs[Long]("n_ids") === 30L))
    assert(flagged.forall(r => r.getAs[Seq[String]]("sample_ids").size <= 20))
    // the bounded sample is the 20 SMALLEST member ids, ascending
    assert(flagged.forall(r =>
      r.getAs[Seq[String]]("sample_ids") == (500 until 520).map(_.toString)))
    // normal near-dups still found
    val planted = (0 until 10).map(i => (i.toLong, (100 + i).toLong)).toSet
    assert(planted.count(pairs.contains) >= 8)
    // uncapped convenience is unchanged semantics
    val uncapped = Dedup.minhashLshPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count { case (a, b) => a >= 500 && b >= 500 } === 30 * 29 / 2)
    // and on a flood-free corpus, the capped and uncapped paths emit
    // the IDENTICAL pair set (the sizing pass must not change results)
    val clean = corpus().toDF("doc_id", "text")
    val cap = Dedup.minhashLshCandidates(clean, "doc_id", "text", maxBucket = 10)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val noCap = Dedup.minhashLshPairs(clean, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cap === noCap)
  }

  test("ngramContainment: a quote inside a larger doc scores containment 1.0 with small jaccard; directions are asymmetric") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y a b c d e q r s t u v w"),
      (3L, "totally different words entirely")).toDF("id", "text")
    val out = Dedup.ngramContainment(docs, "id", "text",
        Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._2)
    // doc 1 has 3 shingles, all inside doc 2 (12 shingles): full
    // containment one way, 3/12 the other, jaccard 3/12
    assert(out(0) === ((1L, 2L, 3L, 1.0, 3.0 / 12, 3.0 / 12)))
    // disjoint docs: zero everywhere
    assert(out(1)._3 === 0L && out(1)._4 === 0.0 && out(1)._6 === 0.0)
  }

  test("connectedComponents: STRING ids converge exactly (type-agnostic convergence test)") {
    // a diameter-3 chain a-b-c-d: the old sum(rep cast decimal)
    // convergence test cast string reps to NULL, saw ZERO every round,
    // and declared convergence after ONE propagation — silently split
    // components for the ids Linkage.resolveEntities commonly feeds in
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(Seq("a", "b", "c", "d").map(out(_)._1).distinct === Seq("a"),
      s"chain must collapse to one rep, got $out")
    assert(Seq("a", "b", "c", "d").forall(out(_)._2 === 4L))
    assert(out("x")._1 === "x" && out("y")._1 === "x")
  }

  test("banding requires bandRows to divide k; scratch-column collisions are loud") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshCandidates(d, "doc_id", "text", k = 12, bandRows = 5)
    }
    assert(e.getMessage.contains("must divide"), e.getMessage)
    val clash = d.withColumn("__h", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.exactByHash(clash, "text", col("doc_id"))
    }
    assert(e2.getMessage.contains("__h"), e2.getMessage)
    val clash2 = d.withColumn("__rn", lit(1))
    val e3 = intercept[IllegalArgumentException] {
      Dedup.firstSeen(clash2, Seq("doc_id"), Seq(col("doc_id")))
    }
    assert(e3.getMessage.contains("__rn"), e3.getMessage)
  }

  test("capped candidate generation with STRING ids: cap works, flood sample is the bounded {min,max} witness") {
    val near = Seq(("a", "alpha beta gamma delta epsilon"),
      ("b", "alpha beta gamma delta zeta"))
    // 30 identical string-id docs share every band; cap at 10 — the
    // flood must divert (no pairs) with a bounded min/max id sample,
    // not refuse (the pre-r10 capability regression, ADVICE r9) and
    // not buffer the membership
    val boiler = (100 until 130).map(i => (f"doc$i%03d", "same boilerplate text here"))
    val df = (near ++ boiler).toDF("doc_id", "text")
    val res = Dedup.minhashLshCandidates(df, "doc_id", "text", maxBucket = 10)
    val pairs = res.pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("a", "b"))), s"flood must not pair: $pairs")
    val flagged = res.flaggedBuckets
      .select("n_ids", "sample_ids").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(flagged.nonEmpty)
    assert(flagged.forall { case (n, s) =>
      n === 30L && s === Seq("doc100", "doc129") },
      s"expected {min,max} witness pair, got ${flagged.toSeq}")
    // simhash path shares the same sizing pass: the flood must divert
    // (never pair) under string ids too
    val sim = Dedup.simhashCandidates(df, "doc_id", "text", maxBucket = 10)
    val simPairs = sim.pairs.collect().map(r => (r.getString(0), r.getString(1)))
    assert(!simPairs.exists { case (a, b) =>
      a.startsWith("doc") && b.startsWith("doc") }, s"flood paired: ${simPairs.toSeq}")
    assert(sim.flaggedBuckets.count() > 0)
  }

  test("simhashCandidates: flood bucket diverts with a bounded sample, never pairs") {
    // 40 identical docs share EVERY simhash chunk; cap at 25
    val boiler = (900 until 940).map(i => (i.toLong, "same exact boilerplate text here"))
    val normal = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "totally different content words entirely distinct"))
    val df = (normal ++ boiler).toDF("doc_id", "text")
    val res = Dedup.simhashCandidates(df, "doc_id", "text", maxBucket = 25)
    val pairs = res.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists { case (a, b) => a >= 900 && b >= 900 },
      "flood bucket must not pair")
    val flagged = res.flaggedBuckets.collect()
    assert(flagged.nonEmpty)
    assert(flagged.forall(r => r.getAs[Long]("n_ids") === 40L))
    assert(flagged.forall(r => r.getAs[Seq[String]]("sample_ids") == (900 until 920).map(_.toString)))
    // flood-free input: capped == uncapped pair-for-pair
    val clean = normal.toDF("doc_id", "text")
    def ps(cap: Int) = Dedup.simhashPairs(clean, "doc_id", "text", maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ps(25) === ps(Int.MaxValue))
  }

  test("ngramJaccard: near-dups score high, unrelated docs score low") {
    val df = corpus().toDF("doc_id", "text")
    val pairs = ((0 until 10).map(i => (i.toLong, (100 + i).toLong)) ++
      Seq((0L, 30L), (1L, 31L))).toDF("id_a", "id_b")
    val scored = Dedup.ngramJaccard(df, "doc_id", "text", pairs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    (0 until 10).foreach { i =>
      assert(scored((i.toLong, (100 + i).toLong)) > 0.8)
    }
    assert(scored((0L, 30L)) < 0.2 && scored((1L, 31L)) < 0.2)
  }

  test("simhashPairs finds planted near-dups via banded buckets") {
    val df = corpus().toDF("doc_id", "text")
    // one-word-changed copies land within hamming<=12 typically; use a
    // generous band count so the pigeonhole bound covers them
    val pairs = Dedup.simhashPairs(df, "doc_id", "text",
        nBands = 8, maxHamming = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(i => (i.toLong, (100 + i).toLong)).toSet
    val found = planted.count(pairs.contains)
    assert(found >= 7, s"simhash recall $found/10; pairs=$pairs")
    assert((pairs -- planted).size <= 5, s"false pairs: ${pairs -- planted}")
  }

  test("connectedComponents: chains collapse to min-id reps, components stay separate") {
    // component A: a 4-chain given as scrambled, redundant pairs;
    // component B: one pair; id 99 appears nowhere (singleton -> absent)
    val pairs = Seq(
      (3L, 4L), (2L, 3L), (1L, 2L), (4L, 1L), // chain + a redundant closing edge
      (11L, 10L)
    ).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("connectedComponents: empty pair frame returns empty result (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }

  test("connectedComponents: long path needs multiple propagation rounds") {
    // a 17-node path 0-1-...-16: min label must travel the full diameter
    val pairs = (0L until 16L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 17)
    assert(out.forall { case (_, rep, size) => rep === 0L && size === 17L })
  }

  test("property: connectedComponents == driver union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // constructive (no Gen filter — a failed filter aborts the sample)
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 40L); d <- Gen.chooseNum(1L, 40L)
    } yield { val b = (a + d) % 41; if (a < b) (a, b) else (b, a) }
    val graphGen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, edgeGen))
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    (0 until 8).foreach { s =>
      val edges = sample(graphGen, s + 1L).distinct
      // driver-side union-find truth
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      val sizes = truth.groupBy(_._2).map { case (r, m) => r -> m.size.toLong }
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got === truth.map { case (id, r) => id -> (r, sizes(r)) },
        s"seed $s, edges $edges")
    }
  }

  test("starComponents: diameter-1000 STRING-id path converges in <= 2*log2(n)+2 rounds, components identical to min-label's contract") {
    // a 1001-node path with string ids — the shape min-label pays one
    // shuffle round per diameter unit for (1000 rounds here); the
    // alternating large-star/small-star variant must converge within
    // the log bound and produce the same (id, rep, size) rows
    val n = 1000
    val ids = (0 to n).map(i => f"doc$i%04d")
    val pairs = (0 until n).map(i => (ids(i), ids(i + 1))).toDF("id_a", "id_b")
    val logBound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n.toLong)) + 2
    val out = Dedup.connectedComponents(pairs, maxIter = logBound,
        lowDiameter = false)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.length === n + 1)
    assert(out.forall { case (_, rep, size) =>
      rep === "doc0000" && size === (n + 1).toLong })
  }

  test("starComponents == min-label == driver union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 40L); d <- Gen.chooseNum(1L, 40L)
    } yield { val b = (a + d) % 41; if (a < b) (a, b) else (b, a) }
    val graphGen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, edgeGen))
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    (0 until 4).foreach { s =>
      val edges = sample(graphGen, 100 + s.toLong).distinct
      val stars = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
          lowDiameter = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val label = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(stars === label, s"seed $s, edges $edges")
    }
  }

  test("absorbComponents: batch absorb == one-shot components (random splits)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 30L); d <- Gen.chooseNum(1L, 30L)
    } yield { val b = (a + d) % 31; if (a < b) (a, b) else (b, a) }
    val graphGen = Gen.chooseNum(2, 40).flatMap(n => Gen.listOfN(n, edgeGen))
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    (0 until 4).foreach { s =>
      val edges = sample(graphGen, 500 + s.toLong).distinct
      val (e1, e2) = edges.partition { case (a, b) => (a + b) % 3 != 0 }
      // either half may be empty — both directions must still hold
      val state = Dedup.connectedComponents(e1.toDF("id_a", "id_b"))
      val got = Dedup.absorbComponents(state, e2.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val oneShot = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === oneShot, s"seed $s, e1=$e1 e2=$e2")
    }
  }

  test("absorbComponents: a new bridge node merges two stored components; reps stay global minima") {
    // state: components {1,2} (rep 1) and {10,11} (rep 10); the batch
    // adds node 5 bridging both -> one component of 5 ids, rep 1
    val state = Dedup.connectedComponents(
      Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b"))
    val got = Dedup.absorbComponents(state,
        Seq((5L, 2L), (5L, 11L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(1L, 2L, 5L, 10L, 11L).map(id => (id, 1L, 5L)))
    // an absorb that touches NOTHING leaves the state identical
    val untouched = Dedup.absorbComponents(state,
        Seq((1L, 2L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(untouched === Set((1L, 1L, 2L), (2L, 1L, 2L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("absorbComponents: oversize changed-rep map fails loudly; broadcastReps=false is the identical remediation") {
    // a backfill-shaped batch: every merge changes a stored rep, so the
    // changed-rep map is as large as the contracted graph. With a cap of
    // 2 the guarded broadcast must refuse BEFORE materializing on the
    // driver, naming the remediation flag…
    val state = Dedup.connectedComponents(
      Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L)).toDF("id_a", "id_b"))
    val bigBatch = Seq((2L, 10L), (11L, 20L), (21L, 30L)).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] {
      Dedup.absorbComponents(state, bigBatch, maxBroadcastRows = 2).collect()
    }
    assert(ex.getMessage.contains("absorbComponents changed-rep map"))
    assert(ex.getMessage.contains("broadcastReps = false"))
    // …and the non-broadcast path produces exactly the guarded path's
    // answer (the same cap, no longer consulted)
    val viaShuffle = Dedup.absorbComponents(state, bigBatch,
        broadcastReps = false, maxBroadcastRows = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBroadcast = Dedup.absorbComponents(state, bigBatch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaShuffle === viaBroadcast)
    assert(viaShuffle === Set(1L, 2L, 10L, 11L, 20L, 21L, 30L, 31L)
      .map(id => (id, 1L, 8L)))
  }

  test("starComponents: empty pair frame returns empty result") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, lowDiameter = false).count() === 0)
  }

  test("incrementalCandidates: batch probes corpus index; no corpus-corpus pairs") {
    val all = corpus().toDF("doc_id", "text")
    // batch = the planted near-dups (ids 100..109) + one unrelated base
    // doc; corpus = the rest. Every planted dup must match its original
    // via the CORPUS index (src=corpus), and ids present only in the
    // corpus must never appear as id_new.
    val batchIds = ((100 until 110).map(_.toLong) :+ 30L).toSet
    val batch = all.filter(col("doc_id").isin(batchIds.toSeq: _*))
    val corp = all.filter(!col("doc_id").isin(batchIds.toSeq: _*))
    val cand = Dedup.incrementalCandidates(
        Dedup.bandIndex(batch, "doc_id", "text"),
        Dedup.bandIndex(corp, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    cand.foreach { case (idNew, _, _) =>
      assert(batchIds.contains(idNew), s"corpus id $idNew appeared as id_new") }
    val corpusMatches = cand.collect { case (n, m, "corpus") => (n, m) }.toSet
    val planted = (0 until 10).map(i => ((100 + i).toLong, i.toLong))
    val recall = planted.count(corpusMatches.contains).toDouble / planted.size
    assert(recall >= 0.8, s"incremental recall $recall, matches: $corpusMatches")
    // batch-internal pairs carry id_match < id_new and src=batch
    cand.collect { case (n, m, "batch") => (n, m) }.foreach { case (n, m) =>
      assert(m < n && batchIds.contains(m), s"bad batch pair ($n, $m)") }
  }

  test("pruneOversizedBuckets: boilerplate flood flagged out of the index, rest intact") {
    // 40 identical docs (every band collides) + the normal corpus
    val flood = (1000 until 1040).map(i =>
      (i.toLong, "identical boilerplate header row for every page"))
    val df = (corpus() ++ flood).toDF("doc_id", "text")
    val bands = Dedup.bandIndex(df, "doc_id", "text")
    val PrunedBands = Dedup.pruneOversizedBuckets(bands, maxBucket = 20)
    // every flood bucket flagged with a bounded sample
    val flagged = PrunedBands.flagged.collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      assert(r.getAs[Long]("n_ids") === 40)
      assert(r.getAs[Seq[String]]("sample_ids").size === 20)
    }
    // flood ids carry no rows in the pruned index; normal docs unaffected
    val prunedIds = PrunedBands.pruned.select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flood.forall { case (id, _) => !prunedIds.contains(id) })
    assert(corpus().forall { case (id, _) => prunedIds.contains(id) })
    // probing the pruned index can never meet the flood
    val probe = Dedup.incrementalCandidates(
      Dedup.bandIndex(Seq((5000L, "identical boilerplate header row for every page"))
        .toDF("doc_id", "text"), "doc_id", "text"),
      PrunedBands.pruned)
    assert(probe.count() === 0)
  }

  test("incrementalCandidates == full-corpus pairs restricted to new ids") {
    // the incremental result over (corpus, batch) must equal what a full
    // re-pairing of corpus+batch would say about the batch's ids —
    // incrementality changes the COST, never the answer
    val all = corpus().toDF("doc_id", "text")
    val batchIds = (0 until 70 by 7).map(_.toLong).toSet ++ Set(103L, 106L)
    val batch = all.filter(col("doc_id").isin(batchIds.toSeq: _*))
    val corp = all.filter(!col("doc_id").isin(batchIds.toSeq: _*))
    val incr = Dedup.incrementalCandidates(
        Dedup.bandIndex(batch, "doc_id", "text"),
        Dedup.bandIndex(corp, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashLshPairs(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.collect {
      // full pairs are (a < b); incremental emits (id_new, id_match)
      case (a, b) if batchIds.contains(a) && batchIds.contains(b) => (b, a)
      case (a, b) if batchIds.contains(a) => (a, b)
      case (a, b) if batchIds.contains(b) => (b, a)
    }
    assert(incr === expected)
  }

  test("simhash64: near-dups within small hamming distance, unrelated far") {
    val df = corpus().toDF("doc_id", "text")
    val h = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    (0 until 10).foreach { i =>
      assert(hamming(h(i.toLong), h((100 + i).toLong)) <= 12,
        s"doc $i hamming ${hamming(h(i.toLong), h((100 + i).toLong))}")
    }
    val unrelated = hamming(h(0L), h(30L))
    assert(unrelated > 12, s"unrelated hamming $unrelated")
  }

  test("substringDedup: cross-doc shared window stripped from BOTH docs") {
    val df = Seq(
      (1L, "a1 b1 c1 d1 e1 f1 g1 h1 tail1 only1"),
      (2L, "a1 b1 c1 d1 e1 f1 g1 h1 tail2 only2"),
      (3L, "completely different words with no overlap at all here ok")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(df, "doc_id", "text", w = 8)
      .orderBy("id").collect()
    // docs 1 and 2 share exactly the 8-token prefix -> one window at
    // pos 0 duplicated -> span [0, 8) in each, tails survive
    assert(got(0).getAs[Int]("dup_tokens") === 8)
    assert(got(0).getAs[Int]("n_spans") === 1)
    assert(got(0).getAs[String]("clean_text") === "tail1 only1")
    assert(got(1).getAs[String]("clean_text") === "tail2 only2")
    // doc 3 untouched (all its windows unique)
    assert(got(2).getAs[Int]("dup_tokens") === 0)
    assert(got(2).getAs[String]("clean_text") ===
      "completely different words with no overlap at all here ok")
  }

  test("substringDedup: within-doc repeat merges adjacent windows into one span") {
    // "p..w" repeated back to back: windows at pos 0 and pos 8 have
    // identical content (count 2 -> duplicated); straddling windows
    // 1..7 are unique. Covers [0,8) ∪ [8,16) -> ONE merged span, doc
    // fully stripped.
    val df = Seq(
      (1L, "p q r s t u v w p q r s t u v w"),
      (2L, "some other unrelated filler text that is long enough here")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(df, "doc_id", "text", w = 8)
      .orderBy("id").collect()
    assert(got(0).getAs[Int]("n_tokens") === 16)
    assert(got(0).getAs[Int]("dup_tokens") === 16)
    assert(got(0).getAs[Int]("n_spans") === 1)
    assert(got(0).getAs[String]("clean_text") === "")
  }

  test("substringDedup: docs shorter than the window are never touched") {
    val df = Seq(
      (1L, "short doc"), (2L, "short doc"), // identical but < w tokens
      (3L, "  padded   short\tdoc  ")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(df, "doc_id", "text", w = 8)
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getAs[Int]("dup_tokens") === 0)
      assert(r.getAs[Int]("n_spans") === 0)
    }
    // tokenization is whitespace-normalizing
    assert(got(2).getAs[String]("clean_text") === "padded short doc")
    assert(got(2).getAs[Int]("n_tokens") === 3)
  }

  test("MergeSpans kernel: overlap merges, gap splits, adjacency merges") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    def spans(ps: Seq[Int], w: Int): Seq[(Int, Int)] =
      Seq(Tuple1(ps)).toDF("ps")
        .select(column(graft.expr.catalyst.MergeSpans(
          expression(col("ps")), w)).as("s"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getInt(0), r.getInt(1)))
    assert(spans(Seq(0, 3, 20), 5) === Seq((0, 8), (20, 25)))
    assert(spans(Seq(0, 5), 5) === Seq((0, 10)), "adjacent covers merge")
    assert(spans(Seq(0, 6), 5) === Seq((0, 5), (6, 11)), "gap of one splits")
    assert(spans(Seq(7), 3) === Seq((7, 10)))
    assert(spans(Seq.empty[Int], 4) === Seq.empty)
  }

  test("record linkage: typos link within blocks, distinct entities stay apart") {
    import graft.ops.Linkage
    val recs = Seq(
      (1L, "Acme Corp", "b1"), (2L, "Acme Corpp", "b1"),   // dist 1 -> link
      (3L, "Zenith Ltd", "b1"),                             // same block, far
      (4L, "Acme Corp", "b2"),                              // other block: no pair
      (5L, "Solo Inc", "b3"))
      .toDF("id", "name", "bk")
    val got = Linkage.resolveEntities(recs, "id", "name", col("bk"), maxDist = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L), (4L, 4L, 1L), (5L, 5L, 1L)),
      "identical names in DIFFERENT blocks must not link (blocking contract)")
  }

  test("record linkage: a NULL block key blocks, pairs, and reports like any other") {
    import graft.ops.Linkage
    // missing blocking attribute (null key) is the common real-world
    // case — those records must still pair among themselves
    val recs = Seq(
      (1L, "Acme Corp", Some("b1")), (2L, "Acme Corpp", Some("b1")),
      (10L, "Null Key Co", None), (11L, "Null Key Coo", None),  // dist 1
      (12L, "Unrelated Name", None))
      .toDF("id", "name", "bk")
    val res = Linkage.linkPairs(recs, "id", "name", col("bk"), maxDist = 2)
    val pairs = res.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)),
      s"null-key records must pair within their block, got $pairs")
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a <= 2 && b >= 10 },
      "null block must not cross-pair with keyed blocks")
    // the null block caps and diverts like any other
    val flood = (100L to 130L).map(i => (i, s"Flood $i", None: Option[String]))
      .toDF("id", "name", "bk")
    val capped = Linkage.linkPairs(flood, "id", "name", col("bk"),
      maxDist = 2, maxBlock = 10)
    assert(capped.pairs.count() === 0L)
    assert(capped.flagged.count() === 1L,
      "the oversized null block must surface in flagged")
  }

  test("record linkage: transitive chain resolves to one entity; pair dist is exact") {
    import graft.ops.Linkage
    // abcd—abce dist 1, abce—abee dist 1, abcd—abee dist 2 > maxDist 1:
    // linked only transitively
    val recs = Seq((10L, "abcd", "k"), (20L, "abce", "k"), (30L, "abee", "k"))
      .toDF("id", "name", "bk")
    val pairs = Linkage.linkPairs(recs, "id", "name", col("bk"), maxDist = 1)
      .pairs.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((10L, 20L, 1), (20L, 30L, 1)))
    val got = Linkage.resolveEntities(recs, "id", "name", col("bk"), maxDist = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((10L, 10L, 3L), (20L, 10L, 3L), (30L, 10L, 3L)))
  }

  test("record linkage: oversized blocks divert to flagged, never pair") {
    import graft.ops.Linkage
    val recs = (1L to 5L).map(i => (i, s"name$i", "flood")) :+ (9L, "ok", "tiny")
    val r = Linkage.linkPairs(recs.toDF("id", "name", "bk"),
      "id", "name", col("bk"), maxDist = 10, maxBlock = 3)
    assert(r.pairs.count() === 0L, "flood block must not generate pairs")
    val f = r.flagged.collect().map(x => (x.getString(0), x.getLong(1)))
    assert(f.toSeq === Seq(("flood", 5L)))
  }

  test("record linkage: sub-block salted pairing equals unsalted pair set exactly") {
    import graft.ops.Linkage
    // 61 members in one block + 7 in another, targetSub=8 → the big
    // block fans out over g=8 sub-groups (36 triangle cells), the small
    // one stays g=1; the pair set must equal the unsalted formulation
    // (targetSub large ⇒ every block g=1) pair for pair, dist for dist
    val recs = ((1L to 61L).map(i => (i * 7 % 61 + 100, s"nm${i % 9}x${i % 4}", "big")) ++
      (1L to 7L).map(i => (i, s"ab${i % 3}", "small"))).toDF("id", "name", "bk")
    def run(ts: Int) = Linkage
      .linkPairs(recs, "id", "name", col("bk"), maxDist = 3, targetSub = ts)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val salted = run(8)
    val plain = run(1000000)
    assert(salted === plain, "triangle decomposition must not add or drop pairs")
    assert(salted.nonEmpty && salted.forall { case (a, b, _) => a < b })
  }

  test("record linkage: block-size report buckets by log2 with exact pair work") {
    import graft.ops.Linkage
    // blocks of size 1, 3, 5, 9 → buckets 0, 1, 2, 3; flagged blocks
    // (the 9 @ maxBlock=8) still appear — the report exists to expose them
    val recs = (Seq((0L, "solo", "k1")) ++
      (1L to 3L).map(i => (i + 10, s"a$i", "k3")) ++
      (1L to 5L).map(i => (i + 20, s"b$i", "k5")) ++
      (1L to 9L).map(i => (i + 30, s"c$i", "k9"))).toDF("id", "name", "bk")
    val rep = Linkage.linkPairs(recs, "id", "name", col("bk"),
        maxDist = 1, maxBlock = 8)
      .blockReport.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rep.toSeq === Seq(
      (0, 1L, 1L, 1L, 0L), (1, 1L, 3L, 3L, 3L),
      (2, 1L, 5L, 5L, 10L), (3, 1L, 9L, 9L, 36L)))
  }

  test("semdedup cluster report: totals and pair work from the assignment") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(4)(if (i % 2 == 0) 1.0f else -1.0f))).toDF("id", "vec")
    val out = graft.ops.Ann.semDedup(vecs, k = 2, threshold = 0.99, iters = 2)
    val rep = graft.ops.Ann.clusterSizeReport(out).collect()
    assert(rep.map(_.getLong(3)).sum === 40L, "report totals cover every assigned row")
    val expectedPairs = out.groupBy(col("cid")).count().collect()
      .map(_.getLong(1)).map(n => n * (n - 1) / 2).sum
    assert(rep.map(_.getLong(4)).sum === expectedPairs)
  }
}
