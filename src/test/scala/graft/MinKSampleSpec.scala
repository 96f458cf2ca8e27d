package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Sketch

/** MinKByHash deterministic-sample aggregate: window equivalence,
  * mergeability (partitioning invariance), bound/null/NaN contracts,
  * and the sampleQuantile == Spark percentile formula identity. */
class MinKSampleSpec extends SparkSpec {
  import spark.implicits._

  private def sampleOf(df: org.apache.spark.sql.DataFrame, m: Int) =
    Sketch.minKSample(df, Seq("g"), Seq(col("id")), col("v"), m)

  test("minKSample == (hash, value) window bottom-m, any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 4000).map { i =>
      (i.toLong % 5, i.toLong, rnd.nextDouble() * 100)
    }
    val df = rows.toDF("g", "id", "v")

    val win = df.withColumn("h", xxhash64(col("id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"), col("v"))))
      .filter(col("rn") <= 32)
      .select(col("g"), col("h"), col("v"))

    for (nPart <- Seq(1, 3, 11)) {
      val agg = sampleOf(df.repartition(nPart), 32)
        .select(col("g"), explode(col("sample")).as("e"))
        .select(col("g"), col("e.h").as("h"), col("e.v").as("v"))
      assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
        s"sample diverged from the window formulation at $nPart partitions")
    }
  }

  test("min-k of a union == min-k of the per-part min-ks (absorb contract)") {
    val rows = (0 until 3000).map(i => (0L, i.toLong, i.toDouble))
    val df = rows.toDF("g", "id", "v")
    val oneShot = sampleOf(df, 16).select(explode(col("sample"))).collect().toSet

    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val minK = column(graft.expr.catalyst.MinKByHash(
      expression(struct(col("e.h").as("h"), col("e.v").as("v"))), 16)
      .toAggregateExpression())
    val merged = sampleOf(df.filter(col("id") % 3 === 0), 16)
      .unionByName(sampleOf(df.filter(col("id") % 3 === 1), 16))
      .unionByName(sampleOf(df.filter(col("id") % 3 === 2), 16))
      .select(col("g"), explode(col("sample")).as("e"))
      .groupBy(col("g")).agg(minK.as("sample"))
      .select(explode(col("sample"))).collect().toSet
    assert(merged === oneShot)
  }

  test("bound, null skipping, and NaN-greatest value order") {
    val df = Seq[(Long, java.lang.Long, java.lang.Double)](
      (0L, 1L, 1.0), (0L, 2L, null), (0L, null, 3.0),
      (0L, 4L, Double.NaN), (0L, 5L, 5.0), (0L, 6L, 6.0))
      .toDF("g", "id", "v")
    val out = sampleOf(df, 10).select(col("n_rows"), col("sample")).head()
    // null id/value rows skipped from BOTH the count and the sample
    assert(out.getLong(0) === 4L)
    val entries = out.getSeq[org.apache.spark.sql.Row](1)
    assert(entries.length === 4)
    // NaN kept (a real value under the nan-safe order), bound respected
    assert(entries.exists(r => r.getDouble(1).isNaN))
    val tiny = sampleOf(df, 2).select(size(col("sample"))).head().getInt(0)
    assert(tiny === 2)
  }

  test("sampleQuantile == Spark percentile over the sampled values") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map(i => (i.toLong % 3, i.toLong, rnd.nextGaussian()))
    val df = rows.toDF("g", "id", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val est = sampleOf(df, 25)
        .select(col("g"), Sketch.sampleQuantile(col("sample"), p).as("est"))
      val exact = sampleOf(df, 25)
        .select(col("g"), explode(col("sample")).as("e"))
        .groupBy(col("g"))
        .agg(expr(s"percentile(e.v, $p)").as("pct"))
      val joined = est.join(exact, Seq("g"))
        .select((col("est") === col("pct")).as("eq")).collect()
      assert(joined.forall(_.getBoolean(0)), s"p=$p estimate != percentile")
    }
  }

  test("persisted state absorb == one-shot; late groups and empty batches survive") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-minkstate").toString
    // group 1 exists ONLY in the second batch; the third batch is EMPTY
    val b0 = (0 until 500).map(i => (0L, i.toLong, i.toDouble)).toDF("g", "id", "v")
    val b1 = ((500 until 900).map(i => (0L, i.toLong, i.toDouble)) ++
      (0 until 200).map(i => (1L, 10000L + i, i * 2.0))).toDF("g", "id", "v")
    val b2 = b0.filter(col("id") < 0)
    Sketch.writeSampleState(b0, Seq("g"), Seq(col("id")), col("v"), 16, statePath)
    Sketch.absorbSampleState(b1, Seq("g"), Seq(col("id")), col("v"), 16, statePath)
    Sketch.absorbSampleState(b2, Seq("g"), Seq(col("id")), col("v"), 16, statePath)
    val state = Sketch.readSampleState(spark, statePath)
      .select(col("g"), col("n_rows"), explode(col("sample")).as("e"))
      .select(col("g"), col("n_rows"), col("e.h"), col("e.v"))
    val oneShot = sampleOf(b0.unionByName(b1), 16)
      .select(col("g"), col("n_rows"), explode(col("sample")).as("e"))
      .select(col("g"), col("n_rows"), col("e.h"), col("e.v"))
    assert(state.exceptAll(oneShot).isEmpty && oneShot.exceptAll(state).isEmpty,
      "absorbed state must equal the one-shot sample entry for entry")
  }

  test("cast-null values and empty-sample parts stay consistent") {
    // under ANSI a malformed string FAILS the cast loudly (no silent
    // desync channel) ...
    val df = Seq((0L, 1L, "1.5"), (0L, 2L, "abc"), (0L, 3L, "2.5"))
      .toDF("g", "id", "v")
    intercept[Exception] {
      Sketch.minKSample(df, Seq("g"), Seq(col("id")), col("v"), 10).collect()
    }
    // ... and a caller opting into try_cast gets the null-after-cast
    // row excluded from BOTH n_rows and the sample (never a desync)
    val out = Sketch.minKSample(df, Seq("g"), Seq(col("id")),
        expr("try_cast(v as double)"), 10)
      .select(col("n_rows"), size(col("sample"))).head()
    assert(out.getLong(0) === 2L && out.getInt(1) === 2)
    // mergeSamples: a part row with an EMPTY sample must still carry
    // its group (and n_rows) into the merged state
    val parts = Seq((0L, 5L, Seq((1L, 1.0))), (1L, 3L, Seq.empty[(Long, Double)]))
      .toDF("g", "n_rows", "raw")
      .select(col("g"), col("n_rows"),
        expr("transform(raw, x -> named_struct('h', x._1, 'v', x._2))").as("sample"))
    val merged = Sketch.mergeSamples(parts, Seq("g"), 4)
      .select(col("g"), col("n_rows"), size(col("sample")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(merged(0L) === ((5L, 1)) && merged(1L) === ((3L, 0)),
      s"empty-sample group must survive the merge: $merged")
  }

  test("rank-error bound: |F(est) - p| <= 3/sqrt(m) at m=1024 over the sf0.1 lineitem fixture (DKW)") {
    // the statistical accuracy claim behind the sketch (VERDICT r9
    // item 6): estimates from the m-row hash sample must land within
    // eps = 3/sqrt(m) TRUE rank of the requested p — DKW puts the
    // failure probability of that envelope at 2*exp(-2*m*eps^2) =
    // 2e-18 per draw, and the hash sample is deterministic, so this
    // either holds forever or flags a real sampler bias. F(est) is
    // the exact CDF (fraction of corpus values <= est) over the
    // 600k-row fixture; seven p values cover both tails.
    val dir = new java.io.File("/root/testdata/sf0.1")
    assume(dir.isDirectory, "sf0.1 fixtures not present")
    val li = graft.schema.Tables.load(spark, dir.getAbsolutePath, "lineitem")
      .select(lit(0L).as("g"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_extendedprice").as("v"))
    val m = 1024
    val sample = Sketch.minKSample(li, Seq("g"), Seq(col("id")), col("v"), m)
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val ests = sample.select(
        ps.map(p => Sketch.sampleQuantile(col("sample"), p).as(s"q$p")): _*)
      .head()
    val eps = 3.0 / math.sqrt(m.toDouble)
    val n = li.count().toDouble
    ps.zipWithIndex.foreach { case (p, i) =>
      val est = ests.getDouble(i)
      val rank = li.filter(col("v") <= est).count() / n
      assert(math.abs(rank - p) <= eps,
        f"p=$p est=$est trueRank=$rank%.4f off by ${math.abs(rank - p)}%.4f > eps=$eps%.4f")
    }
  }

  test("empty sample quantile is null; empty group never emitted") {
    val df = Seq((0L, 1L, 1.0)).toDF("g", "id", "v").filter(col("id") < 0)
    assert(sampleOf(df, 4).count() === 0L)
    val one = Seq((0L, 1L, 42.0)).toDF("g", "id", "v")
    val q = sampleOf(one, 4)
      .select(Sketch.sampleQuantile(col("sample"), 0.5)).head().getDouble(0)
    assert(q === 42.0)
  }

  // ---- KMV (MinKDistinctHashes + kmvSetOps) ----

  private def kmvArr(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    df.agg(column(graft.expr.catalyst.MinKDistinctHashes(
        expression(xxhash64(col("id"))), k).toAggregateExpression()).as("r"))
      .head().getSeq[Long](0)
  }

  test("MinKDistinctHashes: duplicates occupy one slot; == window bottom-k over DISTINCT hashes; partitioning-invariant") {
    // every id arrives 7 times — a sample WITHOUT dedup would fill
    // slots with repeats and the retained set would shrink
    val rows = (0 until 2000).flatMap(i => Seq.fill(7)(Tuple1(i.toLong)))
    val df = rows.toDF("id")
    val expect = df.select(xxhash64(col("id")).as("h")).distinct()
      .orderBy(col("h")).limit(64).collect().map(_.getLong(0)).toSeq
    for (nPart <- Seq(1, 3, 11))
      assert(kmvArr(df.repartition(nPart), 64) === expect,
        s"retained set diverged at $nPart partitions")
    // unsaturated: all distinct hashes retained, sorted
    val few = (0 until 10).map(i => Tuple1(i.toLong)).toDF("id")
    assert(kmvArr(few, 64).length === 10)
    // eviction then re-arrival of the evicted value stays exact: the
    // min-k over the distinct set is order-independent by construction
    val shuffled = new scala.util.Random(3).shuffle(rows).toDF("id")
    assert(kmvArr(shuffled, 64) === expect)
  }

  test("kmvSetOps: exact when unsaturated; error bound when saturated; difference consistent") {
    // A = 0..999, B = 500..1499 -> |A|=|B|=1000, |A∩B|=500, |A\B|=500
    val a = (0L until 1000L).map(Tuple1(_)).toDF("k")
    val b = (500L until 1500L).map(Tuple1(_)).toDF("k")

    // k above the cardinalities: every estimate is EXACT
    val ex = Sketch.kmvSetOps(a, "k", b, "k", k = 4096).head()
    assert(ex.getDouble(1) === 1000.0 && ex.getDouble(2) === 1000.0)
    assert(ex.getDouble(3) === 1500.0, "exact union")
    assert(ex.getDouble(4) === 500.0, "exact intersect")
    assert(ex.getDouble(5) === 500.0, "exact difference")

    // saturated: relative error within 4/sqrt(k-2) per estimate
    // (~4 sigma of the KMV estimator; deterministic for the fixture)
    val k = 256
    val bound = 4.0 / math.sqrt(k - 2.0)
    val est = Sketch.kmvSetOps(a, "k", b, "k", k = k).head()
    def rel(got: Double, want: Double) = math.abs(got - want) / want
    assert(rel(est.getDouble(1), 1000) < bound, s"nd_a ${est.getDouble(1)}")
    assert(rel(est.getDouble(2), 1000) < bound, s"nd_b ${est.getDouble(2)}")
    assert(rel(est.getDouble(3), 1500) < bound, s"union ${est.getDouble(3)}")
    assert(rel(est.getDouble(4), 500) < 2 * bound, s"intersect ${est.getDouble(4)}")
    assert(rel(est.getDouble(5), 500) < 2 * bound, s"a_only ${est.getDouble(5)}")

    // a hot key arriving a million-to-one skewed: estimates unchanged
    // (the sketch summarizes the SET; the buffer dedups, not samples)
    val hot = a.unionAll(Seq.fill(5000)(Tuple1(7L)).toDF("k"))
    val est2 = Sketch.kmvSetOps(hot, "k", b, "k", k = k).head()
    assert(est2.getDouble(1) === est.getDouble(1), "hot key changed nd_a")
    assert(est2.getDouble(4) === est.getDouble(4), "hot key changed intersect")
  }

  test("persisted KMV state: 3-batch absorb == one-shot bit for bit; overlapping batches never double-count") {
    val all = (0L until 2000L).map(Tuple1(_)).toDF("k")
    val p1 = java.nio.file.Files.createTempDirectory("graft-kmv1").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft-kmv2").toString

    // one-shot reference
    Sketch.writeKmvState(all, "k", k = 128, p1)
    val oneShot = Sketch.readKmvState(spark, p1).head()

    // seed + 2 absorbs with OVERLAPPING key ranges: re-seen keys must
    // not perturb the retained set (distinct semantics through the
    // state path too)
    Sketch.writeKmvState(all.filter($"k" < 900), "k", k = 128, p2)
    Sketch.absorbKmvState(all.filter($"k" >= 600 && $"k" < 1500), "k", p2)
    Sketch.absorbKmvState(all.filter($"k" >= 1200), "k", p2)
    val absorbed = Sketch.readKmvState(spark, p2).head()

    assert(absorbed.getInt(0) === oneShot.getInt(0))
    assert(absorbed.getInt(1) === oneShot.getInt(1))
    assert(absorbed.getDouble(2) === oneShot.getDouble(2),
      s"absorbed estimate ${absorbed.getDouble(2)} != one-shot ${oneShot.getDouble(2)}")
    // the retained ARRAYS are identical, not just the estimates
    val ra = graft.ops.StateStore.readSingle(spark, p1).head().getSeq[Long](1)
    val rb = graft.ops.StateStore.readSingle(spark, p2).head().getSeq[Long](1)
    assert(ra === rb, "absorbed retained set diverged from one-shot")
    // unsaturated exact path: estimate == true distinct count
    val pSmall = java.nio.file.Files.createTempDirectory("graft-kmv3").toString
    Sketch.writeKmvState(all.filter($"k" < 50), "k", k = 128, pSmall)
    Sketch.absorbKmvState(all.filter($"k" < 50), "k", pSmall) // pure re-see
    assert(Sketch.readKmvState(spark, pSmall).head().getDouble(2) === 50.0)

    // r12 ADVICE: the state is lock-guarded like the index layouts — a
    // held lock refuses a concurrent absorb LOUDLY (an unguarded
    // read-modify-overwrite would silently lose the batch); the reseed
    // clears a stale lock (the documented crash remediation)
    val lock = new java.io.File(pSmall, ".graft.index.lock")
    assert(!lock.exists(), "completed ops must release the lock")
    assert(lock.createNewFile())
    val ex = intercept[IllegalStateException] {
      Sketch.absorbKmvState(all.filter($"k" < 10), "k", pSmall)
    }
    assert(ex.getMessage.contains("locked"))
    assert(Sketch.readKmvState(spark, pSmall).head().getDouble(2) === 50.0,
      "refused absorb must not have touched the state")
    Sketch.writeKmvState(all.filter($"k" < 50), "k", k = 128, pSmall)
    assert(!lock.exists(), "reseed must clear the stale lock and release its own")
  }

  test("kmvOverlapMatrix == pairwise kmvSetOps; group-cardinality rail fires") {
    // three overlapping key sets with known structure
    val rows = (0L until 900L).map { i =>
      val g = if (i < 400) "a" else if (i < 700) "b" else "c"
      (g, i % 500) // a: 0..399, b spans the wrap, c overlaps a's head
    }
    val df = rows.toDF("grp", "key")
    val m = Sketch.kmvOverlapMatrix(df, "key", "grp", k = 64)
      .orderBy("group_a", "group_b").collect()
    assert(m.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")), "all (a<b) pairs, ordered")
    // each pair must equal the two-frame kmvSetOps on the same sides —
    // the matrix is the same estimator over the same retained sets
    m.foreach { r =>
      val (ga, gb) = (r.getString(0), r.getString(1))
      val two = Sketch.kmvSetOps(
        df.filter($"grp" === ga).select($"key"), "key",
        df.filter($"grp" === gb).select($"key"), "key", k = 64).head()
      assert(r.getDouble(3) === two.getDouble(1), s"$ga/$gb nd_a")
      assert(r.getDouble(4) === two.getDouble(2), s"$ga/$gb nd_b")
      assert(r.getDouble(5) === two.getDouble(3), s"$ga/$gb union")
      assert(r.getDouble(6) === two.getDouble(4), s"$ga/$gb intersect")
    }
    // sanity: a and c share keys 0..199 -> jaccard well above zero;
    // every key occurs once per group, so nothing saturates oddly
    val ac = m.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    assert(ac.getDouble(7) > 0.1, s"a/c jaccard ${ac.getDouble(7)}")
    // the group-cardinality rail refuses loudly instead of scheduling
    // nGroups^2 pair rows
    val wide = (0L until 50L).map(i => (s"g$i", i)).toDF("grp", "key")
    val ex = intercept[IllegalArgumentException] {
      Sketch.kmvOverlapMatrix(wide, "key", "grp", k = 8, maxGroups = 10)
        .collect()
    }
    assert(ex.getMessage.contains("kmvOverlapMatrix"))
  }
}
