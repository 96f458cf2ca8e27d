package graft

import org.apache.spark.sql.functions._

import graft.ops.AggState

/** Persisted keyed additive aggregate state: absorbing batches must
  * equal the one-shot aggregate EXACTLY (decimal sums), appends must
  * rewrite only the touched key-hash buckets, and null keys/values
  * must follow SQL aggregate semantics. */
class AggStateSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range): Seq[(String, java.lang.Double)] =
    ids.map(i => (s"k${i % 7}", if (i % 11 == 0) null
      else java.lang.Double.valueOf(i * 0.1)))

  private def snap(path: String) =
    AggState.readAggState(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)))).toSet

  test("absorbing batches == one-shot aggregate, bit-exact") {
    val all = rows(0 until 200)
    val (seed, rest) = all.splitAt(80)
    val (b1, b2) = rest.splitAt(60)
    val p = java.nio.file.Files.createTempDirectory("graft-aggst").toString
    AggState.writeAggState(seed.toDF("g", "v"), Seq("g"), Seq("v"), p, nBuckets = 8)
    AggState.appendAggState(b1.toDF("g", "v"), p)
    AggState.appendAggState(b2.toDF("g", "v"), p)

    val pRef = java.nio.file.Files.createTempDirectory("graft-aggst-ref").toString
    AggState.writeAggState(all.toDF("g", "v"), Seq("g"), Seq("v"), pRef, nBuckets = 8)
    assert(snap(p) === snap(pRef),
      "absorbed state diverges from the one-shot aggregate")
    // spot check one group by hand: k0 gets i = 0,7,...,196; nulls at i%11==0
    val k0 = AggState.readAggState(spark, p).filter(col("g") === "k0")
      .select("n_rows", "v_cnt").first()
    val ids = (0 until 200).filter(_ % 7 == 0)
    assert(k0.getLong(0) === ids.size.toLong)
    assert(k0.getLong(1) === ids.count(_ % 11 != 0).toLong)
  }

  test("append writes ONLY the touched bucket, into a new segment; stored files immutable") {
    // the manifest-layout restatement (r14) of the touched-buckets
    // invariant: an absorb must never modify a stored file — it writes
    // ONE new segment holding ONLY the touched kb= bucket, and the old
    // segment merely gains that bucket as an exclude annotation
    val p = java.nio.file.Files.createTempDirectory("graft-aggbk").toString
    AggState.writeAggState(rows(0 until 100).toDF("g", "v"),
      Seq("g"), Seq("v"), p, nBuckets = 16)
    def files(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, (f.length, f.lastModified))).toMap
    }
    val before = files()
    assert(before.nonEmpty, "seed must have written state files")
    // a batch touching exactly one key
    AggState.appendAggState(Seq(("k3", java.lang.Double.valueOf(5.0)))
      .toDF("g", "v"), p)
    val after = files()
    assert(before.forall { case (path, sig) => after.get(path).contains(sig) },
      "an absorb must never modify or delete a stored file")
    val newFiles = (after.keySet -- before.keySet).toSeq
    assert(newFiles.nonEmpty, "the absorb must have written a new segment")
    val newSegs = newFiles.map(f =>
      f.substring(f.indexOf("state-")).takeWhile(_ != '/')).toSet
    assert(newSegs.size === 1,
      s"a one-key batch must write exactly one new segment, got $newSegs")
    val newBuckets = newFiles.map(f =>
      f.substring(f.indexOf("kb=")).takeWhile(_ != '/')).toSet
    assert(newBuckets.size === 1,
      s"a one-key batch must write exactly one bucket dir, got $newBuckets")
    val kb = newBuckets.head.stripPrefix("kb=").toLong
    // the manifest records the rewrite: old segment excludes the
    // touched bucket, the new segment carries it
    val segs = graft.ops.StateStore.snapshot(spark, p).segments("state")
    assert(segs.size === 2, s"expected old+new segments, got $segs")
    assert(segs.head.exclude === Set(kb),
      s"old segment must exclude exactly the touched bucket: ${segs.head}")
    assert(segs.last.exclude.isEmpty)
    // and the state is still correct: k3 rows are i ≡ 3 (mod 7), so the
    // pre-append max is 9.4; the absorbed 5.0 must not lower it
    val k3 = AggState.readAggState(spark, p).filter(col("g") === "k3")
      .select("v_max").first().getDouble(0)
    assert(k3 === 9.4)
  }

  test("null keys and null values follow SQL aggregate semantics") {
    val df = Seq((null.asInstanceOf[String], java.lang.Double.valueOf(1.0)),
      (null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]),
      ("k", java.lang.Double.valueOf(2.0))).toDF("g", "v")
    val p = java.nio.file.Files.createTempDirectory("graft-aggnull").toString
    AggState.writeAggState(df, Seq("g"), Seq("v"), p, nBuckets = 4)
    AggState.appendAggState(
      Seq((null.asInstanceOf[String], java.lang.Double.valueOf(3.0))).toDF("g", "v"), p)
    val nullRow = AggState.readAggState(spark, p).filter(col("g").isNull)
      .select("n_rows", "v_cnt", "v_min", "v_max").first()
    assert((nullRow.getLong(0), nullRow.getLong(1)) === (3L, 2L),
      "null keys group together; null values count rows but not v_cnt")
    assert((nullRow.getDouble(2), nullRow.getDouble(3)) === (1.0, 3.0))
  }

  test("property: random batch splits absorb == one-shot (seeded)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val all = (0 until 120).map { i =>
        (s"k${rnd.nextInt(9)}", if (rnd.nextInt(13) == 0) null
          else java.lang.Double.valueOf(rnd.nextInt(2000) * 0.01 - 5))
      }
      // random 3-way split, any sizes (possibly-empty middles exercise
      // the empty-batch no-op path)
      val c1 = rnd.nextInt(all.size)
      val c2 = c1 + rnd.nextInt(all.size - c1 + 1)
      val p = java.nio.file.Files.createTempDirectory(s"graft-aggp$seed").toString
      AggState.writeAggState(all.take(c1).toDF("g", "v"),
        Seq("g"), Seq("v"), p, nBuckets = 1 + rnd.nextInt(16))
      AggState.appendAggState(all.slice(c1, c2).toDF("g", "v"), p)
      AggState.appendAggState(all.drop(c2).toDF("g", "v"), p)
      val pRef = java.nio.file.Files.createTempDirectory(s"graft-aggpr$seed").toString
      AggState.writeAggState(all.toDF("g", "v"), Seq("g"), Seq("v"), pRef,
        nBuckets = 4)
      assert(snap(p) === snap(pRef), s"seed $seed: absorb != one-shot")
    }
  }

  test("empty seed: meta-only state; the first non-empty append lays the state down") {
    val p = java.nio.file.Files.createTempDirectory("graft-aggmt").toString
    AggState.writeAggState(
      Seq.empty[(String, java.lang.Double)].toDF("g", "v"),
      Seq("g"), Seq("v"), p, nBuckets = 4)
    val batch = Seq(("a", java.lang.Double.valueOf(1.5)),
      ("b", java.lang.Double.valueOf(2.5)))
    AggState.appendAggState(batch.toDF("g", "v"), p)
    val pRef = java.nio.file.Files.createTempDirectory("graft-aggmtr").toString
    AggState.writeAggState(batch.toDF("g", "v"), Seq("g"), Seq("v"), pRef, 4)
    assert(snap(p) === snap(pRef))
  }

  test("empty seed is READABLE before any append: empty rollup, full schema") {
    val p = java.nio.file.Files.createTempDirectory("graft-aggrd").toString
    AggState.writeAggState(
      Seq.empty[(String, java.lang.Double)].toDF("g", "v"),
      Seq("g"), Seq("v"), p, nBuckets = 4)
    val out = AggState.readAggState(spark, p)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("g", "n_rows", "v_cnt", "v_sum",
      "v_min", "v_max", "v_avg"),
      "empty read must carry the persisted rollup schema, not throw")
  }

  test("column names containing commas round-trip through meta intact") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0)).toDF("g,1", "v,2")
    val p = java.nio.file.Files.createTempDirectory("graft-aggcm").toString
    AggState.writeAggState(df, Seq("g,1"), Seq("v,2"), p, nBuckets = 4)
    AggState.appendAggState(Seq(("b", 10.0)).toDF("g,1", "v,2"), p)
    val got = AggState.readAggState(spark, p)
      .select(col("`g,1`"), col("n_rows"), col("`v,2_max`"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(("a", 2L, 3.0), ("b", 2L, 10.0)),
      "array-typed meta must not mis-split comma-bearing column names")
  }

  test("state layout partition-prunes on the bucket column") {
    val p = java.nio.file.Files.createTempDirectory("graft-aggpp").toString
    AggState.writeAggState(rows(0 until 50).toDF("g", "v"),
      Seq("g"), Seq("v"), p, nBuckets = 8)
    // the append's state read filters kb.isin(touched) — that filter
    // must reach the scan as a PARTITION filter (directory pruning),
    // not a post-scan predicate
    val plan = graft.ops.StateStore.readSingle(spark, p)
      .filter(org.apache.spark.sql.functions.col("kb").isin(3, 5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("kb"),
      "bucket filter must prune partitions\n" + plan)
  }

  test("guards: empty keys/values, overlapping keys and values") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      AggState.writeAggState(df, Seq(), Seq("v"), "/tmp/x")
    }
    intercept[IllegalArgumentException] {
      AggState.writeAggState(df, Seq("g"), Seq("g"), "/tmp/x")
    }
  }

  test("pre-manifest layout fails with a named remedy, not an AnalysisException") {
    val p = java.nio.file.Files.createTempDirectory("graft-aggstate-legacy").toString
    // the pre-manifest in-place layout (this also covers the older
    // comma-joined meta format — both predate the manifest store)
    Seq(("g1,g2", "v", 16)).toDF("keys", "value_cols", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/meta")
    val e = intercept[IllegalStateException] {
      AggState.readAggState(spark, p)
    }
    assert(e.getMessage.contains("not manifest-versioned"), e.getMessage)
    assert(e.getMessage.contains("writeAggState"), e.getMessage)
  }
}
