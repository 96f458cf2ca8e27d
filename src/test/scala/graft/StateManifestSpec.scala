package graft

import org.apache.spark.sql.functions._

import graft.ops.{AggState, IndexManifest, Profile, Sketch, StateStore}

/** The manifest-versioned small-state layouts (VERDICT r13 item 4):
  * every family's absorb must publish atomically (crash debris is
  * invisible; blind re-runs are safe) and isolate concurrent readers
  * (a reader pinned before an absorb sees fully-old state). The torn-
  * manifest and commit-collision mechanics are pinned once in
  * TextVectorSpec — the seam is shared — so these tests cover the
  * state-specific surfaces. */
class StateManifestSpec extends SparkSpec {
  import spark.implicits._

  test("KMV: reader pinned before an absorb sees fully-old state; vacuum reclaims superseded versions") {
    val p = java.nio.file.Files.createTempDirectory("graft-kmv-iso").toString
    val all = (0L until 2000L).toDF("k")
    Sketch.writeKmvState(all.filter($"k" < 1000), "k", k = 64, p)
    // the pinned reader: resolve the state through the CURRENT
    // snapshot, collect only AFTER the absorb commits
    val pinned = StateStore.readSingle(spark, p)
    val before = Sketch.readKmvState(spark, p).head().getDouble(2)
    Sketch.absorbKmvState(all.filter($"k" >= 1000), "k", p)
    val after = Sketch.readKmvState(spark, p).head().getDouble(2)
    assert(after > before, "fixture must make the absorb move the estimate")
    // the pinned plan still reads the OLD segment directory — fully-old
    // state, not a mix and not a failure
    val k = pinned.select(col("k")).first().getInt(0)
    val pinnedEst = pinned
      .select(round(graft.ops.Sketch.kmvEstimate(col("retained"), k), 9))
      .first().getDouble(0)
    assert(pinnedEst === before,
      "a reader pinned before the absorb must see the pre-absorb state")
    // both versions remain readable (time travel) until vacuum
    assert(IndexManifest.versions(spark, p).size === 2)
    StateStore.vacuum(spark, p)
    assert(IndexManifest.versions(spark, p).size === 1)
    assert(Sketch.readKmvState(spark, p).head().getDouble(2) === after,
      "current reads survive vacuum")
  }

  test("KMV: crash debris (uncommitted segment) is invisible and a blind re-run is safe") {
    val p = java.nio.file.Files.createTempDirectory("graft-kmv-crash").toString
    val all = (0L until 500L).toDF("k")
    Sketch.writeKmvState(all.filter($"k" < 400), "k", k = 32, p)
    val healthy = Sketch.readKmvState(spark, p).head().getDouble(2)
    // a crashed absorb wrote its segment but never committed: the
    // layout must behave as if nothing happened
    Seq((32, Seq(1L, 2L, 3L))).toDF("k", "retained")
      .write.parquet(s"$p/state-deadbeef0001")
    assert(Sketch.readKmvState(spark, p).head().getDouble(2) === healthy,
      "orphan state segment leaked into a read")
    // the blind re-run applies once
    Sketch.absorbKmvState(all.filter($"k" >= 400), "k", p)
    val after = Sketch.readKmvState(spark, p).head().getDouble(2)
    assert(after > healthy)
    // vacuum reclaims the orphan
    val dropped = StateStore.vacuum(spark, p)
    assert(dropped.exists(_.contains("deadbeef")),
      s"vacuum must reclaim the crashed absorb's orphan: $dropped")
    assert(Sketch.readKmvState(spark, p).head().getDouble(2) === after)
  }

  test("profile + histogram: reader isolation across an absorb; one pin pairs counts with bounds") {
    val cols = Seq("id", "v")
    val rows = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val late = (100 until 150).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val pp = java.nio.file.Files.createTempDirectory("graft-prof-iso").toString
    Profile.writeProfileState(rows, cols, pp)
    val pinnedProfile = StateStore.readSingle(spark, pp)
    Profile.appendProfileState(late, cols, pp)
    assert(pinnedProfile.filter(col("column") === "id")
      .select(col("n_rows")).first().getLong(0) === 100L,
      "a reader pinned before the profile absorb must see the old counts")
    assert(Profile.readProfileState(spark, pp)
      .filter(col("column") === "id")
      .select(col("n_rows")).first().getLong(0) === 150L)

    val ph = java.nio.file.Files.createTempDirectory("graft-hist-iso").toString
    Profile.writeHistState(rows, "v", 0.0, 200.0, nBins = 10, ph)
    val pinnedHist = {
      val snap = StateStore.snapshot(spark, ph)
      spark.read.parquet(snap.single("state"))
    }
    Profile.appendHistState(late, ph)
    assert(pinnedHist.agg(sum(col("n_rows"))).first().getLong(0) === 100L,
      "a reader pinned before the histogram absorb must see the old bins")
    assert(Profile.readHistState(spark, ph)
      .agg(sum(col("n_rows"))).first().getLong(0) === 150L)
  }

  test("meta head-row cache: a reseed with new bounds is observed, never served stale (r17)") {
    // the per-JVM head-row cache is keyed on the meta SEGMENT path; a
    // reseed writes a new uuid directory, so the same-path staleness a
    // value-level cache would risk must be impossible by construction
    val rows = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val ph = java.nio.file.Files.createTempDirectory("graft-hist-reseed").toString
    Profile.writeHistState(rows, "v", 0.0, 200.0, nBins = 10, ph)
    // prime the cache through every meta-reading path
    assert(Profile.readHistState(spark, ph).count() === 10)
    assert(!Profile.histQuantile(spark, ph, 0.5).isNaN)
    Profile.writeHistState(rows, "v", 0.0, 50.0, nBins = 5, ph)
    val after = Profile.readHistState(spark, ph)
    assert(after.count() === 5, "reseed must replace the cached bin count")
    assert(after.agg(max(col("hi"))).first().getDouble(0) === 50.0,
      "reseed must replace the cached bounds")
    assert(after.select(col("n_above")).first().getLong(0) === 50L,
      "values above the new hi land in the overflow bin")
  }

  test("agg state: absorb excludes touched buckets from old segments; pinned reader unaffected; vacuum reclaims") {
    val p = java.nio.file.Files.createTempDirectory("graft-agg-iso").toString
    val seedRows = (0 until 40).map(i => (s"g${i % 8}", i.toDouble)).toDF("g", "v")
    AggState.writeAggState(seedRows, Seq("g"), Seq("v"), p, nBuckets = 4)
    val pinned = {
      val snap = StateStore.snapshot(spark, p)
      snap.read(spark, "state", Some("kb")).get
    }
    // a batch touching ONE group: only its bucket rewrites
    AggState.appendAggState(Seq(("g0", 1000.0)).toDF("g", "v"), p)
    assert(pinned.agg(sum(col("n_rows"))).first().getLong(0) === 40L,
      "a reader pinned before the absorb must see the old rollup")
    val cur = AggState.readAggState(spark, p)
    assert(cur.agg(sum(col("n_rows"))).first().getLong(0) === 41L)
    assert(cur.filter(col("g") === "g0").select(col("v_max"))
      .first().getDouble(0) === 1000.0)
    // the new manifest: old segment annotated with the touched bucket,
    // new segment holds the merged bucket
    val snap = StateStore.snapshot(spark, p)
    val segs = snap.segments("state")
    assert(segs.size === 2, s"expected old+new state segments, got $segs")
    assert(segs.head.exclude.nonEmpty,
      "the superseded bucket must be excluded from the old segment")
    // absorb == one-shot through the segmented read
    val oneShot = java.nio.file.Files.createTempDirectory("graft-agg-one").toString
    AggState.writeAggState(
      seedRows.unionByName(Seq(("g0", 1000.0)).toDF("g", "v")),
      Seq("g"), Seq("v"), oneShot, nBuckets = 4)
    val a = cur.orderBy("g").collect().map(_.toString).toSeq
    val b = AggState.readAggState(spark, oneShot)
      .orderBy("g").collect().map(_.toString).toSeq
    assert(a === b, "segmented rollup diverged from the one-shot seed")
    // vacuum reclaims the excluded bucket dir + superseded manifests;
    // reads unchanged
    AggState.vacuumAggState(spark, p)
    val c = AggState.readAggState(spark, p)
      .orderBy("g").collect().map(_.toString).toSeq
    assert(c === b, "reads must survive vacuum")
  }

  test("every state family answers as-of reads: the version pinned before an absorb reproduces the pre-absorb state") {
    // profile
    val cols = Seq("id", "v")
    val rows = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val late = (100 until 150).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val pp = java.nio.file.Files.createTempDirectory("graft-prof-tt").toString
    Profile.writeProfileState(rows, cols, pp)
    val vp = StateStore.snapshot(spark, pp).version
    Profile.appendProfileState(late, cols, pp)
    assert(Profile.readProfileState(spark, pp, asOfVersion = Some(vp))
      .filter(col("column") === "id").select("n_rows").first().getLong(0) === 100L)
    assert(Profile.readProfileState(spark, pp)
      .filter(col("column") === "id").select("n_rows").first().getLong(0) === 150L)
    // histogram (meta + counts pair through the SAME pinned version)
    val ph = java.nio.file.Files.createTempDirectory("graft-hist-tt").toString
    Profile.writeHistState(rows, "v", 0.0, 200.0, nBins = 10, ph)
    val vh = StateStore.snapshot(spark, ph).version
    Profile.appendHistState(late, ph)
    assert(Profile.readHistState(spark, ph, asOfVersion = Some(vh))
      .agg(sum(col("n_rows"))).first().getLong(0) === 100L)
    // rollup
    val pa = java.nio.file.Files.createTempDirectory("graft-agg-tt").toString
    AggState.writeAggState(rows.toDF("g", "v"), Seq("g"), Seq("v"), pa, nBuckets = 4)
    val va = StateStore.snapshot(spark, pa).version
    AggState.appendAggState(late.toDF("g", "v"), pa)
    assert(AggState.readAggState(spark, pa, asOfVersion = Some(va))
      .agg(sum(col("n_rows"))).first().getLong(0) === 100L)
    assert(AggState.readAggState(spark, pa)
      .agg(sum(col("n_rows"))).first().getLong(0) === 150L)
    // sample
    val ps = java.nio.file.Files.createTempDirectory("graft-smp-tt").toString
    Sketch.writeSampleState(rows.toDF("g", "v"), Seq("g"), Seq(col("g")),
      col("v"), 32, ps)
    val vs = StateStore.snapshot(spark, ps).version
    Sketch.absorbSampleState(late.toDF("g", "v"), Seq("g"), Seq(col("g")),
      col("v"), 32, ps)
    assert(Sketch.readSampleState(spark, ps, asOfVersion = Some(vs))
      .agg(sum(col("n_rows"))).first().getLong(0) === 100L)
    // a vacuumed earlier version refuses loudly (shared seam contract)
    StateStore.vacuum(spark, pa)
    val ex = intercept[IllegalStateException] {
      AggState.readAggState(spark, pa, asOfVersion = Some(va)).collect()
    }
    assert(ex.getMessage.contains("vacuum"))
  }

  test("retention vacuum: keepVersions retains whole snapshots — as-of reads inside the window survive, excluded buckets reclaim only when every retained version excludes them") {
    val p = java.nio.file.Files.createTempDirectory("graft-agg-ret").toString
    val seedRows = (0 until 40).map(i => (s"g${i % 8}", i.toDouble)).toDF("g", "v")
    AggState.writeAggState(seedRows, Seq("g"), Seq("v"), p, nBuckets = 4)
    val v1 = StateStore.snapshot(spark, p).version
    AggState.appendAggState(Seq(("g0", 1000.0)).toDF("g", "v"), p)
    val v2 = StateStore.snapshot(spark, p).version
    def total(asOf: Option[Long]) = AggState.readAggState(spark, p, asOf)
      .agg(sum(col("n_rows"))).first().getLong(0)

    // keepVersions=2: BOTH versions stay fully readable — in
    // particular the touched bucket of v1's segment is NOT reclaimed,
    // because v1 (retained) still reads it (exclude-intersection rule)
    AggState.vacuumAggState(spark, p, keepVersions = 2)
    assert(IndexManifest.versions(spark, p) === Seq(v1, v2))
    assert(total(Some(v1)) === 40L,
      "the as-of read inside the retention window must survive vacuum")
    assert(total(None) === 41L)

    // keepVersions=1 (the default posture): v1's manifest and the
    // now-unreferenced excluded bucket reclaim; v1 refuses loudly
    val dropped = AggState.vacuumAggState(spark, p)
    assert(IndexManifest.versions(spark, p) === Seq(v2))
    assert(dropped.exists(_.contains("kb=")),
      s"the excluded bucket dir must reclaim once no retained version reads it: $dropped")
    assert(total(None) === 41L)
    val ex = intercept[IllegalStateException] { total(Some(v1)) }
    assert(ex.getMessage.contains("vacuum"))
  }

  test("sample state: absorb == one-shot bit-for-bit through the versioned layout") {
    val p1 = java.nio.file.Files.createTempDirectory("graft-smp-one").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft-smp-inc").toString
    val all = (0 until 1000).map(i => (s"g${i % 3}", i.toLong, (i * 7 % 100).toDouble))
      .toDF("g", "id", "v")
    Sketch.writeSampleState(all, Seq("g"), Seq(col("id")), col("v"), 64, p1)
    Sketch.writeSampleState(all.filter($"id" < 600), Seq("g"),
      Seq(col("id")), col("v"), 64, p2)
    Sketch.absorbSampleState(all.filter($"id" >= 600), Seq("g"),
      Seq(col("id")), col("v"), 64, p2)
    val a = Sketch.readSampleState(spark, p1)
      .orderBy("g").collect().map(_.toString).toSeq
    val b = Sketch.readSampleState(spark, p2)
      .orderBy("g").collect().map(_.toString).toSeq
    assert(a === b, "absorbed sample state diverged from the one-shot seed")
    assert(IndexManifest.versions(spark, p2).size === 2)
  }
}
