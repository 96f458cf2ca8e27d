package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark main.
  *
  * Output contract (VERDICT r2 item 1 — the r2 metric line embedded two
  * 70-entry per-query maps and the driver's tail capture started
  * mid-line, so round 2 published NO perf number):
  *   - per-query timing maps go to `BENCH_DETAIL.json` on disk and to
  *     ONE stdout line of their own, printed FIRST;
  *   - the LAST stdout line is a compact headline the driver can always
  *     parse from a bounded tail window:
  *       {"metric":"total","value":N,"unit":"sec","sf":"…","errors":[…]}
  *
  * Measurement order (VERDICT r2 item 4 — the sf0.01 pass used to run
  * first and doubled as JIT warmup, making its numbers junk): a
  * dedicated all-query warmup at sf0.001 runs first and is discarded,
  * then the headline SF is measured, then sf0.01.
  *
  * Per-query failures are no longer silent (VERDICT r2 item 3): a query
  * that throws is recorded in "errors" with its name; its time slot
  * holds -1.0 so a broken query can never masquerade as a fast one.
  *
  * Steady-state hygiene (BENCH_r03/r04 root cause): several queries
  * legitimately persist/localCheckpoint intermediates (warm-warehouse
  * replays); run back-to-back 210 times in one JVM those blocks leaked
  * into the unified 8 GB heap, storage crowded out execution memory,
  * and late-pass queries degraded 10-100x (q_group_agg 126 s in r4 vs
  * 0.4 s clean). Every runOne now drops all persisted blocks + cached
  * plans, and the status store keeps only a handful of executions.
  * The headline figure is the median of 3 passes per query (r14 —
  * best-of-2 before that let a single contended pass decide, and
  * r10/r12/r13 each spent a session adjudicating the resulting
  * hotter-machine false flag) so a transient external stall (the r2
  * "alphabetically contiguous slow block") cannot masquerade as a
  * regression.
  *
  * BENCH_r06 root cause (the gate flagged 3 UNCHANGED trivial queries
  * 3-8x slow; an instrumented re-run flagged a DIFFERENT set, with
  * per-query GC deltas too small to explain the stalls): two
  * self-inflicted mid-query interference sources, both now removed —
  *  - `spark.cleaner.periodicGC.interval=30s` fired full System.gc()
  *    on a wall-clock cadence, so collector pauses + the context
  *    cleaner's unpersist/broadcast-removal storms landed INSIDE
  *    whatever query was running every ~30 s (stable within a process
  *    because both best-of-2 passes pace alike; moving between
  *    processes — exactly the observed signature). The config is gone;
  *    instead the harness itself runs a synchronous System.gc() at
  *    controlled points BETWEEN queries (>=20 s apart, untimed), which
  *    still drains ContextCleaner's reference queue (the r3/r4 leak
  *    defense) without ever pausing a measured query.
  *  - the generated-class cache (`spark.sql.codegen.cache.maxEntries`,
  *    static default 100) thrashes at 110 queries x several codegen
  *    units x 2+ fixture dirs: evicted entries mean a full Janino
  *    recompile inside the timed window on every later pass. Raised to
  *    5000 (entries are soft-referenced class handles — cheap).
  *  - cleanup (clearCache/unpersist) now runs OUTSIDE the timed
  *    window: it is harness hygiene, not query cost.
  */
object Bench {

  /** Matches the start of any ScaleSmoke section key in
    * BENCH_DETAIL.json (`"sf1_smoke":`, `"sf3_smoke":`, …) — shared by
    * Bench's preserve and ScaleSmoke's splice so the two can never
    * disagree about where the smoke tail begins. */
  private[graft] val smokeSectionPattern = "\"sf[0-9a-z.]+_smoke\":".r

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(appName = "graft-bench",
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional args: bench only the named queries (dev loop).
    // SPARK_GRAFT_BENCH_EXCLUDE (comma list) drops queries from a FULL
    // run — used by the ×10 gate (tools/bench_x10.sh) to skip the two
    // DECLARED-quadratic verification queries (q_embed_neardup and its
    // lsh recall twin embed an all-pairs brute baseline in their own
    // output; their ×100-at-×10 cost is the declared property of
    // verification queries, not a plan cliff — same exclusion
    // ScaleSmoke documents).
    val excluded = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val selected =
      (if (args.isEmpty) SparkEntry.queries
       else SparkEntry.queries.filter { case (k, _) => args.contains(k) })
        .filter { case (k, _) => !excluded(k) }

    // noop sink materializes EVERY output column — count() would let
    // the optimizer prune the expensive projections out of the plan.
    // NOTE: no cleanup in here — runOne is the TIMED unit; hygiene
    // happens in betweenQueries, outside the clock.
    def runOne(name: String, dir: String): Either[String, Unit] =
      try { selected(name)(spark, dir).write.format("noop").mode("overwrite").save(); Right(()) }
      catch { case t: Throwable => Left(t.getClass.getSimpleName) }

    // untimed per-query hygiene: drop blocks a query persisted/
    // localCheckpointed for its own multi-job structure (dead once the
    // query returns — the r3/r4 late-pass degradation defense), and
    // every >=20 s run a SYNCHRONOUS full GC so ContextCleaner's
    // reference queue drains HERE, between queries, instead of a
    // wall-clock periodic GC pausing whatever query happens to be
    // running (the r6 moving-regression root cause).
    var lastGcAt = System.nanoTime()
    def betweenQueries(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      // blocking: an async unpersist returns before block removal runs,
      // so the removal storm (hundreds of localCheckpoint blocks after
      // an iterative query) lands INSIDE the next query's timed window
      // — the r16 full run measured an untouched query at 8× its
      // baseline in the two passes where it followed a checkpoint-heavy
      // neighbor. This is hygiene; it belongs outside the clock.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      if ((System.nanoTime() - lastGcAt) / 1e9 > 20.0) {
        System.gc()
        lastGcAt = System.nanoTime()
      }
    }

    // ---- calibration probe (VERDICT r15 item 1) -------------------
    // The per-round BENCH_REF refresh is a ratchet: each round's drift
    // flags get adjudicated as "machine band" and the ref re-recorded,
    // so cumulative slowdown never trips anything (r15 REF was a median
    // 1.34× the r12 REF on 190 untouched queries, cause indeterminate
    // from inside the sandbox). The fix is an INSTRUMENT: a fixed
    // CPU-bound probe — pinned synthetic data, deterministic plan, no
    // fixture/disk dependency — measured at bench start AND end, plus a
    // pinned BENCH_ANCHOR.txt recorded once and NEVER refreshed. Drift
    // vs the anchor is then calibration-normalized,
    //   (t_q / anchor_q) / (calib_now / calib_anchor),
    // so "the VM got slower" (calib moves with the queries) separates
    // from "the code got slower" (queries move, calib does not).
    def calibrationRun(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, 32)
        .selectExpr("xxhash64(cast(id as string), id) as h")
        // mask before summing: 8M full-range longs overflow an ANSI sum
        .selectExpr("h & 1023 as k", "h & 1048575 as hm")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("hm")).as("s"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def calibrate(): Seq[Double] = {
      betweenQueries()
      (1 to 5).map { _ => val t = calibrationRun(); betweenQueries(); t }
    }

    val names = selected.keys.toSeq.sorted

    // dedicated warmup: every query once at the tiniest SF, discarded.
    // This absorbs codegen/JIT/broadcast machinery so BOTH measured
    // passes below see a warm JVM.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      names.foreach { n => runOne(n, warmDir); betweenQueries() }

    // small-SF regression axis, shared by the prewarm below and the
    // measured small pass at the bottom — ONE definition so the two
    // can never warm/measure different dirs
    val smallDir = "/root/testdata/sf0.01"
    def hasSmallPass: Boolean =
      new java.io.File(smallDir).isDirectory && smallDir != sfDir

    // fixture setup for the MEASURED dirs happens here, inside warmup:
    // scratch-materialized payloads are keyed per (JVM, fixture dir),
    // so without this the first measured pass of q_media_video times
    // the GIF encode in every fresh JVM (the driver's 2.5× phantom
    // regression, VERDICT r10 item 3). Best-effort: a prewarm failure
    // (bad fixture dir) must not kill the run — the measured pass
    // records the same failure per query via runOne's error path.
    if (names.contains("q_media_video")) {
      (Seq(sfDir) ++ (if (hasSmallPass) Seq(smallDir) else Nil)).foreach { d =>
        try graft.queries.MultimodalQueries.prewarmFixtures(spark, d)
        catch { case _: Throwable => () }
      }
      betweenQueries()
    }

    // last failure class per (pass-dir, query); only queries whose BEST
    // result is still a failure make the headline errors list — a query
    // that failed one best-of-2 run but recovered in the other is
    // healthy (the transient is visible in BENCH_DETAIL's -1.0 slot,
    // not in the gate the driver reads)
    val failures = scala.collection.mutable.LinkedHashMap.empty[(String, String), String]

    // GC/heap instrumentation (BENCH_r06 root-cause): the r6 gate
    // flagged three UNCHANGED trivial queries 3-8x slow at sf0.1 in
    // BOTH best-of-2 passes. Per-query GC-time deltas separate "the
    // plan got slower" from "a collector pause landed inside the timed
    // window" — the maps go to BENCH_DETAIL.json so the diagnosis is a
    // persisted artifact, not a guess.
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def heapUsedMb: Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    val gcByQuery = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val heapByQuery = scala.collection.mutable.LinkedHashMap.empty[String, Long]

    // `rotate` shifts the execution order (results come back in
    // canonical `names` order regardless): each pass starts a third of
    // the way further around the query ring. Without it every query
    // occupies the SAME wall-clock position in every pass, so a machine
    // stall lasting longer than one pass poisons the same query in two
    // consecutive passes and defeats the median — exactly the
    // BENCH_r14 false flag (q_merge_upsert 8.85/13.2/0.43 s across the
    // three passes while an isolated rerun measured 0.77 s). With the
    // rotation a time-contiguous stall lands on DIFFERENT queries each
    // pass, so any single query keeps at least two clean samples.
    def timeAll(dir: String, trackGc: Boolean = false,
                rotate: Int = 0): Seq[(String, Double)] = {
      val k = if (names.isEmpty) 0 else ((rotate % names.size) + names.size) % names.size
      val order = names.drop(k) ++ names.take(k)
      val timed = order.map { name =>
        val g0 = gcMillis
        val t0 = System.nanoTime()
        val r = runOne(name, dir) match {
          case Right(_) => name -> (System.nanoTime() - t0) / 1e9
          case Left(e)  => failures((dir, name)) = e; name -> -1.0
        }
        if (trackGc) {
          // both instrumentation maps keep the MAX across the timed
          // passes (uniform semantics — a reader of BENCH_DETAIL.json
          // sees each query's worst GC bill and worst post-query heap,
          // comparable numbers for the same diagnosis)
          gcByQuery(name) = gcByQuery.getOrElse(name, 0L).max(gcMillis - g0)
          heapByQuery(name) = heapByQuery.getOrElse(name, 0L).max(heapUsedMb)
        }
        betweenQueries()
        r
      }
      val byName = timed.toMap
      names.map(n => n -> byName(n))
    }

    // median-of-N per query (lower median when the valid count is
    // even): r10/r12/r13 each burned a session adjudicating a
    // hotter-machine false flag that best-of-2 let through — one
    // contended pass out of two decided the headline. The median of
    // three needs TWO slow passes to move, so a transient stall cannot
    // masquerade as a regression, while a real plan change still
    // shows in all three. A -1.0 error marker survives only if the
    // query failed in every run.
    def medByQuery(runs: Seq[Seq[(String, Double)]]): Seq[(String, Double)] =
      runs.transpose.map { ts =>
        val ok = ts.map(_._2).filter(_ >= 0).sorted
        if (ok.isEmpty) ts.head else (ts.head._1, ok((ok.size - 1) / 2))
      }

    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")

    // headline SF first (warm but unpolluted), small-SF regression axis
    // second. Skip the small pass when it IS the headline dir. Each
    // pass starts a third of the way around the query ring so a
    // sustained stall decorrelates across passes (see timeAll).
    val third = names.size / 3
    calibrationRun() // discarded: codegen/JIT warm for the probe's plan
    val calibStart = calibrate()
    val pass1 = timeAll(sfDir, trackGc = true)
    val pass2 = timeAll(sfDir, trackGc = true, rotate = third)
    val pass3 = timeAll(sfDir, trackGc = true, rotate = 2 * third)
    val results = medByQuery(Seq(pass1, pass2, pass3))
    val small = if (hasSmallPass) timeAll(smallDir) else Seq.empty
    val calibEnd = calibrate()
    val total = results.map(_._2).filter(_ >= 0).sum
    val smallTotal = small.map(_._2).filter(_ >= 0).sum

    // calibration figure for THIS run: median of the ten samples (five
    // at start, five at end — the spread itself is recorded so a
    // machine that changed speed MID-run is visible in the artifact)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.size - 1) / 2)
    }
    val calibAll = calibStart ++ calibEnd
    val calibSec = if (calibAll.nonEmpty) median(calibAll) else -1.0

    def readRef(name: String): Seq[String] = {
      val f = new java.io.File(name)
      if (!f.isFile) Nil
      else {
        // explicit tolerant UTF-8: under a POSIX locale this JVM's
        // default charset is US-ASCII and Scala's default codec
        // REPORTS malformed input, so one non-ASCII byte in a ref
        // comment line would kill the whole bench run after both
        // timed passes (observed: an em dash in an anchor header)
        val codec = scala.io.Codec.UTF8
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        val src = scala.io.Source.fromFile(f)(codec)
        try src.getLines().toList finally src.close()
      }
    }

    // pinned anchor, HOST-KEYED (r16 VERDICT item 7): the r16 driver
    // run showed a CPU probe cannot normalize fixture-I/O query
    // profiles across machines (cum_drift median 1.703 against the
    // builder-host anchor — cross-host noise, not code drift), so
    // drift is only ever computed against an anchor recorded on THIS
    // host. Selection requires BOTH the sf and the host to match; with
    // no matching anchor, cum_drift is explicitly null and (below,
    // outside every timed window) this run writes the host's anchor —
    // never overwriting an existing one.
    val hostKey =
      try java.net.InetAddress.getLocalHost.getHostName
        .replaceAll("[^A-Za-z0-9.-]", "_")
      catch { case _: Throwable => "unknown" }
    val hostAnchorFile = s"BENCH_ANCHOR.$hostKey.txt"
    val anchorCandidates =
      Seq(hostAnchorFile, s"BENCH_ANCHOR_x10.$hostKey.txt",
        "BENCH_ANCHOR.txt", "BENCH_ANCHOR_x10.txt")
      .map(readRef).filter(_.nonEmpty)
      .map { ls =>
        (ls.collectFirst {
          case l if l.trim.startsWith("# sf=") => l.trim.stripPrefix("# sf=")
        }, ls)
      }
    def anchorHost(ls: Seq[String]): Option[String] = ls.collectFirst {
      case l if l.trim.startsWith("# host=") => l.trim.stripPrefix("# host=")
    }
    val anchorLines: Seq[String] = anchorCandidates
      .collectFirst { case (Some(sf), ls)
        if sf == sfDir && anchorHost(ls).contains(hostKey) => ls }
      .getOrElse(Nil)
    val anchorCalib: Option[Double] = anchorLines.collectFirst {
      case l if l.trim.startsWith("# calibration=") =>
        l.trim.stripPrefix("# calibration=").toDouble
    }
    val anchor: Map[String, Double] =
      anchorLines.iterator.map(_.trim.split("\\s+"))
        .collect { case Array(n, v) => v.toDoubleOption.map(n -> _) }
        .flatten.toMap
    // calibration-normalized cumulative drift per anchored query
    val calibRatio = anchorCalib.filter(_ > 0).filter(_ => calibSec > 0)
      .map(ca => calibSec / ca)
    val driftByQuery: Seq[(String, Double)] = calibRatio match {
      case Some(cr) => results.collect {
        case (n, t) if t >= 0 && anchor.get(n).exists(_ > 0) =>
          n -> (t / anchor(n)) / cr
      }
      case None => Nil
    }
    val cumDriftJson =
      if (driftByQuery.isEmpty) "null"
      else {
        val ds = driftByQuery.map(_._2).sorted
        val med = ds((ds.size - 1) / 2)
        val p90 = ds(((ds.size - 1) * 9) / 10)
        f"""{"median":$med%.3f,"p90":$p90%.3f,"n":${ds.size},""" +
          f""""calib":$calibSec%.3f,"calib_anchor":${anchorCalib.get}%.3f}"""
      }

    // preserve the ScaleSmoke sections (always the LAST keys in the
    // file — sf1_smoke, sf3_smoke, …) across bench rewrites — they are
    // produced by separate, much longer runs and must not vanish every
    // bench cycle
    val prevSf1: String = try {
      val f = new java.io.File("BENCH_DETAIL.json")
      if (f.isFile) {
        val src = scala.io.Source.fromFile(f)
        val s = try src.mkString finally src.close()
        val i = Bench.smokeSectionPattern.findFirstMatchIn(s).map(_.start).getOrElse(-1)
        if (i >= 0) "," + s.substring(i, s.lastIndexOf('}')) else ""
      } else ""
    } catch { case _: Throwable => "" }
    def toJsonL(rs: Iterable[(String, Long)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def toJsonArr(xs: Seq[Double]): String =
      xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val detail = s"""{"queries":${toJson(results)},"sf":"$sfDir",""" +
      s""""pass1":${toJson(pass1)},"pass2":${toJson(pass2)},"pass3":${toJson(pass3)},""" +
      s""""gc_ms":${toJsonL(gcByQuery)},"heap_mb":${toJsonL(heapByQuery)},""" +
      s""""calibration":{"start":${toJsonArr(calibStart)},"end":${toJsonArr(calibEnd)},"sec":$calibSec},""" +
      s""""cum_drift":$cumDriftJson,"drift_vs_anchor":${toJson(driftByQuery)},""" +
      s""""total_sf0.01":$smallTotal,"queries_sf0.01":${toJson(small)}$prevSf1}"""
    // only a FULL run owns the diagnostics artifact: a dev-loop subset
    // run (query-name args) would otherwise replace the full maps with
    // one-entry stubs and destroy the round's recorded detail.
    // SPARK_GRAFT_BENCH_DETAIL_OUT redirects the artifact — the ×10
    // gate writes BENCH_DETAIL_x10.json so the headline-SF detail the
    // driver reads is never clobbered by a different-scale run. An
    // EXCLUDE without an explicit detail path writes nothing: a
    // leftover exclusion env on a normal full run must not replace the
    // committed full maps with a reduced set (the same clobber class
    // the args guard exists for).
    val detailOut = sys.env.get("SPARK_GRAFT_BENCH_DETAIL_OUT")
    if (args.isEmpty && (excluded.isEmpty || detailOut.isDefined))
      try {
        val w = new java.io.PrintWriter(detailOut.getOrElse("BENCH_DETAIL.json"))
        try w.println(detail) finally w.close()
      } catch { case _: Throwable => () }
    println(detail)

    // per-query regression gate (VERDICT r2 item 7): compare the
    // headline pass against the committed clean-run reference; a query
    // >1.5x its reference AND >0.5 s absolute (so sub-second noise
    // can't trip it) is flagged in the headline. The median-of-3
    // headline needs two slow passes to move, so a flag means the
    // query was slow in most runs — a real regression, not contention.
    // parse defensively: a malformed line (header, typo) must not
    // crash AFTER both timed passes and cost the headline JSON line;
    // the "# sf=<dir>" comment keys each reference to the SF it was
    // recorded at — comparing another SF's times against it would flag
    // every query as a bogus regression. The gate is armed at TWO
    // scales (VERDICT r14 item 6): BENCH_REF.txt holds the headline
    // (sf0.1) clean run and BENCH_REF_x10.txt the materialized ×10 run
    // (tools/bench_x10.sh); the file whose header matches the benched
    // dir is consulted, so the same binary gates both.
    val refCandidates = Seq("BENCH_REF.txt", "BENCH_REF_x10.txt")
      .map(readRef).filter(_.nonEmpty)
      .map { ls =>
        (ls.collectFirst {
          case l if l.trim.startsWith("# sf=") => l.trim.stripPrefix("# sf=")
        }, ls)
      }
    // an EXACT header match wins over a headerless legacy file — a
    // headerless headline ref must not shadow the x10 ref (comparing
    // ×10 timings against sf0.1 references flags everything)
    val refLines: Seq[String] = refCandidates
      .collectFirst { case (Some(sf), ls) if sf == sfDir => ls }
      .orElse(refCandidates.collectFirst { case (None, ls) => ls })
      .getOrElse(Nil)
    val ref: Map[String, Double] =
      refLines.iterator.map(_.trim.split("\\s+"))
        .collect { case Array(n, v) => v.toDoubleOption.map(n -> _) }
        .flatten.toMap
    val regressions = results.collect {
      case (n, t) if t >= 0 && ref.get(n).exists(r => t > r * 1.5 && t - r > 0.5) =>
        f"$n:${t / ref(n)}%.1fx"
    }
    val regJson = regressions.map("\"" + _ + "\"").mkString("[", ",", "]")

    val errors =
      results.collect { case (n, t) if t < 0 =>
        s"$n:${failures.getOrElse((sfDir, n), "unknown")}" } ++
      small.collect { case (n, t) if t < 0 =>
        s"sf0.01/$n:${failures.getOrElse((smallDir, n), "unknown")}" }
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","errors":$errJson,"regressions":$regJson,"calibration":$calibSec,"cum_drift":$cumDriftJson}""")
    System.out.flush()

    // first errorless full run on a host records that host's anchor
    // (never overwritten — the pinned-once contract, now per host).
    // Untimed: the measured passes and the headline are already out.
    if (args.isEmpty && excluded.isEmpty && errors.isEmpty && calibSec > 0 &&
        !new java.io.File(hostAnchorFile).isFile)
      try {
        val w = new java.io.PrintWriter(hostAnchorFile, "UTF-8")
        try {
          w.println(s"# graft bench anchor - recorded once per host, never refreshed")
          w.println(s"# sf=$sfDir")
          w.println(s"# host=$hostKey")
          w.println(f"# calibration=$calibSec%.6f")
          results.foreach { case (n, t) => if (t >= 0) w.println(f"$n $t%.6f") }
        } finally w.close()
      } catch { case _: Throwable => () }

    spark.stop()
  }
}
