package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-versioned storage for the SMALL persisted states — KMV
  * sketch, min-k sample, profile, histogram, keyed aggregate rollup
  * (VERDICT r13 item 4). These are the mergeable-state family: seed
  * once over the corpus, absorb batches forever, answer questions from
  * state-sized reads. Their writer locks (r12) made concurrent WRITERS
  * loud, but a reader overlapping an absorb's in-place overwrite still
  * had no isolation — the exact window [[IndexManifest]] closed for
  * the index layouts in r13. This module is that seam applied to the
  * states:
  *
  *  - every absorb writes fresh immutable segment directories and
  *    publishes ONE atomic manifest commit — a reader pins the current
  *    snapshot and sees fully-old or fully-new state, never a
  *    half-overwritten frame;
  *  - a crash before the commit changes nothing (orphan directories
  *    only), so seeds and absorbs are safe to re-run blindly — the
  *    crash contract the in-place overwrites could not offer;
  *  - `streamTag` rides inside the commit and is re-checked under the
  *    writer lock, so the streamed twins ([[graft.streaming
  *    .ProfileStream]], [[graft.streaming.RollupStream]]) get the
  *    idempotent-checkable retry of [[graft.streaming.IndexStream]]
  *    for free;
  *  - superseded state versions stay readable (time-travel, the audit
  *    read "what did the profile say before this batch?") until an
  *    explicit [[vacuum]].
  *
  * The price is explicit reclamation instead of overwrite-in-place —
  * right for states this small (k longs, nBins rows, per-column
  * profile rows, key-bucket aggregates). */
private[graft] object StateStore {
  import IndexManifest.{Segment, Snapshot}

  /** Seed (overwrite semantics): clears a stale writer lock first (the
    * documented crash remediation, as the index builders do), then
    * writes each component via its `write(absoluteDir)` thunk and
    * publishes one atomic commit. An existing layout continues its
    * version sequence, so readers pinned to older versions stay
    * valid. */
  def seed(spark: SparkSession, path: String, op: String)
          (comps: (String, String => Unit)*): Unit = {
    IndexLock.clearStale(spark, path)
    IndexLock.withLock(spark, path, op) {
      // component writes are mutually independent and land in disjoint
      // fresh directories — overlap them (guide §2.6, the
      // writeGraphIndex posture); the commit stays strictly after the
      // join. For the two-component states (hist bins + bounds,
      // rollup buckets + meta) the tiny meta write rides the state
      // write's tail instead of adding its own job latency.
      val named = comps.toSeq.map { case (name, write) =>
        (name, write, IndexManifest.newSegment(name))
      }
      Par.run(named.map { case (_, write, seg) =>
        () => write(s"$path/$seg")
      }: _*)
      val next = named.map { case (name, _, seg) =>
        name -> Seq(Segment(seg))
      }.toMap
      val base =
        if (IndexManifest.exists(spark, path)) Some(IndexManifest.pin(spark, path))
        else None
      IndexManifest.commit(spark, path, base, next)
    }
  }

  /** General absorb under the writer lock: `f` receives the pinned
    * snapshot, writes fresh segment directories, and returns the
    * component entries to REPLACE (untouched components carry
    * forward); one atomic commit publishes the result. When
    * `streamTag` is set and already committed, the whole mutation
    * no-ops — the retry path of a redelivered stream batch whose
    * earlier attempt committed but died before its exactly-once
    * marker. */
  def mutate(spark: SparkSession, path: String, op: String,
             streamTag: Option[String] = None)
            (f: Snapshot => Map[String, Seq[Segment]]): Unit =
    IndexLock.withLock(spark, path, op) {
      // lambda: the manifest-store tag lookup must not run at all on the
      // (common) untagged batch-absorb path
      if (streamTag.exists(t => IndexManifest.hasCommittedTag(spark, path, t)))
        return
      val snap = IndexManifest.pin(spark, path)
      val replaced = f(snap)
      if (replaced.nonEmpty)
        IndexManifest.commit(spark, path, Some(snap),
          snap.components ++ replaced, streamTag)
    }

  /** The single-frame absorb most states need: read `comp` from the
    * pinned snapshot, transform, write the result as the replacing
    * segment. The transform's plan reads the OLD segment and writes a
    * NEW directory, so the read-path-overwrite hazard the in-place
    * absorbs had to checkpoint around is gone by construction. */
  def absorbSingle(spark: SparkSession, path: String, op: String,
                   comp: String = "state", streamTag: Option[String] = None,
                   coalesce1: Boolean = false)
                  (f: DataFrame => DataFrame): Unit =
    mutate(spark, path, op, streamTag) { snap =>
      val out = f(snap.readSingle(spark, comp))
      val seg = IndexManifest.newSegment(comp)
      IndexManifest.writeSingleSegment(out, s"$path/$seg", coalesce1)
      Map(comp -> Seq(Segment(seg)))
    }

  /** Pin the current snapshot — multi-component readers resolve every
    * component through ONE pin so a concurrent absorb cannot mismatch
    * them (the probeIvfIndexPq single-pin posture). A layout without a
    * manifest (never seeded, or written by the pre-manifest in-place
    * format) fails with the state-specific remedy instead of the index
    * layouts' message. */
  def snapshot(spark: SparkSession, path: String,
               version: Option[Long] = None): Snapshot =
    // translate the missing-manifest failure rather than pre-checking
    // exists(): the pre-check would repeat pin's whole manifest-store
    // scan on every state read just to pick an error message
    try IndexManifest.pin(spark, path, version)
    catch {
      case e: IllegalStateException if e.getMessage.contains("no index manifest") =>
        throw new IllegalStateException(
          s"state at $path is not manifest-versioned — never seeded, or " +
            "written by an older graft in-place state format; re-seed it " +
            "with its write* function (writeKmvState / writeSampleState / " +
            "writeProfileState / writeHistState / writeAggState) from the " +
            "source data", e)
    }

  /** Read a single-segment component of the current version — or, the
    * TIME-TRAVEL read the versioned layout gives for free, an explicit
    * earlier `version` (valid until [[vacuum]]): "what did the state
    * say before this batch?" answered from the superseded snapshot. */
  def readSingle(spark: SparkSession, path: String,
                 comp: String = "state",
                 version: Option[Long] = None): DataFrame =
    snapshot(spark, path, version).readSingle(spark, comp)

  /** Reclaim superseded state versions ([[IndexManifest.vacuum]]);
    * `keepVersions` retains the newest K snapshots (as-of reads within
    * the window survive); callers own the reader-grace contract beyond
    * it. */
  def vacuum(spark: SparkSession, path: String,
             op: String = "vacuumState",
             keepVersions: Int = 1): Seq[String] =
    IndexLock.withLock(spark, path, op) {
      IndexManifest.vacuum(spark, path, keepVersions)
    }
}
