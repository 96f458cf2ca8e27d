package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.IndexManifest.Segment

/** Persisted inverted text index for BM25 ranked retrieval — the
  * lexical twin of the persisted ANN layouts ([[Ann.writeIvfIndex]])
  * and the MinHash band index ([[Dedup.bandIndex]]): tokenize and
  * aggregate the corpus ONCE at build time, then serve any number of
  * query batches from the stored layout without touching the raw text
  * again. At 100 TB the corpus tokenization dominates everything; this
  * amortizes it to once per corpus version.
  *
  * The layout is MANIFEST-VERSIONED ([[IndexManifest]]): every
  * maintenance op writes only new immutable segment directories under
  * `path` and commits one atomic manifest; probes pin the manifest
  * current when they open. That gives
  *  - reader isolation (a probe racing an append/delete/purge sees
  *    fully-old state, never a half-rewritten mix),
  *  - crash atomicity (a crash before the commit leaves only orphan
  *    directories — every op here is safe to re-run blindly), and
  *  - explicit space reclamation ([[vacuumBm25Index]]).
  *
  * Components in the manifest:
  *  - `postings` — segments of (doc_id, term, tf) PARTITIONED BY `tb` =
  *    pmod(hash(term), nBuckets): a probe for a handful of query terms
  *    reads only their buckets (literal partition filter, pruned at
  *    planning time — the same pruned-probe shape as
  *    [[Ann.probeIvfIndex]]), with the `term IN (…)` predicate pushed
  *    into the parquet scan within each bucket;
  *  - `terms` — segments of (term, df, tb): document frequencies are
  *    ADDITIVE across doc-disjoint segments, so probes sum `df` across
  *    segments — an append never rewrites stored term buckets;
  *  - `doclen` — segments of (doc_id, dl) document lengths;
  *  - `stats` — single directory, one row (n_docs, avgdl, n_buckets):
  *    the corpus scalars plus the bucketing fan-out probes must reuse;
  *  - `tombstones` — segments of pending delete ids (doc_id).
  *
  * Scoring matches the ad-hoc q_bm25 formula exactly (k1=1.2, b=0.75,
  * Lucene-style idf = ln((N − df + 0.5)/(df + 0.5) + 1)); per-doc score
  * parts are summed in SORTED TERM ORDER via a fold over the collected
  * (term, part) structs, so double addition is associativity-
  * deterministic across partitionings and engines (BENCH lesson: ranks
  * are oracle-compared, so near-tie sums must add in a fixed order).
  */
object TextIndex {

  /** Tokenizer shared by build and the ad-hoc queries: whitespace
    * tokens of the lowercased text (graft.expr.Text.tokens). */
  private def termRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(graft.expr.Text.tokens(lower(col(textCol)))).as("term"))

  private def writeBucketed(df: DataFrame, absDir: String, bucketCol: String): Unit =
    IndexManifest.writeBucketed(df, absDir, bucketCol)

  /** Build and persist the index. One tokenization pass; the df table
    * derives from the WRITTEN postings (read back from disk), so the
    * corpus text is scanned exactly once. Rebuilding over an existing
    * layout commits the next manifest version (pinned readers stay on
    * theirs); reclaim superseded segments with [[vacuumBm25Index]]. */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0)
    val spark = docs.sparkSession
    // the full rebuild is the documented crash-remediation path: a
    // stale lock left by a crashed op must not block it
    IndexLock.clearStale(spark, path)
    IndexLock.withLock(spark, path, "writeBm25Index") {
      val base = if (IndexManifest.exists(spark, path))
        Some(IndexManifest.pin(spark, path)) else None
      val postSeg = IndexManifest.newSegment("postings")
      val termSeg = IndexManifest.newSegment("terms")
      val dlSeg = IndexManifest.newSegment("doclen")
      val statSeg = IndexManifest.newSegment("stats")

      // ONE tokenization pass, materialized (r17, VERDICT r16 item 1):
      // postings, df and doclen all derive from this frame. The r16
      // shape wrote postings first and re-READ the written segment for
      // the df/doclen derivations — a schema-inference job plus a
      // 64-partition-dir scan each, with the postings write serializing
      // ahead of both. Now the heavy pass runs once into a checkpoint
      // and the three segment writes overlap (guide §1.2/§2.6). The
      // price is one extra postings-sized materialization; the
      // tokenize+shuffle it feeds dominates it at every scale (this
      // module's own 100 TB posture note).
      val tf = Reliable.checkpoint(
        termRows(docs, idCol, textCol)
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("tb", pmod(hash(col("term")), lit(nBuckets))))
      Par.run(
        // direct partitioned write (no emptiness probe — building over
        // an empty corpus is caller error, as before)
        () => tf.repartition(col("tb"))
          .write.mode("overwrite").partitionBy("tb").parquet(s"$path/$postSeg"),
        // same df values as the former written-postings aggregation:
        // the checkpoint holds exactly the rows the postings segment
        // stores, and tb is functionally dependent on term
        () => writeBucketed(
          tf.groupBy(col("term"), col("tb")).agg(count(lit(1)).as("df")),
          s"$path/$termSeg", "tb"),
        () => IndexManifest.writeSingleSegment(
          tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")),
          s"$path/$dlSeg"))
      // stats from the WRITTEN doclen segment (n_docs rows of (id, long))
      // — one narrow scan, schema served from the primed cache
      IndexManifest.writeSingleSegment(
        IndexManifest.readSegmentDir(spark, s"$path/$dlSeg")
          .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
            lit(nBuckets).as("n_buckets")),
        s"$path/$statSeg", coalesce1 = true)

      IndexManifest.commit(spark, path, base, Map(
        "postings" -> Seq(Segment(postSeg)),
        "terms" -> Seq(Segment(termSeg)),
        "doclen" -> Seq(Segment(dlSeg)),
        "stats" -> Seq(Segment(statSeg)),
        "tombstones" -> Seq.empty))
    }
  }

  /** Incremental ingest for a [[writeBm25Index]] layout — the
    * daily-arrivals posture of [[Ann.appendToIvfIndex]] for the text
    * index: the CORPUS is never re-tokenized; only the batch is.
    *
    *  - `postings`: batch (doc_id, term, tf) rows become a NEW segment
    *    (existing segments untouched — probes pinned mid-append are
    *    unaffected);
    *  - `terms`: document frequencies are ADDITIVE across disjoint doc
    *    sets (callers own id-uniqueness across appends, the same
    *    contract as the IVF append), so the batch's per-term doc counts
    *    land as a new segment and probes sum df across segments —
    *    NOTHING stored is rewritten;
    *  - `doclen`: batch doc lengths land as a new segment;
    *  - `stats`: recomputed over all doclen segments into a new
    *    directory (one narrow columnar scan — n_docs rows of
    *    (id, long)).
    *
    * An appended index answers probes identically to a from-scratch
    * rebuild over corpus ∪ batch up to double-addition order in `avgdl`
    * (scores compare equal at the 1e-9 contract boundary every ranked
    * query already rounds to) — spec-asserted in TextVectorSpec, and
    * driver-visible via q_bm25_append (appended-index probe vs the
    * oracle's full-corpus ad-hoc BM25).
    *
    * CRASH SAFETY: the append publishes atomically via the manifest
    * commit — a crash at any earlier step changes nothing (orphan
    * segments only), so a failed append is SAFE TO RETRY BLINDLY. This
    * replaces the pre-manifest "never retry" contract; streaming
    * callers ([[graft.streaming.IndexStream.bm25AppendBatch]]) still
    * stage per-batch committed markers so a REDELIVERED batch that did
    * commit is skipped, not double-applied — and pass `streamTag`,
    * which rides inside the commit's atomic publication and is checked
    * here UNDER the writer lock, closing the marker protocol's residual
    * window (an attempt that committed but died before its marker). */
  def appendToBm25Index(docs: DataFrame, idCol: String, textCol: String,
                        path: String, streamTag: Option[String] = None): Unit =
    IndexLock.withLock(docs.sparkSession, path, "appendToBm25Index") {
      appendToBm25Locked(docs, idCol, textCol, path, streamTag)
    }

  private def appendToBm25Locked(docs: DataFrame, idCol: String, textCol: String,
                                 path: String,
                                 streamTag: Option[String] = None): Unit = {
    val spark = docs.sparkSession
    // lambda: the manifest-store tag lookup must not run at all on the
    // (common) untagged batch-append path
    if (streamTag.exists(t => IndexManifest.hasCommittedTag(spark, path, t)))
      return
    val snap = IndexManifest.pin(spark, path)
    // cached head-row read — stats is one immutable row per snapshot
    // (r17 item 4): no collect job to re-learn the bucket count
    val nBuckets = snap.headRow(spark, "stats").getAs[Int]("n_buckets")
    // one tokenization pass over the BATCH; materialized once — the
    // postings write, the df segment, and the doclen segment all read it
    val batch = Reliable.checkpoint(
      termRows(docs, idCol, textCol)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("tb", pmod(hash(col("term")), lit(nBuckets))))

    val postSeg = IndexManifest.newSegment("postings")
    val termSeg = IndexManifest.newSegment("terms")
    val dlSeg = IndexManifest.newSegment("doclen")
    val statSeg = IndexManifest.newSegment("stats")
    // three independent writes over the one checkpointed batch —
    // overlap them (guide §2.6); the stats write below waits for the
    // doclen segment it reads
    Par.run(
      () => writeBucketed(batch, s"$path/$postSeg", "tb"),
      () => writeBucketed(
        batch.groupBy(col("term"), col("tb")).agg(count(lit(1)).as("df")),
        s"$path/$termSeg", "tb"),
      () => IndexManifest.writeSingleSegment(
        batch.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")),
        s"$path/$dlSeg"))
    // stats over ALL doclen segments (stored ones + the one just
    // written — read from disk, never from the lazy plan)
    IndexManifest.writeSingleSegment(
      snap.segments("doclen")
        .map(s => IndexManifest.readSegmentDir(spark, s"$path/${s.dir}"))
        .foldLeft(IndexManifest.readSegmentDir(spark, s"$path/$dlSeg"))(_ unionByName _)
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
          lit(nBuckets).as("n_buckets")),
      s"$path/$statSeg", coalesce1 = true)

    IndexManifest.commit(spark, path, Some(snap), snap.components ++ Map(
      "postings" -> (snap.segments("postings") :+ Segment(postSeg)),
      "terms" -> (snap.segments("terms") :+ Segment(termSeg)),
      "doclen" -> (snap.segments("doclen") :+ Segment(dlSeg)),
      "stats" -> Seq(Segment(statSeg))), tag = streamTag)
  }

  /** Logical delete from a [[writeBm25Index]] layout — the
    * right-to-erasure maintenance op for the text index, mirroring
    * [[Ann.deleteFromIvfIndex]]: ids land as a tombstone segment in the
    * next manifest version and the probe path anti-joins the pinned
    * tombstone set, so a deleted document can never be RETURNED again,
    * immediately and O(batch). Corpus statistics (df, n_docs, avgdl)
    * stay STALE until [[purgeBm25Tombstones]] — the Lucene contract
    * (deleted docs leave results at once; doc-freq decay waits for
    * segment merge), stated here rather than silently approximated:
    * scores of the SURVIVING docs are exact again after purge.
    * Deleting ids not in the index is a no-op. */
  def deleteFromBm25Index(ids: DataFrame, path: String): Unit =
    IndexLock.withLock(ids.sparkSession, path, "deleteFromBm25Index") {
      IndexManifest.appendTombstones(ids.sparkSession, path, ids, "doc_id")
    }

  /** Physically apply accumulated tombstones: one (doc_id, tb)
    * columnar scan finds the touched TERM buckets (bounded collect —
    * ≤ nBuckets longs), the kept rows of those buckets land in ONE new
    * postings segment while the old segments merely gain excluded-
    * bucket annotations in the next manifest (bucket-local: no stored
    * file moves), df recomputes for the same buckets from the kept rows
    * (a term in an untouched bucket cannot occur in any deleted doc —
    * that occurrence would have made its bucket touched), doclen
    * consolidates tombstone-free, stats recompute, and the tombstone
    * component empties. After purge, probe scores equal a from-scratch
    * rebuild over the surviving corpus (spec + oracle asserted).
    * Returns the number of postings buckets rewritten.
    *
    * CRASH SAFETY: everything above publishes in ONE atomic manifest
    * commit — a crash at any earlier step changes nothing and the purge
    * is safe to re-run blindly (the pre-manifest per-window recovery
    * code is gone by construction). A purge that deletes the LAST
    * document leaves a serving, appendable EMPTY index (empty segments
    * preserve schemas; stats keep the bucketing fan-out). Superseded
    * segments are reclaimed by [[vacuumBm25Index]]. */
  def purgeBm25Tombstones(spark: SparkSession, path: String): Int =
    IndexLock.withLock(spark, path, "purgeBm25Tombstones") {
      purgeBm25Locked(spark, path)
    }

  private def purgeBm25Locked(spark: SparkSession, path: String): Int = {
    val snap = IndexManifest.pin(spark, path)
    if (snap.segments("tombstones").isEmpty) return 0
    val tomb = Reliable.checkpoint(snap.tombstones(spark, "doc_id").get)
    val postings = snap.read(spark, "postings", Some("tb")).get
    val touched = postings.join(tomb, Seq("doc_id"), "left_semi")
      .select(col("tb")).distinct().collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) return clearTombstonesOnly(spark, path, snap)

    val postSeg = IndexManifest.newSegment("postings")
    val termSeg = IndexManifest.newSegment("terms")
    val dlSeg = IndexManifest.newSegment("doclen")
    val statSeg = IndexManifest.newSegment("stats")
    val kept = Reliable.checkpoint(
      postings.filter(col("tb").isin(touched: _*))
        .join(tomb, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("term"), col("tf"), col("tb")))
    // doclen consolidates into one tombstone-free segment (narrow
    // (id, long) rows — reliable-checkpointed to disk, not memory, so a
    // billion-doc index still purges)
    val dlKept = Reliable.checkpoint(
      snap.read(spark, "doclen").get.join(tomb, Seq("doc_id"), "left_anti"))
    // postings / df / doclen writes are independent given the two
    // checkpointed inputs — overlap them (guide §2.6); df comes from
    // the KEPT rows of the touched buckets; untouched buckets' df
    // segments stay valid (their terms occur in no deleted doc)
    Par.run(
      () => writeBucketed(kept, s"$path/$postSeg", "tb"),
      () => writeBucketed(
        kept.groupBy(col("term"), col("tb")).agg(count(lit(1)).as("df")),
        s"$path/$termSeg", "tb"),
      () => IndexManifest.writeSingleSegment(dlKept, s"$path/$dlSeg"))
    // cached head-row read — stats is one immutable row per snapshot
    // (r17 item 4): no collect job to re-learn the bucket count
    val nBuckets = snap.headRow(spark, "stats").getAs[Int]("n_buckets")
    IndexManifest.writeSingleSegment(
      IndexManifest.readSegmentDir(spark, s"$path/$dlSeg")
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
          lit(nBuckets).as("n_buckets")),
      s"$path/$statSeg", coalesce1 = true)

    val touchedSet = touched.toSet
    // annotate old segments with the rewritten buckets; fully-excluded
    // segments drop so vacuum can reclaim them (shared erasure seam)
    def excluded(name: String): Seq[Segment] =
      IndexManifest.excludeTouched(spark, path, snap, name, "tb", touchedSet)
    IndexManifest.commit(spark, path, Some(snap), Map(
      "postings" -> (excluded("postings") :+ Segment(postSeg)),
      "terms" -> (excluded("terms") :+ Segment(termSeg)),
      "doclen" -> Seq(Segment(dlSeg)),
      "stats" -> Seq(Segment(statSeg)),
      "tombstones" -> Seq.empty))
    touched.length
  }

  /** Tombstoned ids were never indexed: the purge is a manifest-only
    * commit emptying the tombstone component. */
  private def clearTombstonesOnly(spark: SparkSession, path: String,
                                  snap: IndexManifest.Snapshot): Int = {
    IndexManifest.commit(spark, path, Some(snap),
      snap.components ++ Map("tombstones" -> Seq.empty[Segment]))
    0
  }

  /** Consolidate the accumulated append segments into one segment per
    * component (postings/terms/doclen) — the segment-merge half of the
    * Lucene lifecycle: probes fan in over every segment, so a layout
    * absorbing many appends should compact on a maintenance cadence.
    * Reads the INDEX, never the corpus text (cheaper than a rebuild);
    * logical state — pending tombstones included — is preserved
    * verbatim. Returns the number of segments consolidated away. */
  def compactBm25Index(spark: SparkSession, path: String): Int =
    IndexLock.withLock(spark, path, "compactBm25Index") {
      compactBm25Locked(spark, path)
    }

  private def compactBm25Locked(spark: SparkSession, path: String): Int = {
    val snap = IndexManifest.pin(spark, path)
    val nData = Seq("postings", "terms", "doclen").map(snap.segments(_).size).sum
    if (nData <= 3) return 0 // already one segment per component
    val postSeg = IndexManifest.newSegment("postings")
    val termSeg = IndexManifest.newSegment("terms")
    val dlSeg = IndexManifest.newSegment("doclen")
    // the three component consolidations read disjoint stored segments
    // and write disjoint directories — overlap them (guide §2.6). df
    // segments are additive by contract — the consolidated segment
    // carries the summed counts.
    Par.run(
      () => writeBucketed(snap.read(spark, "postings", Some("tb")).get
          .select(col("doc_id"), col("term"), col("tf"), col("tb")),
        s"$path/$postSeg", "tb"),
      () => writeBucketed(snap.read(spark, "terms", Some("tb")).get
          .groupBy(col("term"), col("tb")).agg(sum(col("df")).as("df")),
        s"$path/$termSeg", "tb"),
      () => IndexManifest.writeSingleSegment(
        snap.read(spark, "doclen").get, s"$path/$dlSeg"))
    IndexManifest.commit(spark, path, Some(snap), snap.components ++ Map(
      "postings" -> Seq(Segment(postSeg)),
      "terms" -> Seq(Segment(termSeg)),
      "doclen" -> Seq(Segment(dlSeg))))
    nData - 3
  }

  /** Reclaim segments superseded by rebuilds/appends/purges/compacts
    * plus old manifest versions ([[IndexManifest.vacuum]]).
    * `keepVersions` retains the newest K snapshots intact (time-travel
    * and in-flight probes within the window survive). Holds the writer
    * lock; callers own the reader-grace contract for probes pinned
    * older than the retention window. */
  def vacuumBm25Index(spark: SparkSession, path: String,
                      keepVersions: Int = 1): Seq[String] =
    IndexLock.withLock(spark, path, "vacuumBm25Index") {
      IndexManifest.vacuum(spark, path, keepVersions)
    }

  /** Observability for a [[writeBm25Index]] layout: the manifest's
    * per-component segment/exclusion counts plus the layout scalars
    * (n_docs, n_buckets repeated per row — the one-frame report
    * convention of calibrationReport). Pure metadata plus one
    * single-row stats read; the maintenance-cadence dashboard —
    * n_segments growing past the probe fan-in you want is the signal
    * to [[compactBm25Index]], exclusions accumulating the signal to
    * [[vacuumBm25Index]]. */
  def describeBm25Index(spark: SparkSession, path: String): DataFrame = {
    val snap = IndexManifest.pin(spark, path)
    val stats = snap.readSingle(spark, "stats")
      .select(col("n_docs"), col("n_buckets"))
    IndexManifest.describe(spark, path).crossJoin(broadcast(stats))
  }

  /** BM25-score `qTerms` against the stored index: returns
    * (doc_id, matched_terms, matched_tf, score) for every doc matching
    * at least one term — identical numbers to the ad-hoc computation on
    * the same corpus (spec + oracle-asserted). PINS the current
    * manifest: everything the probe reads comes from that snapshot, so
    * a concurrent maintenance op can never mix states mid-probe. The
    * probed term buckets are collected to the driver (≤ |qTerms| longs
    * — bounded-scalar posture) and pushed as a literal partition
    * filter into every postings segment. */
  def probeBm25Index(spark: SparkSession, path: String, qTerms0: Seq[String],
                     k1: Double = 1.2, b: Double = 0.75,
                     maxTombstoneRows: Int = Guard.DefaultMaxBroadcastRows,
                     asOfVersion: Option[Long] = None): DataFrame = {
    require(qTerms0.nonEmpty, "empty query")
    // the index stores tokens of LOWERCASED text — an unnormalized
    // query term with an uppercase letter would silently match zero
    // docs (and probe the wrong partition bucket); normalize here so
    // build and probe share one tokenizer contract
    val qTerms = qTerms0.map(_.toLowerCase)
    import spark.implicits._
    // asOfVersion: TIME-TRAVEL — score against an earlier committed
    // snapshot (valid until vacuumed): the reproducibility primitive
    // the manifest layout gives for free (re-run yesterday's eval
    // against yesterday's index, byte-identical)
    val snap = IndexManifest.pin(spark, path, asOfVersion)
    // one cached head-row read (stats is one immutable row per
    // snapshot, r17 item 4): the collect job per probe goes away, and
    // n_docs/avgdl enter the plan as literals instead of a broadcast
    // crossJoin of a 1-row frame — same values, one less tiny exchange
    val stats = snap.headRow(spark, "stats")
    val nBuckets = stats.getAs[Int]("n_buckets")
    // same hash function the build used — Spark's own Murmur3Hash
    // expression (what hash() plans to, seed 42), EVALUATED EAGERLY on
    // the driver over the ≤ |qTerms| literals instead of through a
    // toDF→distinct→collect round trip (r17: that was 2 Spark jobs per
    // probe for a handful of scalars; interpreted eval of the identical
    // expression is exact by construction, not a reimplementation)
    val tbs = qTerms.map { t =>
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
          t, org.apache.spark.sql.types.StringType)), 42)
        .eval(null).asInstanceOf[Int].toLong
      ((h % nBuckets) + nBuckets) % nBuckets
    }.distinct.sorted
    def pruned(name: String) = snap.read(spark, name, Some("tb")).map(
      _.filter(col("tb").isin(tbs: _*) && col("term").isin(qTerms: _*)))
    // tombstoned docs must never be RETURNED (the deleteFromBm25Index
    // contract — df/n_docs/avgdl stay stale until purge, Lucene-style);
    // the broadcastSmall rail turns an over-accumulated delete set into
    // a named failure pointing at the purge, not a driver OOM
    val tombAnti: DataFrame => DataFrame =
      snap.tombstones(spark, "doc_id") match {
        case Some(t) =>
          val tomb = broadcast(Guard.broadcastSmall(t,
            s"BM25 tombstone set at $path (run purgeBm25Tombstones " +
              "to compact accumulated deletes)",
            maxTombstoneRows))
          df => df.join(tomb, Seq("doc_id"), "left_anti")
        case None => identity
      }
    val postings = tombAnti(pruned("postings").get
      .select(col("doc_id"), col("term"), col("tf")))
    // df is additive across doc-disjoint segments — sum at the seam
    // (≤ |qTerms| · nSegments rows reach this aggregate)
    val termDf = pruned("terms").get
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val dl = snap.read(spark, "doclen").get
    val scored = postings
      .join(broadcast(termDf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("n_docs", lit(stats.getAs[Long]("n_docs")))
      .withColumn("avgdl", lit(stats.getAs[Double]("avgdl")))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("part",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("term"), col("part"))).as("parts"),
        count(lit(1)).as("matched_terms"), sum(col("tf")).as("matched_tf"))
      // fixed-order fold: sort parts by term, then left-fold the sum —
      // bit-identical to summing per-term slots in alphabetical order
      .withColumn("score",
        aggregate(array_sort(col("parts")), lit(0.0),
          (acc, x) => acc + x.getField("part")))
    scored.select(col("doc_id"), col("matched_terms"), col("matched_tf"),
      col("score"))
  }

  /** Ad-hoc BM25 scoring (no persisted index): tokenize `docs` and
    * score `qTerms` with the exact formula/fold of [[probeBm25Index]].
    * One tokenization pass over the corpus; use the persisted index
    * when the same corpus serves many query batches. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 qTerms0: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(qTerms0.nonEmpty, "empty query")
    val qTerms = qTerms0.map(_.toLowerCase) // the probeBm25Index contract
    val t = termRows(docs, idCol, textCol)
    val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = t.filter(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("part",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("term"), col("part"))).as("parts"),
        count(lit(1)).as("matched_terms"), sum(col("tf")).as("matched_tf"))
      .withColumn("score",
        aggregate(array_sort(col("parts")), lit(0.0),
          (acc, x) => acc + x.getField("part")))
      .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
        col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * combine heterogeneous retrieval lists (sparse BM25 + dense ANN,
    * multiple probes, prior rankings) without score calibration:
    *
    *   rrf(doc) = Σ over lists containing doc of 1 / (kRrf + rank)
    *
    * Each input frame carries (`idCol`, `rank`), rank 1-based. A doc
    * missing from a list simply contributes nothing (the full-outer
    * semantics retrieval fusion wants). A doc appearing MORE THAN ONCE
    * within one frame (easy to introduce via a bad upstream join)
    * counts once — its best (lowest) rank wins, enforced by a per-list
    * dedup before the union, so `n_lists` counts LISTS, never
    * duplicate rows, and a duplicated row cannot double its
    * contribution. Contributions are folded in
    * FIXED list order (each input tagged with its position, parts
    * sorted before summing), so the double arithmetic is
    * associativity-deterministic across engines — the same contract as
    * the BM25 fold; the result is rounded to 1e-9. Scale: each list is
    * already a top-k frame (tiny); the fusion is a union + one
    * word-sized groupBy — nothing touches the corpus. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings.zipWithIndex
      .map { case (df, i) =>
        // per-(list, id) dedup: best rank wins — a list is a set of
        // docs, and the groupBy is top-k-frame-sized
        df.groupBy(col(idCol)).agg(min(col("rank")).as("__rank"))
          .select(col(idCol), lit(i).as("__src"),
            (lit(1.0) / (lit(kRrf.toDouble) + col("__rank"))).as("__contrib")) }
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"),
        round(aggregate(
            array_sort(collect_list(struct(col("__src"), col("__contrib")))),
            lit(0.0), (acc, x) => acc + x.getField("__contrib")), 9)
          .as("rrf_score"))
  }
}
