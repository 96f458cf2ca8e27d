package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index for BM25 ranked retrieval — the
  * lexical twin of the persisted ANN layouts ([[Ann.writeIvfIndex]])
  * and the MinHash band index ([[Dedup.bandIndex]]): tokenize and
  * aggregate the corpus ONCE at build time, then serve any number of
  * query batches from the stored layout without touching the raw text
  * again. At 100 TB the corpus tokenization dominates everything; this
  * amortizes it to once per corpus version.
  *
  * Layout under `path`:
  *  - `postings/` — (term, doc_id, tf), PARTITIONED BY `tb` =
  *    pmod(hash(term), nBuckets): a probe for a handful of query terms
  *    reads only their buckets (literal partition filter, pruned at
  *    planning time — the same pruned-probe shape as
  *    [[Ann.probeIvfIndex]]), with the `term IN (…)` predicate pushed
  *    into the parquet scan within each bucket;
  *  - `terms/` — (term, df) document frequencies, same tb partitioning;
  *  - `doclen/` — (doc_id, dl) document lengths;
  *  - `stats/` — one row (n_docs, avgdl, n_buckets): the corpus scalars
  *    plus the bucketing fan-out the probe must reuse.
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

  /** Build and persist the index. One tokenization pass; the df table
    * derives from the WRITTEN postings (read back from disk), so the
    * corpus text is scanned exactly once. */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0)
    val spark = docs.sparkSession
    // the full rebuild is the documented crash-remediation path: a
    // stale lock left by a crashed op must not block it
    IndexLock.clearStale(spark, path)
    IndexLock.withLock(spark, path, "writeBm25Index") {
      writeBm25Locked(docs, idCol, textCol, path, nBuckets)
    }
  }

  private def writeBm25Locked(docs: DataFrame, idCol: String, textCol: String,
                              path: String, nBuckets: Int): Unit = {
    val spark = docs.sparkSession
    val t = termRows(docs, idCol, textCol)
    // one shuffle on (doc_id, term); doc lengths ride the same pass
    val postings = t.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("term")), lit(nBuckets)))
    postings.repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")

    val written = spark.read.parquet(s"$path/postings")
    written.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("tb", pmod(hash(col("term")), lit(nBuckets)))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/terms")
    val dl = written.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    dl.write.mode("overwrite").parquet(s"$path/doclen")
    dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
        lit(nBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Incremental ingest for a [[writeBm25Index]] layout — the
    * daily-arrivals posture of [[Ann.appendToIvfIndex]] for the text
    * index: the CORPUS is never re-tokenized; only the batch is.
    *
    *  - `postings/`: batch (doc_id, term, tf) rows APPEND as new files
    *    into their term-hash buckets — existing files untouched;
    *  - `terms/`: document frequencies are ADDITIVE across disjoint doc
    *    sets (callers own id-uniqueness across appends, the same
    *    contract as the IVF append), so the batch's per-term doc counts
    *    merge into the stored df table with one sum; only the buckets
    *    the batch touches are rewritten (dynamic partition overwrite —
    *    term frames are vocab-bounded, tiny next to postings);
    *  - `doclen/`: batch doc lengths append;
    *  - `stats/`: recomputed from the post-append doclen table (one
    *    narrow columnar scan — n_docs rows of (id, long)).
    *
    * An appended index answers probes identically to a from-scratch
    * rebuild over corpus ∪ batch up to double-addition order in `avgdl`
    * (scores compare equal at the 1e-9 contract boundary every ranked
    * query already rounds to) — spec-asserted in TextVectorSpec, and
    * driver-visible via q_bm25_append (appended-index probe vs the
    * oracle's full-corpus ad-hoc BM25).
    *
    * ATOMICITY CONTRACT (same class as the [[MergeSink]] parquet
    * caveat): the append is a multi-step metadata update — postings
    * append, then terms/doclen rewrites, then the stats overwrite —
    * with no cross-directory transaction. A crash mid-append leaves
    * df/stats inconsistent with postings, and a BLIND RETRY
    * DOUBLE-APPENDS the batch's postings and doclen rows (tf/df
    * double-count). Do not retry a failed append: rebuild via
    * [[writeBm25Index]], or restore the index directory from the
    * pre-append snapshot. Streaming callers get this detection for
    * free — [[graft.streaming.IndexStream.bm25AppendBatch]] stages
    * per-batch started/committed markers, so a replay of a partial
    * append fails loudly instead of double-counting. */
  def appendToBm25Index(docs: DataFrame, idCol: String, textCol: String,
                        path: String): Unit =
    IndexLock.withLock(docs.sparkSession, path, "appendToBm25Index") {
      appendToBm25Locked(docs, idCol, textCol, path)
    }

  private def appendToBm25Locked(docs: DataFrame, idCol: String, textCol: String,
                                 path: String): Unit = {
    val spark = docs.sparkSession
    val nBuckets = spark.read.parquet(s"$path/stats")
      .select(col("n_buckets")).first().getInt(0)
    // one tokenization pass over the BATCH; materialized once — the
    // postings write, the df merge, and the doclen append all read it
    val batch = Reliable.checkpoint(
      termRows(docs, idCol, textCol)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("tb", pmod(hash(col("term")), lit(nBuckets))))
    batch.repartition(col("tb"))
      .write.mode("append").partitionBy("tb").parquet(s"$path/postings")

    // df merge: old + batch counts, only the touched buckets rewritten.
    // Touched bucket ids collect to the driver (<= nBuckets ints — the
    // bounded-scalar posture) and push as a LITERAL partition filter on
    // the stored terms table, so the merge reads only those buckets.
    val batchDf = batch.groupBy(col("term"), col("tb"))
      .agg(count(lit(1)).as("df"))
    val touched = batchDf.select(col("tb")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val merged = spark.read.parquet(s"$path/terms")
      .filter(col("tb").isin(touched: _*))
      .select(col("term"), col("df"), col("tb"))
      .unionByName(batchDf.select(col("term"), col("df"), col("tb")))
      .groupBy(col("term"), col("tb")).agg(sum(col("df")).as("df"))
      .transform(Reliable.checkpoint) // materialize BEFORE overwriting its input
    Scale.withDynamicOverwrite(spark) {
      merged.select(col("term"), col("df"), col("tb"))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/terms")
    }

    batch.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .write.mode("append").parquet(s"$path/doclen")
    // stats recompute reads doclen/ and overwrites stats/ — disjoint
    // dirs, so no pre-materialization is needed (and doclen is
    // corpus-sized: never checkpoint it)
    spark.read.parquet(s"$path/doclen")
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
        lit(nBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Logical delete from a [[writeBm25Index]] layout — the
    * right-to-erasure maintenance op for the text index, mirroring
    * [[Ann.deleteFromIvfIndex]]: ids append to a tombstone table and
    * the probe path anti-joins them, so a deleted document can never
    * be RETURNED again, immediately and O(batch). Corpus statistics
    * (df, n_docs, avgdl) stay STALE until [[purgeBm25Tombstones]] —
    * the Lucene contract (deleted docs leave results at once; doc-freq
    * decay waits for segment merge), stated here rather than silently
    * approximated: scores of the SURVIVING docs are exact again after
    * purge. Deleting ids not in the index is a no-op. Holds the layout
    * lock: a delete racing a purge would append its ids between the
    * purge's tombstone read and its clear — and be silently LOST. */
  def deleteFromBm25Index(ids: DataFrame, path: String): Unit =
    IndexLock.withLock(ids.sparkSession, path, "deleteFromBm25Index") {
      Tombstones.append(ids, "doc_id", path)
    }

  /** Physically apply accumulated tombstones: one (doc_id, tb)
    * columnar scan finds the touched TERM buckets (bounded collect —
    * ≤ nBuckets ints), ONLY those postings buckets rewrite with the
    * tombstoned rows dropped, df recomputes for the same buckets from
    * the kept rows (a term in an untouched bucket cannot occur in any
    * deleted doc — that occurrence would have made its bucket
    * touched), doclen rewrites tombstone-free, stats recompute, and
    * the tombstone table resets. After purge, probe scores equal a
    * from-scratch rebuild over the surviving corpus (spec + oracle
    * asserted). Returns the number of postings buckets rewritten.
    *
    * ATOMICITY: same multi-step contract as [[appendToBm25Index]] — a
    * crash mid-purge leaves the directories inconsistent; re-running
    * the purge is SAFE here: every crash window is detected and
    * recovered on the re-run (spec-pinned per window) —
    *  - postings rewritten, terms/doclen/stats stale → tombstones no
    *    longer match postings but still match doclen: terms recompute
    *    from the FULL current postings (the crashed run's touched-bucket
    *    list is gone, so no subset can be trusted), doclen and stats
    *    recover;
    *  - doclen rewritten, stats stale → nothing matches anywhere, but
    *    the stored n_docs disagrees with the doclen row count: stats
    *    recompute;
    *  - all partitions dropped, layout removal missed → postings root
    *    holds no tb= dirs: the layout removal completes.
    * Interleaving with a concurrent append/delete is refused loudly
    * ([[IndexLock]]). A purge that deletes the LAST document removes
    * the index layout entirely (an empty partitioned parquet table
    * cannot exist on disk); rebuild with [[writeBm25Index]]. */
  def purgeBm25Tombstones(spark: SparkSession, path: String): Int =
    IndexLock.withLock(spark, path, "purgeBm25Tombstones") {
      purgeBm25Locked(spark, path)
    }

  private def purgeBm25Locked(spark: SparkSession, path: String): Int = {
    if (!Tombstones.exists(spark, path)) return 0
    // crash window: every partition dropped but the layout removal
    // missed — a postings root with no tb= dirs is unreadable (schema
    // inference has no files); complete the removal instead of crashing
    if (!hasPartitionDirs(spark, s"$path/postings")) {
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(path), true)
      return 0
    }
    val tomb = Reliable.checkpoint(Tombstones.read(spark, path, "doc_id"))
    val touched = spark.read.parquet(s"$path/postings")
      .join(tomb, Seq("doc_id"), "left_semi")
      .select(col("tb").cast("int")).distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) {
      // no tombstoned id has postings — a genuine no-op (ids never
      // indexed) or the RE-RUN of a purge that crashed after the
      // postings rewrite (terms/doclen/stats in unknown state).
      val doclenDirty = spark.read.parquet(s"$path/doclen")
        .join(tomb, Seq("doc_id"), "left_semi").limit(1).count() > 0
      if (!doclenDirty) {
        // doclen clean ⟹ the crashed run (if any) got past the doclen
        // rewrite, so only stats/ can still be stale — detectable as a
        // stored n_docs that disagrees with the doclen row count
        // (purge only ever REMOVES doclen rows). Recompute exactly
        // when they disagree, so a genuine no-op stays byte-identical.
        val nDocsStored = spark.read.parquet(s"$path/stats")
          .select(col("n_docs")).first().getLong(0)
        val nDocsNow = spark.read.parquet(s"$path/doclen").count()
        if (nDocsStored != nDocsNow) recomputeStats(spark, path)
        Tombstones.clear(spark, path)
        return 0
      }
      // CRASH RECOVERY (postings rewritten, the rest stale): the
      // crashed run's touched-bucket list is unrecoverable, so terms/
      // recomputes from the FULL current postings — one scan; terms is
      // vocab-bounded, tiny next to postings — with a FULL (non-
      // dynamic) overwrite, which also clears any orphaned
      // fully-tombstoned bucket dirs the crashed run left in terms/.
      val allKept = Reliable.checkpoint(
        spark.read.parquet(s"$path/postings")
          .select(col("doc_id"), col("term"), col("tf"), col("tb")))
      allKept.groupBy(col("term"), col("tb")).agg(count(lit(1)).as("df"))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/terms")
      val dlRecovered = Reliable.checkpoint(
        spark.read.parquet(s"$path/doclen")
          .join(tomb, Seq("doc_id"), "left_anti"))
      dlRecovered.write.mode("overwrite").parquet(s"$path/doclen")
      recomputeStats(spark, path)
      Tombstones.clear(spark, path)
      return 0
    }
    val kept = Reliable.checkpoint(
      spark.read.parquet(s"$path/postings")
        .filter(col("tb").isin(touched: _*))
        .join(tomb, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("term"), col("tf"), col("tb")))
    Scale.withDynamicOverwrite(spark) {
      kept.repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
    }
    // df from the KEPT rows (already materialized — never re-read the
    // directory the overwrite above just rewrote)
    val mergedTerms = Reliable.checkpoint(
      kept.groupBy(col("term"), col("tb")).agg(count(lit(1)).as("df")))
    Scale.withDynamicOverwrite(spark) {
      mergedTerms.select(col("term"), col("df"), col("tb"))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/terms")
    }
    // a FULLY-tombstoned bucket has no kept rows, so the dynamic
    // overwrite above never replaces its directory — drop those
    // explicitly in BOTH layouts, or the deleted docs' rows would
    // outlive the tombstone table (the purgeIvfTombstones precedent;
    // right-to-erasure violated silently otherwise)
    val keptTbs = kept.select(col("tb").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    val emptied = touched.filterNot(keptTbs).map(tb => s"tb=$tb")
    Tombstones.dropPartitionDirs(spark, s"$path/postings", emptied)
    Tombstones.dropPartitionDirs(spark, s"$path/terms", emptied)
    // a purge that erased the LAST partition would leave a parquet dir
    // with no data files — unreadable by schema inference and
    // un-appendable (an empty PARTITIONED table cannot be represented
    // on disk). An all-deleted index is indistinguishable from one
    // never built, so the layout itself is removed; rebuild with
    // [[writeBm25Index]] when documents arrive again. Checked on the
    // filesystem, not via keptTbs: untouched buckets may still hold
    // surviving docs.
    if (!hasPartitionDirs(spark, s"$path/postings")) {
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(path), true)
      return touched.length
    }
    // doclen: materialize the survivors before overwriting their source
    // dir (narrow (id, long) rows — reliable-checkpointed to disk, not
    // memory, so a billion-doc index still purges)
    val dlKept = Reliable.checkpoint(
      spark.read.parquet(s"$path/doclen").join(tomb, Seq("doc_id"), "left_anti"))
    dlKept.write.mode("overwrite").parquet(s"$path/doclen")
    recomputeStats(spark, path)
    Tombstones.clear(spark, path)
    touched.length
  }

  /** True iff the partitioned parquet root at `tablePath` holds at
    * least one `tb=` partition directory (an empty partitioned table
    * cannot be represented on disk — see the purge contract). */
  private def hasPartitionDirs(spark: SparkSession, tablePath: String): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(dir) && fs.listStatus(dir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("tb="))
  }

  /** Recompute `stats/` from the current `doclen/` (one narrow columnar
    * scan), preserving the stored bucketing fan-out. */
  private def recomputeStats(spark: SparkSession, path: String): Unit = {
    val nBuckets = spark.read.parquet(s"$path/stats")
      .select(col("n_buckets")).first().getInt(0)
    spark.read.parquet(s"$path/doclen")
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
        lit(nBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25-score `qTerms` against the stored index: returns
    * (doc_id, matched_terms, matched_tf, score) for every doc matching
    * at least one term — identical numbers to the ad-hoc computation on
    * the same corpus (spec + oracle-asserted). The probed term buckets
    * are collected to the driver (≤ |qTerms| ints — bounded-scalar
    * posture) and pushed as a literal partition filter. */
  def probeBm25Index(spark: SparkSession, path: String, qTerms0: Seq[String],
                     k1: Double = 1.2, b: Double = 0.75,
                     maxTombstoneRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    require(qTerms0.nonEmpty, "empty query")
    // the index stores tokens of LOWERCASED text — an unnormalized
    // query term with an uppercase letter would silently match zero
    // docs (and probe the wrong partition bucket); normalize here so
    // build and probe share one tokenizer contract
    val qTerms = qTerms0.map(_.toLowerCase)
    import spark.implicits._
    val stats = spark.read.parquet(s"$path/stats")
    val nBuckets = stats.select(col("n_buckets")).first().getInt(0)
    // same hash function the build used — evaluated through Spark, not
    // reimplemented on the driver
    val tbs = qTerms.toDF("term")
      .select(pmod(hash(col("term")), lit(nBuckets)).as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    def pruned(sub: String) = spark.read.parquet(s"$path/$sub")
      .filter(col("tb").isin(tbs: _*) && col("term").isin(qTerms: _*))
    // tombstoned docs must never be RETURNED (the deleteFromBm25Index
    // contract — df/n_docs/avgdl stay stale until purge, Lucene-style);
    // the broadcastSmall rail turns an over-accumulated delete set into
    // a named failure pointing at the purge, not a driver OOM
    val tombAnti: DataFrame => DataFrame =
      if (Tombstones.exists(spark, path)) {
        val tomb = broadcast(Guard.broadcastSmall(
          Tombstones.read(spark, path, "doc_id"),
          s"BM25 tombstone set at $path/tombstones (run purgeBm25Tombstones " +
            "to compact accumulated deletes)",
          maxTombstoneRows))
        df => df.join(tomb, Seq("doc_id"), "left_anti")
      } else identity
    val postings = tombAnti(
      pruned("postings").select(col("doc_id"), col("term"), col("tf")))
    val termDf = pruned("terms").select(col("term"), col("df"))
    val dl = spark.read.parquet(s"$path/doclen")
    val scored = postings
      .join(broadcast(termDf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats.select(col("n_docs"), col("avgdl"))))
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
