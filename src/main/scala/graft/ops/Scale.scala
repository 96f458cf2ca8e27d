package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics (SURVEY §7.6): skew-salted joins and the
  * storage-layout writers that make 100 TB partition pruning and
  * co-located reads possible. AQE's skew-join split handles most skew
  * automatically; explicit salting remains the tool for the pathological
  * single-hot-key case (e.g. one token address carrying half the facts)
  * and for deterministic layout control.
  */
object Scale {

  /** Input-split rail for per-row-kernel-heavy scans (guide §2.5
    * "input skew: one huge unsplittable file … repartition immediately
    * after the read"), made SCALE-ADAPTIVE (r16 optimization round):
    * hash-repartition `df` by `key` ONLY when the source yields fewer
    * input files than the context's parallelism — the oversized-split
    * case where downstream fused kernels (MinHash signing, tokenize +
    * aggregate, vector distance) would otherwise run in a handful of
    * tasks regardless of cores. On a production corpus that already
    * supplies ≥ cores splits this is a NO-OP — no exchange enters the
    * plan — so the rail can never become a full-corpus shuffle tax at
    * 100 TB (the flaw of an unconditional repartition). The key must be
    * a deterministic column (task-retry safe, unlike round-robin
    * `repartition(n)` — SPARK-38388 class). `inputFiles` is driver
    * metadata from the already-cached file index; no job runs.
    *
    * The partition count is PINNED (an unpinned `repartition(key)` is
    * subject to AQE partition coalescing, which sizes by BYTES — a
    * kernel-bound 600 KB input coalesces straight back to one
    * partition and the rail does nothing; measured: the signing stage
    * stayed single-task until the count was pinned) but SIZE-AWARE
    * (r17, VERDICT r16 item 2): `min(defaultParallelism,
    * ceil(inputBytes / targetSplitBytes))`. The r16 pin to
    * `defaultParallelism` outright put 32 partitions of a 600 KB
    * fixture into ITERATIVE chains (signing → banding →
    * label-propagation rounds), multiplying tiny-task count per round
    * exactly where per-task overhead dominates — the driver host
    * measured q_dedup_keep 10.2 s at 32 threads vs 1.8 s at 8 (the
    * suite-wide 32-vs-8 inversion's deepest touched outlier). Scaling
    * the count with input bytes keeps the spread (multi-task kernel
    * stages at every SF) without the fixed full-parallelism task tax.
    * `targetSplitBytes` is deliberately far below a production scan
    * split (128 KiB vs 128 MiB): it prices KERNEL-bound rows, and only
    * oversized-split sources (gate above) ever reach it. Tunable via
    * `spark.graft.spreadSplits.targetBytes` for cluster postures;
    * the production story stays the no-op gate, not the constant. */
  def spreadSplits(df: DataFrame, key: Column): DataFrame = {
    val sess = df.sparkSession
    val parallelism = sess.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length >= parallelism) return df
    val target = sess.conf.get("spark.graft.spreadSplits.targetBytes",
      (128L * 1024).toString).toLong
    require(target > 0, s"spark.graft.spreadSplits.targetBytes must be > 0")
    // driver-side metadata listing of < parallelism files — no job runs
    val hconf = sess.sessionState.newHadoopConf()
    val bytes = files.map { f =>
      val p = new HPath(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val n = math.min(parallelism.toLong,
      math.max(1L, (bytes + target - 1) / target)).toInt
    // already at least as many splits as the size-derived count (or a
    // tiny input not worth one exchange): the rail is a no-op
    if (n <= files.length) df
    else df.repartition(n, key)
  }

  /** [[spreadSplits]] for MULTI-SUBTREE consumers (r17): a lazily
    * railed scan re-pays the pinned exchange once per subtree (the
    * r16 finding that got the rail REVERTED from the curation
    * queries), while the unrailed alternative leaves every downstream
    * kernel pass on the source's single split (AQE coalesces an
    * unpinned repartition of a sub-MB input straight back to one
    * partition — it sizes by bytes and cannot see kernel cost). This
    * pays the exchange ONCE into a materialized multi-partition copy;
    * every subtree then reads it in parallel with no further
    * exchange. Gated exactly like the rail: when spreadSplits no-ops
    * (production corpora supply ≥ cores splits), NOTHING is
    * materialized — the checkpoint can never become a corpus-sized
    * write tax at scale. */
  def spreadSplitsOnce(df: DataFrame, key: Column): DataFrame = {
    val spread = spreadSplits(df, key)
    if (spread eq df) df else Reliable.checkpoint(spread)
  }

  /** Skew-salted equi-join: the skewed (large, hot-keyed) side gets a
    * deterministic salt derived from `saltSource` (any stable column —
    * an id, a hash of the row key); the small-but-not-broadcastable
    * side is replicated once per salt. One shuffle each on
    * (keys, salt) — hot keys spread over `nSalts` reducers.
    *
    * Semantics identical to `skewed.join(other, keys, "inner")`
    * (property-tested). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 nSalts: Int, saltSource: Column): DataFrame = {
    require(nSalts > 0)
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "column name __salt is reserved by saltedJoin")
    val salted = skewed.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Shuffle-key skew diagnosis — the measurement that decides whether
    * [[saltedJoin]] (or AQE skew handling) is needed BEFORE a 100 TB
    * join runs: the heaviest `topK` key tuples with their row counts
    * plus the global shape (total rows, distinct keys, skew_factor =
    * heaviest key / mean rows-per-key). One map-side-combined groupBy
    * on the keys; the summary is a scalar fold over the key counts.
    * Rank ties break on the key rendering (deterministic output). Null
    * key components participate — null-heavy keys are the most common
    * real-world skew. */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame = {
    require(keys.nonEmpty, "skewReport needs at least one key column")
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("key_rows"))
    // render null components EXPLICITLY: concat_ws skips nulls, which
    // would make ("a", null) and ("a", "") indistinguishable — and the
    // null-heavy key this report exists to expose would render as ""
    val keyStr = concat_ws("|",
      keys.map(k => coalesce(col(k).cast("string"), lit("<null>"))): _*)
    val summary = counts.agg(
      sum(col("key_rows")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("key_rows")).as("max_key_rows"))
    // orderBy+limit plans as TakeOrderedAndProject — per-partition
    // top-k merged on the driver, never a global window sort over the
    // (possibly billions of) key counts
    val top = counts.withColumn("key", keyStr)
      .orderBy(col("key_rows").desc, col("key"))
      .limit(topK)
    import org.apache.spark.sql.expressions.Window
    top // rank assignment runs on <= topK rows — the window is bounded
      .withColumn("rank", row_number().over(
        Window.orderBy(col("key_rows").desc, col("key"))))
      .select(col("rank"), col("key"), col("key_rows"))
      .crossJoin(broadcast(summary)) // 1-row shape frame
      .withColumn("skew_factor",
        round(col("max_key_rows") / (col("n_rows") / col("n_keys")), 4))
  }

  /** Log2-bucketed size distribution of pair-generating groups (LSH
    * buckets, linkage blocks, SemDeDup clusters) — the instrumentation
    * that exposes the Σ|group|² failure axis BEFORE a quadratic stage
    * runs at scale: total work tracks the block-size DISTRIBUTION, not
    * corpus size, so this report is what to watch as data grows. One
    * row per ⌊log2(size)⌋ bucket: (size_bucket, n_groups, max_size,
    * total_rows, total_pairs) with total_pairs = Σ size·(size−1)/2 —
    * the exact comparison count those groups will generate.
    *
    * Input is the GROUP-sized counts frame (one row per group), so the
    * report costs one map-side-combined aggregate over group counts,
    * never a data-row scan. The bucket is computed in INTEGER
    * arithmetic (bit length − 1) — a floating log2 rounds differently
    * across engines exactly at the power-of-2 boundaries. */
  def sizeDistribution(counts: DataFrame, sizeCol: String): DataFrame =
    counts
      .groupBy((length(bin(col(sizeCol))) - 1).cast("int").as("size_bucket"))
      .agg(count(lit(1)).as("n_groups"),
        max(col(sizeCol)).cast("long").as("max_size"),
        sum(col(sizeCol)).cast("long").as("total_rows"),
        // per-group integer `div` BEFORE the sum — n·(n−1) is always
        // even, and a post-sum double division would lose exactness
        // past 2^53 total pairs
        sum(expr(s"cast($sizeCol as bigint) * (cast($sizeCol as bigint) - 1) div 2"))
          .cast("long").as("total_pairs"))
      .orderBy(col("size_bucket"))

  /** Dense 0-based global index in total `order` — the scale-safe
    * replacement for `row_number() OVER (ORDER BY …)` (which funnels
    * every row through ONE partition). Two-phase numbering, entirely in
    * DataFrame ops (no RDD seam — codegen and AQE stay live):
    * range-partition + sort by `order` (parallel), stamp each row with
    * `monotonically_increasing_id()` — whose layout IS
    * (partitionId << 33) | rowOffsetInPartition — then aggregate
    * per-partition row counts, cumsum them into exclusive offsets on
    * the driver (#partitions scalars — the bounded-scalar-read
    * exception, the same cumsum the classic RDD `zipWithIndex` runs),
    * and broadcast-join the offsets back: index = offset + local row
    * position. Range partition ids ascend with the sort ranges, so the
    * result equals the global rank exactly (ScaleSpec pins dense ==
    * `row_number` over the same total order).
    *
    * The stamped frame is checkpointed BEFORE fan-out: the counts
    * branch and the join branch must observe the SAME physical
    * partitioning (re-executing the range exchange twice could resample
    * bounds or re-coalesce under AQE and desynchronize the offsets).
    * Cost: one materialization + one count pass — the same two jobs the
    * old RDD `zipWithIndex` ran, without leaving Catalyst. Limits from
    * the id layout: < 2^31 partitions, < 2^33 rows per partition —
    * far beyond any sane layout. For frames guaranteed tiny, a global
    * window is fine. */
  def zipWithOrderedIndex(df: DataFrame, order: Seq[Column],
                          indexName: String): DataFrame = {
    require(!df.columns.contains(indexName), s"column $indexName already exists")
    val reserved = Seq("__zwi_mid", "__zwi_pid", "__zwi_cnt", "__zwi_off")
    require(!df.columns.exists(reserved.contains),
      s"column names ${reserved.mkString(", ")} are reserved by zipWithOrderedIndex")
    val sorted = Reliable.checkpoint(
      df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
        .withColumn("__zwi_mid", monotonically_increasing_id()))
    val pid = shiftright(col("__zwi_mid"), 33)
    val localIdx = col("__zwi_mid").bitwiseAND(lit((1L << 33) - 1))
    val counts = sorted.groupBy(pid.as("__zwi_pid"))
      .agg(count(lit(1)).as("__zwi_cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix sum over #partitions scalars on the driver —
    // never over data rows
    var acc = 0L
    val offsets = counts.map { case (p, c) => val o = acc; acc += c; (p, o) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    sorted.join(
        broadcast(offsets.toDF("__zwi_pid", "__zwi_off")),
        pid === col("__zwi_pid"))
      .withColumn(indexName, (col("__zwi_off") + localIdx).cast("long"))
      .drop(reserved: _*)
  }

  /** Date-partitioned (and optionally bucketed-by-key, via
    * `repartition` on the key inside each date) parquet layout — the
    * fact-table storage posture from SURVEY §7.6: partition pruning
    * serves the incremental P2 slice from metadata, and co-partitioned
    * keys keep the daily merges shuffle-local. */
  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String,
                           keyCol: Option[String] = None,
                           filesPerPartition: Int = 1): Unit =
    arrangedWrite(df, path, dateCol, keyCol, filesPerPartition)

  /** Shared arrange+write for the static and dynamic overwrite paths —
    * one definition so the two layouts can never desynchronize. */
  private def arrangedWrite(df: DataFrame, path: String, dateCol: String,
                            keyCol: Option[String],
                            filesPerPartition: Int): Unit = {
    val arranged = keyCol match {
      case Some(k) =>
        df.repartition(filesPerPartition, col(dateCol), col(k))
          .sortWithinPartitions(col(dateCol), col(k))
      case None => df.repartition(filesPerPartition, col(dateCol))
    }
    arranged.write.mode("overwrite").partitionBy(dateCol).parquet(path)
  }

  /** Small-file compaction for a parquet LEAF directory — the
    * maintenance job that keeps years of incremental micro-batch
    * appends readable: many tiny files inflate scan task counts and
    * listing pressure, so periodically rewrite a partition's files into
    * ceil(bytes / targetBytes) right-sized ones. Returns the output
    * file count. Refuses a partitioned ROOT (subdirs named `col=…`):
    * compacting one would flatten the layout and retype the partition
    * column — run per partition directory instead, which also bounds
    * each rewrite at 100 TB.
    *
    * All file operations go through the Hadoop FileSystem resolved from
    * the path itself, so the same code runs against `file://`, `hdfs://`
    * or any mounted Hadoop filesystem — and every rename/delete is
    * require()d, never silently ignored.
    *
    * Swap protocol: stage into DOT-PREFIXED sibling directories
    * (`.name.compact.tmp` / `.name.compact.old` — hidden from Spark's
    * file listing, so a crash mid-swap can never surface them as bogus
    * partitions when the leaf sits inside a partitioned root), rename
    * the live dir aside, rename tmp in, delete old. A crash mid-swap
    * leaves at least one complete copy on disk, and re-running compact
    * RESTORES it: at entry, if the live dir is missing, the survivor
    * (`.old` preferred — the pre-compact state; else the fully-written
    * `.tmp`) is renamed back in before anything is deleted. Staging
    * dirs are only ever deleted while the live dir is present.
    *
    * Object-store caveat: the swap relies on directory rename being
    * atomic-and-cheap, which holds on POSIX filesystems and HDFS but
    * NOT on S3-style object stores (rename = copy+delete, non-atomic).
    * There, compact a copy and flip a table-format pointer instead
    * (Delta/Iceberg metadata commit — see ops.Merge's sink notes). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 256L * 1024 * 1024): Int = {
    val (fs, dir) = resolve(spark, path)
    val parent = dir.getParent
    val tmp = new HPath(parent, "." + dir.getName + ".compact.tmp")
    val old = new HPath(parent, "." + dir.getName + ".compact.old")
    if (!fs.exists(dir)) {
      // crash recovery: a prior run died between the two swap renames —
      // restore the surviving copy; never delete while the live dir is
      // missing (a blind tmp/old cleanup here would destroy the only
      // remaining data)
      if (fs.exists(old)) {
        require(fs.rename(old, dir), s"recovery rename $old -> $dir failed")
        if (fs.exists(tmp)) require(fs.delete(tmp, true), s"delete $tmp failed")
      } else if (fs.exists(tmp)) {
        // old gone but tmp present: tmp was fully written before any
        // rename, so promoting it completes the interrupted swap
        require(fs.rename(tmp, dir), s"recovery rename $tmp -> $dir failed")
      } else {
        throw new IllegalArgumentException(s"$path does not exist")
      }
    } else {
      // live dir present: tmp/old are stale staging from an earlier
      // crash after (or before) the swap — safe to clear
      if (fs.exists(tmp)) require(fs.delete(tmp, true), s"delete $tmp failed")
      if (fs.exists(old)) require(fs.delete(old, true), s"delete $old failed")
    }
    val partitionDirs = fs.listStatus(dir)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    require(partitionDirs.isEmpty,
      s"$path is a partitioned root (${partitionDirs.head.getPath.getName}, …) — " +
        "compact operates on leaf directories; run it per partition")
    val bytes = fs.getContentSummary(dir).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir.toString).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(dir, old), s"rename $dir aside failed")
    require(fs.rename(tmp, dir), s"rename $tmp -> $dir failed; previous copy at $old")
    require(fs.delete(old, true), s"delete $old failed (table swap succeeded)")
    nFiles
  }

  /** Targeted key deletion from a date-partitioned layout (the
    * retention / right-to-erasure maintenance op): rewrites ONLY the
    * date partitions that actually contain the doomed keys — discovered
    * with one partition-pruned-friendly aggregation — via dynamic
    * partition overwrite; untouched history is never read or written.
    * Rows whose key is NULL are explicitly KEPT (three-valued logic
    * would otherwise silently drop them from rewritten partitions);
    * doomed rows in a null-dated partition are refused loudly rather
    * than left behind.
    *
    * This is a retention / right-to-erasure op, so silent failure is a
    * contract breach: emptied partition directories are removed via the
    * Hadoop FileSystem resolved from the path (works on file://, hdfs://,
    * object stores), and the delete is require()d — if the files the
    * doomed rows lived in cannot be removed, the op throws rather than
    * leaving them readable. */
  def deleteKeys(spark: org.apache.spark.sql.SparkSession, path: String,
                 dateCol: String, keyCol: String, keys: Seq[Any]): Unit = {
    require(keys.nonEmpty, "no keys to delete")
    val table = spark.read.parquet(path)
    val touched = table
      .filter(col(keyCol).isin(keys: _*))
      .select(col(dateCol)).distinct().collect().map(_.get(0))
    require(!touched.contains(null),
      s"doomed keys present in a null-$dateCol partition — not supported")
    if (touched.nonEmpty) {
      val kept = table
        .filter(col(dateCol).isin(touched: _*))
        .filter(col(keyCol).isNull || !col(keyCol).isin(keys: _*))
        // materialize BEFORE the overwrite deletes the files it reads
        .transform(Reliable.checkpoint)
      withDynamicOverwrite(spark) {
        kept.filter(col(dateCol).isin(touched: _*))
          .write.mode("overwrite").partitionBy(dateCol).parquet(path)
      }
      // dynamic overwrite only rewrites partitions PRESENT in the
      // output — a partition emptied entirely by the delete would
      // otherwise keep its old files; remove those directories (names
      // use Spark's partition-path escaping)
      val keptDates = kept.select(col(dateCol)).distinct()
        .collect().map(_.get(0).toString).toSet
      val (fs, root) = resolve(spark, path)
      touched.map(_.toString).filterNot(keptDates).foreach { v =>
        val escaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v)
        val pdir = new HPath(root, s"$dateCol=$escaped")
        // delete must succeed AND the directory must actually have been
        // there (delete(missing) returns false on most FS impls — but a
        // vanished dir with doomed rows is itself suspicious, so check)
        require(fs.exists(pdir), s"emptied partition $pdir vanished mid-delete")
        require(fs.delete(pdir, true),
          s"failed to delete emptied partition $pdir — doomed rows would remain readable")
      }
    }
  }

  /** Bit-interleaved Z-order value of two non-negative ints — the
    * space-filling-curve key behind multi-dimension data clustering:
    * sorting by z interleaves locality in BOTH dimensions, so a file
    * holding a contiguous z-range has TIGHT min/max column statistics
    * on both columns and parquet row-group/file skipping prunes scans
    * filtered on either one (a single-column sort gives this for that
    * column only — every file spans the full range of the other).
    *
    * `bits` low bits of each input are interleaved (a even positions,
    * b odd); inputs must be in [0, 2^bits) — rank/bucket wider domains
    * first (e.g. `pmod(hash(c), 1<<bits)` or an ntile rank). Checked
    * per row, loudly. Pure integer arithmetic (shift/and/or), codegen-
    * friendly, and portable: [[zValueSql]] emits the identical ANSI
    * expansion for an external oracle engine. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    zValueN(Seq(a, b), bits)

  /** n-column bit-round-robin interleave (the general form of
    * [[zValue]]): bit i of input c lands at position i·n + c, so a file
    * holding a contiguous z-range has tight min/max stats on ALL n
    * columns and a point filter on ANY of them skips files. `bits` low
    * bits per input; n·bits must fit a non-negative long (≤ 63). The
    * useful n is small (2–4): each added column halves the per-column
    * resolution a fixed z-range preserves — the classic Z-order
    * trade-off, measured per-n in AnalyticsSpec. */
  def zValueN(inputs: Seq[Column], bits: Int): Column = {
    val n = inputs.size
    require(n >= 2, s"zValueN needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need bits >= 1 and n*bits <= 63, got n=$n bits=$bits")
    val bound = 1L << bits
    val vs = inputs.map(_.cast("long"))
    val z = (for { i <- 0 until bits; c <- vs.indices } yield (i, c))
      .foldLeft(lit(0L)) { case (acc, (i, c)) =>
        acc.bitwiseOR(
          shiftleft(shiftright(vs(c), i).bitwiseAND(lit(1L)), i * n + c))
      }
    // one range assert per input per row, added as a pass-through zero
    // (assert_true is NULL on pass) so pruning can't drop the check
    val checked = (c: Column) => coalesce(
      assert_true(c >= 0 && c < bound,
        lit(s"zValue input out of [0, $bound) — bucket or rank wider domains first")),
      lit(0L))
    vs.foldLeft(z)((acc, v) => acc + checked(v))
  }

  /** The same interleave as ANSI SQL text (for an external oracle):
    * `aExpr`/`bExpr` are SQL fragments already cast to BIGINT and
    * already range-checked by the caller. Generated from the same bit
    * positions as [[zValue]] so the two can never drift. */
  def zValueSql(aExpr: String, bExpr: String, bits: Int): String =
    zValueSqlN(Seq(aExpr, bExpr), bits)

  /** n-ary ANSI SQL twin of [[zValueN]] — same i·n + c bit positions. */
  def zValueSqlN(exprs: Seq[String], bits: Int): String = {
    val n = exprs.size
    require(n >= 2, s"zValueSqlN needs at least 2 expressions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need bits >= 1 and n*bits <= 63, got n=$n bits=$bits")
    (for { i <- 0 until bits; c <- exprs.indices } yield
      s"((((${exprs(c)}) >> $i) & 1) << ${i * n + c})")
      .mkString("(", " | ", ")")
  }

  /** Z-order-clustered parquet layout: range-partition by the
    * interleaved key into `nFiles` contiguous z-ranges, sort within
    * each, write. Each output file covers a compact rectangle-ish
    * region of (colA, colB) space — min/max footer stats on BOTH
    * columns are tight, so scans filtered on either column skip most
    * files (AnalyticsSpec measures probe-point file skipping vs a
    * single-column sort). The helper column is dropped before the write; dropping
    * after the sort is a projection, so the within-partition order
    * survives. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int, nFiles: Int): Unit =
    writeZOrderedN(df, path, Seq(colA, colB), bits, nFiles)

  /** n-column Z-order-clustered layout — [[writeZOrdered]] over
    * [[zValueN]]: point filters on ANY of the n clustered columns skip
    * most files (AnalyticsSpec measures the 3-column read fraction). */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[String],
                     bits: Int, nFiles: Int): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    require(!df.columns.contains("__z"),
      "column name __z is reserved by writeZOrdered")
    df.withColumn("__z", zValueN(cols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-curve distance of two non-negative ints — the 2-D layout
    * key with strictly better locality than [[zValue]]: consecutive
    * curve positions are always ADJACENT cells (Z-order teleports at
    * every power-of-two boundary), so a contiguous d-range is one
    * connected region and its per-file min/max stats are at least as
    * tight. Same input contract as zValue (each in [0, 2^bits),
    * checked loudly per row); fused integer kernel
    * ([[graft.expr.catalyst.HilbertD]]), codegen-friendly, restated
    * step-for-step by the q_hilbert oracle. Range predicates don't
    * decompose as simply as Z-order's — use it where 2-D point/range
    * locality is the dominant access pattern; for 3+ clustered columns
    * see [[hilbertValueN]]. */
  def hilbertValue(a: Column, b: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.HilbertD(
      expression(a.cast("long")), expression(b.cast("long")), bits))
  }

  /** n-column Hilbert index (Skilling's transpose walk,
    * [[graft.expr.catalyst.HilbertKernel.dN]]) — the [[zValueN]]
    * counterpart with true curve locality: consecutive indices are
    * Manhattan-adjacent n-D cells, so a contiguous index range is one
    * connected region and per-file min/max stats stay at least as
    * tight as Z-order's on every clustered column (footer-measured
    * against zValueN in q_hilbert3_audit). Same input contract as
    * zValueN: each coordinate in [0, 2^bits), n·bits ≤ 62, loud on
    * range violations. */
  def hilbertValueN(inputs: Seq[Column], bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.HilbertDN(
      inputs.map(c => expression(c.cast("long"))), bits))
  }

  /** n-column Hilbert-clustered parquet layout — [[writeZOrderedN]] on
    * the [[hilbertValueN]] key. */
  def writeHilbertOrderedN(df: DataFrame, path: String, cols: Seq[String],
                           bits: Int, nFiles: Int): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    require(!df.columns.contains("__h"),
      "column name __h is reserved by writeHilbertOrderedN")
    df.withColumn("__h", hilbertValueN(cols.map(col), bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-clustered parquet layout (the [[writeZOrderedN]] shape on
    * the Hilbert key): range-partition into contiguous d-ranges, sort
    * within, write — each file covers one CONNECTED region of (a, b)
    * space. File-skipping measured against the Z layout and a plain
    * sort in q_hilbert_audit / AnalyticsSpec. */
  def writeHilbertOrdered(df: DataFrame, path: String, colA: String,
                          colB: String, bits: Int, nFiles: Int): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    require(!df.columns.contains("__h"),
      "column name __h is reserved by writeHilbertOrdered")
    df.withColumn("__h", hilbertValue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Resolve a path string to (FileSystem, fully-qualified Path) via the
    * session's Hadoop conf — the one seam every disk-mutating maintenance
    * op goes through, so none of them can regress to java.io.File. */
  private[graft] def resolve(spark: org.apache.spark.sql.SparkSession,
                           path: String): (org.apache.hadoop.fs.FileSystem, HPath) = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  /** Run `body` with partitionOverwriteMode=dynamic, restoring the
    * previous session value afterwards — shared by every
    * partition-selective writer so the conf swap exists once (also the
    * replay-idempotence seam for streaming.CurationStream's
    * batch_id-partitioned refresh writes). */
  private[graft] def withDynamicOverwrite(
      spark: org.apache.spark.sql.SparkSession)(body: => Unit): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** Incremental variant of `writeDatePartitioned` (VERDICT r2 item 5):
    * rewrites ONLY the date partitions present in `df`, leaving every
    * other date directory untouched on disk — the property that makes
    * daily fact merges O(day), not O(table), at 100 TB. Implemented via
    * Spark's dynamic partition overwrite (`partitionOverwriteMode=
    * dynamic`), scoped to this one write and restored afterwards so the
    * session-level setting (default `static`, where mode("overwrite")
    * truncates the whole path) is never silently changed.
    *
    * Typical daily cycle: read back ONLY the touched dates
    * (partition-pruned scan), `Merge.upsert` the new slice into them,
    * then write the merged result here — untouched history is never
    * read or written. */
  def overwriteTouchedDates(df: DataFrame, path: String, dateCol: String,
                            keyCol: Option[String] = None,
                            filesPerPartition: Int = 1): Unit =
    withDynamicOverwrite(df.sparkSession) {
      arrangedWrite(df, path, dateCol, keyCol, filesPerPartition)
    }
}
