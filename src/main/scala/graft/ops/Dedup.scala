package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * Reference surface: first-seen-per-key Python sets (A3 —
  * SqlDbEtl.py:192-229, Stellar.py:83/175) and top-1-per-key
  * `ORDER BY created_at DESC LIMIT 1` (W1/J3 — Stellar.py:68-78).
  *
  * Beyond-reference (north-star) surface: exact content dedup, MinHash,
  * SimHash and n-gram-Jaccard near-dup over the `documents` table — all
  * set-oriented, one shuffle each, no driver-side state, so they scale to
  * 100 TB by partitioning on the dedup key.
  */
object Dedup {

  /** First row per key under an EXPLICIT deterministic order. The
    * reference's "first seen" is MySQL result order — nondeterministic in
    * principle (SURVEY §7.7 #4); we pin arrival order to `order` columns. */
  def firstSeen(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__rn"),
      "column __rn is reserved by firstSeen — rename the input's")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Top-1 per key by descending order — the latest-price lookup (J3/W1). */
  def top1PerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    firstSeen(df, keys, order.map(_.desc))

  /** Exact content dedup: group by a stable content hash, keep the row with
    * the smallest tiebreak. sha2-256 collisions are negligible; the hash
    * (32 bytes) shuffles instead of the full text — at 100 TB that is the
    * difference between shuffling hashes and shuffling documents. */
  def exactByHash(df: DataFrame, contentCol: String, tiebreak: Column): DataFrame = {
    require(!df.columns.contains("__h"),
      "column __h is reserved by exactByHash — rename the input's")
    firstSeen(df.withColumn("__h", sha2(col(contentCol), 256)),
      Seq("__h"), Seq(tiebreak)).drop("__h")
  }

  // ---- MinHash-LSH near-dup ----

  /** Whitespace word shingles of size n as an array column (distinct,
    * first-occurrence order) — fused kernel
    * (graft.expr.catalyst.ShingleArray). */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.ShingleArray(expression(text), n))
  }

  /** Declarative reference formulation of shingles (kept for the kernel
    * parity property test). */
  def shinglesDeclarative(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** One MinHash value: min over shingles of md5(seed || shingle).
    * md5 hex strings compare lexicographically identically everywhere
    * (oracle-parity with DuckDB's md5), and a per-seed prefix gives k
    * independent permutation approximations. Declarative reference
    * formulation — the production path is the fused kernel below. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed:"), s))))

  /** MinHash signature of k hashes — fused native kernel
    * (graft.expr.catalyst.MinHashSignature): one tight loop per row
    * instead of k× interpreted shingle+md5 HOF chains. Semantics are
    * property-tested equal to `array((0 until k).map(i =>
    * minhash(shingles(text, n), i)))`. */
  def minhashSignature(text: Column, shingleSize: Int, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.MinHashSignature(expression(text), shingleSize, k))
  }

  /** P(two docs become LSH candidates | Jaccard = s) for a (bandRows,
    * nBands) banding: 1 − (1 − s^r)^b — the S-curve every MinHash-LSH
    * textbook derives (Leskovec/Rajaraman/Ullman, "Mining of Massive
    * Datasets", public). Computed as LEFT-ASSOCIATED multiplication
    * chains, NOT pow(): IEEE multiplication is bit-identical across
    * engines where pow is only ~1-ulp-accurate, so the q_lsh_plan
    * oracle restates this exactly. */
  def lshCandidateProb(s: Column, bandRows: Int, nBands: Int): Column = {
    require(bandRows >= 1 && nBands >= 1, "bandRows and nBands must be >= 1")
    val sr = (1 to bandRows).map(_ => s).reduce(_ * _)
    val miss = (1 to nBands).map(_ => lit(1.0) - sr).reduce(_ * _)
    lit(1.0) - miss
  }

  /** Banding planner for a k-hash MinHash signature: one row per
    * divisor pair (bandRows r, nBands b = k/r) with the S-curve
    * evaluated at the caller's target (true near-dup) and noise
    * (unrelated pair) similarities, the separation margin
    * P(target) − P(noise), and `chosen` marking the margin-maximal
    * config (ties to the smaller r — cheaper bands). The margin
    * criterion is the operational trade: recall at the similarity you
    * must catch minus the candidate-flood rate at the similarity you
    * must ignore — and unlike the classic (1/b)^(1/r) threshold
    * formula it needs no pow(), so the whole plan is engine-exact.
    * Driver-sized output (≤ d(k) rows); run it before sizing
    * [[minhashLshCandidates]] at a new corpus similarity profile. */
  def lshPlan(spark: org.apache.spark.sql.SparkSession, k: Int,
              targetSim: Double, noiseSim: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(targetSim > noiseSim && noiseSim >= 0.0 && targetSim <= 1.0,
      s"need 0 <= noiseSim < targetSim <= 1, got ($noiseSim, $targetSim)")
    import spark.implicits._
    val configs = (1 to k).filter(k % _ == 0).map(r => (r, k / r))
      .toDF("band_rows", "n_bands")
    val pT = lshCandidateProbInt(lit(targetSim), col("band_rows"), col("n_bands"), k)
    val pN = lshCandidateProbInt(lit(noiseSim), col("band_rows"), col("n_bands"), k)
    val w = org.apache.spark.sql.expressions.Window.orderBy(
      (col("p_target") - col("p_noise")).desc, col("band_rows"))
    configs
      .select(col("band_rows"), col("n_bands"),
        pT.as("p_target"), pN.as("p_noise"))
      .withColumn("margin", col("p_target") - col("p_noise"))
      .withColumn("chosen", row_number().over(w) === 1)
      .orderBy(col("band_rows"))
  }

  /** The planner APPLIED (VERDICT r10 item 5): the margin-maximal
    * (bandRows, nBands) row of [[lshPlan]] for a k-hash signature at
    * the caller's (targetSim, noiseSim) similarity profile, collected
    * as two driver ints — the plan frame is ≤ d(k) rows, a driver
    * scalar by construction. The planned entry points below resolve
    * their banding here, so "plan it, then run it" is one call. */
  def plannedBanding(spark: org.apache.spark.sql.SparkSession, k: Int,
                     targetSim: Double, noiseSim: Double): (Int, Int) = {
    val row = lshPlan(spark, k, targetSim, noiseSim)
      .filter(col("chosen")).select(col("band_rows"), col("n_bands"))
      .head()
    (row.getInt(0), row.getInt(1))
  }

  /** [[minhashLshCandidates]] with the banding DERIVED from the corpus
    * similarity profile via [[lshPlan]] instead of hand-picked: state
    * the similarity you must catch and the similarity you must ignore,
    * and the margin-maximal (bandRows, nBands) follows. */
  def minhashLshCandidatesPlanned(df: DataFrame, idCol: String, textCol: String,
                                  targetSim: Double, noiseSim: Double,
                                  shingleSize: Int = 3, k: Int = 12,
                                  maxBucket: Int = Int.MaxValue): LshCandidates = {
    val (bandRows, _) = plannedBanding(df.sparkSession, k, targetSim, noiseSim)
    minhashLshCandidates(df, idCol, textCol, shingleSize, k, bandRows, maxBucket)
  }

  /** Pairs-only face of [[minhashLshCandidatesPlanned]]. */
  def minhashLshPairsPlanned(df: DataFrame, idCol: String, textCol: String,
                             targetSim: Double, noiseSim: Double,
                             shingleSize: Int = 3, k: Int = 12,
                             maxBucket: Int = Int.MaxValue): DataFrame =
    minhashLshCandidatesPlanned(df, idCol, textCol, targetSim, noiseSim,
      shingleSize, k, maxBucket).pairs

  /** [[bandIndex]] with planner-derived banding — the sign-once
    * incremental face of the planned configuration. */
  def bandIndexPlanned(df: DataFrame, idCol: String, textCol: String,
                       targetSim: Double, noiseSim: Double,
                       shingleSize: Int = 3, k: Int = 12): DataFrame = {
    val (bandRows, _) = plannedBanding(df.sparkSession, k, targetSim, noiseSim)
    bandIndex(df, idCol, textCol, shingleSize, k, bandRows)
  }

  /** [[lshCandidateProb]] with COLUMN r/b (bounded by k): the same
    * left-associated chains selected by a CASE over the k's divisors —
    * per-divisor literal expansion keeps the arithmetic identical to
    * the scalar form. */
  private def lshCandidateProbInt(s: Column, r: Column, b: Column,
                                  k: Int): Column = {
    val divisors = (1 to k).filter(k % _ == 0)
    divisors.foldLeft(lit(Double.NaN)) { (acc, rr) =>
      when(r === rr && b === k / rr, lshCandidateProb(s, rr, k / rr))
        .otherwise(acc)
    }
  }

  /** LSH banding: split a k-signature into bands of `rows` hashes; docs
    * sharing any full band are candidate near-dups. Returns (band_id,
    * band_key) pairs to explode + self-join on — the join key is a short
    * hash, so the candidate join shuffles keys, not documents. */
  def lshBands(signature: Column, bandRows: Int, nBands: Int): Column =
    array((0 until nBands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws("|", slice(signature, b * bandRows + 1, bandRows))).as("band_key"))
    }: _*)

  /** Pairs + skew side-output of the LSH candidate generation:
    * `pairs` is the (id_a, id_b) candidate set; `flaggedBuckets` lists
    * buckets larger than the cap as (band_id, band_key, n_ids,
    * sample_ids) — a bucket of near-identical boilerplate IS the
    * answer (one giant duplicate cluster); pairing it is O(n²) for no
    * information. Callers route flagged buckets to cluster-level
    * handling (keep one representative, drop the rest). */
  case class LshCandidates(pairs: DataFrame, flaggedBuckets: DataFrame)

  /** Near-duplicate candidate pairs via MinHash-LSH over a text column.
    * Output: (id_a, id_b) with id_a < id_b, distinct.
    *
    * Shape: ONE pass computes signatures, ONE shuffle groups ids per
    * (band_id, band_key) bucket, and pairs are generated inside each
    * bucket with array combinatorics — no self-join, so the (expensive,
    * interpreted) minhash expressions are evaluated exactly once per
    * document. At 100 TB the shuffle payload is (16-byte band key, id);
    * bucket skew is the quadratic risk, so `maxBucket` caps it:
    * oversized buckets produce NO pairs and surface in
    * `flaggedBuckets` instead (VERDICT r1 item 9). */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           shingleSize: Int = 3, k: Int = 12, bandRows: Int = 2,
                           maxBucket: Int = Int.MaxValue): LshCandidates = {
    require(k % bandRows == 0,
      s"bandRows=$bandRows must divide k=$k — a remainder would silently " +
        "drop the trailing minhash values from banding, quietly lowering " +
        "recall below what the configuration implies")
    val nBands = k / bandRows
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), shingleSize, k).as("sig"))
    val banded = sig.select(col("id"),
        explode(lshBands(col("sig"), bandRows, nBands)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_key"))
    val (safe, flagged) =
      divertOversized(banded, Seq("band_id", "band_key"), maxBucket)
    val pairs = safe
      .groupBy(col("band_id"), col("band_key"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairsFromSortedIds(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
    LshCandidates(pairs, flagged)
  }

  /** Bucket sizing pass shared by the capped candidate generators:
    * (bucket keys, n_ids, sample_ids) with a BOUNDED sample — only a
    * count and a few ids per bucket cross the shuffle, never the
    * membership. Integral ids get the 20-smallest via the argmax-k
    * aggregate; other id types (string/UUID linkage keys) get the
    * bounded {min, max} witness pair — min/max are plain partial
    * aggregates for ANY orderable type, so the flood-safety contract
    * (no membership ever buffers) holds type-agnostically, at a
    * smaller sample. Pre-r10 this REFUSED non-integral ids outright
    * (ADVICE r9: a capability regression vs the slice sample it
    * replaced — and a full collect_set sample would reintroduce the
    * exact buffer the sizing pass exists to prevent).
    *
    * sample_ids is array<string> in BOTH branches (ADVICE r10): the
    * witnesses are diagnostic, never joined on, and a type-dependent
    * schema would break consumers persisting or unioning flagged
    * frames across pipelines with different id types. */
  private def sizedBuckets(rows: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import org.apache.spark.sql.types._
    val integral = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(rows.schema("id").dataType)
    if (integral) {
      val sample20 = column(graft.expr.catalyst.TopKByScore(
        expression(struct(-col("id").cast("double"), col("id").cast("long"))), 20)
        .toAggregateExpression())
      rows.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n_ids"), sample20.as("__top"))
        .select(keys.map(col) ++ Seq(col("n_ids"),
          transform(col("__top"), e => e.getField("id").cast("string"))
            .as("sample_ids")): _*)
    } else {
      rows.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n_ids"),
          min(col("id")).as("__mn"), max(col("id")).as("__mx"))
        .select(keys.map(col) ++ Seq(col("n_ids"),
          array_distinct(array(col("__mn").cast("string"),
            col("__mx").cast("string"))).as("sample_ids")): _*)
    }
  }

  /** SIZE buckets BEFORE collecting, then divert oversized ones (the
    * Linkage posture): a boilerplate flood bucket would otherwise
    * materialize its full membership in one agg buffer and kill the
    * task before a size filter could drop it. Returns (safe rows,
    * flagged buckets); identity with an empty flagged frame when
    * `maxBucket` is unset, keeping uncapped callers single-pass. One
    * definition for every capped generator so a cap fix can never
    * silently miss a copy.
    *
    * sample_ids is the 20-smallest for integral ids and the bounded
    * {min, max} witness pair otherwise — see [[sizedBuckets]]. */
  private[ops] def divertOversized(rows: DataFrame, keys: Seq[String],
                              maxBucket: Int): (DataFrame, DataFrame) = {
    if (maxBucket == Int.MaxValue)
      (rows, sizedBuckets(rows, keys).filter(lit(false)))
    else {
      val over = sizedBuckets(rows, keys).filter(col("n_ids") > maxBucket)
      (rows.join(over.select(keys.map(col): _*), keys, "left_anti"), over)
    }
  }

  /** Bucket-local no-self-join pair kernel, shared by every LSH-style
    * candidate generator (minhash text buckets, hyperplane vector
    * buckets): a SORTED id array → array of (id_a < id_b) structs via
    * ids[i] × ids[i+1..] combinatorics. One definition so a bounds fix
    * can never silently miss a copy. */
  def pairsFromSortedIds(ids: Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + 2, size(ids)),
        b => struct(a.as("id_a"), b.as("id_b")))))

  // ---- incremental near-dup (append-only corpus) ----

  /** MinHash-LSH band-index rows for a document frame:
    * (id, band_id, band_key). The append-only-corpus primitive: at
    * 100 TB, re-signing the whole corpus per arriving batch is the
    * anti-pattern — sign each batch ONCE when it arrives, persist these
    * rows bucketed by band_key, and dedup future batches by probing the
    * stored index (`incrementalCandidates`) instead of re-pairing the
    * corpus. Parameters must match across batches for the index to be
    * coherent (band keys are md5 over signature slices). */
  def bandIndex(df: DataFrame, idCol: String, textCol: String,
                shingleSize: Int = 3, k: Int = 12, bandRows: Int = 2): DataFrame = {
    require(k % bandRows == 0,
      s"bandRows=$bandRows must divide k=$k — a remainder would silently " +
        "drop the trailing minhash values from banding, quietly lowering " +
        "recall below what the configuration implies")
    val nBands = k / bandRows
    df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), shingleSize, k).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), bandRows, nBands)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_key"))
  }

  /** Split a band index into probe-safe rows and oversized buckets —
    * run at INDEX BUILD time, not per probe: a band key shared by more
    * than `maxBucket` docs (boilerplate headers, empty documents) would
    * turn every future probe that hits it into an O(bucket) candidate
    * flood. `pruned` is the index to persist; `flagged` lists the
    * oversized buckets as (band_id, band_key, n_ids, sample_ids) for
    * cluster-level handling — the same posture as
    * [[minhashLshCandidates]]'s skew side-output. One aggregation over
    * the index, shuffle payload (16-byte key, count). Input must be
    * duplicate-free band rows (what [[bandIndex]] emits): the bounded
    * sample has no set semantics, so duplicated (id, band) rows would
    * both inflate n_ids and repeat ids in sample_ids. */
  case class PrunedBands(pruned: DataFrame, flagged: DataFrame)
  def pruneOversizedBuckets(bands: DataFrame, maxBucket: Int): PrunedBands = {
    // sizing + bounded sample via the shared divertOversized pass (the
    // argmax-k aggregate keeps the 20 SMALLEST ids — deterministic).
    // Precision bound: the sample score ranks via double, exact only
    // for |id| ≤ 2^53 — above that, ids collapsing to one double may
    // make sample_ids not strictly the smallest 20 (the (score, id)
    // tie-break keeps the sample deterministic either way). Fine for
    // sequence ids; hash-derived 64-bit ids get A deterministic
    // sample, not the MIN-20.
    val (pruned, flagged) =
      divertOversized(bands, Seq("band_id", "band_key"), maxBucket)
    PrunedBands(pruned, flagged)
  }

  /** Near-dup candidates for a NEW batch against an EXISTING corpus
    * band index, plus within-batch candidates: (id_new, id_match, src)
    * with src = 'corpus' (matched a stored id) or 'batch' (matched
    * another new doc, id_match < id_new). Corpus-vs-corpus pairs are
    * deliberately absent — they were resolved when those docs arrived;
    * that is the whole point of the incremental shape.
    *
    * Probe-side skew: `maxBucket` caps WITHIN-BATCH buckets here; the
    * CORPUS side must be capped when the index is built
    * ([[pruneOversizedBuckets]]) — an unpruned index bucket holding a
    * boilerplate flood would otherwise multiply every matching batch
    * band by its full membership.
    *
    * Scale: the batch's band rows are small relative to the corpus —
    * broadcast them, so the corpus index is probed on the batch's band
    * keys without shuffling (and with the index stored bucketed by
    * band_key, the probe is an index lookup, not a scan). Within-batch
    * pairs use the same bucket-local no-self-join combinatorics as
    * `minhashLshCandidates`, capped by `maxBucket` with the oversized
    * buckets dropped (route boilerplate floods to cluster handling). */
  def incrementalCandidates(batchBands: DataFrame, corpusBands: DataFrame,
                            maxBucket: Int = 10000): DataFrame = {
    // two consumers below (corpus probe + within-batch buckets) — an
    // unmaterialized frame would run the MinHash signing twice per
    // batch, defeating the sign-once contract; the batch is small by
    // definition, so eager materialization is cheap
    val bb = Reliable.checkpoint(batchBands)
    val vsCorpus = broadcast(
        bb.select(col("id").as("id_new"), col("band_id"), col("band_key")))
      .join(corpusBands.select(col("id").as("id_match"), col("band_id"), col("band_key")),
        Seq("band_id", "band_key"))
      .select(col("id_new"), col("id_match")).distinct()
      .withColumn("src", lit("corpus"))
    val vsBatch = bb
      .groupBy(col("band_id"), col("band_key"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(pairsFromSortedIds(col("ids"))).as("p"))
      .select(col("p.id_b").as("id_new"), col("p.id_a").as("id_match")).distinct()
      .withColumn("src", lit("batch"))
    vsCorpus.unionByName(vsBatch)
  }

  /** Pairs-only convenience (uncapped) — see minhashLshCandidates. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 3, k: Int = 12, bandRows: Int = 2,
                      maxBucket: Int = Int.MaxValue): DataFrame =
    minhashLshCandidates(df, idCol, textCol, shingleSize, k, bandRows, maxBucket).pairs

  /** Exact n-gram Jaccard similarity for given candidate id pairs.
    * pairs: (id_a, id_b); docs: (id, text). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Exact n-gram CONTAINMENT for candidate pairs — the asymmetric
    * measure Jaccard cannot express (Broder 1997 distinguishes
    * resemblance from containment): c(a→b) = |A ∩ B| / |A| is high
    * when a is a QUOTE/SUBSET of b even when b is much larger and the
    * Jaccard is tiny — the partial-duplicate and quotation detector a
    * training corpus needs beside whole-document near-dup. One pass
    * emits both directions AND the Jaccard, so a single candidate join
    * serves both policies. Divisions are int/int — bit-identical
    * cross-engine with no rounding step; the shingle kernel's
    * short-text fallback (one whole-text shingle) keeps |A| >= 1. */
  def ngramContainment(docs: DataFrame, idCol: String, textCol: String,
                       pairs: DataFrame, shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_common"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_a"))).as("contain_a_in_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_b"))).as("contain_b_in_a"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  // ---- SimHash near-dup ----

  /** Pairs + skew side-output of the SimHash candidate generation —
    * the [[LshCandidates]] posture for the banded-simhash path. */
  case class SimhashCandidates(pairs: DataFrame, flaggedBuckets: DataFrame)

  /** SimHash near-dup candidate pairs: split the 64-bit simhash into
    * `nBands` chunks; by pigeonhole, two hashes within Hamming distance
    * `nBands − 1` share at least one exact chunk, so bucketing on
    * (band_id, chunk) finds all such pairs with one shuffle of
    * (16-bit chunk, id) — then the exact Hamming check confirms.
    * Same bucket-groupBy shape as minhashLshPairs (no self-join);
    * `maxBucket` diverts flood buckets (identical boilerplate hashes
    * share every chunk) to `flaggedBuckets` via the same
    * size-before-collect pass, so the flood never materializes in an
    * agg buffer and never pairs quadratically. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        nBands: Int = 4, maxHamming: Int = 3,
                        maxBucket: Int = Int.MaxValue): SimhashCandidates = {
    require(64 % nBands == 0, "nBands must divide 64")
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    val hashed = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("h"))
    val banded = hashed.select(col("id"), col("h"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("h"), b * bandBits).bitwiseAND(lit(mask)).as("chunk"))): _*))
        .as("band"))
      .select(col("id"), col("h"), col("band.band_id"), col("band.chunk"))
    val (safe, flagged) =
      divertOversized(banded, Seq("band_id", "chunk"), maxBucket)
    val buckets = safe
      .groupBy(col("band_id"), col("chunk"))
      .agg(sort_array(collect_set(struct(col("id"), col("h")))).as("members"))
      .filter(size(col("members")) > 1)
    val pairs = buckets
      .select(explode(flatten(transform(col("members"), (a, i) =>
        transform(slice(col("members"), i + 2, size(col("members"))),
          b => struct(a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            a.getField("h").as("h_a"), b.getField("h").as("h_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.h_a"), col("p.h_b"))
      .distinct()
    val confirmed = pairs
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
    SimhashCandidates(confirmed, flagged)
  }

  /** Pairs-only convenience — see [[simhashCandidates]]. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   nBands: Int = 4, maxHamming: Int = 3,
                   maxBucket: Int = Int.MaxValue): DataFrame =
    simhashCandidates(df, idCol, textCol, nBands, maxHamming, maxBucket).pairs

  // ---- near-dup cluster resolution ----

  /** Connected components over a near-dup pair graph — the canonical-
    * representative step every dedup pipeline needs after pair
    * generation (keep one doc per component, drop the rest). Input is
    * any (id_a, id_b) pair frame (minhashLshPairs, simhashPairs,
    * Ann.nearDupPairsLsh); output is (id, rep, cluster_size) where
    * `rep` is the component's minimum id — the deterministic canonical
    * pick — and only ids that appear in some pair are returned
    * (singleton docs are their own representative by definition).
    *
    * Algorithm: iterative min-label propagation to fixpoint — each
    * round every node takes the min of its own label and its
    * neighbors'; converges in O(graph diameter) rounds. Near-dup
    * graphs are dense local clumps with tiny diameters (a transitive
    * chain of near-identical docs), so rounds stay in single digits at
    * any corpus size; each round is one shuffle of (id, label) pairs —
    * the text never moves. Labels are localCheckpointed per round: the
    * convergence check needs an action anyway, and an uncheckpointed
    * loop would re-execute every prior round's joins each iteration
    * (lineage grows quadratically). For graphs with genuinely LARGE
    * diameters — substring/chain-shaped duplicate graphs, linkage
    * paths — a diameter-k chain costs k shuffles here; pass
    * `lowDiameter = false` to run the alternating large-star /
    * small-star algorithm (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public) instead, which converges
    * in ~O(log n) rounds regardless of diameter at a higher per-round
    * cost (spec-pinned: a diameter-1000 string-id path converges in
    * ≤ 2·log₂(n) + 2 rounds with components identical to this path's
    * output).
    *
    * Fault tolerance: per-round materialization routes through
    * [[Reliable.checkpoint]] — set the SparkContext checkpoint dir on a
    * real cluster and each round is a replicated reliable checkpoint
    * (an executor loss mid-propagation recovers); unset, it stays the
    * fast executor-local variant. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
                          lowDiameter: Boolean = true): DataFrame = {
    if (!lowDiameter) return starComponents(pairs, maxIter)
    val sc = pairs.sparkSession.sparkContext
    def trackedCheckpoint(df: DataFrame): (DataFrame, Set[Int]) =
      Dedup.trackedCheckpoint(sc, df)
    def free(ids: Set[Int]): Unit = Dedup.freePersisted(sc, ids)

    // edges are re-joined every round: checkpoint ONCE so the (possibly
    // expensive) pair-generation lineage upstream runs once, not
    // once-per-round
    val (edges, edgeIds) = trackedCheckpoint(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct())
    var (labels, labelIds) = trackedCheckpoint(
      edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("rep")))
    // convergence = ZERO labels changed this round — an exact,
    // TYPE-AGNOSTIC test (one count per round, same cost as a scalar
    // agg). The previous sum(rep cast decimal) test silently cast
    // non-numeric ids to NULL, making every round's sum ZERO and
    // declaring convergence after one propagation round — silently
    // wrong components for string/UUID ids (the ids
    // Linkage.resolveEntities commonly feeds in).
    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("rep")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("rep")).as("nbr_rep"))
      // the checkpoint carries old+new rep so the changed-count and the
      // next round read ONE materialization
      val (nextFull, nextIds) = trackedCheckpoint(
        labels.select(col("id"), col("rep").as("__old"))
          .join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("__old"),
            least(col("__old"), coalesce(col("nbr_rep"), col("__old")))
              .as("rep")))
      val changed = nextFull.filter(not(col("rep") <=> col("__old"))).count()
      free(labelIds)
      labels = nextFull.select(col("id"), col("rep")); labelIds = nextIds
      converged = changed == 0
      iter += 1
    }
    free(edgeIds)
    // an unconverged result is silently-wrong dedup (one component
    // reported as several, wrong reps/sizes) — fail loudly instead;
    // callers with genuinely deep graphs raise maxIter
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          s"graph diameter exceeds maxIter; raise maxIter")
    val sizes = labels.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("rep")).select(col("id"), col("rep"), col("cluster_size"))
  }

  /** Incremental connected components: absorb a batch of NEW pairs
    * into an existing (id, rep[, cluster_size]) component state WITHOUT
    * rescanning the corpus pair graph — the components face of the
    * sign-once incremental near-dup lifecycle ([[bandIndex]] persists
    * signatures once, [[incrementalCandidates]] probes them per batch,
    * and this folds the resulting pairs into the cluster state).
    * Output is the full new state (id, rep, cluster_size), equal —
    * spec-pinned, min-reps included — to
    * `connectedComponents(oldPairs ∪ newPairs)` run from scratch.
    *
    * Why contraction is sound: every stored rep is the MINIMUM of its
    * component, and collapsing a connected component to a single node
    * preserves the connectivity of everything outside it, so running
    * components over only the rep-CONTRACTED new edges finds exactly
    * the merges, and the merged rep (min over old reps and new ids)
    * is the true global min.
    *
    * Scale shape: the batch endpoints join the state on id (bucket the
    * persisted state by id and these are index probes, not scans); the
    * iterative part runs on the CONTRACTED graph only — batch-sized,
    * never corpus-sized; and the state relabel is one BROADCAST map of
    * changed reps (the contracted output) applied in a single pass.
    * Unseen ids enter as their own reps. Sizes recompute with one
    * count over the new labels.
    *
    * The broadcast is GUARDED, not assumed: "batch-sized by
    * construction" holds for steady-state absorbs, but a backfill-sized
    * batch that merges a large fraction of stored components makes the
    * changed-rep map corpus-scale — the exact class of silent
    * forced-broadcast OOM [[graft.ops]] rails elsewhere (the
    * purgeIvfTombstones precedent). An oversize map fails loudly at
    * `maxBroadcastRows`; the remediation path is
    * `broadcastReps = false`, which relabels via a plain shuffle join
    * (AQE still broadcasts it when actually small) with identical
    * output. */
  def absorbComponents(state: DataFrame, newPairs: DataFrame,
                       maxIter: Int = 50,
                       lowDiameter: Boolean = true,
                       broadcastReps: Boolean = true,
                       maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    val st = Reliable.checkpoint(state.select(col("id"), col("rep")))
    // materialize the batch pairs ONCE: endpoints and the contracted
    // join below each read them, and the caller's pair-generation
    // lineage (MinHash signing + banding in the incremental-dedup
    // chain) is the expensive part — unmaterialized it ran once per
    // consumer (guide §1.2), measured as duplicate signing jobs in
    // q_incr_components
    val np = Reliable.checkpoint(newPairs.select(col("id_a"), col("id_b")))
    val endpoints = np.select(col("id_a").as("id"))
      .union(np.select(col("id_b").as("id"))).distinct()
    // each endpoint's current label: its stored rep, itself when unseen
    val labels = Reliable.checkpoint(
      endpoints.join(st, Seq("id"), "left")
        .select(col("id"), coalesce(col("rep"), col("id")).as("lab")))
    val contracted = np
      .join(labels.select(col("id").as("id_a"), col("lab").as("__la")), Seq("id_a"))
      .join(labels.select(col("id").as("id_b"), col("lab").as("__lb")), Seq("id_b"))
      .select(col("__la").as("id_a"), col("__lb").as("id_b"))
      .filter(not(col("id_a") <=> col("id_b"))).distinct()
    // the changed-rep map: old label -> merged component min.
    // Checkpointed so the size guard and BOTH relabel joins read one
    // computed copy of the contracted-CC output.
    val merged = Reliable.checkpoint(
      connectedComponents(contracted, maxIter, lowDiameter)
        .select(col("id").as("__old"), col("rep").as("__new")))
    val repMap =
      if (broadcastReps)
        broadcast(Guard.broadcastSmall(merged,
          "absorbComponents changed-rep map (batch-sized in steady state; " +
            "a backfill merging a large share of stored components makes " +
            "it corpus-scale — rerun with broadcastReps = false)",
          maxBroadcastRows))
      else merged
    val relabeled = st
      .join(repMap, st("rep") === col("__old"), "left")
      .select(st("id"), coalesce(col("__new"), st("rep")).as("rep"))
    val newcomers = labels
      .join(st.select(col("id")), Seq("id"), "left_anti")
      .join(repMap, col("lab") === col("__old"), "left")
      .select(col("id"), coalesce(col("__new"), col("lab")).as("rep"))
    val out = relabeled.unionByName(newcomers)
    val sizes = out.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    out.join(sizes, Seq("rep")).select(col("id"), col("rep"), col("cluster_size"))
  }

  /** Eager checkpoints materialize each round of an iterative graph
    * algorithm; track the RDD ids each LOCAL checkpoint persists so
    * superseded rounds can be freed immediately (the leak class that
    * degraded BENCH_r03/r04) instead of waiting for context-cleaner
    * GC. Reliable checkpoints (dir configured) persist nothing — their
    * files GC via spark.cleaner.referenceTracking.cleanCheckpoints or
    * dir cleanup, so the delta set is empty and free() is a no-op. */
  private def trackedCheckpoint(sc: org.apache.spark.SparkContext,
                                df: DataFrame): (DataFrame, Set[Int]) = {
    val before = sc.getPersistentRDDs.keySet
    val out = Reliable.checkpoint(df)
    (out, (sc.getPersistentRDDs.keySet -- before).toSet)
  }
  private def freePersisted(sc: org.apache.spark.SparkContext,
                            ids: Set[Int]): Unit =
    ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., SoCC'14) — the [[connectedComponents]] variant for graphs
    * whose DIAMETER is not small: round count is ~O(log n) in the node
    * count regardless of diameter, where min-label propagation pays one
    * round (one shuffle) per unit of diameter. Per round:
    *
    *  - LARGE-STAR: every node u links each STRICTLY LARGER neighbor to
    *    the minimum of its closed neighborhood min(Γ(u) ∪ {u}) —
    *    long chains collapse toward minima in halving strides (the
    *    pointer-doubling effect);
    *  - SMALL-STAR: edges orient toward the smaller endpoint, and every
    *    node links its smaller neighbors AND ITSELF to their minimum —
    *    consolidating the partial stars.
    *
    * Both steps are groupBy-min + join — per-node neighbor MINIMA, not
    * collected neighbor lists, so a high-degree hub costs a partial
    * aggregate, never an agg buffer. The edge set is checkpointed per
    * round (superseded rounds freed), and convergence is edge-set
    * fixpoint — two bounded anti-join emptiness probes. At the
    * fixpoint the edges ARE the component stars (u → component min),
    * proven terminal in the paper; output contract is identical to
    * [[connectedComponents]] (spec-pinned equal on random graphs and
    * on a diameter-1000 string-id path, the case min-label pays 1000
    * rounds for and this finishes in ≤ 2·log₂(n) + 2). */
  private def starComponents(pairs: DataFrame, maxIter: Int): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    var (edges, edgeIds) = trackedCheckpoint(sc,
      pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .filter(not(col("u") <=> col("v"))).distinct())
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star over the bidirectional neighborhood
      val nbrs = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("m"))
      val afterLarge = nbrs.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star over the toward-smaller orientation
      val oriented = afterLarge.select(
          greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
      val mins2 = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      val withMin = oriented.join(mins2, Seq("u"))
      val afterSmall = withMin.select(col("v").as("u"), col("m").as("v"))
        .union(withMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      val (next, nextIds) = trackedCheckpoint(sc, afterSmall)
      // one-job multiset equality per round (see ops.FrameEq) — the
      // symmetric exceptAll pair ran two actions per round
      converged = FrameEq.equalAsMultisets(next, edges)
      freePersisted(sc, edgeIds)
      edges = next; edgeIds = nextIds
      iter += 1
    }
    if (!converged) {
      freePersisted(sc, edgeIds)
      throw new IllegalStateException(
        s"starComponents did not converge in $maxIter rounds — raise maxIter")
    }
    // fixpoint edges are stars (u -> component min): non-min nodes read
    // their rep off their star edge, minima are their own rep
    val labels = edges.select(col("u").as("id"), col("v").as("rep"))
      .union(edges.select(col("v").as("id"), col("v").as("rep")))
      .distinct()
    val sizes = labels.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("rep"))
      .select(col("id"), col("rep"), col("cluster_size"))
  }

  /** 64-bit SimHash over word tokens: per-bit majority vote of each
    * token's xxhash64 bits. Fused kernel (graft.expr.catalyst.SimHash64)
    * — the declarative formulation below runs 64 interpreted aggregate
    * passes per row. */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.SimHash64(expression(text)))
  }

  /** Exact substring-span dedup (Lee et al. 2022, arXiv:2107.06499 —
    * "Deduplicating Training Data Makes Language Models Better",
    * public): find every w-token window whose content occurs >= 2 times
    * anywhere in the corpus, merge each document's duplicated window
    * positions into maximal [start, end) token spans, and strip the
    * covered tokens — the boilerplate/template remover document-level
    * near-dup cannot express (two long documents sharing one licence
    * paragraph are NOT near-dups, but the paragraph must go).
    *
    * The paper builds a corpus-wide suffix array; the Spark-native
    * shape is window fingerprints: every token position emits md5 of
    * its w-token window (computed map-side — window TEXT never
    * shuffles), duplicated fingerprints fall out of one fixed-width
    * (hash, count) aggregation, matching positions regroup doc-local,
    * and a fused kernel (expr.catalyst.MergeSpans) folds each doc's
    * sorted positions into spans. Two deliberate differences:
    * detection is at w-token window granularity (a duplicated run of
    * length L >= w is covered exactly by its L−w+1 duplicated windows,
    * so coverage is identical; runs shorter than w don't count by
    * definition), and ALL occurrences are stripped — the paper's
    * posture — rather than keeping one copy.
    *
    * Scale shapes: the detection shuffles carry (8-byte xxhash64) or
    * (id, int) rows, never text. The 64-bit window hash is safe HERE
    * (unlike [[graft.ops.Curation]]'s global line dedup, which keeps
    * sha2-256): a birthday collision between two unrelated windows
    * only marks those w-token windows as duplicated — a few spuriously
    * stripped tokens, ~n²/2^65 windows expected corpus-wide (≈1e-6 of
    * tokens at 2e13 windows) — it can never delete a whole distinct
    * line/document the way a colliding global line hash would. The
    * 4× narrower shuffle payload vs a 32-char md5 hex string is the
    * dominant cost at 100 TB, so the trade is taken on this path only. The one text-carrying exchange is the
    * final rejoin of spans onto the corpus: the span frame holds only
    * dup-BEARING docs, so Spark broadcasts it when it fits (no text
    * moves at all); past broadcast size the corpus shuffles by id
    * once — the unavoidable meeting point of text and its spans.
    * Per-doc position lists are bounded by document token count.
    * Output (id, n_tokens, dup_tokens, n_spans, spans, clean_text);
    * clean_text rejoins survivors with single spaces (the shared
    * [[graft.expr.Text.tokens]] whitespace-normalizing contract). */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     w: Int): DataFrame = {
    require(w >= 2, s"window width must be >= 2 tokens, got $w")
    val (base, wins) = windowFrame(df, idCol, textCol, w)
    val dupHash = wins.groupBy(col("h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select(col("h"))
    stripSpans(base, wins.join(dupHash, Seq("h"), "left_semi"), w, "dup_tokens")
  }

  /** (base, wins) for the token-window span family: base = (id,
    * __toks), wins = one (id, pos, h) row per w-token window with h
    * the 8-byte xxhash64 fingerprint (collision bound documented on
    * [[substringDedup]]). Shared by substring dedup and span-level
    * decontamination ([[Curation.decontaminateSpans]]). */
  private[ops] def windowFrame(df: DataFrame, idCol: String, textCol: String,
                               w: Int): (DataFrame, DataFrame) = {
    require(w >= 2, s"window width must be >= 2 tokens, got $w")
    val base = df.select(col(idCol).as("id"),
      graft.expr.Text.tokens(col(textCol)).as("__toks"))
    val wins = base.select(col("id"),
      posexplode(when(size(col("__toks")) >= w,
          transform(sequence(lit(0), size(col("__toks")) - lit(w)),
            i => xxhash64(array_join(slice(col("__toks"), i + lit(1), lit(w)), " "))))
        .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "h")))
    (base, wins)
  }

  /** The span tail shared by the window family: gather each doc's bad
    * window positions, merge into token spans (MergeSpans kernel), and
    * strip — output (id, n_tokens, `countCol`, n_spans, spans,
    * clean_text). `badWins` carries (id, pos) for every flagged
    * window. */
  private[ops] def stripSpans(base: DataFrame, badWins: DataFrame,
                              w: Int, countCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val spans = badWins
      .groupBy(col("id")).agg(sort_array(collect_list(col("pos"))).as("__ps"))
      .select(col("id"),
        column(graft.expr.catalyst.MergeSpans(expression(col("__ps")), w))
          .as("spans"))
    base.join(spans, Seq("id"), "left")
      .select(col("id"), size(col("__toks")).as("n_tokens"),
        coalesce(col("spans"),
          array().cast("array<struct<start:int,end:int>>")).as("spans"),
        col("__toks"))
      .select(col("id"), col("n_tokens"),
        aggregate(col("spans"), lit(0), (a, s) =>
          a + (s.getField("end") - s.getField("start"))).as(countCol),
        size(col("spans")).as("n_spans"),
        col("spans"),
        array_join(filter(col("__toks"), (t, i) =>
          !exists(col("spans"), s =>
            i >= s.getField("start") && i < s.getField("end"))), " ")
          .as("clean_text"))
  }

  /** Declarative reference formulation (kernel parity test only). */
  def simhash64Declarative(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      // per-bit vote: count of tokens with bit i set vs total
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)))
      when(votes * 2 > size(toks), lit(1L)).otherwise(lit(0L)) * lit(1L << i)
    }
    bits.reduce(_ + _)
  }
}
