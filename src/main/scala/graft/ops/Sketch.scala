package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketching: heavy hitters by count-min sketch cross-checked
  * against exact counts. The CMS is the fixed-memory, mergeable
  * frequency summary for key spaces too large to count exactly (the
  * companion of the HLL distinct sketch in q_approx_distinct); its
  * one-sided guarantee — estimate ≥ true, ≤ true + eps·N with
  * probability ≥ confidence — is surfaced as driver-visible booleans,
  * the same assertion-oracle posture as the other approximate ops.
  */
object Sketch {

  /** Keys carrying at least `support` of all rows, with exact counts
    * and CMS quality booleans. Fully lazy — one plan: an aggregation
    * builds (total, sketch) as a 1-row frame, broadcast to the exact
    * per-key counts (≤ 1/support heavy keys by definition), each probed
    * in place via the graft_cms_estimate expression. No driver-side
    * sketch handling, so the query is plan-gateable like every other
    * entry.
    *
    * NULL keys are excluded on BOTH sides (the CMS aggregate skips
    * them; excluding them from the exact counts keeps the bounds
    * comparison meaningful). Deterministic for a fixed `seed`, so the
    * booleans are stable to hash-compare. At 100 TB the exact groupBy
    * is the part you'd replace (sketch-probed candidates from a
    * sample); here it is the point — the oracle states the exact
    * counts the sketch must bound.
    */
  def heavyHittersCms(df: DataFrame, keyCol: String, support: Double,
                      eps: Double = 0.001, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    require(support > 0 && support < 1, "support must be in (0, 1)")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val in = df.filter(col(keyCol).isNotNull)
    val sk = in.agg(
      count(lit(1)).as("__total"),
      count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
        .as("__cms"))
    val est = column(graft.expr.catalyst.CmsEstimate(
      expression(col("__cms")), expression(col(keyCol))))
    in.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .filter(col("n") >= col("__total") * support)
      .select(col(keyCol), col("n"),
        (est >= col("n")).as("est_ge_exact"),
        (est <= col("n") + ceil(col("__total") * eps).cast("long"))
          .as("est_within_eps"))
  }

  /** Approximate distinct-value overlap between two frames' columns —
    * the join-planning question ("how many of A's keys exist in B?")
    * answered WITHOUT executing the join: one pass per side builds an
    * HLL sketch, union is register-wise max, and inclusion-exclusion
    * gives |A ∩ B| ≈ |A| + |B| − |A ∪ B|. Returns one row:
    * (nd_a, nd_b, nd_union, nd_intersect_est). Error compounds (three
    * estimates), so read the intersect as a planning signal, not a
    * count — the q_distinct_overlap gate bounds it against the exact
    * join at 10%. Both sketches are mergeable state: persist them (the
    * Profile state posture) and overlap checks between 100 TB drops
    * never rescan either side. */
  def distinctOverlap(a: DataFrame, aCol: String,
                      b: DataFrame, bCol: String): DataFrame = {
    val sa = a.agg(hll_sketch_agg(col(aCol)).as("sk_a"))
    val sb = b.agg(hll_sketch_agg(col(bCol)).as("sk_b"))
    sa.crossJoin(broadcast(sb)) // two 1-row frames
      .select(
        hll_sketch_estimate(col("sk_a")).as("nd_a"),
        hll_sketch_estimate(col("sk_b")).as("nd_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("nd_union"))
      .withColumn("nd_intersect_est",
        greatest(lit(0L), col("nd_a") + col("nd_b") - col("nd_union")))
  }

  /** Deterministic uniform m-sample per group — the mergeable quantile
    * sketch: keep the `m` rows whose salted xxhash64 of a UNIQUE row
    * id is smallest ([[graft.expr.catalyst.MinKByHash]]). A uniform
    * m-row sample answers any quantile to O(1/√m) rank error —
    * quantitatively, by Dvoretzky–Kiefer–Wolfowitz the sample CDF
    * satisfies P(sup|F_m − F| > ε) ≤ 2·exp(−2mε²), so the estimate's
    * TRUE rank stays within ε = 3/√m of the requested p except with
    * probability ≤ 2e⁻¹⁸ per draw (the hash sample is deterministic,
    * so a given corpus either holds the bound forever or never —
    * spec-pinned at m = 1024 against the exact CDF of the 600k-row
    * sf0.1 lineitem fixture across seven p values) — and
    * unlike reservoir sampling the winners are a pure function of the
    * ids — any partitioning, any arrival order, any engine picks the
    * same rows (a DuckDB ROW_NUMBER over the restated hash reproduces
    * the sample bit-for-bit, so the estimates are value-exact
    * cross-engine, not assertion-gated).
    *
    * Scale shape: map-side partial aggregation ships ≤ m entries per
    * (partition, group) through the shuffle — a 10^9-row group costs
    * O(n log m) compute and m rows of network, and persisted samples
    * merge associatively (min-k of a union == min-k of the min-ks),
    * the same absorb contract as the Profile/AggState family.
    *
    * `idCols` must identify rows UNIQUELY — hashing a non-unique
    * column silently turns the row sample into a distinct-value sample
    * and biases every quantile under heavy duplication. Rows with a
    * null id, or whose value is null AFTER the double cast (e.g. a
    * caller-supplied try_cast; under ANSI a malformed value fails the
    * cast loudly), are EXCLUDED from both the sample and `n_rows`
    * (xxhash64 SKIPS null children rather than returning null, which
    * would otherwise pile every null-id row onto one constant hash);
    * append a `lit(salt)` column to redraw the sample.
    *
    * Output: (groupCols..., n_rows, sample array<struct<h,v>> in
    * selection order (h asc, v asc)). */
  def minKSample(df: DataFrame, groupCols: Seq[String], idCols: Seq[Column],
                 value: Column, m: Int): DataFrame = {
    require(idCols.nonEmpty, "minKSample needs at least one id column")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // filter on the CAST value: a value that is non-null but casts to
    // null double (a non-numeric string) must be excluded from n_rows
    // AND the sample together, or the two desync
    val v = value.cast("double")
    val minK = column(graft.expr.catalyst.MinKByHash(
      expression(struct(xxhash64(idCols: _*).as("h"), v.as("v"))), m)
      .toAggregateExpression())
    df.filter(idCols.map(_.isNotNull).reduce(_ && _) && v.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), minK.as("sample"))
  }

  /** Seed the persisted min-k sample state at `statePath` (overwrite
    * semantics) — the quantile member of the mergeable-state family
    * (Profile/AggState posture): one bounded row per group. The layout
    * is manifest-versioned ([[StateStore]]): seeds and absorbs publish
    * atomically and concurrent readers are snapshot-isolated. */
  def writeSampleState(df: DataFrame, groupCols: Seq[String],
                       idCols: Seq[Column], value: Column, m: Int,
                       statePath: String): Unit =
    StateStore.seed(df.sparkSession, statePath, "writeSampleState")(
      "state" -> (d => minKSample(df, groupCols, idCols, value, m)
        .write.mode("overwrite").parquet(d)))

  /** Re-trim a frame of per-part samples — (groupCols..., n_rows,
    * sample) rows, one per (part, group) — back to ONE min-k row per
    * group: explode the samples, re-aggregate through the same min-k,
    * sum the counts. Associativity makes the result the one-shot
    * sample over every contributing part, bit-for-bit. THE single
    * definition of sample-merge semantics — [[absorbSampleState]] and
    * the q_quantile_sketch_merge in-plan pin both run this, so a tie
    * or trim change cannot desynchronize them. */
  def mergeSamples(parts: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val nTotal = parts.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"))
    val minK = column(graft.expr.catalyst.MinKByHash(
      expression(struct(col("e.h").as("h"), col("e.v").as("v"))), m)
      .toAggregateExpression())
    // explode_outer: a part row with an EMPTY sample still names its
    // group (the null entry is skipped by the aggregate's null
    // contract) — a plain explode would drop the group and the merge
    // would delete its n_rows from the state
    parts.select((groupCols.map(col) :+ explode_outer(col("sample")).as("e")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(minK.as("sample"))
      .join(nTotal, groupCols)
      .select((groupCols.map(col) :+ col("n_rows") :+ col("sample")): _*)
  }

  /** Absorb a batch into the stored sample: one min-k pass over the
    * BATCH, then a state-sized [[mergeSamples]] re-trim. The sampled
    * corpus is never rescanned. Publishes atomically as the next state
    * version (safe to retry blindly; concurrent readers pinned to the
    * prior version are untouched). */
  def absorbSampleState(batch: DataFrame, groupCols: Seq[String],
                        idCols: Seq[Column], value: Column, m: Int,
                        statePath: String): Unit =
    StateStore.absorbSingle(batch.sparkSession, statePath,
      "absorbSampleState") { st =>
      mergeSamples(
        st.select((groupCols.map(col) :+ col("n_rows") :+ col("sample")): _*)
          .unionByName(minKSample(batch, groupCols, idCols, value, m)),
        groupCols, m)
    }

  /** Read the persisted sample state back: (groupCols..., n_rows,
    * sample) — feed [[sampleQuantile]] for estimates. */
  def readSampleState(spark: org.apache.spark.sql.SparkSession,
                      statePath: String,
                      asOfVersion: Option[Long] = None): DataFrame =
    StateStore.readSingle(spark, statePath, version = asOfVersion)

  /** Quantile estimate from a [[minKSample]] sample column, running
    * EXACTLY the arithmetic of Spark's `Percentile` aggregate
    * (pos = p·(n−1); integral pos returns the value; otherwise the
    * two-sided weighting (ceil(pos)−pos)·v[floor] +
    * (pos−floor(pos))·v[ceil] — NOT the algebraically-equal-but-
    * FP-different lower + (higher−lower)·frac form), so estimates are
    * bit-identical to `percentile()` over the sampled values and the
    * oracle can mirror the steps. NULL on an empty sample. */
  def sampleQuantile(sample: Column, p: Double): Column = {
    require(p >= 0.0 && p <= 1.0, s"p must be in [0, 1], got $p")
    val vs = array_sort(transform(sample, s => s.getField("v")))
    val n = size(vs)
    val pos = lit(p) * (n - 1).cast("double")
    val lo = floor(pos)
    val hi = ceil(pos)
    when(n === 0, lit(null).cast("double")).otherwise(
      when(hi === lo, element_at(vs, lo.cast("int") + 1)).otherwise(
        (hi - pos) * element_at(vs, lo.cast("int") + 1) +
          (pos - lo) * element_at(vs, hi.cast("int") + 1)))
  }

  /** Normalization constants of the KMV sketch: a signed xxhash64 word
    * maps to u = (h + 2^63) / 2^64 ∈ [0, 1). Spliced as the SAME
    * double literals into the DuckDB oracle (`Double.toString` is the
    * shortest round-trip form), so the estimate arithmetic is
    * bit-identical cross-engine. */
  val KmvShift: Double = java.lang.Math.scalb(1.0, 63)
  val KmvScale: Double = java.lang.Math.scalb(1.0, 64)

  private def kmvU(h: Column): Column =
    (h.cast("double") + lit(KmvShift)) / lit(KmvScale)

  /** One-row KMV retained set for `key`: the k smallest DISTINCT
    * xxhash64 values ([[graft.expr.catalyst.MinKDistinctHashes]] —
    * map-side partials ship ≤ k longs per partition; a hot key
    * occupies ONE slot no matter how often it arrives). Null keys are
    * excluded (xxhash64 SKIPS null children — they would otherwise
    * collapse onto the seed hash as a phantom value). */
  private def kmvRetained(df: DataFrame, keyCol: String, k: Int): DataFrame =
    kmvOverHashes(
      df.filter(col(keyCol).isNotNull).select(xxhash64(col(keyCol)).as("__h")),
      col("__h"), k)

  /** Min-k distinct aggregation over an ALREADY-HASHED long column —
    * the re-trim primitive state absorption shares with the first
    * pass (the [[mergeSamples]] posture: min-k of a union == min-k of
    * the min-ks, bit for bit). */
  private def kmvOverHashes(df: DataFrame, h: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val minK = column(graft.expr.catalyst.MinKDistinctHashes(
      expression(h), k).toAggregateExpression())
    df.agg(minK.as("retained"))
  }

  /** The KMV distinct estimate from a retained array (shared by
    * [[kmvSetOps]] and the persisted-state reader): exact count when
    * unsaturated, (k−1)/θ otherwise. */
  def kmvEstimate(retained: Column, k: Int): Column =
    when(size(retained) >= k,
      lit((k - 1).toDouble) / kmvU(element_at(retained, k)))
      .otherwise(size(retained).cast("double"))

  /** KMV (k-minimum-values / theta) distinct set-operation estimates —
    * the sketch that answers what HLL cannot: |A ∩ B| and |A \ B|
    * DIRECTLY (one sided-error estimator each), not via
    * inclusion-exclusion whose errors compound, and DETERMINISTICALLY
    * — the retained sets are a pure function of the key sets, so the
    * estimates hash-match across engines (the DuckDB oracle reproduces
    * them bit-for-bit through the restated xxhash64), where HLL
    * register estimates can only be assertion-gated.
    *
    * Estimators (Beyer et al. 2007 / theta-sketch set ops): with
    * θ = u(k-th smallest hash) when saturated else 1,
    *   n̂(S)    = (k−1)/θ_S           (exact count when unsaturated)
    *   n̂(A∪B)  = same formula over the k smallest of the merged
    *             retained sets (every union value below the merged
    *             k-th is present in one of the inputs by construction)
    *   n̂(A∩B)  = |{h ∈ R_A ∩ R_B : u(h) < θ}| / θ,  θ = min(θ_A, θ_B)
    *   n̂(A\B)  = |{h ∈ R_A \ R_B : u(h) < θ}| / θ
    * Relative error ~ 1/√(k−2) per estimate. Scale shape: one agg per
    * side (≤ k longs shipped), a 1×1 cross join, pure array math —
    * nothing joins the corpora. The retained arrays are mergeable
    * state (min-k of unions), so persisted sketches absorb new batches
    * without rescanning — the Profile/AggState posture.
    *
    * Returns ONE row: (k, nd_a_est, nd_b_est, nd_union_est,
    * nd_intersect_est, nd_a_only_est), estimates rounded to 9 dp. */
  def kmvSetOps(a: DataFrame, aCol: String,
                b: DataFrame, bCol: String, k: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3 for the (k-1)/theta estimator, got $k")
    val ra = kmvRetained(a, aCol, k).withColumnRenamed("retained", "ra")
    val rb = kmvRetained(b, bCol, k).withColumnRenamed("retained", "rb")
    def theta(arr: Column): Column =
      when(size(arr) >= k, kmvU(element_at(arr, k))).otherwise(lit(1.0))
    def est(arr: Column): Column = kmvEstimate(arr, k)
    ra.crossJoin(rb)
      .withColumn("rm",
        slice(array_sort(array_distinct(concat(col("ra"), col("rb")))), 1, k))
      .withColumn("th", least(theta(col("ra")), theta(col("rb"))))
      .select(
        lit(k).as("k"),
        round(est(col("ra")), 9).as("nd_a_est"),
        round(est(col("rb")), 9).as("nd_b_est"),
        round(est(col("rm")), 9).as("nd_union_est"),
        round(size(filter(array_intersect(col("ra"), col("rb")),
            h => kmvU(h) < col("th"))).cast("double") / col("th"), 9)
          .as("nd_intersect_est"),
        round(size(filter(array_except(col("ra"), col("rb")),
            h => kmvU(h) < col("th"))).cast("double") / col("th"), 9)
          .as("nd_a_only_est"))
  }

  /** Pairwise corpus-overlap matrix — "how much does source A's key
    * set overlap source B's?", the question a training-mix curator
    * asks of every source pair before weighting them (double-counted
    * mass skews a mixture silently). ONE pass over the corpus builds a
    * KMV sketch PER GROUP (groupBy + the bounded
    * [[graft.expr.catalyst.MinKDistinctHashes]] aggregate — map-side
    * partials ship ≤ k longs per partition per group); every group
    * PAIR's estimates then come from the k-sized retained sets alone —
    * an all-pairs join over nGroups sketch rows, never the corpus.
    * nGroups is railed by `maxGroups` through [[Guard.broadcastSmall]]
    * (a high-cardinality group column would otherwise quietly schedule
    * nGroups² pair rows).
    *
    * Output per (group_a < group_b) pair: the [[kmvSetOps]] estimator
    * set plus `jaccard_est` = intersect / union computed from the
    * 9-dp-rounded estimates (so the division consumes bit-identical
    * inputs cross-engine — the calibration-report rounding contract).
    * Like kmvSetOps, every estimate is a pure function of the key
    * sets: value-exact cross-engine through the restated xxhash64
    * pipeline (q_kmv_matrix). */
  def kmvOverlapMatrix(df: DataFrame, keyCol: String, groupCol: String,
                      k: Int,
                      maxGroups: Int = 1000): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    require(k >= 3, s"k must be >= 3 for the (k-1)/theta estimator, got $k")
    val minK = column(graft.expr.catalyst.MinKDistinctHashes(
      expression(col("__h")), k).toAggregateExpression())
    // checkpoint the ≤ maxGroups sketch rows BEFORE the rail and the
    // self-join: the corpus-wide sketch aggregate (the expensive step)
    // must run once, not once per consumer
    val sketches = Guard.broadcastSmall(
      Reliable.checkpoint(
        df.filter(col(keyCol).isNotNull && col(groupCol).isNotNull)
          .select(col(groupCol).cast("string").as("__g"),
            xxhash64(col(keyCol)).as("__h"))
          .groupBy(col("__g")).agg(minK.as("retained"))),
      s"kmvOverlapMatrix sketches over group column '$groupCol'", maxGroups)
    def theta(arr: Column): Column =
      when(size(arr) >= k, kmvU(element_at(arr, k))).otherwise(lit(1.0))
    sketches.select(col("__g").as("group_a"), col("retained").as("ra"))
      .join(sketches.select(col("__g").as("group_b"), col("retained").as("rb")),
        col("group_a") < col("group_b"))
      .withColumn("rm",
        slice(array_sort(array_distinct(concat(col("ra"), col("rb")))), 1, k))
      .withColumn("th", least(theta(col("ra")), theta(col("rb"))))
      .withColumn("nd_union_est", round(kmvEstimate(col("rm"), k), 9))
      .withColumn("nd_intersect_est",
        round(size(filter(array_intersect(col("ra"), col("rb")),
          h => kmvU(h) < col("th"))).cast("double") / col("th"), 9))
      .select(col("group_a"), col("group_b"), lit(k).as("k"),
        round(kmvEstimate(col("ra"), k), 9).as("nd_a_est"),
        round(kmvEstimate(col("rb"), k), 9).as("nd_b_est"),
        col("nd_union_est"), col("nd_intersect_est"),
        round(when(col("nd_union_est") > 0,
            col("nd_intersect_est") / col("nd_union_est")).otherwise(0.0), 9)
          .as("jaccard_est"))
  }

  /** Seed the persisted KMV sketch state (overwrite semantics): one
    * row of (k, retained). The distinct-count member of the
    * mergeable-state family (Profile / AggState / min-k sample
    * posture) — a 100 TB corpus is hashed ONCE, and every later
    * overlap / growth question is answered from ≤ k longs. The layout
    * is manifest-versioned ([[StateStore]]): seeds and absorbs publish
    * atomically and concurrent readers are snapshot-isolated. */
  def writeKmvState(df: DataFrame, keyCol: String, k: Int,
                    statePath: String): Unit = {
    require(k >= 3, s"k must be >= 3, got $k")
    StateStore.seed(df.sparkSession, statePath, "writeKmvState")(
      "state" -> (d => kmvRetained(df, keyCol, k)
        .select(lit(k).as("k"), col("retained"))
        .coalesce(1).write.mode("overwrite").parquet(d)))
  }

  /** Absorb a batch into the stored sketch: one min-k pass over the
    * BATCH, then a ≤ 2k re-trim of the union — min-k over a distinct
    * set is associative, so the absorbed state is BIT-IDENTICAL to the
    * one-shot sketch over everything seen (spec-pinned and
    * driver-checked by q_kmv_incr); the sketched corpus is never
    * rescanned. Publishes atomically as the next state version under
    * the writer lock (r12 ADVICE made concurrent absorbs loud; the
    * manifest seam now also isolates readers and makes a failed absorb
    * safe to retry blindly). */
  def absorbKmvState(batch: DataFrame, keyCol: String,
                     statePath: String,
                     streamTag: Option[String] = None): Unit =
    StateStore.absorbSingle(batch.sparkSession, statePath,
      "absorbKmvState", streamTag = streamTag, coalesce1 = true) { st =>
      val k = st.select(col("k")).first().getInt(0)
      val unioned = st.select(explode(col("retained")).as("__h"))
        .unionByName(batch.filter(col(keyCol).isNotNull)
          .select(xxhash64(col(keyCol)).as("__h")))
      kmvOverHashes(unioned, col("__h"), k)
        .select(lit(k).as("k"), col("retained"))
    }

  /** Read the state back with its distinct estimate:
    * (k, n_kept, nd_est) — of the current version, or of an explicit
    * earlier one (time travel; valid until vacuum): "how many distinct
    * keys had we seen before this batch?" from the superseded
    * snapshot. */
  def readKmvState(spark: org.apache.spark.sql.SparkSession,
                   statePath: String,
                   asOfVersion: Option[Long] = None): DataFrame = {
    val st = StateStore.readSingle(spark, statePath, version = asOfVersion)
    val k = st.select(col("k")).first().getInt(0)
    st.select(col("k"), size(col("retained")).as("n_kept"),
      round(kmvEstimate(col("retained"), k), 9).as("nd_est"))
  }
}
