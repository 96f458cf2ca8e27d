package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.Vectors

/** Approximate-nearest-neighbor search operators (SURVEY §2.11 north
  * star). Two scale paths over brute force:
  *
  *  - multi-table hyperplane LSH (`lshTopK`): candidates = union over T
  *    tables of same-bucket vectors; shuffle payload is (int bucket, id).
  *  - IVF-Flat (`ivfTopK`): coarse-quantize every vector to its nearest
  *    of K centroid vectors, probe the nprobe nearest lists per query.
  *    Centroids broadcast; the corpus shuffles once on list id at build
  *    time and never again (at 100 TB the lists are the storage
  *    partitioning, so a probe reads nprobe/K of the data).
  *
  * Both return (qid, rank, nid, sim) for top-k by cosine, ranked
  * deterministically (sim desc, nid asc).
  */
object Ann {

  /** Brute-force cosine top-k — the correctness baseline. `queries` and
    * `corpus` are (id, vec) frames; queries must be small (the plan
    * broadcasts them — guarded loudly, `maxBroadcastRows`). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    val qg = Guard.broadcastSmall(queries, "bruteTopK query batch", maxBroadcastRows)
    val q = qg.select(col("id").as("qid"), col("vec").as("qv"),
      Vectors.l2Norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("nid"), col("vec").as("nv"),
      Vectors.l2Norm(col("vec")).as("nn"))
    rank(broadcast(q).join(c, col("qid") =!= col("nid")), k)
  }

  /** Hard-negative mining for retrieval training (the DPR/ANCE data
    * recipe, public: Karpukhin et al. 2020, Xiong et al. 2021): for
    * each query, the top-`k` nearest corpus vectors that are NOT the
    * query's labeled positives — the near-misses a dual encoder learns
    * the most from. `positives` is (qid, pos_id); `posPerQueryBound`
    * must bound positives per query (the retrieval depth is
    * k + posPerQueryBound so dropping every positive still leaves k
    * candidates — over-bounding only deepens the shortlist, never
    * changes the answer). Emits (qid, neg_rank, nid, sim), neg_rank
    * 1-based by exact cosine (sim desc, nid tie-break).
    *
    * Scale shape: one [[bruteTopK]] retrieval (query batch broadcast,
    * corpus streamed, bounded argmax-k through the shuffle), an anti
    * join against the positive pairs on (qid, nid), and a re-rank
    * window over the k+bound survivors PER QUERY — never the corpus.
    * [[hardNegativesIndexed]] is the same recipe with the retrieval
    * stage served by a persisted IVF index (partition-pruned probe
    * instead of a full corpus scan) — the anti-join + re-rank are
    * retrieval-size either way.
    *
    * The bound is VALIDATED (one bounded per-qid count aggregate over
    * the positives — query-batch-sized by contract): a query with more
    * positives than the bound would silently yield fewer than k
    * negatives, so it fails loudly here instead. */
  def hardNegatives(queries: DataFrame, positives: DataFrame,
                    corpus: DataFrame, k: Int,
                    posPerQueryBound: Int = 8): DataFrame = {
    require(k > 0 && posPerQueryBound >= 0, "bad k / positive bound")
    assertPositiveBound(positives, posPerQueryBound)
    negRerank(bruteTopK(queries, corpus, k + posPerQueryBound), positives, k)
  }

  /** [[hardNegatives]] served from a persisted [[writeIvfIndex]] layout
    * — the mining shape for a DPR-style job where the corpus is too
    * large to scan per batch: the candidate stage is a partition-pruned
    * [[probeIvfIndex]] at depth k + posPerQueryBound + depthSlack
    * (dropping every positive still leaves k candidates; slack deepens
    * the shortlist for recall headroom — nProbe is the primary recall
    * dial), and the anti-join + re-rank tail is identical to the brute
    * path. Sims are exact float cosines (IVF-Flat lists store float
    * vectors), so mined negatives rank bit-identically to a brute run
    * whenever the probe's candidate set contains them — driver-gated
    * by q_hard_negatives_ivf against the brute mining run. */
  def hardNegativesIndexed(queries: DataFrame, positives: DataFrame,
                           indexPath: String, k: Int,
                           posPerQueryBound: Int = 8, nProbe: Int = 4,
                           depthSlack: Int = 0): DataFrame = {
    require(k > 0 && posPerQueryBound >= 0 && depthSlack >= 0,
      "bad k / positive bound / depth slack")
    assertPositiveBound(positives, posPerQueryBound)
    negRerank(
      probeIvfIndex(queries, indexPath, k + posPerQueryBound + depthSlack,
        nProbe),
      positives, k)
  }

  /** Loud check that no query exceeds its declared positives-per-query
    * bound (the silent-undercount trap: every positive beyond the bound
    * eats one emitted negative). One bounded scalar read — the max of a
    * per-qid count — same posture as the watermark reads. */
  private def assertPositiveBound(positives: DataFrame, bound: Int): Unit = {
    val worst = positives.groupBy(col("qid")).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("m")).head().getLong(0)
    require(worst <= bound,
      s"a query has $worst labeled positives but posPerQueryBound=$bound — " +
        "the retrieval depth budgets k + bound candidates, so extra " +
        "positives would silently shrink the mined negative set; raise " +
        "posPerQueryBound to cover the worst query")
  }

  /** Shared mining tail: drop labeled positives from the ranked
    * shortlist, re-rank the survivors 1..k per query. Window cost is
    * per-query over k+bound rows — never corpus-sized. */
  private def negRerank(cand: DataFrame, positives: DataFrame,
                        k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rank"))
    cand
      .join(positives.select(col("qid"), col("pos_id").as("nid")),
        Seq("qid", "nid"), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("qid"), col("neg_rank"), col("nid"), col("sim"))
  }

  /** Multi-table LSH top-k. Queries broadcast (guarded). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nBits: Int = 4, nTables: Int = 12,
              maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    val qg = Guard.broadcastSmall(queries, "lshTopK query batch", maxBroadcastRows)
    val q = qg.select(col("id").as("qid"), col("vec").as("qv"),
        Vectors.l2Norm(col("vec")).as("qn"),
        Vectors.lshBuckets(col("vec"), nBits, nTables).as("qb"))
      .select(col("qid"), col("qv"), col("qn"), explode(col("qb")).as("bucket"))
    val c = corpus.select(col("id").as("nid"), col("vec").as("nv"),
        Vectors.l2Norm(col("vec")).as("nn"),
        Vectors.lshBuckets(col("vec"), nBits, nTables).as("cb"))
      .select(col("nid"), col("nv"), col("nn"), explode(col("cb")).as("bucket"))
    val cand = broadcast(q).join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("qn"), col("nid"), col("nv"), col("nn"))
      .dropDuplicates("qid", "nid")
    rank(cand, k)
  }

  /** Deterministic first-K-by-id centroid seed — the zero-cost fallback
    * and the k-means initialization. */
  def seedCentroids(corpus: DataFrame, nLists: Int): DataFrame =
    corpus.orderBy(col("id")).limit(nLists)
      .select(col("id").as("cid"), col("vec").as("cv"))

  /** Lloyd-iteration k-means over (id, vec) frames, expressed entirely
    * as DataFrame ops (VERDICT r2 item 4 — first-K seeding is a naive
    * default; recall at scale wants trained coarse centroids):
    *
    *   assign: nearest centroid by cosine (same metric the IVF probe
    *           uses — broadcast centroids, no corpus shuffle);
    *   update: element-wise mean per list via posexplode + groupBy
    *           (cid, pos) — the shuffle payload is (int, int, double)
    *           triples, n·dim rows, with map-side partial aggregation;
    *   empty lists keep their previous centroid (left-join coalesce).
    *
    * Each iteration extends one lazy plan (no driver-side vectors); for
    * deep training (iters >> 3) checkpoint between iterations. At
    * 100 TB, train on a sample — the IVF build then assigns the full
    * corpus once with the trained centroids, which is the expensive
    * step either way. Output column types match the corpus vec type
    * (float), so trained and seeded centroids are interchangeable.
    *
    * The returned frame is eagerly materialized ([[Reliable.checkpoint]]
    * of nLists rows): every consumer uses centroids at least twice
    * (assign + probe, or assign + objective join), and a lazy return
    * would re-run the whole Lloyd chain once PER USE — measured 2×+ on
    * the IVF/k-means queries. Same posture as
    * [[Dedup.connectedComponents]]'s per-round labels. */
  def trainCentroids(corpus: DataFrame, nLists: Int, iters: Int = 3,
                     metric: String = "cosine"): DataFrame = {
    var cents = seedCentroids(corpus, nLists)
    for (_ <- 1 to iters) {
      val assigned = nearestLists(cents,
        corpus.select(col("id").as("nid"), col("vec").as("nv")), "nid", "nv", 1,
        metric)
      // element-wise mean as ONE partial-aggregable kernel (VecMean,
      // r16 VERDICT item 5): the declarative posexplode form blew each
      // vector into n·dim (cid, pos, x) rows and paid TWO exchanges per
      // Lloyd round (hash by (cid, pos), then by cid to re-pack the
      // array); this is one exchange of per-partition (sum, count)
      // buffers and zero row expansion. Same double sums, same
      // sum/count division, skip-null-per-position semantics — value
      // drift is only partial-sum grouping (ULPs under the float cast),
      // oracle-gated at sf0.001/0.01/0.1 and ×10.
      val vecMean = {
        import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
        column(graft.expr.catalyst.VecMean(expression(col("nv")))
          .toAggregateExpression())
      }
      val means = assigned
        .groupBy(col("cid"))
        .agg(transform(vecMean, x => x.cast("float")).as("mv"))
      // materialize EVERY iteration (nLists rows), not just the last:
      // iteration i's lazy plan referenced iteration i−1's chain TWICE
      // (the packed-centroids broadcast agg AND the empty-list fallback
      // join), so each added iteration re-ran every prior one's full
      // corpus assignment + mean shuffle — the same once-per-use
      // recompute the final checkpoint exists for (guide §1.2). The
      // centroid VALUES are unchanged (assignment ties break on
      // (score, cid) — packed-array order independent), only the
      // recompute goes away.
      cents = Reliable.checkpoint(
        cents.join(means, Seq("cid"), "left")
          .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv")))
    }
    // the loop's last round already materialized; only the iters=0
    // degenerate call still needs the eager-return contract enforced
    if (iters <= 0) Reliable.checkpoint(cents) else cents
  }

  /** k-means cluster assignment: train (or take) centroids, assign
    * every vector to its nearest list by cosine → (id, cid). The
    * clustering counterpart of ivfTopK's build step, surfaced for
    * corpus organization (topic bucketing, per-cluster sampling,
    * cluster-stratified dedup). Broadcast centroids, no corpus
    * shuffle — embarrassingly parallel at any scale. Rows with a NULL
    * vector are EXCLUDED from the output (the kernel's null contract —
    * filter them beforehand to handle them differently). */
  def kmeansAssign(vecs: DataFrame, k: Int, iters: Int = 3,
                   centroidsOverride: Option[DataFrame] = None): DataFrame = {
    val cents = centroidsOverride.getOrElse(trainCentroids(vecs, k, iters))
    nearestLists(cents, vecs.select(col("id"), col("vec")), "id", "vec", 1)
      .select(col("id"), col("cid"))
  }

  /** Cluster-balanced corpus sampling — the diversity-balancing step of
    * a training-data pipeline (cap each topic/cluster so a dominant
    * mode cannot flood the mix; the cluster side of what
    * [[graft.ops.Curation.sourceMix]] does for labeled sources): assign
    * every vector to its nearest centroid, then keep at most `cap`
    * rows per cluster, selecting the LOWEST ids (deterministic,
    * engine-portable — a hashed order balances adversarial id
    * locality; pre-permute ids upstream if that matters). Emits
    * (id, cid) for the kept rows.
    *
    * Scale shape: assignment is the broadcast-centroids fused kernel
    * (no corpus shuffle); the cap is one shuffle of (id, cid) pairs by
    * cid with a bounded per-cluster sort window — fixed-width rows,
    * never vectors. */
  def clusterBalance(vecs: DataFrame, k: Int, cap: Int, iters: Int = 3,
                     centroidsOverride: Option[DataFrame] = None): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("id"))
    kmeansAssign(vecs, k, iters, centroidsOverride)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Nearest-`n` centroids per vector — the IVF assign/probe primitive.
    * `cents` is (cid, cv); centroid norms are computed here so seeded
    * and trained centroid frames share one contract; cid is emitted as
    * long. `metric`: "cosine" (the IVF family default) or "l2" (PQ
    * codebook training, where subvectors are not unit-norm and cosine
    * would collapse magnitude structure). */
  private def nearestLists(cents: DataFrame, df: DataFrame,
                           idc: String, vc: String, n: Int,
                           metric: String = "cosine"): DataFrame = {
    // centroids packed into ONE broadcast array value (cid, cv, norm),
    // then a per-row fused top-n pick (expr.catalyst.NearestCents) —
    // zero corpus shuffle and zero row expansion, where the previous
    // broadcast-join + row_number window shuffled n·k (id, vec, csim)
    // rows per assignment (and once per Lloyd iteration). The explode
    // emits each row's n picks in place; a NULL vector yields a NULL
    // pick list and drops here (documented on the kernel).
    val packed = cents.agg(collect_list(struct(
      col("cid").cast("long").as("cid"), col("cv"),
      Vectors.l2Norm(col("cv")).as("cn"))).as("__cents"))
    df.crossJoin(broadcast(packed))
      .select(col(idc), col(vc),
        explode(Vectors.nearestCents(col(vc), col("__cents"), n, metric))
          .as("cid"))
  }

  /** IVF-Flat top-k. Centroids come from, in precedence order:
    * `centroidsOverride`, k-means training (`trainIters` > 0), or the
    * deterministic first-K-by-id seed. An override must be a
    * (cid, cv) frame — the shape `seedCentroids`/`trainCentroids`
    * produce (NOT the corpus (id, vec) shape of earlier versions). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4,
              trainIters: Int = 0,
              centroidsOverride: Option[DataFrame] = None): DataFrame = {
    val cents = centroidsOverride.getOrElse(
      if (trainIters > 0) trainCentroids(corpus, nLists, trainIters)
      else seedCentroids(corpus, nLists))

    val assigned = nearestLists(cents,
      corpus.select(col("id").as("nid"), col("vec").as("nv")), "nid", "nv", 1)
    val probes = nearestLists(cents,
      queries.select(col("id").as("qid"), col("vec").as("qv")), "qid", "qv", nProbe)

    val cand = broadcast(
        probes.select(col("qid"), col("qv"),
          Vectors.l2Norm(col("qv")).as("qn"), col("cid")))
      .join(assigned.select(col("nid"), col("nv"),
        Vectors.l2Norm(col("nv")).as("nn"), col("cid")), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("qn"), col("nid"), col("nv"), col("nn"))
      .dropDuplicates("qid", "nid")
    rank(cand, k)
  }

  /** Recall-vs-nprobe sweep for an IVF configuration — the tuning
    * diagnostic that catches probe-count regressions the fixed-nprobe
    * recall gates cannot see (q_ann_ivf_sweep, VERDICT r9 item 5): one
    * row per probed depth with (nprobe, n_returned, n_hits, recall)
    * where hits are returned (qid, nid) pairs inside the EXACT
    * brute-force top-k and recall = n_hits / |truth pairs|.
    *
    * Cost shape: the corpus is assigned ONCE (checkpointed — the sweep
    * must not pay one assignment per probed depth) and the exact truth
    * is one brute top-k of the query batch; each sweep point then
    * re-probes only the tiny query side and joins the materialized
    * assignment. A monotone curve is guaranteed by construction
    * (probed cells are prefixes of one centroid ranking), so a
    * non-monotone committed artifact means the ranking itself
    * regressed. */
  def ivfNprobeSweep(queries: DataFrame, corpus: DataFrame, k: Int,
                     nLists: Int = 16,
                     nProbes: Seq[Int] = Seq(1, 2, 4, 8, 16),
                     trainIters: Int = 0,
                     centroidsOverride: Option[DataFrame] = None): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(p => p >= 1 && p <= nLists),
      s"nProbes must be within [1, nLists=$nLists], got $nProbes")
    val cents = centroidsOverride.getOrElse(
      if (trainIters > 0) trainCentroids(corpus, nLists, trainIters)
      else seedCentroids(corpus, nLists))
    val assigned = Reliable.checkpoint(
      nearestLists(cents,
          corpus.select(col("id").as("nid"), col("vec").as("nv")),
          "nid", "nv", 1)
        .select(col("nid"), col("nv"), Vectors.l2Norm(col("nv")).as("nn"),
          col("cid")))
    val truth = Reliable.checkpoint(
      bruteTopK(queries, corpus, k).select(col("qid"), col("nid")))
    val nTruth = truth.count()
    require(nTruth > 0,
      s"ivfNprobeSweep: brute-force truth is empty (query batch empty or " +
        s"corpus degenerate) — recall would be 0/0; fix the inputs instead " +
        s"of propagating NaN into the tuning decision")
    nProbes.map { p =>
      val probes = nearestLists(cents,
        queries.select(col("id").as("qid"), col("vec").as("qv")), "qid", "qv", p)
      val cand = broadcast(probes.select(col("qid"), col("qv"),
          Vectors.l2Norm(col("qv")).as("qn"), col("cid")))
        .join(assigned, Seq("cid"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("qv"), col("qn"), col("nid"), col("nv"), col("nn"))
        .dropDuplicates("qid", "nid")
      rank(cand, k)
        .join(truth.withColumn("__hit", lit(1L)), Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_returned"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
        .select(lit(p).cast("long").as("nprobe"), col("n_returned"), col("n_hits"))
    }.reduce(_ unionByName _)
      // round(x, 9): the committed sweep row must be reproducible across
      // comparison stacks — nprobe/n_returned/n_hits are integer-exact and
      // recall is the only double, so it follows the same 9-dp rounding
      // discipline as tv_dist/emd_dist (a raw n_hits/nTruth division can
      // differ in the last ulp between engines' formatting paths).
      .withColumn("recall",
        round(col("n_hits").cast("double") / lit(nTruth.toDouble), 9))
  }

  /** The tuning decision [[ivfNprobeSweep]] exists to drive: the
    * SMALLEST probed depth whose measured recall meets `targetRecall`
    * — one row (target_recall, nprobe, n_returned, n_hits, recall), or
    * EMPTY when no swept depth reaches the target (an explicit
    * "re-size nLists or deepen the sweep" signal, not a silent
    * best-effort pick). Probed cells are prefixes of one centroid
    * ranking, so recall is monotone in nprobe and the minimum is the
    * unique frontier point. */
  def recommendNprobe(queries: DataFrame, corpus: DataFrame, k: Int,
                      targetRecall: Double,
                      nLists: Int = 16,
                      nProbes: Seq[Int] = Seq(1, 2, 4, 8, 16),
                      trainIters: Int = 0,
                      centroidsOverride: Option[DataFrame] = None): DataFrame = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    val sweep = Reliable.checkpoint(ivfNprobeSweep(queries, corpus, k,
      nLists, nProbes, trainIters, centroidsOverride))
    sweep.filter(col("recall") >= targetRecall)
      .agg(min(col("nprobe")).as("nprobe"))
      .filter(col("nprobe").isNotNull)
      .join(sweep, Seq("nprobe"))
      .select(lit(targetRecall).as("target_recall"), col("nprobe"),
        col("n_returned"), col("n_hits"), col("recall"))
  }

  /** Two-stage int8-quantized top-k: scan the corpus in its QUANTIZED
    * form (4× less I/O and memory bandwidth than float32 — the scan is
    * the dominant cost of brute-force similarity at 100 TB), keep the
    * top k·rerankFactor candidates per query by quantized cosine, then
    * rerank only those candidates with exact float cosine. Per-vector
    * scales cancel inside a cosine, so the approximate stage needs no
    * dequantization; the exact stage's joins are candidate-sized.
    * Output contract matches bruteTopK: (qid, rank, nid, sim) with
    * EXACT sims — quantization affects which candidates are considered,
    * never the reported similarity. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    rerankFactor: Int = 4,
                    maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    def q8(v: Column): Column = Vectors.quantizeInt8(v).getField("q")
    val qg = Guard.broadcastSmall(queries, "quantizedTopK query batch", maxBroadcastRows)
    val qq = qg.select(col("id").as("qid"), q8(col("vec")).as("qv8"))
      .withColumn("qn8", Vectors.l2Norm(col("qv8")))
    val cq = corpus.select(col("id").as("nid"), q8(col("vec")).as("nv8"))
      .withColumn("nn8", Vectors.l2Norm(col("nv8")))
    val approxTop = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("sim8"), col("nid"))), k * rerankFactor)
      .toAggregateExpression())
    val cand = broadcast(qq).join(cq, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        when(col("qn8") > 0 && col("nn8") > 0,
          Vectors.dot(col("qv8"), col("nv8")) / (col("qn8") * col("nn8"))).as("sim8"))
      .groupBy(col("qid")).agg(approxTop.as("top"))
      .select(col("qid"), explode(col("top")).as("entry"))
      .select(col("qid"), col("entry.id").as("nid"))
    val qv = queries.select(col("id").as("qid"), col("vec").as("qv"),
      Vectors.l2Norm(col("vec")).as("qn"))
    val cv = corpus.select(col("id").as("nid"), col("vec").as("nv"),
      Vectors.l2Norm(col("vec")).as("nn"))
    // the candidate set is |queries|·k·rerankFactor rows — broadcast it
    // so the exact-rerank lookup never shuffles the corpus by nid
    rank(broadcast(cand.join(broadcast(qv), Seq("qid"))).join(cv, Seq("nid")), k)
  }

  /** Two-stage BINARY-quantized top-k — the 1-bit extreme of the
    * quantization family ([[quantizedTopK]] is the int8 point): pack
    * each vector's coordinate signs into dim/64 longs once
    * ([[graft.expr.Vectors.signPack]]), shortlist per query by sign
    * Hamming distance (xor + popcount — 64 coordinates per word op,
    * and a corpus 32× smaller than float32 on disk and the wire, the
    * first-stage bandwidth lever at 100 TB), then rerank only the
    * k·rerankFactor shortlist with exact float cosine. Sign-mismatch
    * count is a monotone angular-distance proxy (Charikar 2002), so
    * the shortlist ranks by NEGATED Hamming distance, ties to the
    * smaller nid. Output contract matches [[bruteTopK]]: (qid, rank,
    * nid, sim) with EXACT sims — quantization affects which candidates
    * are considered, never the reported similarity. Binary is the
    * lossiest stage of the family, so its recall gate (q_ann_binary_
    * recall) declares a deeper truth horizon than int8's. */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 rerankFactor: Int = 8,
                 maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val qg = Guard.broadcastSmall(queries, "binaryTopK query batch", maxBroadcastRows)
    val qb = qg.select(col("id").as("qid"), Vectors.signPack(col("vec")).as("qbits"))
    val cb = corpus.select(col("id").as("nid"), Vectors.signPack(col("vec")).as("nbits"))
    val approxTop = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("simb"), col("nid"))), k * rerankFactor)
      .toAggregateExpression())
    val cand = broadcast(qb).join(cb, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (-Vectors.hamming(col("qbits"), col("nbits")).cast("double")).as("simb"))
      .groupBy(col("qid")).agg(approxTop.as("top"))
      .select(col("qid"), explode(col("top")).as("entry"))
      .select(col("qid"), col("entry.id").as("nid"))
    val qv = queries.select(col("id").as("qid"), col("vec").as("qv"),
      Vectors.l2Norm(col("vec")).as("qn"))
    val cv = corpus.select(col("id").as("nid"), col("vec").as("nv"),
      Vectors.l2Norm(col("vec")).as("nn"))
    rank(broadcast(cand.join(broadcast(qv), Seq("qid"))).join(cv, Seq("nid")), k)
  }

  /** Random-projection two-stage top-k: Johnson–Lindenstrauss the
    * corpus to `outDim` dims (Achlioptas ±1 signs derived from the seed
    * on every executor — no matrix ships), rank candidates by projected
    * cosine, exact-rerank the k·rerankFactor shortlist in the original
    * space. The dimensionality lever of the approximate family: the
    * candidate scan costs outDim/dim of the float math and memory
    * bandwidth (64→16 = 4×, 768→64 = 12×), independent of any index
    * build — the right first cut when the corpus churns too fast to
    * maintain an IVF index. Same two-stage plan shape as
    * [[quantizedTopK]]; the recall gate is q_rp_recall. */
  def rpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             outDim: Int = 16, rerankFactor: Int = 4, seed: Long = 42L,
             maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    def proj(v: Column): Column = Vectors.randomProject(v, outDim, seed)
    val qg = Guard.broadcastSmall(queries, "rpTopK query batch", maxBroadcastRows)
    val qp = qg.select(col("id").as("qid"), proj(col("vec")).as("qp"))
      .withColumn("qpn", Vectors.l2Norm(col("qp")))
    val cp = corpus.select(col("id").as("nid"), proj(col("vec")).as("np"))
      .withColumn("npn", Vectors.l2Norm(col("np")))
    val approxTop = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("simp"), col("nid"))), k * rerankFactor)
      .toAggregateExpression())
    val cand = broadcast(qp).join(cp, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        when(col("qpn") > 0 && col("npn") > 0,
          Vectors.dot(col("qp"), col("np")) / (col("qpn") * col("npn"))).as("simp"))
      .groupBy(col("qid")).agg(approxTop.as("top"))
      .select(col("qid"), explode(col("top")).as("entry"))
      .select(col("qid"), col("entry.id").as("nid"))
    val qv = queries.select(col("id").as("qid"), col("vec").as("qv"),
      Vectors.l2Norm(col("vec")).as("qn"))
    val cv = corpus.select(col("id").as("nid"), col("vec").as("nv"),
      Vectors.l2Norm(col("vec")).as("nn"))
    rank(broadcast(cand.join(broadcast(qv), Seq("qid"))).join(cv, Seq("nid")), k)
  }

  /** Unit-normalize a float vector COLUMN IN A FRAME (zero vectors pass
    * through): on the unit sphere L2² = 2 − 2·cos, so PQ's L2-based ADC
    * ranks cosine-consistently. The norm is projected to an attribute
    * FIRST — a lambda that embedded `l2Norm(v)` directly would
    * re-evaluate the whole dot product per element (the O(dim²)
    * interpreted-HOF trap the int8 kernel exists to avoid). */
  private def unitNormalized(df: DataFrame, vc: String): DataFrame = {
    require(!df.columns.contains("__un"), "column __un is reserved")
    df.withColumn("__un", Vectors.l2Norm(col(vc)))
      .withColumn(vc, when(col("__un") > 0,
        transform(col(vc), x => (x / col("__un")).cast("float")))
        .otherwise(col(vc)))
      .drop("__un")
  }

  /** Per-subspace PQ codebooks trained with L2 Lloyd iterations over
    * the corpus's subvector slices (the [[trainCentroids]] machinery
    * with the L2 metric — cosine on subvectors would ignore the
    * magnitude structure PQ must preserve). Returns
    * codebooks(s)(c) = sub-centroid vector; shape m × nCodes × dim/m.
    *
    * The collect is bounded by construction (m·nCodes rows of dim/m
    * floats — ~1 KiB at 8×16×8), same class as the watermark/probed-cid
    * scalar reads. At 100 TB: train on a sample; encoding the full
    * corpus with the trained books is the one-pass cost that matters.
    */
  def trainPqCodebooks(corpus: DataFrame, m: Int, nCodes: Int,
                       iters: Int = 2): Array[Array[Array[Float]]] = {
    require(m >= 1 && nCodes >= 2, "need m >= 1 subspaces and nCodes >= 2")
    require(nCodes <= 128, "codes are stored as tinyint — nCodes <= 128")
    val dim = corpus.select(size(col("vec")).as("d")).limit(1).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide the vector dim $dim")
    val sub = dim / m

    // all m subspaces train in ONE grouped Lloyd job per iteration —
    // the sequential per-subspace formulation ran m separate training
    // chains (m× the driver round trips and job-launch overhead; was
    // the single slowest bench entry). Same math per subspace: first-K
    // seeds, L2 argmin assignment (ties → lowest cid), element means,
    // empty cells keep their previous centroid.
    val slices = corpus.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("vec"), s * lit(sub) + 1, lit(sub)))).as(Seq("s", "sv")))
    val seedIds = corpus.orderBy(col("id")).limit(nCodes)
      .select(col("id").as("cid"))
    var cents = slices.join(seedIds, col("id") === col("cid"))
      .select(col("s"), col("cid"), col("sv").as("cv"))
    for (_ <- 1 to iters) {
      // per-subspace packed codebooks, per-row L2 argmin (fused kernel;
      // m-row broadcast join) — no slice expansion, no window shuffle
      val packed = cents.groupBy(col("s")).agg(collect_list(struct(
        col("cid").cast("long").as("cid"), col("cv"),
        lit(0.0).as("cn"))).as("__cents"))
      val assigned = slices.join(broadcast(packed), Seq("s"))
        .select(col("s"),
          Vectors.nearestCents(col("sv"), col("__cents"), 1, "l2")
            .getItem(0).as("cid"),
          col("sv"))
      // one-exchange element-wise mean (VecMean — see trainCentroids):
      // replaces the posexplode → groupBy(s, cid, pos) → re-pack pair
      val subMean = {
        import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
        column(graft.expr.catalyst.VecMean(expression(col("sv")))
          .toAggregateExpression())
      }
      val means = assigned
        .groupBy(col("s"), col("cid"))
        .agg(transform(subMean, e => e.cast("float")).as("mv"))
      cents = cents.join(means, Seq("s", "cid"), "left")
        .select(col("s"), col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
    }
    // bounded collect: m·nCodes rows
    reshapeCodebooks(cents.orderBy(col("s"), col("cid")).collect(),
      _.getLong(1))
  }

  /** (s, cid-or-c, cv) rows → codebooks(s)(c) nested array — the ONE
    * reshape both the training tail and the persisted-index reader use
    * (`cid` is long in training output, int in the stored table, hence
    * the extractor). */
  private def reshapeCodebooks(rows: Array[org.apache.spark.sql.Row],
                               code: org.apache.spark.sql.Row => Long)
      : Array[Array[Array[Float]]] =
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(code).map(_.getSeq[Float](2).toArray).toArray)
      .toArray

  /** Two-stage product-quantized top-k (IVF-PQ's scoring half): the
    * candidate stage scans the corpus as m-byte PQ codes (32× less
    * bandwidth than 64 floats) ranked by ADC — each query precomputes
    * an (m × nCodes) exact-subdistance table, a candidate costs m
    * lookups — then the top k·rerankFactor rerank with exact float
    * cosine. Same contract as [[bruteTopK]]/[[quantizedTopK]]:
    * (qid, rank, nid, sim) with EXACT sims.
    *
    * ADC approximates L2 distance; for cosine ranking the inputs are
    * unit-normalized before encoding (L2² = 2 − 2·cos on the unit
    * sphere, so the orderings agree), and the rerank computes cosine
    * on the ORIGINAL vectors.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, nCodes: Int = 16, trainIters: Int = 2,
             rerankFactor: Int = 4,
             codebooksOverride: Option[Array[Array[Array[Float]]]] = None,
             maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows,
             autoDepth: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // materialize the normalization once: training references the
    // corpus per Lloyd iteration and the codes projection scans it
    // again — a lazy plan would re-run the per-element divide each time
    val normCorpus = Reliable.checkpoint(
      unitNormalized(corpus.select(col("id"), col("vec")), "vec"))
    val cbs = codebooksOverride.getOrElse(
      trainPqCodebooks(normCorpus, m, nCodes, trainIters))
    // stride comes from the ACTUAL codebooks — an override (or a corpus
    // smaller than nCodes, which under-fills the seed) may disagree
    // with the parameter, and a wrong stride mis-indexes every lookup
    val effCodes = cbs(0).length

    val qg = Guard.broadcastSmall(queries, "pqTopK query batch", maxBroadcastRows)
    val qt = unitNormalized(qg.select(col("id").as("qid"), col("vec")), "vec")
      .select(col("qid"),
        column(graft.expr.catalyst.PqAdcTable(
          expression(col("vec")), cbs)).as("tbl"))
    val codes = normCorpus.select(col("id").as("nid"),
      column(graft.expr.catalyst.PqEncode(expression(col("vec")), cbs)).as("codes"))
    val adist = column(graft.expr.catalyst.PqAdcDistance(
      expression(col("tbl")), expression(col("codes")), effCodes))

    // autoDepth — probeIvfIndexPq's occupancy dial applied to the
    // FULL-corpus ADC scan: ADC rank displacement accumulates like the
    // square root of the candidates scanned (independent per-code
    // quantization errors), and here a query scans the WHOLE corpus,
    // so the shortlist that holds recall at ~128 scanned vectors
    // deepens by sqrt(n/128). The r15 full-suite ×30 gate caught the
    // fixed factor missing true-top-k members at 30× density — the
    // same defect the r14 ×30 heavy gate caught in the IVF-PQ probe.
    // One count over the already-checkpointed corpus; the deepened
    // shortlist is still |queries|·k·effFactor broadcast rows.
    val effFactor =
      if (!autoDepth) rerankFactor
      else {
        val n = normCorpus.count()
        math.max(rerankFactor,
          math.ceil(rerankFactor * math.sqrt(n / 128.0)).toInt)
      }
    val approxTop = column(graft.expr.catalyst.TopKByScore(
      expression(struct(-col("adist").cast("double"), col("nid"))),
      k * effFactor).toAggregateExpression())
    val cand = broadcast(qt).join(codes, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), adist.as("adist"))
      .groupBy(col("qid")).agg(approxTop.as("top"))
      .select(col("qid"), explode(col("top")).as("entry"))
      .select(col("qid"), col("entry.id").as("nid"))
    val qv = queries.select(col("id").as("qid"), col("vec").as("qv"),
      Vectors.l2Norm(col("vec")).as("qn"))
    val cv = corpus.select(col("id").as("nid"), col("vec").as("nv"),
      Vectors.l2Norm(col("vec")).as("nn"))
    // candidate set is |queries|·k·effFactor rows — broadcast it so
    // the exact rerank never shuffles the corpus by nid. With autoDepth
    // the shortlist grows ~sqrt(n), so the query-batch guard above no
    // longer bounds this frame (r15 ADVICE): rail the EXACT arithmetic
    // bound (argmax-k emits at most nq·k·effFactor rows of known width;
    // nq is one count of the already-guarded small batch) — no extra
    // scan of the ADC lineage, no plan change.
    val dim = cbs.length.toLong * cbs(0)(0).length
    // the caller's explicit cap decision governs the rerank rail too —
    // a raised maxBroadcastRows must not be vetoed by the default
    Guard.broadcastBudget(qg.count() * k * effFactor, 48L + dim * 4,
      "pqTopK rerank candidate set", maxRows = maxBroadcastRows)
    rank(broadcast(cand.join(broadcast(qv), Seq("qid"))).join(cv, Seq("nid")), k)
  }

  /** Persist an IVF-Flat index as a manifest-versioned parquet layout
    * ([[graft.ops.IndexManifest]]): inverted-list segments PARTITIONED
    * BY list id (one directory per coarse cell) and a centroid table,
    * published by one atomic manifest commit. This is the claim "at
    * 100 TB the lists are the storage partitioning" made real: a probe
    * that touches nProbe of nLists cells reads nProbe directories from
    * disk — partition pruning, not a scan — and the corpus shuffles
    * exactly once, at build time.
    *
    * Probes PIN the manifest current when they open, so a concurrent
    * append/delete/purge (which only ever adds new segments plus a new
    * manifest) can never mix states mid-probe; crashes before a commit
    * change nothing, making every maintenance op blind-retry-safe.
    * Reclaim superseded segments with [[vacuumIvfIndex]].
    *
    * The expensive step (assigning every corpus vector to its nearest
    * centroid) runs here, once; `probeIvfIndex` then serves any number
    * of query batches against the layout without touching the corpus
    * assignment again — the vector-search twin of the band-index
    * posture in [[Dedup.bandIndex]]. */
  def writeIvfIndex(corpus: DataFrame, path: String, nLists: Int = 16,
                    trainIters: Int = 0,
                    centroidsOverride: Option[DataFrame] = None): Unit =
    writeIvfLayout(corpus, path, nLists, trainIters, centroidsOverride)(
      _.select(col("nid"), col("nv"), col("cid")))

  /** Shared layout builder for the float, SQ8 and PQ index variants —
    * centroid resolution, list assignment, the partitioned write and
    * the manifest commit exist ONCE; `project` picks the per-list
    * payload and `extra` carries variant-specific single-directory
    * components (the PQ codebooks) into the same atomic commit. */
  private def writeIvfLayout(corpus: DataFrame, path: String, nLists: Int,
                             trainIters: Int,
                             centroidsOverride: Option[DataFrame],
                             extra: Map[String, Seq[IndexManifest.Segment]] = Map.empty)(
      project: DataFrame => DataFrame): Unit = {
    val spark = corpus.sparkSession
    // the full rebuild is the documented crash-remediation path: a
    // stale lock left by a crashed append/delete/purge must not block it
    IndexLock.clearStale(spark, path)
    IndexLock.withLock(spark, path, "writeIvfIndex") {
      val base = if (IndexManifest.exists(spark, path))
        Some(IndexManifest.pin(spark, path)) else None
      val centSeg = IndexManifest.newSegment("centroids")
      val listSeg = IndexManifest.newSegment("lists")
      val cents = centroidsOverride.getOrElse(
        if (trainIters > 0) trainCentroids(corpus, nLists, trainIters)
        else seedCentroids(corpus, nLists))
      // the centroid-table write and the assigned-lists write both read
      // `cents` (nLists rows; trained centroids arrive checkpointed)
      // and are otherwise independent — overlap them (guide §2.6)
      Par.run(
        () => cents.coalesce(1).write.mode("overwrite").parquet(s"$path/$centSeg"),
        () => project(nearestLists(cents,
            corpus.select(col("id").as("nid"), col("vec").as("nv")), "nid", "nv", 1))
          .repartition(col("cid"))
          .write.mode("overwrite").partitionBy("cid").parquet(s"$path/$listSeg"))
      IndexManifest.commit(spark, path, base, Map(
        "centroids" -> Seq(IndexManifest.Segment(centSeg)),
        "lists" -> Seq(IndexManifest.Segment(listSeg)),
        "tombstones" -> Seq.empty[IndexManifest.Segment]) ++ extra)
    }
  }

  /** Observability for a persisted IVF layout: the manifest's
    * per-component segment/exclusion counts (the
    * [[graft.ops.TextIndex.describeBm25Index]] twin — n_segments
    * growing is the [[compactIvfIndex]] signal, exclusions the
    * [[vacuumIvfIndex]] signal). Pure metadata. */
  def describeIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    IndexManifest.describe(spark, path)

  /** The stored centroid table of a persisted IVF layout (current
    * manifest version) — the public face of the layout internals for
    * callers that re-run in-memory assignment against the same
    * geometry (q_ann_ivf_index's index==memory identity gate). */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    IndexManifest.pin(spark, path).readSingle(spark, "centroids")

  /** Shared probe front half over a PINNED snapshot: assign queries to
    * their nProbe nearest stored centroids (materialized once — the cid
    * collect and the candidate join would otherwise run the assignment
    * twice), push the probed list ids as a LITERAL partition filter
    * into every list segment, and return (probes, pruned lists). */
  private def prunedProbe(queries: DataFrame, snap: IndexManifest.Snapshot,
                          nProbe: Int,
                          maxTombstoneRows: Int = Guard.DefaultMaxBroadcastRows)
      : (DataFrame, DataFrame) = {
    val spark = queries.sparkSession
    val cents = snap.readSingle(spark, "centroids")
    val probes = Reliable.checkpoint(nearestLists(cents,
      queries.select(col("id").as("qid"), col("vec").as("qv")), "qid", "qv", nProbe))
    val cids = probes.select(col("cid")).distinct().collect().map(_.getLong(0))
    val raw = snap.read(spark, "lists", Some("cid")).get
      .filter(col("cid").isin(cids: _*))
    // logical deletes: rows tombstoned by deleteFromIvfIndex never
    // reach a probe — the anti join broadcasts the tombstone set
    // against only the probed partitions. The set is small BETWEEN
    // purges by contract, but nothing upstream bounds how many delete
    // batches accumulate, so the read goes through the broadcastSmall
    // rail: a caller streaming daily deletes without maintenance gets
    // a named failure pointing at purgeIvfTombstones instead of a
    // driver OOM deep inside the probe job.
    val lists = snap.tombstones(spark, "nid") match {
      case Some(t) =>
        raw.join(broadcast(Guard.broadcastSmall(t,
          s"IVF tombstone set at ${snap.root} (run purgeIvfTombstones " +
            "to compact accumulated deletes)",
          maxTombstoneRows)), Seq("nid"), "left_anti")
      case None => raw
    }
    (probes, lists)
  }

  /** Logical delete from a persisted IVF/SQ8/PQ layout — the
    * right-to-erasure maintenance op: the ids land as a tombstone
    * segment in the next manifest version and every probe path
    * anti-joins the pinned tombstone set (single seam —
    * [[probeIvfIndex]], the SQ8 and PQ probes all read through it), so
    * deletion is immediate and O(batch) regardless of index size; no
    * list partition is touched. Run [[purgeIvfTombstones]] on a
    * maintenance cadence to reclaim the space physically. Deleting ids
    * not present in the index is a no-op (the anti join simply never
    * matches). */
  def deleteFromIvfIndex(ids: DataFrame, path: String): Unit =
    IndexLock.withLock(ids.sparkSession, path, "deleteFromIvfIndex") {
      IndexManifest.appendTombstones(ids.sparkSession, path, ids, "nid")
    }

  /** Physically apply accumulated tombstones: one columnar (nid, cid)
    * scan over the lists finds the touched cells (bounded cid collect),
    * the kept rows of those cells land in ONE new list segment while
    * the old segments merely gain excluded-cell annotations in the next
    * manifest (cell-local: no stored file moves), and the tombstone
    * component empties — all published by one atomic commit, so a crash
    * at any earlier step changes nothing and the purge is blind-retry-
    * safe. Probe answers are identical before and after (spec-asserted)
    * — purge trades a bounded rewrite for smaller probes and a clean
    * slate. Returns the number of cells rewritten; reclaim superseded
    * segments with [[vacuumIvfIndex]]. */
  def purgeIvfTombstones(spark: org.apache.spark.sql.SparkSession,
                         path: String): Int =
    IndexLock.withLock(spark, path, "purgeIvfTombstones") {
      purgeIvfLocked(spark, path)
    }

  private def purgeIvfLocked(spark: org.apache.spark.sql.SparkSession,
                             path: String): Int = {
    val snap = IndexManifest.pin(spark, path)
    if (snap.segments("tombstones").isEmpty) return 0
    // checkpointed, not broadcast: this is the remediation path for an
    // over-accumulated tombstone set — the one input guaranteed to be
    // large exactly when this function is needed most; a forced
    // broadcast would die on the size cap while probes refuse. AQE
    // broadcasts it when actually small.
    val tomb = Reliable.checkpoint(snap.tombstones(spark, "nid").get)
    val lists = snap.read(spark, "lists", Some("cid")).get
    val touched = lists.join(tomb, Seq("nid"), "left_semi")
      .select(col("cid")).distinct().collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) {
      // tombstoned ids were never indexed: manifest-only commit
      IndexManifest.commit(spark, path, Some(snap), snap.components ++
        Map("tombstones" -> Seq.empty[IndexManifest.Segment]))
      return 0
    }
    val listSeg = IndexManifest.newSegment("lists")
    val kept = Reliable.checkpoint(
      lists.filter(col("cid").isin(touched: _*))
        .join(tomb, Seq("nid"), "left_anti"))
    IndexManifest.writeBucketed(kept, s"$path/$listSeg", "cid")
    val touchedSet = touched.toSet
    // annotate old segments with the rewritten cells; fully-excluded
    // segments drop so vacuum can reclaim them (shared erasure seam)
    val oldSegs = IndexManifest.excludeTouched(spark, path, snap,
      "lists", "cid", touchedSet)
    IndexManifest.commit(spark, path, Some(snap), snap.components ++ Map(
      "lists" -> (oldSegs :+ IndexManifest.Segment(listSeg)),
      "tombstones" -> Seq.empty[IndexManifest.Segment]))
    touched.length
  }

  /** Consolidate the accumulated append/purge segments of a persisted
    * IVF layout into one list segment — the segment-merge half of the
    * lifecycle: probes fan in over every segment, so a layout absorbing
    * many appends should compact on a maintenance cadence. Logical
    * state — pending tombstones included — is preserved verbatim.
    * Returns the number of segments consolidated away. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): Int =
    IndexLock.withLock(spark, path, "compactIvfIndex") {
      compactIvfLocked(spark, path)
    }

  private def compactIvfLocked(spark: org.apache.spark.sql.SparkSession,
                               path: String): Int = {
    val snap = IndexManifest.pin(spark, path)
    val nSegs = snap.segments("lists").size
    if (nSegs <= 1) return 0
    val listSeg = IndexManifest.newSegment("lists")
    IndexManifest.writeBucketed(
      snap.read(spark, "lists", Some("cid")).get, s"$path/$listSeg", "cid")
    IndexManifest.commit(spark, path, Some(snap), snap.components ++ Map(
      "lists" -> Seq(IndexManifest.Segment(listSeg))))
    nSegs - 1
  }

  /** Reclaim segments superseded by rebuilds/appends/purges/compacts
    * plus old manifest versions ([[IndexManifest.vacuum]]). Holds the
    * writer lock; callers own the reader-grace contract — probes pinned
    * to versions older than the current one lose their directories. */
  def vacuumIvfIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, keepVersions: Int = 1): Seq[String] =
    IndexLock.withLock(spark, path, "vacuumIvfIndex") {
      IndexManifest.vacuum(spark, path, keepVersions)
    }

  /** Top-k probe against a persisted [[writeIvfIndex]] layout. The
    * probed list ids are collected to the driver (≤ |queries|·nProbe
    * ints — the same bounded-scalar posture as the watermark reads in
    * ops.Incremental) and pushed as a LITERAL partition filter, so the
    * lists scan prunes to the probed directories at planning time —
    * verified by plan assertion in TextVectorSpec. Results are
    * identical to the in-memory `ivfTopK` with the same centroids. */
  def probeIvfIndex(queries: DataFrame, path: String, k: Int,
                    nProbe: Int = 4,
                    maxTombstoneRows: Int = Guard.DefaultMaxBroadcastRows,
                    asOfVersion: Option[Long] = None): DataFrame = {
    // asOfVersion: TIME-TRAVEL — probe an earlier committed snapshot
    // (valid until vacuumed); see IndexManifest.pin
    val snap = IndexManifest.pin(queries.sparkSession, path, asOfVersion)
    val (probes, lists) = prunedProbe(queries, snap, nProbe, maxTombstoneRows)
    val cand = broadcast(
        probes.select(col("qid"), col("qv"),
          Vectors.l2Norm(col("qv")).as("qn"), col("cid")))
      .join(lists.select(col("nid"), col("nv"),
          Vectors.l2Norm(col("nv")).as("nn"), col("cid")),
        Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("qn"), col("nid"), col("nv"), col("nn"))
      .dropDuplicates("qid", "nid")
    rank(cand, k)
  }

  /** IVF-SQ8: the [[writeIvfIndex]] layout with int8-quantized list
    * vectors — the production ANN shape for a 100 TB embedding corpus:
    * partition-pruned probes AND 4× smaller lists (the probe's I/O is
    * nProbe/nLists of a quarter-sized corpus). Stores (nid, nq) per
    * list; float vectors are NOT kept in the index — probes return
    * QUANTIZED cosines (per-vector scales cancel, so no dequantization
    * and no scale column is needed), with recall driver-gated via the
    * exact-sim recompute in q_ann_ivf_sq8_recall. */
  def writeIvfIndexSq8(corpus: DataFrame, path: String, nLists: Int = 16,
                       trainIters: Int = 0,
                       centroidsOverride: Option[DataFrame] = None): Unit =
    writeIvfLayout(corpus, path, nLists, trainIters, centroidsOverride)(
      _.select(col("nid"),
        Vectors.quantizeInt8(col("nv")).getField("q").as("nq"), col("cid")))

  /** Top-k probe of a [[writeIvfIndexSq8]] layout: the probed lists
    * read 4×-smaller int8 vectors with the same literal-partition-filter
    * pruning as [[probeIvfIndex]]; similarities are quantized cosines
    * (query side quantized symmetrically). */
  def probeIvfIndexSq8(queries: DataFrame, path: String, k: Int,
                       nProbe: Int = 4): DataFrame = {
    val snap = IndexManifest.pin(queries.sparkSession, path)
    val (probes, lists) = prunedProbe(queries, snap, nProbe)
    // quantize each query ONCE (probes carries nProbe rows per qid);
    // the per-cid probe rows join the quantized form back by qid
    val q8 = probes.select(col("qid"), col("qv")).dropDuplicates("qid")
      .select(col("qid"),
        Vectors.quantizeInt8(col("qv")).getField("q").as("qv8"))
      .withColumn("qn", Vectors.l2Norm(col("qv8")))
    val cand = broadcast(probes.select(col("qid"), col("cid")).join(q8, Seq("qid")))
      .join(lists.select(col("nid"), col("nq").as("nv8"), col("cid"))
          .withColumn("nn", Vectors.l2Norm(col("nv8"))),
        Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qv8").as("qv"), col("qn"),
        col("nid"), col("nv8").as("nv"), col("nn"))
      .dropDuplicates("qid", "nid")
    rank(cand, k)
  }

  /** IVF-BIN: the [[writeIvfIndex]] layout with the 1-bit sign
    * quantization of [[binaryTopK]] INSIDE the persisted lists —
    * completing the quantization matrix (float / SQ8 / PQ / BIN) in the
    * production layout (VERDICT r12 item 2). Lists store
    * (nid, bits, nv, cid): the candidate stage reads ONLY the packed
    * sign words out of the pruned partitions (parquet columnar
    * projection — 32× less bandwidth than float32, plan-asserted in
    * PqSpec), Hamming-shortlists per query, and the exact cosine rerank
    * reads the float column for the shortlist join alone. */
  def writeIvfIndexBin(corpus: DataFrame, path: String, nLists: Int = 16,
                       trainIters: Int = 0,
                       centroidsOverride: Option[DataFrame] = None): Unit =
    writeIvfLayout(corpus, path, nLists, trainIters, centroidsOverride)(
      _.select(col("nid"), Vectors.signPack(col("nv")).as("bits"),
        col("nv"), col("cid")))

  /** [[appendToIvfIndex]] for the [[writeIvfIndexBin]] layout: the
    * batch sign-packs exactly as the build does, so appended and
    * rebuilt lists answer probes identically. */
  def appendToIvfIndexBin(batch: DataFrame, path: String,
                          streamTag: Option[String] = None): Unit =
    appendToIvfLayout(batch, path, streamTag)(
      (_, a) => a.select(col("nid"), Vectors.signPack(col("nv")).as("bits"),
        col("nv"), col("cid")))

  /** Top-k probe of a [[writeIvfIndexBin]] layout: literal-partition-
    * filter pruning (as [[probeIvfIndex]]), xor+popcount Hamming
    * shortlist over the bits column only (fused
    * [[graft.expr.catalyst.HammingDistance]] kernel), exact cosine
    * rerank of the top k·rerankFactor against the lists' float column.
    * Output contract matches [[bruteTopK]]: (qid, rank, nid, sim) with
    * EXACT sims. rerankFactor defaults deeper than the PQ probe's —
    * 1-bit quantization is the lossiest point of the matrix. */
  def probeIvfIndexBin(queries: DataFrame, path: String, k: Int,
                       nProbe: Int = 4, rerankFactor: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val snap = IndexManifest.pin(queries.sparkSession, path)
    val (probes, lists) = prunedProbe(queries, snap, nProbe)
    val qb = probes.select(col("qid"), col("qv")).dropDuplicates("qid")
      .select(col("qid"), Vectors.signPack(col("qv")).as("qbits"))
    val approxTop = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("simb"), col("nid"))), k * rerankFactor)
      .toAggregateExpression())
    // candidate stage: bits column ONLY out of the pruned lists
    val shortlist = broadcast(
        probes.select(col("qid"), col("cid")).join(qb, Seq("qid")))
      .join(lists.select(col("nid"), col("bits"), col("cid")), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (-Vectors.hamming(col("qbits"), col("bits")).cast("double")).as("simb"))
      .dropDuplicates("qid", "nid")
      .groupBy(col("qid")).agg(approxTop.as("top"))
      .select(col("qid"), explode(col("top")).as("entry"))
      .select(col("qid"), col("entry.id").as("nid"))
    // exact rerank: float vectors for candidate rows only
    val qv = probes.select(col("qid"), col("qv")).dropDuplicates("qid")
      .withColumn("qn", Vectors.l2Norm(col("qv")))
    val cv = lists.select(col("nid"), col("nv"))
      .withColumn("nn", Vectors.l2Norm(col("nv")))
    rank(broadcast(shortlist.join(broadcast(qv), Seq("qid"))).join(cv, Seq("nid")), k)
  }

  /** IVF-PQ: the production 100 TB ANN layout — coarse partition
    * pruning AND product-quantized candidate payloads. Lists store
    * (nid, codes, nv) per coarse cell: the candidate stage projects
    * ONLY (nid, codes) out of the pruned partitions (parquet columnar
    * projection — m bytes of codes instead of the float vector,
    * plan-asserted in PqSpec), and the exact cosine rerank reads the
    * float column for the shortlist join. Codebooks are persisted
    * under `path/codebooks` so probes never retrain.
    *
    * Vectors are unit-normalized before encoding (same
    * cosine-consistency contract as [[pqTopK]]); the stored `nv` is
    * the ORIGINAL vector, so reranks report exact sims. */
  def writeIvfIndexPq(corpus: DataFrame, path: String, nLists: Int = 16,
                      m: Int = 8, nCodes: Int = 16,
                      trainIters: Int = 0, pqIters: Int = 2,
                      centroidsOverride: Option[DataFrame] = None): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val spark = corpus.sparkSession
    val cbs = trainPqCodebooks(
      Reliable.checkpoint(
        unitNormalized(corpus.select(col("id"), col("vec")), "vec")),
      m, nCodes, pqIters)
    val cbRows = for (s <- cbs.indices; c <- cbs(s).indices)
      yield (s, c, cbs(s)(c).toSeq)
    // the codebook segment rides the SAME atomic manifest commit as the
    // centroid/list segments — a crash anywhere leaves only orphans
    val cbSeg = IndexManifest.newSegment("codebooks")
    spark.createDataFrame(cbRows).toDF("s", "c", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$cbSeg")
    writeIvfLayout(corpus, path, nLists, trainIters, centroidsOverride,
      Map("codebooks" -> Seq(IndexManifest.Segment(cbSeg)))) { assigned =>
      unitNormalized(assigned.withColumn("__nvu", col("nv")), "__nvu")
        .select(col("nid"),
          column(graft.expr.catalyst.PqEncode(expression(col("__nvu")), cbs))
            .as("codes"),
          col("nv"), col("cid"))
    }
  }

  /** Read persisted PQ codebooks back into the kernel shape (bounded:
    * m·nCodes rows). */
  private def readCodebooks(spark: org.apache.spark.sql.SparkSession,
                            snap: IndexManifest.Snapshot): Array[Array[Array[Float]]] =
    reshapeCodebooks(
      snap.readSingle(spark, "codebooks")
        .orderBy(col("s"), col("c")).collect(),
      _.getInt(1).toLong)

  /** Top-k probe of a [[writeIvfIndexPq]] layout: literal-partition-
    * filter pruning (as [[probeIvfIndex]]), ADC over the codes column
    * only, exact cosine rerank of the top k·rerankFactor against the
    * lists' float column. Output contract matches [[bruteTopK]]:
    * (qid, rank, nid, sim) with EXACT sims. `autoDepth` deepens the
    * rerank shortlist by sqrt(avg list occupancy / 128) — the dial
    * that holds recall as the cells fill (the ×30 gate caught the
    * fixed factor missing true-top-k members at 30× density; ADC rank
    * displacement accumulates ~sqrt of the candidates scanned). */
  def probeIvfIndexPq(queries: DataFrame, path: String, k: Int,
                      nProbe: Int = 4, rerankFactor: Int = 4,
                      autoDepth: Boolean = false,
                      maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows)
      : DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // ONE pin: lists, tombstones AND codebooks come from the same
    // snapshot — a rebuild committing between reads cannot mismatch
    // codes and codebooks
    val snap = IndexManifest.pin(queries.sparkSession, path)
    val (probes, lists) = prunedProbe(queries, snap, nProbe)
    val cbs = readCodebooks(queries.sparkSession, snap)
    val nCodes = cbs(0).length
    // autoDepth: deepen the exact-rerank shortlist as the cells FILL —
    // the r14 ×30 gate caught the fixed dial missing true-top-k
    // members once lists held 30× the density it was tuned at. ADC's
    // rank displacement accumulates like the square root of the
    // candidates a probe scans (independent per-code quantization
    // errors), so the shortlist that holds recall at ~128 vectors per
    // cell deepens by sqrt(listLen/128). The count is metadata-only
    // (parquet footers over the pinned segments); the deepened
    // shortlist still feeds only |shortlist|·|queries| exact-rerank
    // rows — microscopic beside the candidate scan it guards.
    val effFactor =
      if (!autoDepth) rerankFactor
      else {
        val spark = queries.sparkSession
        val nVecs = snap.read(spark, "lists", Some("cid"))
          .map(_.count()).getOrElse(0L)
        val nCells = snap.readSingle(spark, "centroids").count()
        val avgLen = nVecs.toDouble / math.max(1L, nCells)
        math.max(rerankFactor,
          math.ceil(rerankFactor * math.sqrt(avgLen / 128.0)).toInt)
      }

    val qt = unitNormalized(
        probes.select(col("qid"), col("qv")).dropDuplicates("qid"), "qv")
      .select(col("qid"),
        column(graft.expr.catalyst.PqAdcTable(expression(col("qv")), cbs))
          .as("tbl"))
    val adist = column(graft.expr.catalyst.PqAdcDistance(
      expression(col("tbl")), expression(col("codes")), nCodes))
    val approxTop = column(graft.expr.catalyst.TopKByScore(
      expression(struct(-col("adist").cast("double"), col("nid"))),
      k * effFactor).toAggregateExpression())
    // candidate stage: codes column ONLY out of the pruned lists
    val shortlist = broadcast(
        probes.select(col("qid"), col("cid")).join(qt, Seq("qid")))
      .join(lists.select(col("nid"), col("codes"), col("cid")), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), adist.as("adist"))
      .dropDuplicates("qid", "nid")
      .groupBy(col("qid")).agg(approxTop.as("top"))
      .select(col("qid"), explode(col("top")).as("entry"))
      .select(col("qid"), col("entry.id").as("nid"))
    // exact rerank: float vectors for candidate rows only
    val qv = probes.select(col("qid"), col("qv")).dropDuplicates("qid")
      .withColumn("qn", Vectors.l2Norm(col("qv")))
    val cv = lists.select(col("nid"), col("nv"))
      .withColumn("nn", Vectors.l2Norm(col("nv")))
    // same rail as pqTopK (r15 ADVICE): autoDepth grows the shortlist
    // ~sqrt(list occupancy), so bound the rerank broadcast explicitly —
    // the exact arithmetic bound (argmax-k emits at most nq·k·effFactor
    // rows of qv-width), railed WITHOUT touching the pruned-candidate
    // lineage or its plan-gated codes-only scan.
    val dim = cbs.length.toLong * cbs(0)(0).length
    Guard.broadcastBudget(
      probes.select(col("qid")).dropDuplicates("qid").count() * k * effFactor,
      48L + dim * 4, "probeIvfIndexPq rerank candidate set",
      maxRows = maxBroadcastRows)
    rank(broadcast(shortlist.join(broadcast(qv), Seq("qid"))).join(cv, Seq("nid")), k)
  }

  /** Append a batch of new vectors to a persisted IVF layout WITHOUT
    * touching the stored corpus: assign the batch against the index's
    * stored (immutable-after-build) centroids — broadcast assignment,
    * no corpus read, no corpus shuffle — into a NEW list segment
    * published by one atomic manifest commit. This is the
    * daily-arrivals posture for a 100 TB embedding corpus: ingest cost
    * is |batch| assignment plus one segment write, the index never
    * rebuilds, stored segments are never touched (probes pinned
    * mid-append are unaffected), and a failed append is safe to retry
    * blindly — the vector twin of [[Dedup.incrementalCandidates]] over
    * the stored band index.
    *
    * Because assignment depends only on the stored centroids, the
    * appended layout answers probes IDENTICALLY (not approximately —
    * row for row) to rebuilding from scratch over corpus ∪ batch with
    * the same centroids; TextVectorSpec asserts probe-triple equality
    * against a rebuild and pins that stored segment directories keep
    * their exact file sets (q_ann_ivf_append benches the production
    * build+append+probe cycle with a recall gate). Callers own
    * id-uniqueness across appends (same contract as the build). */
  def appendToIvfIndex(batch: DataFrame, path: String,
                       streamTag: Option[String] = None): Unit =
    appendToIvfLayout(batch, path, streamTag)(
      (_, a) => a.select(col("nid"), col("nv"), col("cid")))

  /** [[appendToIvfIndex]] for the int8-quantized [[writeIvfIndexSq8]]
    * layout: the batch quantizes exactly as the build does, so appended
    * and rebuilt lists are byte-identical. */
  def appendToIvfIndexSq8(batch: DataFrame, path: String,
                          streamTag: Option[String] = None): Unit =
    appendToIvfLayout(batch, path, streamTag)(
      (_, a) => a.select(col("nid"),
        Vectors.quantizeInt8(col("nv")).getField("q").as("nq"), col("cid")))

  /** [[appendToIvfIndex]] for the [[writeIvfIndexPq]] layout: codes are
    * produced by the codebooks PERSISTED under the index (never
    * retrained), so an append leaves the ADC geometry untouched — the
    * property that makes incremental ingest safe for PQ. */
  def appendToIvfIndexPq(batch: DataFrame, path: String,
                         streamTag: Option[String] = None): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    appendToIvfLayout(batch, path, streamTag) { (snap, assigned) =>
      val cbs = readCodebooks(batch.sparkSession, snap)
      unitNormalized(assigned.withColumn("__nvu", col("nv")), "__nvu")
        .select(col("nid"),
          column(graft.expr.catalyst.PqEncode(expression(col("__nvu")), cbs))
            .as("codes"),
          col("nv"), col("cid"))
    }
  }

  /** Shared append half of [[writeIvfLayout]]: stored-centroid
    * assignment into a NEW list segment (existing segments untouched —
    * probes pinned mid-append are unaffected) published by one atomic
    * manifest commit, so a failed append is safe to retry blindly.
    *
    * `streamTag` makes the retry idempotent-CHECKABLE, not merely
    * retry-safe: the tag rides inside the commit's atomic publication,
    * and the check runs here UNDER the writer lock — so a redelivered
    * stream batch whose earlier attempt did commit (but died before its
    * exactly-once marker) is detected and skipped instead of
    * double-appending its lists segment. A zombie attempt that is still
    * mid-apply holds the lock (we refuse loudly); one that would commit
    * after our check has a stale manifest base and collides loudly. */
  private def appendToIvfLayout(batch: DataFrame, path: String,
                                streamTag: Option[String] = None)(
      project: (IndexManifest.Snapshot, DataFrame) => DataFrame): Unit =
    IndexLock.withLock(batch.sparkSession, path, "appendToIvfIndex") {
      val spark = batch.sparkSession
      // lambda: the manifest-store tag lookup must not run at all on the
      // (common) untagged batch-append path
      if (streamTag.exists(t => IndexManifest.hasCommittedTag(spark, path, t)))
        return
      val snap = IndexManifest.pin(spark, path)
      val cents = snap.readSingle(spark, "centroids")
      val listSeg = IndexManifest.newSegment("lists")
      IndexManifest.writeBucketed(
        project(snap, nearestLists(cents,
          batch.select(col("id").as("nid"), col("vec").as("nv")), "nid", "nv", 1)),
        s"$path/$listSeg", "cid")
      IndexManifest.commit(spark, path, Some(snap), snap.components ++ Map(
        "lists" ->
          (snap.segments("lists") :+ IndexManifest.Segment(listSeg))),
        tag = streamTag)
    }

  /** LSH-pruned embedding near-duplicate pairs — the scale path for the
    * all-pairs cosine-threshold baseline (q_embed_neardup): candidates
    * are same-bucket vector pairs under multi-table hyperplane LSH,
    * generated bucket-locally (groupBy + array combinatorics, the same
    * no-self-join shape as Dedup.minhashLshPairs), then confirmed by
    * exact cosine > threshold. Output (id_a < id_b, sim), distinct.
    *
    * At 100 TB: the shuffle key is an int bucket id; only same-bucket
    * vectors ever meet, so cost is Σ bucket² instead of n² — with the
    * recall/cost dial on (nBits, nTables). `maxBucket` is the skew
    * backstop (same posture as Dedup.minhashLshCandidates): a bucket
    * bigger than the cap — e.g. a mass of zero/padding vectors that
    * hash identically in every table — contributes NO pairs instead of
    * an O(bucket²) explosion; route such inputs to cluster-level
    * handling upstream.
    *
    * Bucket rows carry ONLY ids (VERDICT r2 item 6 — the earlier shape
    * collected full vectors per bucket, ~40 MB/row at 1024-dim ×
    * maxBucket=10000): candidate id-pairs are generated bucket-locally
    * from 8-byte ids (≤80 KB/row at the default cap regardless of
    * vector width), then vectors+norms join back by id for the exact
    * cosine confirm — two equi-joins sized by the CANDIDATE count, not
    * the corpus. */
  def nearDupPairsLsh(vecs: DataFrame, threshold: Double,
                      nBits: Int = 4, nTables: Int = 12,
                      maxBucket: Int = 10000,
                      targetOccupancy: Int = 0): DataFrame =
    nearDupCandidatesLsh(vecs, threshold, nBits, nTables, maxBucket,
      targetOccupancy).pairs

  /** Pairs + flagged oversized buckets — the [[Dedup.LshCandidates]]
    * posture for the vector path. */
  case class VecLshCandidates(pairs: DataFrame, flaggedBuckets: DataFrame)

  /** See [[nearDupPairsLsh]]; this variant also surfaces the diverted
    * flood buckets (bucket, n_ids, sample_ids). */
  def nearDupCandidatesLsh(vecs: DataFrame, threshold: Double,
                           nBits: Int = 4, nTables: Int = 12,
                           maxBucket: Int = 10000,
                           targetOccupancy: Int = 0): VecLshCandidates = {
    // Bucket-space sizing is the scale lever the sf1 smoke exposed: a
    // FIXED nBits means bucket occupancy grows linearly with the corpus
    // and bucket-local pair generation quadratically (2^4 buckets/table
    // held ~3k ids each at 50k vectors). With targetOccupancy > 0 the
    // hyperplane count grows with log2(n/target) — expected occupancy
    // stays ~constant, pair work stays ~linear. Costs one count() of
    // the corpus (metadata-cheap next to pair generation); 100 TB
    // callers who know n can pass nBits directly instead. Recall per
    // table drops as bits grow ((1−θ/π)^bits), which the nTables
    // OR-construction is exactly the hedge for — near-identical pairs
    // (the dedup target) collide in some table at any practical depth.
    val effBits =
      if (targetOccupancy <= 0) nBits
      else {
        val n = math.max(1L, vecs.count())
        val needed = math.ceil(
          math.log(n.toDouble / targetOccupancy) / math.log(2)).toInt
        math.min(24, math.max(nBits, needed)) // kernel supports nBits < 30
      }
    val banded = vecs.select(col("id"),
      explode(Vectors.lshBuckets(col("vec"), effBits, nTables)).as("bucket"))
    // SIZE buckets BEFORE collecting (the Dedup.divertOversized
    // posture): a zero/padding-vector flood hashing to one bucket in
    // every table would otherwise materialize its full membership in a
    // single collect_set buffer before the size filter could drop it.
    // Oversized buckets surface in the flagged side-output of
    // [[nearDupCandidatesLsh]] — a capped bucket IS a giant duplicate
    // cluster, not something to discard without a signal.
    val (safe, flagged) =
      Dedup.divertOversized(banded, Seq("bucket"), maxBucket)
    val buckets = safe
      .groupBy(col("bucket"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val idPairs = buckets
      .select(explode(Dedup.pairsFromSortedIds(col("ids"))).as("p"))
      .select(col("p.*"))
      .dropDuplicates("id_a", "id_b")
    val v = vecs.select(col("id"), col("vec"), Vectors.l2Norm(col("vec")).as("nrm"))
    val pairs = idPairs
      .join(v.select(col("id").as("id_a"), col("vec").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        when(col("na") > 0 && col("nb") > 0,
          Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") > threshold)
    VecLshCandidates(pairs, flagged)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — public): k-means the embedding corpus, then
    * look for semantic duplicates ONLY within each cluster, so the
    * candidate cost is Σ|cluster|² instead of n² — the cluster count
    * is the scale dial (100 TB wants k large enough that clusters
    * stay ~10⁴). Within a cluster, a vector is DROPPED when another
    * cluster member exceeds the cosine `threshold` AND dominates it:
    * higher similarity-to-centroid, ties broken on lower id. The
    * dominance rule is a strict total order, so the maximal element
    * of every duplicate group survives: kept rows contain NO
    * within-cluster pair above the threshold, and only rows with at
    * least one near-dup are ever dropped. (BOTH sides of a pair can
    * drop when each is dominated by a third near-dup — the guarantee
    * is per duplicate GROUP, not one-survivor-per-pair.)
    *
    * Plan shape: centroids broadcast for a PER-ROW fused top-1 pick
    * (expr.catalyst.NearestCents — no corpus shuffle, no row
    * expansion), then a shuffle of (id, vec, cent_sim) by cluster id
    * for the cluster-local self-join; the assignment is materialized
    * once ([[Reliable.checkpoint]]) because four downstream subtrees
    * consume it. AQE's skew-join split keeps a dense cluster from
    * pinning a task. Clusters larger than
    * `maxCluster` are excluded from pair generation and kept whole
    * (same loud-cap posture as [[nearDupPairsLsh]]'s `maxBucket`) —
    * a cluster that big means k is mis-sized for the corpus.
    *
    * Returns (id, cid, cent_sim, keep). Rows with a NULL vector are
    * EXCLUDED from the output entirely (the assignment kernel's null
    * contract) — a keep-list consumer that must retain them should
    * filter them out first and union them back.
    *
    * `autoScaleK` turns the cluster count into a FUNCTION of corpus
    * size: k grows to ceil(√n) (never below the passed `k`), the
    * BALANCE point of SemDeDup's two cost terms — assignment is
    * O(n·k·d) and cluster-local pairing is O(n²/k), so k ≈ √n keeps
    * both at O(n^1.5) where a FIXED k makes pairing quadratic (the
    * ×30 scale smoke measured it) and k ∝ n would make the
    * ASSIGNMENT quadratic instead. Same move as [[nearDupPairsLsh]]'s
    * `targetOccupancy`, adjusted for SemDeDup's paying an O(n·k)
    * assign that LSH does not. Costs one count() of the corpus;
    * 100 TB callers who know n can size k directly.
    *
    * Under `autoScaleK` the Lloyd iterations also train on a
    * deterministic 32·k-row hash-sample of the corpus (the paper's
    * own recipe — centroids only need the corpus DENSITY, not every
    * row), so training costs O(k²·d·iters) and the single full-corpus
    * assignment pass is the only O(n·k·d) term left. Measured at the
    * ×30 smoke: full-corpus training at k=√n paid 3 extra corpus
    * passes for centroids whose dedup output the sample reproduces
    * bit-identically (exact duplicates co-cluster under ANY centroid
    * set; the invariant suite is centroid-free). */
  def semDedup(vecs: DataFrame, k: Int, threshold: Double, iters: Int = 3,
               maxCluster: Int = 20000,
               centroidsOverride: Option[DataFrame] = None,
               autoScaleK: Boolean = false): DataFrame = {
    val (effK, trainVecs) =
      if (!autoScaleK || centroidsOverride.isDefined) (k, vecs)
      else {
        val n = math.max(1L, vecs.count())
        val kk = math.max(k, math.ceil(math.sqrt(n.toDouble)).toInt)
        val target = 32L * kk
        val tv =
          if (target >= n) vecs
          else {
            // deterministic Bernoulli sample: keep ids whose salted
            // xxhash64 lands under target/n of the hash ring — no
            // shuffle, no order sensitivity, stable across runs
            val den = 1L << 20
            val num = math.max(1L, (target * den) / n + 1L)
            val drawn = vecs.filter(
              pmod(xxhash64(col("id"), lit(0x5EEDL)), lit(den)) < num)
            // min-rows guard (ADVICE r9): the draw is binomial with no
            // floor — an unlucky sample on a small corpus could train
            // kk centroids on fewer than kk points. Under half the
            // target (or under kk rows), train on the full corpus;
            // costs one count of the SAMPLE, and the dedup invariant
            // is centroid-free either way (exact duplicates co-cluster
            // under any centroids), so this only removes variance.
            if (drawn.count() < math.max(kk.toLong, target / 2)) vecs
            else drawn
          }
        (kk, tv)
      }
    val cents = centroidsOverride.getOrElse(trainCentroids(trainVecs, effK, iters))
    val c = cents.select(col("cid"), col("cv"))
    // materialized: four downstream subtrees (cluster sizes, both
    // self-join sides, the final keep join) would otherwise each
    // re-run the n·k assignment expansion — exchange reuse saves only
    // the shuffle write, not the expand/sort above it
    val assigned = Reliable.checkpoint(
      nearestLists(c, vecs.select(col("id"), col("vec")),
          "id", "vec", 1)
        .join(broadcast(c), Seq("cid"))
        .select(col("id"), col("vec"), col("cid"),
          Vectors.l2Norm(col("vec")).as("nrm"),
          Vectors.cosine(col("vec"), col("cv")).as("cent_sim")))
    val small = assigned.join(
      assigned.groupBy(col("cid")).agg(count(lit(1)).as("__csz"))
        .filter(col("__csz") <= maxCluster).select(col("cid")),
      Seq("cid"), "left_semi")
    def side(sfx: String) = small.select(
      col("cid"), col("id").as(s"id_$sfx"), col("vec").as(s"v_$sfx"),
      col("nrm").as(s"n_$sfx"), col("cent_sim").as(s"cs_$sfx"))
    // only the dominated direction matters: (a, b) rows where b wins
    val droppedIds = side("a").join(side("b"),
        Seq("cid")).filter(col("id_a") =!= col("id_b") &&
        (col("cs_b") > col("cs_a") ||
          (col("cs_b") === col("cs_a") && col("id_b") < col("id_a"))))
      .filter(col("n_a") > 0 && col("n_b") > 0 &&
        Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))
          > threshold)
      .select(col("id_a").as("id")).distinct()
    assigned.join(droppedIds.withColumn("__drop", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cid"), col("cent_sim"),
        coalesce(col("__drop"), lit(false)).unary_!.as("keep"))
  }

  /** Cluster-size distribution of a [[semDedup]] output (or any frame
    * carrying a `cid` assignment) — the Σ|cluster|² instrumentation
    * ([[Scale.sizeDistribution]]): SemDeDup's candidate cost tracks the
    * cluster-size DISTRIBUTION, not corpus size, so this report is what
    * to watch (and what says k is mis-sized) as the corpus grows. One
    * aggregate over (cid, count) rows — never a data-row scan. */
  def clusterSizeReport(assigned: DataFrame): DataFrame =
    Scale.sizeDistribution(
      assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_ids")), "n_ids")

  /** Semantic decontamination — the embedding-level counterpart of the
    * n-gram `Curation.contamination` (the Llama-3-style recipe: drop
    * training documents that are semantically near an eval item even
    * when no n-gram matches). Flags every corpus vector whose cosine
    * to ANY benchmark vector reaches `tau`; emits
    * (id, bench_id, bench_sim, contaminated) with the NEAREST
    * benchmark item and its exact cosine, so the threshold can be
    * re-tuned from the output without a re-scan.
    *
    * Scale shape: benchmark sets are eval-suite-sized by nature, so
    * the bench side packs into ONE broadcast array (the nearestLists
    * posture, guarded loudly) and the corpus streams — per-row fused
    * O(|bench|·dim) work, zero shuffle, zero row expansion; at 100 TB
    * this is a map-only pass over the corpus. A null corpus vector is
    * KEPT with null bench_id/bench_sim and contaminated=false (the
    * conservative verdict — decontam must never silently drop rows;
    * flag-and-review is the caller's job). */
  def semanticDecontam(corpus: DataFrame, bench: DataFrame, tau: Double,
                       maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"tau must be a cosine in [-1, 1], got $tau")
    val bg = Guard.broadcastSmall(bench, "semanticDecontam benchmark",
      maxBroadcastRows)
    val packed = bg.agg(collect_list(struct(
      col("id").cast("long").as("cid"), col("vec").as("cv"),
      Vectors.l2Norm(col("vec")).as("cn"))).as("__bench"))
    val benchSide = bg.select(col("id").cast("long").as("bench_id"),
      col("vec").as("__bv"), Vectors.l2Norm(col("vec")).as("__bn"))
    corpus.select(col("id"), col("vec"),
        Vectors.l2Norm(col("vec")).as("__qn"))
      .crossJoin(broadcast(packed))
      .withColumn("bench_id",
        explode_outer(Vectors.nearestCents(col("vec"), col("__bench"), 1,
          "cosine")))
      .drop("__bench")
      .join(broadcast(benchSide), Seq("bench_id"), "left")
      .withColumn("bench_sim",
        when(col("__qn") > 0 && col("__bn") > 0,
          Vectors.dot(col("vec"), col("__bv")) / (col("__qn") * col("__bn"))))
      .select(col("id"), col("bench_id"), col("bench_sim"),
        coalesce(col("bench_sim") >= tau, lit(false)).as("contaminated"))
  }

  /** Rank candidate pairs by cosine, keep top k per query — via the
    * bounded argmax-k aggregate (expr.catalyst.TopKByScore): map-side
    * partial top-k, k rows per partition through the shuffle, no
    * per-group full sort (the window/row_number formulation sorts every
    * candidate; identical output ordering: sim desc, nid asc). Input
    * needs (qid, qv, qn, nid, nv, nn). */
  /** Distributed k-NN-graph construction by NN-descent (Dong, Moses &
    * Li, WWW 2011) — the graph-family member of the ANN matrix
    * (VERDICT r14 item 4): where IVF/PQ answer "nearest to a QUERY",
    * the k-NN graph answers "nearest to EVERY node" — the structure
    * SemDeDup-style clustering, graph-ANN serving layers, and
    * manifold/isolation analyses start from, and the one whose brute
    * construction is an O(n²) all-pairs join this build never runs.
    *
    * The algorithm is the paper's local-join iteration, re-expressed
    * as bounded Spark relational ops:
    *
    *  - **init**: each node's k starting neighbors are the next k
    *    nodes around a deterministic pseudo-random ring — the corpus
    *    ordered by an engine-neutral multiplicative hash of the id
    *    (Knuth 6.4: `(id mod 1000003) · 2654435761 mod 2^32`, id
    *    tie-break). The global rank comes from
    *    [[Scale.zipWithOrderedIndex]] (range-partition + per-partition
    *    offsets — no single-partition window), so the init is both
    *    scalable and restatable in plain SQL for the oracle.
    *  - **per round**: candidates for node v are its neighbors'
    *    neighbors through the UNDIRECTED graph — forward edges plus
    *    the top-`reverseCap` reverse edges per node (the paper's
    *    reverse sampling, made deterministic by taking the best by
    *    (sim DESC, id)); all ordered pairs within each node's
    *    neighborhood become candidate edges, deduped, scored by exact
    *    guarded cosine, and merged with the current lists through the
    *    bounded TopKByScore argmax (map-side combine, no per-node
    *    sort).
    *
    * Scale shape: every stage is bounded by construction — a node
    * contributes ≤ (k + reverseCap)² candidate pairs per round, so a
    * round is O(n·(k+reverseCap)²) edges flowing through hash
    * shuffles on node id, NEVER an all-pairs self-join; the vector
    * table is checkpointed once and joined per round. Empirically 2
    * rounds reach ~converged neighbor recall at fixture scale
    * (measured in AnnGraphSpec); the paper reports the same few-round
    * convergence at n in the millions.
    *
    * Returns the full graph (id, rank, nid, sim), rank 1..k by
    * (sim DESC, nid) per node. Determinism: every stage is
    * hash/rank/exact-float arithmetic — the driver oracle
    * (q_ann_graph) restates all rounds in DuckDB SQL and matches
    * hash-exactly. */
  def knnGraph(corpus: DataFrame, k: Int = 5, rounds: Int = 2,
               reverseCap: Int = 5): DataFrame = {
    require(k > 0 && rounds >= 0 && reverseCap >= 0,
      s"bad k=$k / rounds=$rounds / reverseCap=$reverseCap")
    val c = Reliable.checkpoint(corpus.select(col("id"), col("vec"),
      Vectors.l2Norm(col("vec")).as("nrm")))
    val n = c.count()
    require(n > k,
      s"corpus has $n rows — the ring init needs more than k=$k nodes")
    // deterministic pseudo-random ring over the hash-permuted id order
    val h = col("id") % lit(1000003L) * lit(2654435761L) % lit(4294967296L)
    val perm = Scale.zipWithOrderedIndex(
      c.select(col("id"), h.as("__h")), Seq(col("__h"), col("id")), "pos")
      .select(col("id"), col("pos"))
    val init = perm
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      .withColumn("npos", (col("pos") + col("j")) % lit(n))
      .join(perm.select(col("pos").as("npos"), col("id").as("nid")), Seq("npos"))
      .select(col("id"), col("nid"))
    var b = knnTopK(init, c, k)
    for (_ <- 1 to rounds) {
      val bcur = Reliable.checkpoint(b)
      val fwd = bcur.select(col("id"), col("nid"))
      // reverse sampling: per TARGET node, the reverseCap best sources
      // by (sim DESC, source id) — bounded argmax, no per-node sort.
      // reverseCap = 0 disables the stage (TopKByScore requires k > 0)
      // rather than crashing on a value the API permits.
      val u =
        if (reverseCap == 0) fwd.distinct()
        else {
          import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
          val revTop = column(graft.expr.catalyst.TopKByScore(
            expression(struct(col("sim"), col("id"))), reverseCap)
            .toAggregateExpression())
          val rev = bcur.groupBy(col("nid")).agg(revTop.as("top"))
            .select(col("nid").as("id"), explode(col("top")).as("entry"))
            .select(col("id"), col("entry.id").as("nid"))
          fwd.unionByName(rev).distinct()
        }
      // the local join: every ordered pair within a node's undirected
      // neighborhood is a candidate edge between those two neighbors
      val pairs = u.as("a").join(u.as("b"),
          col("a.id") === col("b.id") && col("a.nid") =!= col("b.nid"))
        .select(col("a.nid").as("id"), col("b.nid").as("nid"))
      val cand = fwd.unionByName(pairs).distinct()
      b = knnTopK(cand, c, k)
    }
    b
  }

  /** Persist a [[knnGraph]] as a manifest-versioned, bucket-partitioned
    * parquet layout for query-time BEAM-SEARCH serving (VERDICT r15
    * item 3 — the graph was an offline artifact with no probe path).
    * Components, published by one atomic [[IndexManifest]] commit:
    *
    *  - `adjacency`: the (id, rank, nid, sim) edge list PARTITIONED BY
    *    `bucket` = pmod(xxhash64(id), nBuckets) — a probe hop expands a
    *    bounded frontier, so it reads only the frontier's buckets
    *    (literal partition filters, the IVF-list pruning pattern); at
    *    100 TB the buckets are the storage partitioning and a hop
    *    touches |beam| of them, never the graph.
    *  - `vectors`: (id, vec, nrm) under the same bucketing — exact
    *    rerank vectors for candidate rows, pruned the same way.
    *  - `seeds`: the first `nSeeds` node ids of the SAME deterministic
    *    hash-ring permutation the build uses — engine-neutral, so the
    *    DuckDB oracle derives the identical entry points.
    *  - `meta`: one row of layout parameters (nBuckets is required by
    *    every probe; the rest is observability).
    *
    * `nSeeds` is the ENTRY-COVERAGE dial and the honest limit of the
    * design: a converged k-NN graph on clustered data is disconnected
    * ACROSS clusters (every neighbor is in-cluster), so beam search
    * reaches only clusters a seed lands in. Entry coverage must match
    * the data's modality — `nSeeds = 0` (default) auto-sizes to
    * ceil(sqrt(n)) (the IVF coarse-stage cost shape: the seed scoring
    * stage is |queries|·nSeeds exact sims, the same O(√n) per query as
    * probing √n centroids), and corpora with more modes than √n need
    * the dial raised (AnnGraphSpec pins recall 1.0 at 128 seeds over 25
    * clusters and documents the failure at 8). For geometry-adaptive
    * entries at extreme modality, IVF-PQ remains the terminal serving
    * layout; the graph index completes the family for graph-shaped
    * workloads (neighborhood expansion, dedup clustering, hybrid
    * rerank).
    *
    * Probes pin the manifest, so rebuilds never mix states mid-probe
    * (same contract as [[writeIvfIndex]]). */
  def writeGraphIndex(corpus: DataFrame, path: String, k: Int = 5,
                      rounds: Int = 2, reverseCap: Int = 5,
                      nBuckets: Int = 16, nSeeds: Int = 0): Unit = {
    require(nBuckets > 0 && nSeeds >= 0, s"bad nBuckets=$nBuckets / nSeeds=$nSeeds")
    val spark = corpus.sparkSession
    IndexLock.clearStale(spark, path)
    IndexLock.withLock(spark, path, "writeGraphIndex") {
      val base = if (IndexManifest.exists(spark, path))
        Some(IndexManifest.pin(spark, path)) else None
      val adjSeg = IndexManifest.newSegment("adjacency")
      val vecSeg = IndexManifest.newSegment("vectors")
      val seedSeg = IndexManifest.newSegment("seeds")
      val metaSeg = IndexManifest.newSegment("meta")
      val bucket = pmod(xxhash64(col("id")), lit(nBuckets.toLong)).as("bucket")
      // the adjacency (NN-descent build), vectors, and seeds components
      // are mutually independent — overlap their writes (guide §2.6:
      // the vectors/seeds jobs back-fill the long adjacency build's
      // tails); the meta write needs effSeeds and rides the seeds thunk
      val effSeeds =
        if (nSeeds > 0) nSeeds
        else math.max(4, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)
      import spark.implicits._
      Par.run(
        () => knnGraph(corpus, k, rounds, reverseCap)
          .select(col("id"), col("rank"), col("nid"), col("sim"), bucket)
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/$adjSeg"),
        () => corpus.select(col("id"), col("vec"),
            Vectors.l2Norm(col("vec")).as("nrm"), bucket)
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/$vecSeg"),
        () => {
          // entry points: the build's own hash-ring permutation, so a
          // probe (and the oracle) starts from nodes any engine can
          // re-derive; nSeeds = 0 auto-sized to ceil(sqrt(n)) above
          val h = col("id") % lit(1000003L) * lit(2654435761L) % lit(4294967296L)
          Scale.zipWithOrderedIndex(
              corpus.select(col("id"), h.as("__h")), Seq(col("__h"), col("id")), "pos")
            .filter(col("pos") < effSeeds).select(col("id").as("nid"))
            .coalesce(1).write.mode("overwrite").parquet(s"$path/$seedSeg")
          Seq((nBuckets, k, rounds, reverseCap, effSeeds))
            .toDF("n_buckets", "k", "rounds", "reverse_cap", "n_seeds")
            .coalesce(1).write.mode("overwrite").parquet(s"$path/$metaSeg")
        })
      IndexManifest.commit(spark, path, base, Map(
        "adjacency" -> Seq(IndexManifest.Segment(adjSeg)),
        "vectors" -> Seq(IndexManifest.Segment(vecSeg)),
        "seeds" -> Seq(IndexManifest.Segment(seedSeg)),
        "meta" -> Seq(IndexManifest.Segment(metaSeg))))
    }
  }

  /** Top-k probe of a [[writeGraphIndex]] layout by distributed beam
    * search: score the stored seeds against every query, then `hops`
    * times expand the per-query best-`beamWidth` frontier through the
    * pruned adjacency partitions, exact-score only the NEW candidates,
    * and keep the accumulated top-k. All stages are bounded —
    * |queries|·beamWidth frontier rows join bucket-pruned edge
    * partitions (never the whole graph), candidates are
    * |frontier|·degree before the anti-join drops already-scored rows —
    * and every tie breaks (sim DESC, nid), so the probe is
    * deterministic end to end and a fixed-hop run restates in SQL
    * (q_ann_graph_search matches hash-exactly). Output contract matches
    * [[bruteTopK]]: (qid, rank, nid, sim) with EXACT sims.
    *
    * Fixed `hops` (not convergence-stopping) is the deliberate choice:
    * it bounds probe latency, keeps the plan deterministic for the
    * oracle, and at beamWidth≥k the two-hop neighborhood of the seed
    * ring already covers the graph diameter NN-descent leaves (the
    * AnnGraphSpec clustered-corpus gate pins recall 1.0). */
  def probeGraphIndex(queries: DataFrame, path: String, k: Int,
                      beamWidth: Int = 8, hops: Int = 2,
                      maxBroadcastRows: Int = Guard.DefaultMaxBroadcastRows)
      : DataFrame = {
    require(k > 0 && beamWidth > 0 && hops >= 0,
      s"bad k=$k / beamWidth=$beamWidth / hops=$hops")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val spark = queries.sparkSession
    val snap = IndexManifest.pin(spark, path)
    // cached head-row read — meta is one immutable row per snapshot
    // (r17 item 4): repeat probes of one layout skip the collect job
    val meta = snap.headRow(spark, "meta")
    val nBuckets = meta.getAs[Int]("n_buckets").toLong
    val qg = Guard.broadcastSmall(queries, "probeGraphIndex query batch",
      maxBroadcastRows)
    val qv = Reliable.checkpoint(qg.select(col("id").as("qid"),
      col("vec").as("qv"), Vectors.l2Norm(col("vec")).as("qn")))
    val vecs = snap.read(spark, "vectors", Some("bucket")).get
    val adj = snap.read(spark, "adjacency", Some("bucket")).get
    def bucketOf(c: Column): Column = pmod(xxhash64(c), lit(nBuckets))
    // collect a bounded (qid, nid) frontier TOGETHER WITH each nid's
    // bucket in ONE job (r16 VERDICT item 6: the hop loop previously
    // checkpointed a frontier and then ran a SECOND job to collect its
    // buckets — per hop that was 5 actions; this shape is 3). The
    // collected rows are bounded by the same exact-arithmetic rails
    // that bound their broadcast (they ARE the broadcast side), and
    // come back as a local frame so downstream joins re-broadcast them
    // without recompute. Using each frontier's OWN bucket set keeps the
    // partition pruning exact; any superset would only widen the
    // pruned scan, never change the join result.
    final case class Frontier(rows: DataFrame, buckets: Seq[Long], isEmpty: Boolean)
    def collectFrontier(df: DataFrame): Frontier = {
      val sel = df.select(col("qid"), col("nid"), bucketOf(col("nid")).as("__b"))
      val rows = sel.collect()
      val schema = org.apache.spark.sql.types.StructType(sel.schema.fields.take(2))
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          org.apache.spark.sql.Row(r.get(0), r.get(1))): _*), schema)
      Frontier(local, rows.map(_.getLong(2)).distinct.toSeq, rows.isEmpty)
    }
    // exact guarded cosine for a collected (qid, nid) candidate
    // frontier against the candidates' pruned vector partitions.
    def score(f: Frontier): DataFrame = {
      val cv = vecs.filter(col("bucket").isin(f.buckets: _*))
        .select(col("id").as("nid"), col("vec").as("nv"), col("nrm").as("nn"))
      broadcast(f.rows.join(broadcast(qv), Seq("qid"))).join(cv, Seq("nid"))
        .select(col("qid"), col("nid"),
          when(col("qn") > 0 && col("nn") > 0,
            Vectors.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
            .as("sim"))
    }
    // exact arithmetic rails (the pqTopK autoDepth lesson): the seed
    // stage broadcasts |queries|·nSeeds rows and each hop at most
    // |queries|·beamWidth·k rows, every row carrying the query vector —
    // with auto-sized seeds (ceil(sqrt(n))) a large corpus plus a large
    // batch silently exceeds any replication budget without this. The
    // same bounds cap what collectFrontier pulls to the driver. ONE
    // job for both scalars (count + max dim) instead of two.
    val qstats = qv.agg(count(lit(1)).as("n"),
      max(size(col("qv"))).as("d")).head()
    val nq = qstats.getLong(0)
    val qdim = if (qstats.isNullAt(1)) 0L else qstats.getInt(1).toLong
    val rowBytes = 48L + qdim * 4
    Guard.broadcastBudget(nq * meta.getAs[Int]("n_seeds"), rowBytes,
      "probeGraphIndex seed candidate set", maxRows = maxBroadcastRows)
    Guard.broadcastBudget(nq * beamWidth * meta.getAs[Int]("k"), rowBytes,
      "probeGraphIndex hop candidate set", maxRows = maxBroadcastRows)
    val seeds = snap.readSingle(spark, "seeds") // (nid), tiny
    val seedCand = collectFrontier(
      qv.select(col("qid")).crossJoin(broadcast(seeds))
        .filter(col("nid") =!= col("qid")))
    var acc = Reliable.checkpoint(score(seedCand))
    for (_ <- 1 to hops) {
      val beamTop = column(graft.expr.catalyst.TopKByScore(
        expression(struct(col("sim"), col("nid"))), beamWidth)
        .toAggregateExpression())
      // one collect: the per-query beam and its buckets together
      val beam = collectFrontier(
        acc.groupBy(col("qid")).agg(beamTop.as("top"))
          .select(col("qid"), explode(col("top")).as("e"))
          .select(col("qid"), col("e.id").as("nid")))
      val edges = adj.filter(col("bucket").isin(beam.buckets: _*))
        .select(col("id").as("nid"), col("nid").as("cand"))
      // one collect: the deduped, not-yet-scored candidates + buckets
      val cand = collectFrontier(
        broadcast(beam.rows).join(edges, Seq("nid"))
          .select(col("qid"), col("cand").as("nid"))
          .filter(col("nid") =!= col("qid"))
          .distinct()
          .join(acc.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_anti"))
      // one checkpoint per hop; a candidate-less hop leaves acc as-is
      if (!cand.isEmpty)
        acc = Reliable.checkpoint(acc.unionByName(score(cand)))
    }
    val topK = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("sim"), col("nid"))), k).toAggregateExpression())
    acc.groupBy(col("qid")).agg(topK.as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("nid"), col("entry.score").as("sim"))
  }

  /** Score candidate edges by exact guarded cosine and keep each
    * node's top-k — the NN-descent merge step, through the same
    * [[rank]] tail as every other ANN path. Returns
    * (id, rank, nid, sim). */
  private def knnTopK(edges: DataFrame, c: DataFrame, k: Int): DataFrame =
    rank(
      edges.select(col("id").as("qid"), col("nid"))
        .join(c.select(col("id").as("qid"), col("vec").as("qv"),
          col("nrm").as("qn")), Seq("qid"))
        .join(c.select(col("id").as("nid"), col("vec").as("nv"),
          col("nrm").as("nn")), Seq("nid")),
      k).withColumnRenamed("qid", "id")

  private def rank(cand: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val topK = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("sim"), col("nid"))), k).toAggregateExpression())
    cand
      .select(col("qid"), col("nid"),
        when(col("qn") > 0 && col("nn") > 0,
          Vectors.dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("sim"))
      .groupBy(col("qid")).agg(topK.as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("nid"), col("entry.score").as("sim"))
  }
}
