package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.Vectors
import graft.ops.Ann
import graft.schema.Tables

/** Similarity-search surface over the `embeddings` fixture (64-dim
  * `array<float>` vectors) — SURVEY §2.11 north-star mandate.
  *
  * Scale posture: brute-force top-k is the correctness baseline (the
  * query side is broadcast, the candidate side streams — no shuffle of
  * the vector table); LSH bucketing is the 100 TB path (candidates
  * shuffle on a small int bucket id, then per-bucket brute force).
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Embeddings behind the scale-adaptive input-split rail
    * (Scale.spreadSplits, r16 optimization round, guide §2.5) — used
    * ONLY by the queries whose dominant cost is a single dense kernel
    * pass over the corpus (the brute all-pairs baseline of
    * q_embed_neardup): there the single-row-group fixture ran ~2.5 s
    * of vector arithmetic in ONE task, and spreading it across cores
    * measured 5× faster in full-bench context. Everything else —
    * graph build+search, the IVF lifecycle, LSH, SemDeDup, k-means
    * training, the brute+LSH comparison twin — measured SLOWER under
    * the rail in the full-bench A/B (dozens of tiny stages each
    * paying full-parallelism task overhead) and stays on the raw
    * [[emb]]. */
  private def embSpread(s: SparkSession, dir: String): DataFrame =
    graft.ops.Scale.spreadSplits(Tables.load(s, dir, "embeddings"), col("vec_id"))

  /** q_semdedup's cap — ONE value shared by the Ann.semDedup call and
    * the recheck filters below (a drifted copy would recompute the
    * invariants over clusters the operator never deduped). */
  private val semMaxCluster = 20000

  private def scratchDir(prefix: String, dir: String): String =
    graft.Scratch.dir(prefix, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Vector norms + self-dot — verifies the higher-order-function dot
    // product (sequential double accumulation, oracle-exact).
    "q_vector_norms" -> ((s, dir) => {
      emb(s, dir).select(
        col("vec_id"),
        Vectors.dot(col("embedding"), col("embedding")).as("self_dot"),
        Vectors.l2Norm(col("embedding")).as("l2_norm"))
        .orderBy(col("vec_id"))
    }),

    // Brute-force cosine top-k: 8 query vectors (broadcast) × all
    // candidates. Norms are projected BEFORE the join (computed once per
    // vector, not once per pair); the per-pair work is one fused codegen
    // dot product; ranking is the bounded argmax-k aggregate (map-side
    // partial top-k — no per-query full sort, k rows per partition cross
    // the shuffle). At 100 TB the candidate scan is embarrassingly
    // parallel.
    "q_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.bruteTopK(e.filter(col("id") < 8), e, k = 10)
        .orderBy(col("qid"), col("rank"))
    }),

    // Hard-negative mining (the DPR/ANCE retrieval-training recipe):
    // each query's labeled positive is its TRUE nearest neighbor (the
    // realistic setup — the positive is the best match), and the mined
    // negatives are the top-10 nearest that are NOT it, i.e. the
    // near-misses ranks 2-11 re-ranked 1-10. The anti join bites for
    // every query at every SF. One brute retrieval + anti join + a
    // per-query re-rank window over the shortlist.
    "q_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val qs = e.filter(col("id") < 8)
      // checkpointed: the positive set feeds an eager bound check plus
      // two anti-join subtrees — without this the brute top-1 corpus
      // scan re-runs up to 4x per invocation
      val pos = graft.ops.Reliable.checkpoint(
        Ann.bruteTopK(qs, e, k = 1)
          .select(col("qid"), col("nid").as("pos_id")))
      Ann.hardNegatives(qs, pos, e, k = 10)
        .orderBy(col("qid"), col("neg_rank"))
    }),

    // Multi-table LSH ANN (the shuffle-light scale path): 12 tables ×
    // 4-bit hyperplane buckets, union of same-bucket candidates, cosine
    // top-5. VALUE-EXACT oracle: the xxhash64-parity plane matrix is
    // data-free, so lshOracleSql embeds it as DuckDB literals and
    // replays bucketing + cosine ranking bit-for-bit; recall vs brute
    // force stays spec-asserted and driver-visible via the _recall twin.
    "q_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.lshTopK(e.filter(col("id") < 8), e, k = 5)
        .select(col("qid"), col("rank"), col("nid"))
        .orderBy(col("qid"), col("rank"))
    }),

    // IVF-Flat ANN (the storage-partitioned scale path): 16 coarse
    // lists from the DETERMINISTIC first-16 seed, 4-probe queries —
    // VALUE-EXACT: with seeded centroids every stage (top-1 assign,
    // top-4 probe, probed-cell candidate union, exact cosine rank) is
    // engine-neutral sequential-double arithmetic the oracle restates
    // (the q_cluster_sample assignment + q_cosine_topk rank
    // precedents). Lloyd-TRAINED centroids — whose sum(double)
    // partition-order FP DuckDB cannot replicate — stay driver-visible
    // through q_ann_ivf_recall (trainIters=2, engine-neutral constant
    // output) and q_kmeans_quality.
    "q_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.ivfTopK(e.filter(col("id") < 8), e, k = 5)
        .select(col("qid"), col("rank"), col("nid"))
        .orderBy(col("qid"), col("rank"))
    }),

    // Driver-visible ANN quality (VERDICT r1 item 6): for each fixed
    // query, count returned neighbors whose EXACT cosine (the sim column
    // ANN already emits) is >= the true 20th-best cosine from brute
    // force. With k=5 against a top-20 bound the count is deterministically
    // 5 at every fixture SF (measured: all 5 land in the true top-10), so
    // the oracle can assert the constant per qid — if LSH quality
    // regresses, the count drops and the hash check goes red.
    "q_ann_lsh_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      annRecallCheck(Ann.lshTopK(e.filter(col("id") < 8), e, k = 5), e)
    }),

    "q_ann_ivf_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      annRecallCheck(Ann.ivfTopK(e.filter(col("id") < 8), e, k = 5, trainIters = 2), e)
    }),

    // Recall-vs-nprobe curve on the deterministic first-16 seed (the
    // q_ann_ivf configuration swept across probe depths 1..16): the
    // driver-visible tuning gate — a probe-ranking or assignment
    // regression shifts hit counts at SOME depth even when the fixed
    // nprobe=4 gates still pass. Value-exact: every stage is the same
    // engine-neutral arithmetic as q_ann_ivf, restated per depth.
    "q_ann_ivf_sweep" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.ivfNprobeSweep(e.filter(col("id") < 8), e, k = 5)
        .orderBy(col("nprobe"))
    }),

    // the decision the sweep drives: smallest nprobe whose measured
    // recall meets 0.95 (empty when unreachable — loud, not a silent
    // best-effort). Same deterministic-seed restatement, so the oracle
    // picks the identical frontier point.
    "q_ann_ivf_autoprobe" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.recommendNprobe(e.filter(col("id") < 8), e, k = 5,
        targetRecall = 0.95)
    }),

    // NN-descent k-NN GRAPH (Dong, Moses & Li 2011) — the graph-family
    // ANN member (VERDICT r14 item 4): the nearest neighbors of EVERY
    // node, built by iterated bounded local joins, never an all-pairs
    // self-join. Deterministic end to end (multiplicative-hash ring
    // init, exact guarded cosine, (sim DESC, nid) ranks), so the
    // oracle restates BOTH local-join rounds in DuckDB SQL and the
    // edge list matches hash-exactly. Convergence-to-brute-truth is
    // structure-dependent (AnnGraphSpec pins recall 1.0 on a clustered
    // corpus; the fixture's i.i.d. vectors are the documented worst
    // case), so the driver gate pins the ALGORITHM, not a recall
    // constant.
    "q_ann_graph" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.knnGraph(e, k = 5, rounds = 2, reverseCap = 5)
        .filter(col("id") < 8)
        .select(col("id").as("qid"), col("rank"), col("nid"))
        .orderBy(col("qid"), col("rank"))
    }),

    // the neighbor-recall gate on the same build: per query node, how
    // many of its 5 graph neighbors sit in the brute top-20 — the
    // containment arithmetic of the other _recall gates, restated
    // VALUE-exactly rather than as a constant (the 2-round graph on
    // the unstructured fixture is mid-convergence by design; the
    // recall NUMBER is the contract both engines must derive).
    "q_ann_graph_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      annRecallCheck(
        Ann.knnGraph(e, k = 5, rounds = 2, reverseCap = 5)
          .filter(col("id") < 8).withColumnRenamed("id", "qid"), e)
    }),

    // graph-ANN SERVING (VERDICT r15 item 3 — the graph family's probe
    // path): persist the NN-descent graph as a bucket-partitioned
    // manifest layout, then answer top-k by distributed beam search —
    // deterministic seeds from the build's own hash-ring permutation,
    // two frontier expansions through bucket-PRUNED adjacency
    // partitions, exact guarded cosine on new candidates only. Every
    // stage is engine-neutral arithmetic, so the oracle restates the
    // whole build+search (graph CTEs + seed/beam/expansion CTEs) and
    // the ranked output matches hash-exactly.
    "q_ann_graph_search" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = scratchDir("graft-gidx", dir)
      Ann.writeGraphIndex(e, path, k = 5, rounds = 2, reverseCap = 5,
        nBuckets = 16, nSeeds = 4)
      Ann.probeGraphIndex(e.filter(col("id") < 8), path, k = 5,
        beamWidth = 8, hops = 2)
        .select(col("qid"), col("rank"), col("nid"))
        .orderBy(col("qid"), col("rank"))
    }),

    // int8-quantized two-stage scan (approximate candidate stage over
    // 4×-smaller vectors, exact float rerank) — same driver-visible
    // recall gate as the LSH/IVF twins.
    "q_ann_int8_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      annRecallCheck(Ann.quantizedTopK(e.filter(col("id") < 8), e, k = 5), e)
    }),

    // Johnson–Lindenstrauss random-projection two-stage scan (64→32
    // dims, matrix derived from the seed on every executor — no matrix
    // ships). JL is lossier than the quantized stages by design, so its
    // measured-deterministic gate is full containment in the true
    // TOP-100 (5/5 at every fixture SF with margin; 16-dim drops to
    // 4/5 at sf0.1 — outDim=32, rerankFactor=6 is the honest setting).
    "q_rp_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      // rerankFactor 12: deep enough to hold the full-containment gate
      // on the ×10 amplified fixture too (rotated-replica neighbors
      // compress the projected-cosine margins; a 30-deep shortlist
      // missed 2 of 5 there). Deepening the shortlist only ever ADDS
      // exact-rerank candidates, so recall is monotone in this dial —
      // the shipped-SF gates stay green by construction.
      annRecallCheck(Ann.rpTopK(e.filter(col("id") < 8), e, k = 5,
        outDim = 32, rerankFactor = 12), e, trueDepth = 100)
    }),

    // Ranking-quality evaluation (ops.Retrieval.rankedEval): MRR,
    // NDCG@5, precision@5, recall against graded judgments — the gate a
    // retrieval-training pipeline runs after every index/model change.
    // The ranked list is the LSH ANN (value-exact restatable), the
    // qrels grade the brute-force top-10 by position (11 − rank), so
    // BOTH inputs and therefore every metric are engine-reproducible.
    "q_retrieval_metrics" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("id") < 8)
      val ranked = Ann.lshTopK(q, e, k = 5)
        .select(col("qid"), col("rank"), col("nid"))
      val qrels = Ann.bruteTopK(q, e, 10)
        .select(col("qid"), col("nid"), (lit(11) - col("rank")).as("grade"))
      graft.ops.Retrieval.rankedEval(ranked, qrels, k = 5)
        .orderBy(col("qid"))
    }),

    // the leaderboard scalar row (Retrieval.rankedEvalSummary — r12
    // VERDICT item 8): one aggregate over the per-query frame, macro
    // averages folded in qid order, bit-stable before the 9 dp round.
    "q_retrieval_summary" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("id") < 8)
      val ranked = Ann.lshTopK(q, e, k = 5)
        .select(col("qid"), col("rank"), col("nid"))
      val qrels = Ann.bruteTopK(q, e, 10)
        .select(col("qid"), col("nid"), (lit(11) - col("rank")).as("grade"))
      graft.ops.Retrieval.rankedEvalSummary(
        graft.ops.Retrieval.rankedEval(ranked, qrels, k = 5))
    }),

    // 1-bit sign quantization + Hamming shortlist (Ann.binaryTopK) —
    // the lossiest, cheapest-scan point of the quantization matrix
    // (32× less bandwidth than float32, 64 coordinates per word op),
    // so its measured-deterministic gate declares the deepest truth
    // horizon of the family: full containment in the true top-100.
    "q_ann_binary_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      annRecallCheck(Ann.binaryTopK(e.filter(col("id") < 8), e, k = 5,
        rerankFactor = 8), e, trueDepth = 100)
    }),

    // Product-quantized two-stage scan (PQ/ADC: corpus scanned as
    // m=8 byte codes, 32× less candidate-stage bandwidth than float64
    // vectors; per-query distance-table lookups; exact cosine rerank)
    // — same driver-visible recall gate as the other ANN twins.
    // rerankFactor 8: the fixture embeddings are uniform random (no
    // cluster structure — PQ's adversarial case), so the candidate
    // stage needs a deeper shortlist before the exact rerank to hold
    // the same full-containment gate as the other twins
    "q_ann_pq_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      // autoDepth: the shortlist deepens by sqrt(corpusSize/128) — at
      // the fixture's n=500 this reproduces the previously-proven ×8
      // dial exactly, and the r15 full-suite ×30 gate (which caught
      // the fixed dial at 30× density) holds at every amplification
      annRecallCheck(Ann.pqTopK(e.filter(col("id") < 8), e, k = 5,
        rerankFactor = 4, autoDepth = true), e)
    }),

    // IVF-SQ8 (persisted, partition-pruned, int8-quantized lists — the
    // production ANN layout) with the same recall gate as the other
    // ANN twins: the probe returns quantized cosines, so the gate
    // recomputes EXACT sims for the returned (qid, nid) pairs before
    // comparing against the true 20th-best bound.
    "q_ann_ivf_sq8_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = scratchDir("graft-ivf-sq8", dir)
      Ann.writeIvfIndexSq8(e, path, nLists = 16, trainIters = 2)
      val probed = Ann.probeIvfIndexSq8(e.filter(col("id") < 8), path, k = 5, nProbe = 4)
      val v = e.select(col("id"), col("vec"), Vectors.l2Norm(col("vec")).as("nrm"))
      val exact = probed.select(col("qid"), col("rank"), col("nid"))
        .join(v.select(col("id").as("qid"), col("vec").as("qv"), col("nrm").as("qn")), Seq("qid"))
        .join(v.select(col("id").as("nid"), col("vec").as("nv"), col("nrm").as("nn")), Seq("nid"))
        .select(col("qid"), col("rank"), col("nid"),
          (Vectors.dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("sim"))
      annRecallCheck(exact, e)
    }),

    // IVF-BIN (persisted, partition-pruned lists whose candidate stage
    // reads ONLY the packed 1-bit sign words — 32× less bandwidth than
    // float32; xor+popcount Hamming shortlist; exact cosine rerank from
    // the lists' float column) — the binary point of the quantization
    // matrix inside the production layout (VERDICT r12 item 2), gated
    // at the same deep truth horizon as the flat binary scan
    // (q_ann_binary_recall): full containment in the true top-100.
    // nProbe=8: the 1-bit Hamming ordering is the lossiest of the
    // matrix, so the coarse stage keeps more cells in play before the
    // shortlist prunes (same dial the PQ twin turns).
    "q_ann_ivf_bin_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = scratchDir("graft-ivf-bin", dir)
      Ann.writeIvfIndexBin(e, path, nLists = 16, trainIters = 2)
      annRecallCheck(
        Ann.probeIvfIndexBin(e.filter(col("id") < 8), path, k = 5,
          nProbe = 8, rerankFactor = 8), e, trueDepth = 100)
    }),

    // IVF-PQ (persisted, partition-pruned lists whose candidate stage
    // reads ONLY the m-byte PQ codes column; exact cosine rerank from
    // the lists' float column) — the production 100 TB ANN layout,
    // same driver-visible recall gate as the other ANN twins. Deeper
    // rerank (×8) for the same uniform-random-fixture reason as
    // q_ann_pq_recall.
    "q_ann_ivf_pq_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = scratchDir("graft-ivf-pq", dir)
      Ann.writeIvfIndexPq(e, path, nLists = 16, trainIters = 2)
      // autoDepth: the rerank shortlist deepens with cell occupancy,
      // so THIS dial setting holds the 5-of-top-20 bar at ×10/×30
      // amplification too (the r14 ×30 gate caught the fixed factor
      // missing at 30× density)
      annRecallCheck(
        Ann.probeIvfIndexPq(e.filter(col("id") < 8), path, k = 5,
          nProbe = 8, rerankFactor = 8, autoDepth = true), e)
    }),

    // Persisted-IVF-index round trip with a driver-visible assertion:
    // build the index as a parquet layout partitioned by list id
    // (Ann.writeIvfIndex — the corpus's one-time shuffle), then serve
    // the probe from disk with a LITERAL partition filter (partition
    // pruning, plan-asserted in TextVectorSpec) and require the answers
    // to be IDENTICAL to the in-memory ivfTopK with the same centroids.
    // 8 queries × k=5 → n_results is the deterministic 40 only when
    // every (qid, rank, nid) triple matches on both paths.
    "q_ann_ivf_index" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = scratchDir("graft-ivf-q", dir)
      Ann.writeIvfIndex(e, path, nLists = 16, trainIters = 2)
      val probed = Ann.probeIvfIndex(e.filter(col("id") < 8), path, k = 5, nProbe = 4)
      val cents = Ann.readIvfCentroids(s, path)
      val mem = Ann.ivfTopK(e.filter(col("id") < 8), e, k = 5, nProbe = 4,
        centroidsOverride = Some(cents))
      probed.select(col("qid"), col("rank"), col("nid"), lit(1).as("in_idx"))
        .join(mem.select(col("qid"), col("rank"), col("nid"), lit(1).as("in_mem")),
          Seq("qid", "rank", "nid"), "full_outer")
        .agg(count(lit(1)).cast("long").as("n_results"),
          (sum(when(col("in_idx").isNull || col("in_mem").isNull, 1).otherwise(0)) === 0)
            .as("index_matches_memory"))
    }),

    // INCREMENTAL index ingest — the daily-arrivals production shape
    // for a persisted vector index: build the IVF layout over the
    // corpus half (vec_id % 5 != 0), then APPEND the batch half via
    // stored-centroid assignment (Ann.appendToIvfIndex — broadcast
    // assignment, only the touched cid partitions gain files, the
    // corpus is never re-read), then PROBE the appended index with the
    // standard driver-visible recall gate. This query costs exactly
    // what a production daily-ingest cycle costs (build + append +
    // probe — VERDICT r6 item 2 slimmed the second from-scratch index
    // build out); the stronger append==rebuild identity (probe triples
    // equal row for row, untouched partitions keep their exact file
    // sets) is asserted in TextVectorSpec over the same layout.
    "q_ann_ivf_append" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val pApp = scratchDir("graft-ivf-app", dir)
      Ann.writeIvfIndex(e.filter(col("id") % 5 =!= 0), pApp,
        nLists = 16, trainIters = 2)
      Ann.appendToIvfIndex(e.filter(col("id") % 5 === 0), pApp)
      annRecallCheck(
        Ann.probeIvfIndex(e.filter(col("id") < 8), pApp, k = 5, nProbe = 4), e)
    }),

    // INDEX DELETES — the right-to-erasure lifecycle step (build →
    // append → compact → DELETE): tombstone 20% of ids, probe the
    // index. Deleted ids must never surface (boolean gate) and the
    // survivors must still clear the standard recall bar computed
    // against the REMAINING corpus — both immediately after the
    // logical delete and again after the physical purge (spec pins
    // purge equivalence + directory hygiene; this query gates the
    // user-visible semantics).
    "q_ann_ivf_delete" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val p = scratchDir("graft-ivf-del", dir)
      Ann.writeIvfIndex(e, p, nLists = 16, trainIters = 2)
      Ann.deleteFromIvfIndex(
        e.filter(col("id") % 5 === 0).select(col("id").as("nid")), p)
      deletedRecallGate(e, p)
    }),

    // ANN-SERVED hard-negative mining (the indexed twin of
    // q_hard_negatives — VERDICT r7 item 2): the candidate stage is a
    // partition-pruned probe of a persisted IVF index instead of a
    // full corpus scan, anti-join + re-rank unchanged. Driver-visible
    // gate vs the brute mining run: both sims come from the same fused
    // kernel over the same float vectors, so "indexed negative ranks
    // inside the brute top-20 negative band" is a bit-exact >= compare
    // (k returned vs a 2k-deep truth band — the same generous-band
    // posture as annRecallCheck's 5-vs-top-20 gate; the tight k-vs-k
    // band is flaky by one rank on the uniform random fixture, IVF's
    // adversarial case). At nProbe=12 of 16 trained lists containment
    // is deterministically full at every shipped SF, so the oracle
    // asserts k of k; depthSlack=4 exercises the shortlist-deepening
    // dial on the candidate stage.
    "q_hard_negatives_ivf" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val qs = e.filter(col("id") < 8)
      // checkpointed: the positive set feeds an eager bound check plus
      // two anti-join subtrees — without this the brute top-1 corpus
      // scan re-runs up to 4x per invocation
      val pos = graft.ops.Reliable.checkpoint(
        Ann.bruteTopK(qs, e, k = 1)
          .select(col("qid"), col("nid").as("pos_id")))
      val path = scratchDir("graft-ivf-hn", dir)
      Ann.writeIvfIndex(e, path, nLists = 16, trainIters = 2)
      val mined = Ann.hardNegativesIndexed(qs, pos, path, k = 10, nProbe = 12,
        depthSlack = 4)
      val bruteKth = Ann.hardNegatives(qs, pos, e, k = 20)
        .groupBy(col("qid")).agg(min(col("sim")).as("kth_sim"))
      mined.join(bruteKth, Seq("qid"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_returned"),
          sum(when(col("sim") >= col("kth_sim"), 1L).otherwise(0L))
            .as("n_in_brute_top20"))
        .orderBy(col("qid"))
    }),

    // POST-PURGE recall gate (VERDICT r7 item 7): q_ann_ivf_delete
    // gates the logically-deleted index; this twin physically PURGES
    // the tombstones first and gates the compacted index against the
    // brute top-20 of the REMAINING corpus (deletions shift the true
    // top-k). Purge must leave probe answers identical to the logical
    // view, so the same full-containment bar holds.
    "q_ann_ivf_purge_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val p = scratchDir("graft-ivf-purge", dir)
      Ann.writeIvfIndex(e, p, nLists = 16, trainIters = 2)
      Ann.deleteFromIvfIndex(
        e.filter(col("id") % 5 === 0).select(col("id").as("nid")), p)
      Ann.purgeIvfTombstones(s, p)
      deletedRecallGate(e, p)
    }),

    // SEGMENT COMPACTION + VACUUM for the vector index (VERDICT r13
    // item 2 — the last two lifecycle verbs the driver never ran):
    // build + append (lists at 2 segments — the probe fan-in), COMPACT
    // to one, VACUUM the superseded directories, then run the standard
    // recall gate on the compacted index. Runs on the even-vec_id HALF
    // of the corpus (the q_index_compact rationale: lifecycle
    // mechanics are SF-independent; full-corpus build/append/delete
    // cycles are already benched by the q_ann_ivf_* family).
    // Lifecycle facts ride as oracle-checked constants: n_collapsed
    // (1), post-compact lists segment count (1), probe_unchanged
    // (pre-compact == post-maintenance probe, checkpointed, symmetric
    // exceptAll — maintenance preserves logical state verbatim), and
    // the vacuumed pre-compact version refusing a pin.
    "q_ann_ivf_compact" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
        .filter(col("id") % 2 === 0)
      val p = scratchDir("graft-ivf-cpt", dir)
      Ann.writeIvfIndex(e.filter(col("id") % 4 === 0), p,
        nLists = 16, trainIters = 2)
      Ann.appendToIvfIndex(e.filter(col("id") % 4 === 2), p)
      val qs = e.filter(col("id") < 8)
      def probeDf = Ann.probeIvfIndex(qs, p, k = 5, nProbe = 4)
      val pre = graft.ops.Reliable.checkpoint(probeDf)
      val vPre = graft.ops.IndexManifest.pin(s, p).version
      val nCollapsed = Ann.compactIvfIndex(s, p)
      val nListSegs = graft.ops.IndexManifest.pin(s, p).segments("lists").size
      Ann.vacuumIvfIndex(s, p)
      val refused =
        try {
          Ann.probeIvfIndex(qs, p, k = 5, asOfVersion = Some(vPre))
            .limit(1).collect()
          false
        } catch { case _: IllegalStateException => true }
      // ONE post probe, after BOTH maintenance ops — it feeds the
      // equality check AND the recall gate, so "logical state preserved
      // verbatim" covers the whole pass in a single materialization
      val post = graft.ops.Reliable.checkpoint(probeDf)
      // one-job multiset equality (same predicate as the former
      // symmetric exceptAll pair — see ops.FrameEq)
      val unchanged = graft.ops.FrameEq.equalAsMultisets(post, pre)
      annRecallCheck(post, e)
        .withColumn("n_collapsed", lit(nCollapsed))
        .withColumn("n_list_segments", lit(nListSegs))
        .withColumn("probe_unchanged", lit(unchanged))
        .withColumn("pre_vacuum_pin_refused", lit(refused))
    }),

    // TIME-TRAVEL probe of the vector index (VERDICT r13 item 5 — the
    // q_bm25_time_travel twin, previously spec-only): build over 80%
    // (v1), capture the current probe, APPEND the 20% batch (v2), then
    // probe AS OF v1. The pinned earlier snapshot must answer exactly
    // the pre-append probe (a complete, consistent index even after
    // later commits), while the current probe must have absorbed the
    // batch — both checked by symmetric exceptAll over checkpointed
    // (qid, rank, nid) triples and emitted as oracle constants.
    "q_ann_ivf_time_travel" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val p = scratchDir("graft-ivf-ttq", dir)
      Ann.writeIvfIndex(e.filter(col("id") % 5 =!= 0), p,
        nLists = 16, trainIters = 2)
      val qs = e.filter(col("id") < 8)
      def probe(asOf: Option[Long]) =
        Ann.probeIvfIndex(qs, p, k = 5, nProbe = 4, asOfVersion = asOf)
          .select(col("qid"), col("rank"), col("nid"))
      val v1 = graft.ops.IndexManifest.pin(s, p).version
      val pre = graft.ops.Reliable.checkpoint(probe(None))
      Ann.appendToIvfIndex(e.filter(col("id") % 5 === 0), p)
      val tt = graft.ops.Reliable.checkpoint(probe(Some(v1)))
      val cur = graft.ops.Reliable.checkpoint(probe(None))
      val ttEq = graft.ops.FrameEq.equalAsMultisets(tt, pre)
      val curDiff = !graft.ops.FrameEq.equalAsMultisets(cur, pre)
      tt.groupBy(col("qid")).agg(count(lit(1)).as("n_returned"))
        .withColumn("tt_equals_pre_append", lit(ttEq))
        .withColumn("append_changed_current", lit(curDiff))
        .orderBy(col("qid"))
    }),

    // Embedding-cosine near-duplicate pairs (dedup flavor over vectors):
    // all pairs above a cosine threshold, id_a < id_b. Brute-force here
    // (correctness surface); the LSH/IVF candidate pruning above is the
    // 100 TB path for the same predicate.
    "q_embed_neardup" -> ((s, dir) => {
      val e = embSpread(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      brutePairs(e, threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Scale-path twin of q_embed_neardup with a driver-visible quality
    // assertion: LSH-pruned pairs (Ann.nearDupPairsLsh — bucket-local
    // candidates, Σ bucket² cost instead of n²) checked against the
    // brute all-pairs truth. Exact-confirm construction means zero
    // false pairs by definition; recall at the (4-bit, 12-table) dial
    // is 0.83-0.92 on the fixtures (deterministic — xxhash planes), so
    // the oracle asserts recall >= 0.8 plus exact precision. A future
    // recall regression (kernel or banding bug) flips a boolean.
    "q_embed_neardup_lsh" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val brute = brutePairs(e, threshold = 0.4)
        .select(col("id_a"), col("id_b"), lit(1).as("in_brute"))
      val lsh = Ann.nearDupPairsLsh(e, threshold = 0.4)
        .select(col("id_a"), col("id_b"), lit(1).as("in_lsh"))
      brute.join(lsh, Seq("id_a", "id_b"), "full_outer")
        .agg(
          (sum(coalesce(col("in_lsh"), lit(0)) * coalesce(col("in_brute"), lit(0)))
            >= sum(col("in_brute")) * 0.8).as("recall_ok"),
          (sum(when(col("in_brute").isNull, 1).otherwise(0)) === 0).as("no_false_pairs"),
          (count(lit(1)) >= 1).as("has_pairs"))
    }),

    // k-means corpus clustering with a driver-visible quality gate
    // (assertion-oracle pattern, same as the ANN recall twins): train
    // 10 centroids with 3 Lloyd iterations (DataFrame-native k-means),
    // assign every embedding, and score the clustering OBJECTIVE —
    // mean cosine of each vector to its assigned centroid — for both
    // the trained and the naive first-K-seeded centroid sets. Lloyd
    // updates monotonically improve this objective (fixture vectors
    // are unit-norm, so the mean update == the spherical k-means
    // step), so `objective_improved` is deterministic. Fixture labels
    // are NOT the gate: measured separability is weak (true-label
    // centroids only reach 0.41 purity), so a label-purity assertion
    // would test the fixture, not the operator.
    "q_kmeans_quality" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      def meanObjective(cents: DataFrame): DataFrame =
        Ann.kmeansAssign(e, k = 10, centroidsOverride = Some(cents))
          .join(e, Seq("id"))
          .join(cents.select(col("cid"), col("cv")), Seq("cid"))
          .agg(avg(Vectors.cosine(col("vec"), col("cv"))).as("obj"),
            countDistinct(col("cid")).as("k_used"),
            count(lit(1)).as("n"))
      val seeded = meanObjective(Ann.seedCentroids(e, 10))
        .select(col("obj").as("obj_seed"), col("n").as("n_seed"))
      val trained = meanObjective(Ann.trainCentroids(e, 10, iters = 3))
      trained.join(broadcast(seeded))
        .select(
          col("n").cast("long").as("n_vectors"),
          (col("k_used") >= 5).as("clusters_nondegenerate"),
          (col("obj") >= col("obj_seed")).as("objective_improved"))
    }),

    // SemDeDup semantic dedup (cluster-then-dedup, Abbas et al. 2023)
    // with a driver-visible STRUCTURAL oracle: the operator guarantees
    // (by its strict dominance order) that kept rows contain no
    // within-cluster pair above the threshold and that only rows with
    // at least one within-cluster near-dup are dropped. Both facts are
    // recomputed here from scratch — exact cosine over the operator's
    // own cluster assignment — so a kernel, assignment, or dominance
    // bug flips a boolean. The invariants hold only for clusters the
    // operator actually deduped (≤ maxCluster members — oversized
    // clusters are kept whole by design), so the recheck scopes its
    // pairs the same way and pins `no_capped_cluster` separately: if
    // k ever mis-sizes a cluster past the cap, THAT boolean flips —
    // diagnosable — instead of the invariants going red. `has_dropped`
    // pins the fixture-measured fact that semantic duplicates exist
    // and co-cluster at every shipped SF (verified at sf0.001/0.01/0.1).
    "q_semdedup" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      // autoScaleK sizes k ≈ √n so the scale smoke exercises the
      // BALANCED path: assignment O(n·k) and pairing O(n²/k) both stay
      // O(n^1.5), where the old fixed k=10 made pairing quadratic
      // materialized once: the recheck below reads sd from four
      // subtrees (sizes, both self-join sides, the keep flags) and the
      // operator's dominance self-join re-ran per consumer (guide §1.2)
      val sd = graft.ops.Reliable.checkpoint(
        Ann.semDedup(e, k = 10, threshold = 0.4,
          maxCluster = semMaxCluster, autoScaleK = true))
      val sizes = sd.groupBy(col("cid")).agg(count(lit(1)).as("csz"))
      val capStats = sizes.agg(
        (coalesce(max(col("csz")), lit(0L)) <= semMaxCluster).as("no_capped_cluster"))
      val v = sd.join(e, Seq("id"))
        .join(sizes.filter(col("csz") <= semMaxCluster).select(col("cid")),
          Seq("cid"), "left_semi")
        .select(col("cid"), col("id"), col("vec"), col("keep"),
          Vectors.l2Norm(col("vec")).as("nrm"))
      def side(sfx: String) = v.select(col("cid"), col("id").as(s"id_$sfx"),
        col("vec").as(s"v_$sfx"), col("nrm").as(s"n_$sfx"),
        col("keep").as(s"keep_$sfx"))
      val pairs = side("a").join(side("b"), Seq("cid"))
        .filter(col("id_a") < col("id_b") &&
          col("n_a") > 0 && col("n_b") > 0 &&
          Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")) > 0.4)
        .select(col("id_a"), col("id_b"), col("keep_a"), col("keep_b"))
      val pairStats = pairs.agg(
        (coalesce(sum(when(col("keep_a") && col("keep_b"), 1).otherwise(0)),
          lit(0)) === 0).as("kept_clean"))
      val participants = pairs
        .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
      val dropStats = sd.filter(!col("keep"))
        .join(participants.withColumn("__p", lit(true)), Seq("id"), "left")
        .agg(
          (coalesce(sum(when(col("__p").isNull, 1).otherwise(0)), lit(0)) === 0)
            .as("dropped_are_dups"),
          (count(lit(1)) >= 1).as("has_dropped"))
      sd.agg(count(lit(1)).cast("long").as("n_vectors"))
        .join(broadcast(pairStats)).join(broadcast(dropStats))
        .join(broadcast(capStats))
        .select(col("n_vectors"), col("kept_clean"),
          col("dropped_are_dups"), col("has_dropped"),
          col("no_capped_cluster"))
    }),

    // Cluster-balanced sampling (diversity balancing): assign to the 16
    // SEEDED centroids (first-16 vectors, zero Lloyd iterations — so
    // the oracle can replicate assignment exactly: argmax cosine, ties
    // to lowest cid, the kernel's window semantics), cap each cluster
    // at 10 by lowest id. Fully oracle-checked row for row.
    "q_cluster_sample" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cents = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cv"))
      Ann.clusterBalance(e, k = 16, cap = 10,
          centroidsOverride = Some(cents))
        .orderBy(col("id"))
    }),

    // Semantic decontamination (the embedding-level counterpart of
    // q_decontam's n-gram spans): benchmark = vectors 0-31 packed into
    // one broadcast array, corpus = the rest streamed map-only; each
    // corpus row gets its nearest benchmark item, the exact cosine,
    // and the tau verdict. Value-exact: the fused nearest pick orders
    // identically to DuckDB's (sim DESC, bid) window (the
    // q_cluster_sample precedent), and the sim is the sequential-
    // double dot both engines share.
    "q_semantic_decontam" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      Ann.semanticDecontam(e.filter(col("id") >= 32),
          e.filter(col("id") < 32), tau = 0.35)
        .orderBy(col("id"))
    }),

    // Centroid distance per cluster label: grouped vector aggregation —
    // euclidean distance of each vector to its label's first member
    // (deterministic representative), exercising l2Sq at scale shape.
    "q_l2_to_rep" -> ((s, dir) => {
      val e = emb(s, dir)
      val rep = e.groupBy(col("label")).agg(min(col("vec_id")).as("rep_id"))
      val repv = rep.join(e, rep("rep_id") === e("vec_id"))
        .select(rep("label"), col("embedding").as("rep_v"))
      e.join(broadcast(repv), Seq("label"))
        .select(col("vec_id"), col("label"),
          Vectors.l2Sq(col("embedding"), col("rep_v")).as("l2_sq"))
        .orderBy(col("vec_id"))
    }),
  )

  /** Brute all-pairs cosine above `threshold` over an (id, vec) frame
    * — the truth side shared by q_embed_neardup and the LSH gate (ONE
    * definition; the norm guard keeps a zero-norm row a null sim —
    * dropped by the filter — instead of an ANSI divide-by-zero killing
    * the whole gate). */
  private def brutePairs(e: DataFrame, threshold: Double): DataFrame = {
    val a = e.select(col("id").as("id_a"), col("vec").as("va"),
      Vectors.l2Norm(col("vec")).as("na"))
    val b = e.select(col("id").as("id_b"), col("vec").as("vb"),
      Vectors.l2Norm(col("vec")).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(col("na") > 0 && col("nb") > 0,
          Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") > threshold)
  }

  /** Deleted-index recall gate shared by q_ann_ivf_delete and the
    * post-purge twin: probe top-5 of the (logically or physically)
    * deleted index vs the REMAINING corpus' brute top-20 band, plus
    * the no-deleted-id assertion — one definition, so the two gates
    * cannot assert different invariants. */
  private def deletedRecallGate(e: DataFrame, indexPath: String): DataFrame = {
    val ann = Ann.probeIvfIndex(e.filter(col("id") < 8), indexPath,
      k = 5, nProbe = 4)
    val rest = e.filter(col("id") % 5 =!= 0)
    val kth = Ann.bruteTopK(e.filter(col("id") < 8), rest, k = 20)
      .groupBy(col("qid")).agg(min(col("sim")).as("kth_sim"))
    ann.join(kth, Seq("qid"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("sim") >= col("kth_sim"), 1L).otherwise(0L)).as("n_in_true20"),
        (sum(when(col("nid") % 5 === 0, 1).otherwise(0)) === 0).as("no_deleted"))
      .orderBy(col("qid"))
  }

  /** (qid, n_returned, n_in_true<depth>): ANN output joined against
    * the brute-force depth-th-best cosine of the id<8 fixture query
    * set (the set EVERY twin probes — a twin probing a different
    * subset must grow this signature, or the truth side silently
    * gates the wrong queries). Sims on both sides come from the same
    * fused dot-product kernel, so the >= compare is bit-exact at the
    * boundary. */
  private def annRecallCheck(ann: DataFrame, e: DataFrame,
                             trueDepth: Int = 20): DataFrame = {
    val kth = Ann.bruteTopK(e.filter(col("id") < 8), e, k = trueDepth)
      .groupBy(col("qid")).agg(min(col("sim")).as("kth_sim"))
    ann.join(kth, Seq("qid"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("sim") >= col("kth_sim"), 1L).otherwise(0L))
          .as(s"n_in_true$trueDepth"))
      .orderBy(col("qid"))
  }

  /** DuckDB sequential dot product over list elements (matches Spark's
    * aggregate() left-to-right double accumulation bit-for-bit). */
  private def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Shared tail of the value-exact candidate-rank oracles
    * ([[lshOracleSql]], q_ann_ivf): guarded exact cosine over a
    * `cand(qid, nid)` CTE against `e(id, v, nrm)`, then the
    * TopKByScore (sim DESC, nid) order. NULL sims (a zero-norm side)
    * are EXCLUDED before ranking because TopKByScore skips null
    * scores — a bare ROW_NUMBER would still number them and shift
    * every rank below on a degenerate fixture row. */
  private def simsRankedTail(k: Int): String =
    s"""sims AS (
       |  SELECT cand.qid, cand.nid,
       |    CASE WHEN qe.nrm > 0 AND ce.nrm > 0
       |      THEN ${dot("qe.v", "ce.v")} / (qe.nrm * ce.nrm) END AS sim
       |  FROM cand JOIN e qe ON qe.id = cand.qid JOIN e ce ON ce.id = cand.nid),
       |ranked AS (
       |  SELECT qid, nid,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
       |  FROM sims WHERE sim IS NOT NULL)
       |SELECT qid, rank, nid FROM ranked WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin

  /** Value-exact DuckDB restatement of [[Ann.lshTopK]] (the SimHashSql
    * move applied to vectors): the hyperplane weights are DATA-FREE
    * constants — parity of xxhash64 over (plane, elemIndex) — so the
    * generator evaluates the same `LshKernel.weight` the fused Spark
    * kernel calls and embeds the nTables·nBits × dim ±1 matrix as a SQL
    * literal. The rest is engine-neutral arithmetic DuckDB reproduces
    * bit-for-bit: sequential-double projections (the q_vector_norms
    * precedent), sign→bucket bits, same-bucket candidate union,
    * guarded cosine, (sim DESC, nid) ranking (the q_cosine_topk
    * precedent). `dim` is pinned to the fixture's embedding length —
    * the weight matrix must cover every element. */
  private def lshOracleSql(nBits: Int, nTables: Int, dim: Int, k: Int): String = {
    val planeRows = (0 until nBits * nTables).map { p =>
      val w = (0 until dim)
        .map(i => if (graft.expr.catalyst.LshKernel.weight(p, i) > 0) "1" else "-1")
        .mkString(",")
      s"($p, [$w])"
    }.mkString(",\n    ")
    s"""WITH planes(p, w) AS (VALUES
       |    $planeRows),
       |e AS (SELECT vec_id AS id, embedding AS v,
       |        sqrt(${dot("embedding", "embedding")}) AS nrm FROM embeddings),
       |projs AS (
       |  SELECT e.id, pl.p // $nBits AS tbl, pl.p % $nBits AS bit,
       |    list_sum(list_transform(range(1, len(e.v) + 1),
       |      i -> CAST(e.v[i] AS DOUBLE) * CAST(pl.w[i] AS DOUBLE))) AS proj
       |  FROM e CROSS JOIN planes pl),
       |bucketed AS (
       |  SELECT id, tbl * ${1 << nBits} +
       |    CAST(sum(CASE WHEN proj >= 0 THEN 1 << bit ELSE 0 END) AS INT) AS bucket
       |  FROM projs GROUP BY id, tbl),
       |cand AS (
       |  SELECT DISTINCT q.id AS qid, c.id AS nid
       |  FROM bucketed q JOIN bucketed c USING (bucket)
       |  WHERE q.id < 8 AND q.id <> c.id),
       |${simsRankedTail(k)}""".stripMargin
  }

  /** Shared staged CTEs of the DETERMINISTIC-seed IVF oracles
    * (q_ann_ivf, q_ann_ivf_sweep): first-16 centroids, guarded corpus
    * cosines against them, the top-1 assignment, and the full centroid
    * ranking per query (`cranked` — a probe depth p reads rn <= p).
    * One definition so the sweep and the fixed-probe query cannot
    * drift. */
  private def ivfStagedCtes: String =
    s"""cents AS (
       |  SELECT vec_id AS cid, embedding AS cv,
       |    sqrt(${dot("embedding", "embedding")}) AS cn
       |  FROM embeddings WHERE vec_id < 16),
       |e AS (
       |  SELECT vec_id AS id, embedding AS v,
       |    sqrt(${dot("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |csims AS (
       |  SELECT e.id, c.cid, e.nrm,
       |    CASE WHEN c.cn > 0
       |      THEN ${dot("e.v", "c.cv")} / (e.nrm * c.cn) END AS sim
       |  FROM e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY id
       |        ORDER BY sim DESC NULLS LAST, cid) AS rn
       |    FROM csims) WHERE rn = 1),
       |cranked AS (
       |  SELECT id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY id
       |      ORDER BY sim DESC NULLS LAST, cid) AS rn
       |  FROM csims WHERE id < 8)""".stripMargin

  /** Value-exact restatement of [[Ann.ivfNprobeSweep]] under the
    * deterministic first-16 seed: the staged CTEs above give the
    * assignment and the per-query centroid ranking; each probed depth
    * p re-ranks the rn <= p candidate union with the exact guarded
    * cosine and counts hits against the brute-force top-k (`truth` —
    * the q_cosine_topk restatement). The per-depth blocks differ only
    * in the literal p, so a Spark/oracle mismatch at any single depth
    * flags the exact sweep point that regressed. `n_hits` must be cast
    * to BIGINT: DuckDB types SUM(int) as HUGEINT, which downstream
    * readers materialize as float64 (`38.0` vs Spark's `38`). */
  private def ivfSweepOracleSql(k: Int, probes: Seq[Int]): String = {
    val perP = probes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS nprobe,
         |  COUNT(*) AS n_returned,
         |  CAST(COALESCE(SUM(CASE WHEN t.qid IS NOT NULL THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_hits
         |FROM (
         |  SELECT qid, nid FROM (
         |    SELECT s.qid, s.nid,
         |      ROW_NUMBER() OVER (PARTITION BY s.qid
         |        ORDER BY s.sim DESC, s.nid) AS rank
         |    FROM (
         |      SELECT c.qid, c.nid,
         |        CASE WHEN qe.nrm > 0 AND ce.nrm > 0
         |          THEN ${dot("qe.v", "ce.v")} / (qe.nrm * ce.nrm) END AS sim
         |      FROM (
         |        SELECT pr.id AS qid, a.id AS nid
         |        FROM cranked pr JOIN assigned a USING (cid)
         |        WHERE pr.rn <= $p AND a.id <> pr.id
         |        GROUP BY pr.id, a.id) c
         |      JOIN e qe ON qe.id = c.qid JOIN e ce ON ce.id = c.nid) s
         |    WHERE s.sim IS NOT NULL) WHERE rank <= $k) r
         |LEFT JOIN truth t ON t.qid = r.qid AND t.nid = r.nid""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $ivfStagedCtes,
       |tsims AS (
       |  SELECT qe.id AS qid, ce.id AS nid,
       |    CASE WHEN qe.nrm > 0 AND ce.nrm > 0
       |      THEN ${dot("qe.v", "ce.v")} / (qe.nrm * ce.nrm) END AS sim
       |  FROM e qe JOIN e ce ON qe.id < 8 AND qe.id <> ce.id),
       |truth AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY sim DESC, nid) AS rank
       |    FROM tsims WHERE sim IS NOT NULL) WHERE rank <= $k)
       |SELECT nprobe, n_returned, n_hits,
       |  ROUND(CAST(n_hits AS DOUBLE)
       |    / (SELECT CAST(COUNT(*) AS DOUBLE) FROM truth), 9) AS recall
       |FROM (
       |$perP
       |) ORDER BY nprobe""".stripMargin
  }

  /** The constant recall-gate oracle every value-stable twin shares:
    * full containment (k of k) at the declared truth depth. */
  /** Value-exact DuckDB restatement of [[Ann.knnGraph]]: the
    * deterministic hash-ring init (ROW_NUMBER over the multiplicative-
    * hash permutation == Scale.zipWithOrderedIndex's rank), then each
    * NN-descent round as five mechanical CTEs — reverse-cap, undirected
    * union, local-join pairs, guarded cosine, (sim DESC, nid) top-k.
    * All arithmetic is the engine-neutral sequential-double form the
    * other ANN oracles already pin; UNION / DISTINCT mirror the Spark
    * side's distinct() dedups exactly. Emits CTEs up to `b<rounds>`
    * (id, nid, sim, rn — the final ranked graph). */
  private def knnGraphCtes(k: Int, rounds: Int, rcap: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id AS id, embedding AS v,
         |       sqrt(${dot("embedding", "embedding")}) AS nrm FROM embeddings),
         |nn AS (SELECT COUNT(*) AS n FROM e),
         |perm AS (SELECT id,
         |    ROW_NUMBER() OVER (ORDER BY id % 1000003 * 2654435761 % 4294967296, id) - 1 AS pos
         |  FROM e),
         |c0 AS (
         |  SELECT a.id AS id, b.id AS nid
         |  FROM perm a CROSS JOIN range(1, ${k + 1}) j(j) CROSS JOIN nn
         |  JOIN perm b ON b.pos = (a.pos + j.j) % nn.n),
         |""".stripMargin)
    for (r <- 0 to rounds) {
      sb.append(
        s"""s$r AS (
           |  SELECT c$r.id, c$r.nid,
           |    CASE WHEN qe.nrm > 0 AND ce.nrm > 0
           |      THEN ${dot("qe.v", "ce.v")} / (qe.nrm * ce.nrm) END AS sim
           |  FROM c$r JOIN e qe ON qe.id = c$r.id JOIN e ce ON ce.id = c$r.nid),
           |b$r AS (
           |  SELECT id, nid, sim, rn FROM (
           |    SELECT id, nid, sim,
           |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY sim DESC, nid) AS rn
           |    FROM s$r WHERE sim IS NOT NULL) WHERE rn <= $k)""".stripMargin)
      if (r < rounds) sb.append(
        s""",
           |rev${r + 1} AS (
           |  SELECT nid AS id, id AS nid FROM (
           |    SELECT id, nid,
           |      ROW_NUMBER() OVER (PARTITION BY nid ORDER BY sim DESC, id) AS rr
           |    FROM b$r) WHERE rr <= $rcap),
           |u${r + 1} AS (SELECT id, nid FROM b$r UNION SELECT id, nid FROM rev${r + 1}),
           |p${r + 1} AS (
           |  SELECT DISTINCT a.nid AS id, b.nid AS nid
           |  FROM u${r + 1} a JOIN u${r + 1} b ON a.id = b.id AND a.nid <> b.nid),
           |c${r + 1} AS (SELECT id, nid FROM b$r UNION SELECT id, nid FROM p${r + 1}),
           |""".stripMargin)
    }
    sb.toString
  }

  /** [[knnGraphCtes]] extended with the beam-search probe restatement
    * (q_ann_graph_search): entry points from the same hash-ring
    * permutation (`perm`), then per hop the best-`beamWidth` frontier
    * (sim DESC, nid — the TopKByScore order), expansion through the
    * final graph's edges, EXCEPT-dedup against everything already
    * scored (the probe's anti-join), exact guarded cosine on the new
    * candidates, UNION ALL into the accumulator. `a$hops` is the final
    * scored set. */
  private def graphSearchCtes(k: Int, rounds: Int, rcap: Int,
                              nSeeds: Int, beamWidth: Int,
                              hops: Int): String = {
    val sb = new StringBuilder
    sb.append(knnGraphCtes(k, rounds, rcap))
    sb.append(
      s""",
         |g AS (SELECT id, nid FROM b$rounds),
         |q AS (SELECT id AS qid, v, nrm FROM e WHERE id < 8),
         |sd AS (SELECT id AS nid FROM perm WHERE pos < $nSeeds),
         |a0 AS (
         |  SELECT q.qid, sd.nid,
         |    CASE WHEN q.nrm > 0 AND ce.nrm > 0
         |      THEN ${dot("q.v", "ce.v")} / (q.nrm * ce.nrm) END AS sim
         |  FROM q JOIN sd ON sd.nid <> q.qid JOIN e ce ON ce.id = sd.nid)""".stripMargin)
    for (h <- 1 to hops) {
      sb.append(
        s""",
           |bm$h AS (
           |  SELECT qid, nid FROM (
           |    SELECT qid, nid,
           |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
           |    FROM a${h - 1} WHERE sim IS NOT NULL) WHERE rn <= $beamWidth),
           |nc$h AS (
           |  SELECT bm.qid, g.nid FROM bm$h bm JOIN g ON g.id = bm.nid
           |  WHERE g.nid <> bm.qid
           |  EXCEPT SELECT qid, nid FROM a${h - 1}),
           |ns$h AS (
           |  SELECT c.qid, c.nid,
           |    CASE WHEN qe.nrm > 0 AND ce.nrm > 0
           |      THEN ${dot("qe.v", "ce.v")} / (qe.nrm * ce.nrm) END AS sim
           |  FROM nc$h c JOIN e qe ON qe.id = c.qid JOIN e ce ON ce.id = c.nid),
           |a$h AS (SELECT * FROM a${h - 1} UNION ALL SELECT * FROM ns$h)""".stripMargin)
    }
    sb.toString
  }

  private def recallConstOracle(k: Int, depth: Int): String =
    s"""SELECT vec_id AS qid, CAST($k AS BIGINT) AS n_returned,
       |  CAST($k AS BIGINT) AS n_in_true$depth
       |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q_vector_norms" ->
      s"""SELECT vec_id,
         |  ${dot("embedding", "embedding")} AS self_dot,
         |  sqrt(${dot("embedding", "embedding")}) AS l2_norm
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
         |sims AS (
         |  SELECT qid, nid,
         |    CASE WHEN sqrt(${dot("qv", "qv")}) > 0 AND sqrt(${dot("nv", "nv")}) > 0
         |      THEN ${dot("qv", "nv")} / (sqrt(${dot("qv", "qv")}) * sqrt(${dot("nv", "nv")}))
         |    END AS sim
         |  FROM q JOIN c ON qid <> nid),
         |ranked AS (
         |  SELECT qid, nid, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         |  FROM sims)
         |SELECT qid, rank, nid, sim FROM ranked WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,

    // same sims/rank CTEs; drop each query's rank-1 (its labeled
    // positive) and re-rank the survivors — ranks 2-11 become 1-10
    "q_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
         |sims AS (
         |  SELECT qid, nid,
         |    CASE WHEN sqrt(${dot("qv", "qv")}) > 0 AND sqrt(${dot("nv", "nv")}) > 0
         |      THEN ${dot("qv", "nv")} / (sqrt(${dot("qv", "qv")}) * sqrt(${dot("nv", "nv")}))
         |    END AS sim
         |  FROM q JOIN c ON qid <> nid),
         |ranked AS (
         |  SELECT qid, nid, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         |  FROM sims)
         |SELECT qid, CAST(rank - 1 AS BIGINT) AS neg_rank, nid, sim
         |FROM ranked WHERE rank BETWEEN 2 AND 11
         |ORDER BY qid, neg_rank""".stripMargin,

    // q_ann_lsh: VALUE-EXACT — the hyperplane signs are data-free
    // xxhash64 parities, restated as an embedded ±1 literal matrix
    // (lshOracleSql). q_ann_ivf: VALUE-EXACT under the deterministic
    // first-16 seed — assignment and probe are the NearestCents
    // kernel's (cosine DESC, cid) pick, rank is the TopKByScore
    // (sim DESC, nid) order, all sequential-double arithmetic DuckDB
    // reproduces bit-for-bit. Lloyd-TRAINED centroids (Spark
    // sum(double) partition-order FP) remain covered by the _recall
    // twins' engine-neutral constant outputs.

    "q_ann_lsh" -> lshOracleSql(nBits = 4, nTables = 12, dim = 64, k = 5),

    "q_ann_ivf" ->
      s"""WITH $ivfStagedCtes,
         |probes AS (
         |  SELECT id AS qid, cid FROM cranked WHERE rn <= 4),
         |cand AS (
         |  SELECT p.qid, a.id AS nid
         |  FROM probes p JOIN assigned a USING (cid)
         |  WHERE a.id <> p.qid),
         |${simsRankedTail(5)}""".stripMargin,

    "q_ann_ivf_sweep" -> ivfSweepOracleSql(k = 5, probes = Seq(1, 2, 4, 8, 16)),

    // the sweep wrapped as a frontier pick: min nprobe with
    // recall >= target (both engines emit the 9-dp-rounded recall the
    // sweep oracle defines, so the >= frontier agrees exactly)
    "q_ann_ivf_autoprobe" ->
      s"""WITH sw AS (
         |  SELECT * FROM (
         |${ivfSweepOracleSql(k = 5, probes = Seq(1, 2, 4, 8, 16))}
         |  ))
         |SELECT CAST(0.95 AS DOUBLE) AS target_recall, nprobe,
         |  n_returned, n_hits, recall
         |FROM sw
         |WHERE nprobe = (SELECT MIN(nprobe) FROM sw WHERE recall >= 0.95)""".stripMargin,

    "q_ann_lsh_recall" ->
recallConstOracle(k = 5, depth = 20),

    "q_ann_ivf_recall" ->
recallConstOracle(k = 5, depth = 20),

    "q_ann_int8_recall" ->
recallConstOracle(k = 5, depth = 20),

    // q_ann_graph: VALUE-EXACT — the whole 2-round NN-descent build
    // restated (hash-ring init, reverse-capped undirected local join,
    // guarded-cosine top-k per round); the final ranked edges of the
    // query nodes must match hash-exactly.
    "q_ann_graph" ->
      s"""WITH ${knnGraphCtes(k = 5, rounds = 2, rcap = 5)}
         |SELECT id AS qid, rn AS rank, nid FROM b2
         |WHERE id < 8 ORDER BY qid, rank""".stripMargin,

    // q_ann_graph_recall: the same value-exact graph joined to the
    // brute top-20 threshold (MIN of the ranked top-20 sims — the
    // annRecallCheck arithmetic), counts derived identically.
    "q_ann_graph_recall" ->
      s"""WITH ${knnGraphCtes(k = 5, rounds = 2, rcap = 5)},
         |tsims AS (
         |  SELECT qe.id AS qid, ce.id AS nid,
         |    CASE WHEN qe.nrm > 0 AND ce.nrm > 0
         |      THEN ${dot("qe.v", "ce.v")} / (qe.nrm * ce.nrm) END AS sim
         |  FROM e qe JOIN e ce ON qe.id < 8 AND ce.id <> qe.id),
         |truth AS (
         |  SELECT qid, MIN(sim) AS kth_sim FROM (
         |    SELECT qid, sim,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
         |    FROM tsims WHERE sim IS NOT NULL) WHERE rn <= 20 GROUP BY qid)
         |SELECT b2.id AS qid, COUNT(*) AS n_returned,
         |  CAST(SUM(CASE WHEN b2.sim >= t.kth_sim THEN 1 ELSE 0 END) AS BIGINT) AS n_in_true20
         |FROM b2 JOIN truth t ON t.qid = b2.id
         |WHERE b2.id < 8
         |GROUP BY b2.id ORDER BY qid""".stripMargin,

    // q_ann_graph_search: VALUE-EXACT — the whole build (2-round
    // NN-descent) PLUS the beam-search probe restated: hash-ring seed
    // entry points, two best-8 frontier expansions through the final
    // graph, exact cosine on new candidates only, accumulated top-5.
    "q_ann_graph_search" ->
      s"""WITH ${graphSearchCtes(k = 5, rounds = 2, rcap = 5,
             nSeeds = 4, beamWidth = 8, hops = 2)}
         |SELECT qid, rn AS rank, nid FROM (
         |  SELECT qid, nid,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
         |  FROM a2 WHERE sim IS NOT NULL) WHERE rn <= 5
         |ORDER BY qid, rank""".stripMargin,

    "q_rp_recall" ->
recallConstOracle(k = 5, depth = 100),

    "q_ann_binary_recall" ->
recallConstOracle(k = 5, depth = 100),

    // the rankedEval arithmetic restated step for step: the LSH ranked
    // list (the q_ann_lsh value-exact restatement) left-joined to the
    // positionally-graded brute top-10, DCG/IDCG/AP as RANK-ORDERED
    // list sums (the fixed-fold contract), one division per metric,
    // 9 dp
    "q_retrieval_metrics" -> retrievalMetricsOracle,

    // one aggregate over the per-query frame: macro averages folded in
    // qid order
    "q_retrieval_summary" ->
      s"""WITH pq AS (
         |$retrievalMetricsOracle)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  ROUND(list_aggregate(list(mrr ORDER BY qid), 'sum')
         |    / COUNT(*), 9) AS macro_mrr,
         |  ROUND(list_aggregate(list(map ORDER BY qid), 'sum')
         |    / COUNT(*), 9) AS macro_map,
         |  ROUND(list_aggregate(list(ndcg ORDER BY qid), 'sum')
         |    / COUNT(*), 9) AS macro_ndcg,
         |  ROUND(list_aggregate(list(precision ORDER BY qid), 'sum')
         |    / COUNT(*), 9) AS macro_precision,
         |  ROUND(list_aggregate(list(recall ORDER BY qid), 'sum')
         |    / COUNT(*), 9) AS macro_recall
         |FROM pq""".stripMargin,
  ) ++ restOracles

  private lazy val retrievalMetricsOracle: String =
      s"""WITH ranked AS (
         |  SELECT qid, rank, nid FROM (
         |${lshOracleSql(nBits = 4, nTables = 12, dim = 64, k = 5)})),
         |tsims AS (
         |  SELECT qe.vec_id AS qid, ce.vec_id AS nid,
         |    CASE WHEN sqrt(${dot("qe.embedding", "qe.embedding")}) > 0
         |           AND sqrt(${dot("ce.embedding", "ce.embedding")}) > 0
         |      THEN ${dot("qe.embedding", "ce.embedding")}
         |        / (sqrt(${dot("qe.embedding", "qe.embedding")})
         |           * sqrt(${dot("ce.embedding", "ce.embedding")})) END AS sim
         |  FROM embeddings qe JOIN embeddings ce
         |    ON qe.vec_id < 8 AND qe.vec_id <> ce.vec_id),
         |qrels AS (
         |  SELECT qid, nid, CAST(11 - rank AS DOUBLE) AS g FROM (
         |    SELECT qid, nid,
         |      ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY sim DESC, nid) AS rank
         |    FROM tsims WHERE sim IS NOT NULL) WHERE rank <= 10),
         |graded AS (
         |  SELECT r.qid, r.rank, COALESCE(q.g, 0.0) AS g
         |  FROM ranked r LEFT JOIN qrels q
         |    ON r.qid = q.qid AND r.nid = q.nid),
         |gcum AS (
         |  SELECT qid, rank, g,
         |    CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY qid ORDER BY rank) AS DOUBLE) AS cumrel
         |  FROM graded),
         |perq AS (
         |  SELECT qid,
         |    list_aggregate(list((pow(2.0, g) - 1.0)
         |      / log2(CAST(rank AS DOUBLE) + 1.0) ORDER BY rank), 'sum') AS dcg,
         |    list_aggregate(list(CASE WHEN g > 0
         |      THEN cumrel / CAST(rank AS DOUBLE) ELSE 0.0 END
         |      ORDER BY rank), 'sum') AS ap_sum,
         |    MIN(CASE WHEN g > 0 THEN rank END) AS first_rel,
         |    CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_rel_ret
         |  FROM gcum GROUP BY qid),
         |rel AS (
         |  SELECT qid, g,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY g DESC, nid) AS rnk
         |  FROM qrels WHERE g > 0),
         |nrel AS (
         |  SELECT qid, CAST(COUNT(*) AS DOUBLE) AS n_rel
         |  FROM qrels WHERE g > 0 GROUP BY qid),
         |icdg AS (
         |  SELECT qid,
         |    list_aggregate(list((pow(2.0, g) - 1.0)
         |      / log2(CAST(rnk AS DOUBLE) + 1.0) ORDER BY rnk), 'sum') AS idcg
         |  FROM rel WHERE rnk <= 5 GROUP BY qid)
         |SELECT p.qid,
         |  ROUND(CASE WHEN first_rel IS NOT NULL
         |    THEN 1.0 / CAST(first_rel AS DOUBLE) ELSE 0.0 END, 9) AS mrr,
         |  ROUND(CASE WHEN COALESCE(n_rel, 0.0) > 0
         |    THEN COALESCE(ap_sum, 0.0) / n_rel ELSE 0.0 END, 9) AS map,
         |  ROUND(CASE WHEN COALESCE(idcg, 0.0) > 0
         |    THEN dcg / idcg ELSE 0.0 END, 9) AS ndcg,
         |  ROUND(n_rel_ret / 5, 9) AS precision,
         |  ROUND(CASE WHEN COALESCE(n_rel, 0.0) > 0
         |    THEN n_rel_ret / n_rel ELSE 0.0 END, 9) AS recall
         |FROM perq p
         |LEFT JOIN nrel USING (qid) LEFT JOIN icdg USING (qid)
         |ORDER BY p.qid""".stripMargin

  private lazy val restOracles: Map[String, String] = Map(

    "q_ann_pq_recall" ->
recallConstOracle(k = 5, depth = 20),

    "q_ann_ivf_bin_recall" ->
recallConstOracle(k = 5, depth = 100),

    "q_ann_ivf_pq_recall" ->
recallConstOracle(k = 5, depth = 20),

    "q_ann_ivf_sq8_recall" ->
recallConstOracle(k = 5, depth = 20),

    "q_ann_ivf_index" ->
      "SELECT CAST(40 AS BIGINT) AS n_results, TRUE AS index_matches_memory",

    "q_ann_ivf_append" ->
recallConstOracle(k = 5, depth = 20),

    // recall gate over the compacted half-corpus index plus structural
    // lifecycle constants: 2 lists segments collapse to 1 (n_collapsed
    // 1), the pre/post probes compare equal, the vacuumed pre-compact
    // version refuses a pin; queries are the even vec_ids < 8
    "q_ann_ivf_compact" ->
      """SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_returned,
        |  CAST(5 AS BIGINT) AS n_in_true20,
        |  CAST(1 AS INTEGER) AS n_collapsed,
        |  CAST(1 AS INTEGER) AS n_list_segments,
        |  TRUE AS probe_unchanged, TRUE AS pre_vacuum_pin_refused
        |FROM embeddings WHERE vec_id < 8 AND vec_id % 2 = 0
        |ORDER BY qid""".stripMargin,

    // k rows per query from the as-of probe; the equality facts are
    // Spark-side exceptAll checks emitted as constants
    "q_ann_ivf_time_travel" ->
      """SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_returned,
        |  TRUE AS tt_equals_pre_append, TRUE AS append_changed_current
        |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin,

    "q_embed_neardup_lsh" ->
      "SELECT TRUE AS recall_ok, TRUE AS no_false_pairs, TRUE AS has_pairs",

    "q_ann_ivf_delete" ->
      """SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_returned,
        |  CAST(5 AS BIGINT) AS n_in_true20, TRUE AS no_deleted
        |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin,

    "q_ann_ivf_purge_recall" ->
      """SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_returned,
        |  CAST(5 AS BIGINT) AS n_in_true20, TRUE AS no_deleted
        |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin,

    "q_hard_negatives_ivf" ->
      """SELECT vec_id AS qid, CAST(10 AS BIGINT) AS n_returned,
        |  CAST(10 AS BIGINT) AS n_in_brute_top20
        |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin,

    "q_kmeans_quality" ->
      """SELECT count(*) AS n_vectors, TRUE AS clusters_nondegenerate,
        |  TRUE AS objective_improved FROM embeddings""".stripMargin,

    "q_semdedup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors, TRUE AS kept_clean,
        |  TRUE AS dropped_are_dups, TRUE AS has_dropped,
        |  TRUE AS no_capped_cluster FROM embeddings""".stripMargin,

    "q_embed_neardup" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dot("embedding", "embedding")}) AS nrm
         |  FROM embeddings)
         |SELECT id_a, id_b, sim FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CASE WHEN a.nrm > 0 AND b.nrm > 0
         |      THEN ${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
         |    END AS sim
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
         |WHERE sim > 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "q_cluster_sample" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
         |sims AS (
         |  SELECT e.vec_id AS id, c.cid,
         |    ${dot("e.embedding", "c.cv")}
         |      / (sqrt(${dot("e.embedding", "e.embedding")})
         |       * sqrt(${dot("c.cv", "c.cv")})) AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn
         |    FROM sims) WHERE rn = 1),
         |capped AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY cid ORDER BY id) AS rn
         |    FROM assigned) WHERE rn <= 10)
         |SELECT id, cid FROM capped ORDER BY id""".stripMargin,

    "q_semantic_decontam" ->
      s"""WITH b AS (
         |  SELECT vec_id AS bid, embedding AS bv,
         |    sqrt(${dot("embedding", "embedding")}) AS bn
         |  FROM embeddings WHERE vec_id < 32),
         |c AS (
         |  SELECT vec_id AS id, embedding AS cv,
         |    sqrt(${dot("embedding", "embedding")}) AS qn
         |  FROM embeddings WHERE vec_id >= 32),
         |sims AS (
         |  SELECT c.id, b.bid,
         |    CASE WHEN c.qn > 0 AND b.bn > 0
         |      THEN ${dot("c.cv", "b.bv")} / (c.qn * b.bn) END AS sim
         |  FROM c CROSS JOIN b),
         |best AS (
         |  SELECT id, bid AS bench_id, sim AS bench_sim,
         |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY sim DESC, bid) AS rn
         |  FROM sims)
         |SELECT id, bench_id, bench_sim,
         |  COALESCE(bench_sim >= 0.35, FALSE) AS contaminated
         |FROM best WHERE rn = 1 ORDER BY id""".stripMargin,

    "q_l2_to_rep" ->
      s"""WITH rep AS (
         |  SELECT label, min(vec_id) AS rep_id FROM embeddings GROUP BY label),
         |repv AS (
         |  SELECT r.label, e.embedding AS rep_v
         |  FROM rep r JOIN embeddings e ON e.vec_id = r.rep_id)
         |SELECT e.vec_id, e.label,
         |  list_sum(list_transform(range(1, len(e.embedding) + 1),
         |    i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(r.rep_v[i] AS DOUBLE))
         |       * (CAST(e.embedding[i] AS DOUBLE) - CAST(r.rep_v[i] AS DOUBLE)))) AS l2_sq
         |FROM embeddings e JOIN repv r ON e.label = r.label
         |ORDER BY e.vec_id""".stripMargin,
  )
}
