package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation for retrieval training data — the gate a
  * dual-encoder / reranker pipeline runs after every index or model
  * change: given a ranked candidate list and graded relevance
  * judgments, score each query with the standard IR metrics
  * (Järvelin & Kekäläinen 2002 for NDCG; TREC conventions for the
  * rest). Pure column math over top-k-sized frames — the corpus never
  * appears; at 100 TB the expensive part is producing `ranked`, and
  * this op costs |queries|·k regardless.
  */
object Retrieval {

  /** Per-query metrics at cutoff `k`.
    *
    * `ranked`: (qid, rank, nid), rank 1-based — the contract every
    * top-k op in this engine emits ([[Ann.bruteTopK]],
    * [[TextIndex.probeBm25Index]] after ranking, …). `qrels`:
    * (qid, nid, grade) graded judgments; grade > 0 means relevant,
    * missing pairs are grade 0. Emits per qid:
    *
    *  - `mrr`        — 1/rank of the first relevant retrieved doc
    *                   (0 when none in the top k);
    *  - `ndcg`       — Σ (2^grade − 1)/log2(rank+1) over the retrieved
    *                   list, normalized by the ideal DCG of the k best
    *                   judgments (ties on grade broken by nid, so the
    *                   ideal ordering — and the metric — is
    *                   deterministic and engine-reproducible);
    *  - `map`        — average precision: Σ over relevant retrieved
    *                   ranks r of (relevant-so-far / r), divided by
    *                   TOTAL relevant (the trec_eval convention; 0
    *                   when the query has no relevant docs);
    *  - `precision`  — relevant-retrieved / k;
    *  - `recall`     — relevant-retrieved / total relevant (0 when the
    *                   query has no relevant docs).
    *
    * Every sum folds in EXPLICIT rank order (sorted-array aggregate —
    * the BM25 score-parts contract), so the doubles are
    * associativity-deterministic; divisions round to 9 dp. NO query in
    * `ranked` is silently dropped: queries absent from `qrels` — and
    * queries whose ranked rows all sit beyond `k` (reachable only with
    * non-contiguous rank inputs; r12 ADVICE) — score 0 across the
    * board, because a silent drop would inflate the macro average
    * exactly for the worst queries. */
  def rankedEval(ranked: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val graded = ranked.filter(col("rank") <= k)
      .join(qrels.select(col("qid"), col("nid"),
          col("grade").cast("double").as("__g")),
        Seq("qid", "nid"), "left")
      .select(col("qid"), col("rank"),
        coalesce(col("__g"), lit(0.0)).as("g"))
    val perQ = graded.groupBy(col("qid"))
      .agg(collect_list(struct(col("rank"), col("g"))).as("es"))
      .select(col("qid"),
        // rank-ordered fold: array_sort on (rank, g) sorts by rank
        aggregate(array_sort(col("es")), lit(0.0), (acc, e) =>
          acc + (pow(lit(2.0), e.getField("g")) - 1.0) /
            log2(e.getField("rank").cast("double") + 1.0)).as("dcg"),
        // AP numerator: precision-at-r summed at each relevant rank —
        // a (relevant-so-far, sum) struct accumulator folded in rank
        // order; non-relevant ranks contribute an explicit +0.0 so
        // the addition sequence is engine-reproducible
        aggregate(array_sort(col("es")),
          struct(lit(0.0).as("nrel"), lit(0.0).as("s")),
          (acc, e) => struct(
            (acc.getField("nrel") +
              when(e.getField("g") > 0, 1.0).otherwise(0.0)).as("nrel"),
            (acc.getField("s") +
              when(e.getField("g") > 0,
                (acc.getField("nrel") + 1.0) /
                  e.getField("rank").cast("double"))
                .otherwise(0.0)).as("s")),
          acc => acc.getField("s")).as("ap_sum"),
        array_min(filter(
          transform(col("es"), e =>
            when(e.getField("g") > 0, e.getField("rank"))),
          x => x.isNotNull)).as("first_rel"),
        size(filter(col("es"), e => e.getField("g") > 0))
          .cast("double").as("n_rel_ret"))
    // ideal DCG: the k best judgments in (grade desc, nid asc) order
    val ideal = qrels.filter(col("grade") > 0)
      .groupBy(col("qid"))
      .agg(collect_list(struct((-col("grade").cast("double")).as("ng"),
          col("nid"))).as("gl"),
        count(lit(1)).cast("double").as("n_rel"))
      .select(col("qid"), col("n_rel"),
        aggregate(
          zip_with(
            slice(array_sort(col("gl")), 1, k),
            sequence(lit(1), least(size(col("gl")), lit(k))),
            (e, i) => struct(i.as("rank"), (-e.getField("ng")).as("g"))),
          lit(0.0), (acc, e) =>
            acc + (pow(lit(2.0), e.getField("g")) - 1.0) /
              log2(e.getField("rank").cast("double") + 1.0)).as("idcg"))
    def r9(c: Column): Column = round(c, 9)
    // left-join back onto the FULL ranked qid set: a qid whose ranked
    // rows all exceed k must zero-fill, never vanish (r12 ADVICE)
    ranked.select(col("qid")).distinct()
      .join(perQ, Seq("qid"), "left")
      .join(ideal, Seq("qid"), "left")
      .select(col("qid"),
        r9(when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel").cast("double")).otherwise(0.0)).as("mrr"),
        r9(when(coalesce(col("n_rel"), lit(0.0)) > 0,
          coalesce(col("ap_sum"), lit(0.0)) / col("n_rel")).otherwise(0.0))
          .as("map"),
        r9(when(coalesce(col("idcg"), lit(0.0)) > 0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg")).otherwise(0.0))
          .as("ndcg"),
        r9(coalesce(col("n_rel_ret"), lit(0.0)) / k).as("precision"),
        r9(when(coalesce(col("n_rel"), lit(0.0)) > 0,
          coalesce(col("n_rel_ret"), lit(0.0)) / col("n_rel")).otherwise(0.0))
          .as("recall"))
  }

  /** Macro summary over [[rankedEval]]'s per-query frame — the
    * leaderboard-standard scalar set: query count plus the macro
    * (unweighted per-query) average of every metric. ONE aggregate
    * over |queries| rows; the per-metric sums fold in explicit qid
    * order (sorted-array aggregate), so the scalars are bit-stable
    * across engines before the 9 dp rounding. */
  def rankedEvalSummary(perQuery: DataFrame): DataFrame = {
    val metrics = Seq("mrr", "map", "ndcg", "precision", "recall")
    def mean(name: String): Column =
      when(col("n_queries") > 0,
        round(aggregate(array_sort(col("es")), lit(0.0),
            (acc, e) => acc + e.getField(name)) /
          col("n_queries").cast("double"), 9))
        .as(s"macro_$name")
    perQuery
      .agg(count(lit(1)).as("n_queries"),
        collect_list(struct(
          (col("qid") +: metrics.map(col)): _*)).as("es"))
      .select((col("n_queries") +: metrics.map(mean)): _*)
  }

  /** Classifier calibration report — the other standing eval gate of a
    * curation pipeline: quality/toxicity/language filters are threshold
    * consumers, and a mis-CALIBRATED score (accurate ranking, wrong
    * probabilities) silently shifts every threshold's true cut rate.
    * Bins `confidence` (∈ [0,1]; out-of-range or null rows and null
    * labels are excluded) into `nBins` equal-width bins — conf 1.0
    * closes into the top bin — and emits the reliability diagram plus
    * the expected calibration error (Naeini et al. 2015):
    *
    *   ECE = Σ_b (n_b / N) · |frac_pos_b − avg_conf_b|
    *
    * Per-bin rows: (bin, n, avg_conf, frac_pos, gap, n_total, ece) —
    * the scalar columns repeat per row (one frame is the whole report).
    * Empty bins are omitted (they carry no mass and contribute nothing
    * to ECE). avg/frac round to 9 dp BEFORE the ECE fold, so the fold
    * consumes bit-identical inputs on every engine, and the fold itself
    * runs in explicit bin order over the ≤ nBins summary rows — never
    * the corpus (scale shape: one map-side-combined groupBy, then
    * arithmetic over nBins rows). */
  def calibrationReport(df: DataFrame, confidence: Column, label: Column,
                        nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val c = confidence.cast("double")
    // filter on the CASTED label: a label whose cast is null (a
    // try_cast the caller passed for malformed-tolerant input, or any
    // non-ANSI deployment's silent null — under ANSI a malformed
    // string fails loudly at the cast, spec-pinned) must leave the row
    // out of n AND the averages together, or frac_pos silently
    // averages over a different denominator than the ECE weights
    val y = label.cast("boolean").cast("double")
    val binned = df
      .filter(c.isNotNull && c >= 0.0 && c <= 1.0 && y.isNotNull)
      .select(least(floor(c * nBins), lit(nBins - 1L)).cast("long").as("bin"),
        c.as("conf"), y.as("y"))
    val per = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      round(avg(col("conf")), 9).as("avg_conf"),
      round(avg(col("y")), 9).as("frac_pos"))
    val tot = per.agg(sum(col("n")).as("n_total"),
        collect_list(struct(col("bin"), col("n"), col("avg_conf"),
          col("frac_pos"))).as("es"))
      .select(col("n_total"),
        round(
          aggregate(array_sort(col("es")), lit(0.0), (acc, e) =>
            acc + e.getField("n").cast("double") *
              abs(e.getField("frac_pos") - e.getField("avg_conf")))
            / col("n_total").cast("double"), 9).as("ece"))
    per
      .withColumn("gap", round(abs(col("frac_pos") - col("avg_conf")), 9))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("avg_conf"), col("frac_pos"),
        col("gap"), col("n_total"), col("ece"))
  }
}
