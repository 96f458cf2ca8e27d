package graft

/** Plan-shape regressions: the properties that make the queries scale
  * (SURVEY §4, §7.6) asserted against the optimized physical plans —
  * pushdown reaching the scan, dims broadcasting, aggregates running
  * map-side partials, custom kernels staying inside codegen. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q_scan_project: range filter and projection reach the parquet scan") {
    val p = plan("q_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate") ||
      p.contains("GreaterThan(l_shipdate"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double"),
      "projection must prune to the selected columns + filter column\n" + p)
  }

  test("q_dim_join: dimension joins broadcast, aggregation has map-side partials") {
    val p = plan("q_dim_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin"), "dim joins must not sort-merge\n" + p)
  }

  test("q_group_agg: hash aggregate with partial (map-side) combine") {
    val p = plan("q_group_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q_cosine_topk: query side broadcasts; fused kernel + bounded top-k in plan") {
    val p = plan("q_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("graft_dot"), "fused dot kernel must be in the plan\n" + p)
    assert(p.contains("graft_top_k"),
      "bounded argmax-k aggregate (not a window sort) must rank\n" + p)
  }

  test("q_correlated_subquery: decorrelated into aggregate + join (the N+1 fix)") {
    val p = plan("q_correlated_subquery")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("Join") || p.contains("BroadcastHashJoin") ||
      p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.toLowerCase.contains("subquery") || !p.contains("InSubquery"),
      "scalar subquery must be rewritten, not executed per row\n" + p)
  }

  test("q_merge_upsert: merge is a single shuffled join on the key (no cartesian)") {
    val p = plan("q_merge_upsert")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_lsh_pairs: bucket aggregation, not a self-join of signatures") {
    val p = plan("q_lsh_pairs")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    // one scan of documents only (no join re-reading the table)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_hash_split: pure per-row projection — no shuffle except the output sort") {
    val p = plan("q_hash_split")
    assert(!p.contains("hashpartitioning"),
      "hash split must not shuffle\n" + p)
    assert(!p.contains("Join"), p)
  }

  test("q_contamination: benchmark grams broadcast; corpus text never shuffles") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // grams come from the fused kernel, not interpreted HOF chains
    assert(p.contains("graft_shingles"), "expected ShingleArray kernel\n" + p)
  }

  test("q_repetition: kernel grams, no join, no gram materialization for totals") {
    val p = plan("q_repetition")
    assert(p.contains("graft_shingles"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_seq_packing: window partitioned by shard (never a global window)") {
    val p = plan("q_seq_packing")
    assert(p.contains("Window"), p)
    assert(p.contains("windowspecdefinition(source"),
      "cumsum window must partition by the shard column\n" + p)
  }

  test("q_vocab_topk: map-side partial counts, bounded TakeOrdered head") {
    val p = plan("q_vocab_topk")
    assert(p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 head must be a bounded TakeOrdered, not a global sort\n" + p)
  }

  test("q_source_mix: rates broadcast back; the corpus is filtered, never shuffled") {
    val p = plan("q_source_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus-side shuffle join in a filter-in-place sampler\n" + p)
  }

  test("q_temperature_mix: rates broadcast back; the corpus is filtered, never shuffled") {
    val p = plan("q_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus-side shuffle join in a filter-in-place sampler\n" + p)
  }

  test("q_line_clean / q_gopher_rules: pure per-row — no join, no aggregate") {
    for (q <- Seq("q_line_clean", "q_gopher_rules")) {
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("HashAggregate"),
        s"$q should be scan→project→filter→sort only\n" + p)
    }
  }

  test("q_line_dedup: fingerprints aggregate and semi-join; no cartesian") {
    val p = plan("q_line_dedup")
    assert(p.contains("LeftSemi"), "frequent-line membership must be a semi join\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_substr_dedup: window hashes shuffle, text never does; kernel span merge") {
    val qe = SparkEntry.queries("q_substr_dedup")(spark, sfDir).queryExecution
    // the span-merge kernel collapses into the aggregate's result
    // projection in the physical printout — assert it on the analyzed
    // plan instead
    assert(qe.analyzed.toString.contains("graft_merge_spans"),
      "fused span-merge kernel expected\n" + qe.analyzed)
    val p = qe.executedPlan.toString
    // duplicated-hash detection must partial-aggregate map-side; the
    // per-doc position gather partial-collects before its shuffle
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_collect_list"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_adaptive_quality: thresholds broadcast back; the corpus is filtered, never shuffled") {
    val p = plan("q_adaptive_quality")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus-side shuffle join in a filter-in-place quality cut\n" + p)
  }

  test("q_decontam: benchmark window set broadcasts; corpus text never shuffle-joins") {
    val p = plan("q_decontam")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark window membership must be a broadcast semi join\n" + p)
    assert(p.contains("graft_merge_spans") ||
      SparkEntry.queries("q_decontam")(spark, sfDir)
        .queryExecution.analyzed.toString.contains("graft_merge_spans"),
      "fused span-merge kernel expected")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_lm_score: word-pair aggregations partial map-side; no cartesian corpus join") {
    val p = plan("q_lm_score")
    // pair/context counting must partial-aggregate before the shuffle
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop join allowed is the 1-row V scalar broadcast
    assert(!p.contains("SortMergeJoin") || p.contains("partial_count"),
      "unexpected plan shape\n" + p)
  }

  test("q_hybrid_rrf: both retrieval lists are distributed partial top-k, fusion never sees the corpus") {
    val p = plan("q_hybrid_rrf")
    // sparse side: TakeOrderedAndProject (distributed top-k), not a
    // global sort of the scored corpus
    assert(p.contains("TakeOrderedAndProject"), p)
    // dense side: the bounded argmax-k aggregate kernel
    assert(p.contains("graft_top_k") || p.contains("TopK"),
      "bounded top-k aggregate expected on the dense side\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_hard_negatives: anti join on the shortlist; bounded top-k through the shuffle") {
    val p = plan("q_hard_negatives")
    assert(p.contains("LeftAnti"), "positive drop must be an anti join\n" + p)
    assert(p.contains("graft_top_k") || p.contains("TopK"),
      "bounded argmax-k expected in the retrieval stage\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_incr_dedup: batch bands broadcast against the corpus index") {
    val p = plan("q_incr_dedup")
    assert(p.contains("BroadcastHashJoin"), p)
    // within-batch pairs are bucket-local aggregation, not a self-join
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    // signatures come from the fused kernel
    assert(p.contains("graft_minhash"), "expected MinHashSignature kernel\n" + p)
  }

  test("q_ann_int8_recall: quantized candidate stage keeps the fused kernel and bounded top-k") {
    val p = plan("q_ann_int8_recall")
    assert(p.contains("graft_dot"), "fused dot kernel expected on int8 arrays\n" + p)
    assert(p.contains("graft_top_k"), "bounded argmax-k expected\n" + p)
    assert(!p.contains("CartesianProduct"),
      "query side must broadcast, not cartesian\n" + p)
  }

  test("q_salted_join: join keys include the salt; no cartesian") {
    val p = plan("q_salted_join")
    // the replicated per-type side joins on (event_type, __salt);
    // which side broadcasts is the planner's call at fixture scale
    assert(p.contains("__salt"), "salt column must be a join key\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_bloom_semi: bloom pre-filter sits on the fact scan before the join") {
    val p = plan("q_bloom_semi")
    assert(p.contains("might_contain"),
      "bloom pruning filter must survive into the physical plan\n" + p)
    // the pre-filter must be BELOW the join: the might_contain text
    // appears after (deeper than) the semi join node in the tree print
    // (LeftSemi asserted present first — indexOf=-1 would pass vacuously)
    assert(p.contains("LeftSemi"), p)
    assert(p.indexOf("might_contain") > p.indexOf("LeftSemi"), p)
  }

  test("q_kmeans_quality: centroids broadcast, fused assignment, no window shuffle") {
    val p = plan("q_kmeans_quality")
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("graft_nearest_cents"),
      "fused per-row assignment kernel expected\n" + p)
    assert(!p.contains("Window"),
      "assignment must be the per-row kernel, not a row_number window " +
        "over the k-expanded corpus\n" + p)
    assert(!p.contains("CartesianProduct"),
      "centroid cross joins must broadcast\n" + p)
  }

  test("q_topk_per_group: bounded argmax-k aggregate, never a window sort") {
    val p = plan("q_topk_per_group")
    assert(p.contains("graft_top_k"),
      "bounded top-k aggregate expected\n" + p)
    assert(!p.contains("Window"),
      "row_number-over-window would sort every group member\n" + p)
  }

  test("q_gapfill: global max date broadcasts (1-row scalar), no cartesian blowup") {
    val p = plan("q_gapfill")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_winnow: native arithmetic only (no UDF), window partitioned by doc") {
    val p = plan("q_winnow")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"), p)
    assert(!p.contains("Join"), "winnowing is per-document — no join\n" + p)
  }

  test("q_winnow_pairs: bucket-local pair combinatorics, never a corpus self-join") {
    val p = plan("q_winnow_pairs")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "fingerprint buckets must aggregate ids\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "pairs come from sorted-id combinatorics inside buckets\n" + p)
  }

  test("q_heavy_hitters: sketch broadcasts as a 1-row frame; probe runs in-plan") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("graft_cms_estimate"),
      "CMS probe must be an in-plan expression, not a driver loop\n" + p)
    assert(p.contains("count_min_sketch"), p)
  }

  test("q_funnel: narrow stage joins and partial aggregates, no cartesian") {
    val p = plan("q_funnel")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the event payload must never join in: stage joins carry only
    // (user_id, ts) — no wide event columns in any join output
    assert(!p.contains("props"), "event payload columns leaked into the funnel plan\n" + p)
  }

  test("q_semdedup: centroids broadcast for assignment, cluster-local joins only") {
    val p = plan("q_semdedup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"),
      "assignment must be the per-row kernel, not a row_number window\n" + p)
  }

  test("q_cohort_retention: hash aggregates with map-side partials, no cartesian") {
    val p = plan("q_cohort_retention")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_snapshot_diff: ONE join on the key, no cartesian, value compares projected") {
    val p = plan("q_snapshot_diff")
    assert("SortMergeJoin".r.findAllIn(p).size +
      "BroadcastHashJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size === 1,
      "snapshot diff must be exactly one keyed join\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), "no window needed for a keyed diff\n" + p)
  }

  test("q_profile: a fixed number of scans, hash aggregation, no Expand sort") {
    val p = plan("q_profile")
    assert(!p.contains("CartesianProduct"), p)
    // the whole point of the two-hash-pass exact mode: no Expand into
    // a multi-key SortAggregate
    assert(!p.contains("Expand"), "exact profile must not plan Expand\n" + p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q_integrity: distinct parent key + single left join + global aggregate") {
    val p = plan("q_integrity")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_rp_recall: projected candidate stage keeps fused kernels and bounded top-k") {
    val p = plan("q_rp_recall")
    assert(p.contains("graft_random_project"), "projection kernel must be in-plan\n" + p)
    assert(p.contains("graft_dot"), "fused dot kernel must score candidates\n" + p)
    assert(p.contains("graft_top_k"), "bounded top-k aggregate expected\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_bpe_encode: encode is a pure per-row kernel; the 1-row gate broadcasts") {
    val p = plan("q_bpe_encode")
    assert(p.contains("graft_bpe_encode"), "BPE kernel must be in-plan\n" + p)
    assert(!p.contains("CartesianProduct"),
      "the 1-row parity gate must broadcast, never cartesian\n" + p)
  }

  test("q_anomaly: group stats broadcast back over one scan — no row shuffle join") {
    val p = plan("q_anomaly")
    assert(p.contains("BroadcastHashJoin"),
      "the group-sized stats frame must broadcast\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "scoring must not shuffle the event rows\n" + p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scd2Upsert: exactly one keyed join (current slice vs batch); closed history never joins") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val history = Seq(
      (1L, "a", ts, null.asInstanceOf[java.sql.Timestamp]),
      (2L, "b", ts, ts)).toDF("id", "tier", "valid_from", "valid_to")
    val p = graft.ops.Merge.scd2Upsert(history,
        Seq((1L, "c")).toDF("id", "tier"), Seq("id"),
        lit("2024-02-01 00:00:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert("SortMergeJoin".r.findAllIn(p).size +
      "BroadcastHashJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size === 1,
      "the upsert must be ONE current-vs-batch join\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), "no window needed for a keyed upsert\n" + p)
  }

  test("record linkage pairs: block-local combinatorics, no cartesian, levenshtein in-plan") {
    // the full q_record_linkage executed plan is lineage-truncated by
    // the components checkpoint, so pin the pair-generation stage — the
    // one whose shape decides whether linkage scales
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val recs = Seq((1L, "a", "k"), (2L, "b", "k")).toDF("id", "name", "bk")
    val p = graft.ops.Linkage.linkPairs(recs, "id", "name", col("bk"), 2)
      .pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "pair generation must stay block-local\n" + p)
    assert(p.toLowerCase.contains("levenshtein"),
      "the exact edit-distance confirm must be in the plan\n" + p)
    assert(!p.contains("SortMergeJoin") || p.contains("LeftAnti"),
      "the only join is the flood-block anti-join\n" + p)
  }

  test("q_semantic_decontam: bench packs + broadcasts, corpus never shuffles") {
    val p = plan("q_semantic_decontam")
    assert(p.contains("graft_nearest_cents"),
      "the fused nearest-bench pick must be in-plan\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the bench side must broadcast\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "the corpus must stream map-only — no corpus shuffle join\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_epoch_shuffle: one shard-hash exchange feeds the shard-local sort") {
    val p = plan("q_epoch_shuffle")
    assert(p.contains("xxhash64"), "the epoch key must be in-plan\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // exactly one hashpartitioning exchange (the shard window); the
    // final orderBy adds a range exchange — nothing else may shuffle
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"expected 1 shard hash exchange, got $hashEx\n" + p)
  }

  test("q_quantile_sketch: min-k runs a map-side partial; one group exchange") {
    val p = plan("q_quantile_sketch")
    assert(p.contains("partial_graft_min_k_by_hash"),
      "the sample must trim to m per partition BEFORE the shuffle\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"expected 1 group exchange, got $hashEx\n" + p)
  }
}
