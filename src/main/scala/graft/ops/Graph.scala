package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames — the companion family to
  * [[Dedup.connectedComponents]]: where components answer "which rows
  * are the same thing", PageRank answers "which nodes matter" —
  * boilerplate hubs in a near-dup graph, load-bearing entities in a
  * linkage graph, influential users in an interaction graph.
  *
  * Scale posture (the components playbook): the edge frame is joined
  * once per iteration against a NODE-sized rank frame — per round one
  * shuffle of (node, double) pairs plus one map-side-combined
  * aggregate; iterations are driver-coordinated with per-round
  * [[Reliable.checkpoint]] (lineage stays flat, an executor loss
  * recovers from the round boundary). Dangling mass is a 1-row scalar
  * broadcast, never a driver collect of node state.
  */
object Graph {

  /** Standard damped PageRank (Page et al. 1999) over a directed edge
    * frame (src, dst): `iters` synchronous rounds of
    *
    *   pr'(v) = (1−d)/N + d·( Σ_{u→v} pr(u)/outDeg(u) + D/N )
    *
    * where D is the total rank of dangling nodes (no out-edges),
    * redistributed uniformly — so Σ pr == 1 after every round (the
    * spec's conservation theorem). Returns (node, rank). Fixed
    * iteration count rather than convergence detection: rank queries
    * run a known budget (3–20 rounds) and a fixed count keeps the
    * result deterministic and oracle-restatable. Duplicate edges are
    * counted once (the edge SET defines the graph). */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val sc = edges.sparkSession.sparkContext
    // superseded rounds free their localCheckpoint blocks immediately
    // (the connectedComponents leak-class fix); reliable checkpoints
    // (dir configured) persist nothing here, so free() is a no-op
    def trackedCheckpoint(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = Reliable.checkpoint(df)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val (e, eIds) = trackedCheckpoint(
      edges.select(col("src"), col("dst")).distinct())
    val (nodes, nodeIds) = trackedCheckpoint(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count().toDouble
    // out-degree folded onto the edges once: each iteration's join
    // carries (src, dst, deg) against the rank frame only
    val (eDeg, eDegIds) = trackedCheckpoint(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src")))
    // the dangling SET is structural (nodes with no out-edge) — only
    // its MASS changes per round. Hoisted out of the loop (r14): the
    // per-round edge-sized distinct + anti join it used to pay was
    // both wasted work at scale and the query's variance source on the
    // bench (a latency-bound flock of tiny jobs)
    val (dang, dangIds) = trackedCheckpoint(
      nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti"))
    var (pr, prIds) = trackedCheckpoint(nodes.withColumn("rank", lit(1.0 / n)))
    var i = 0
    while (i < iters) {
      val contrib = eDeg
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("in_rank"))
      // dangling rank: the fixed dangling set's CURRENT mass — ONE
      // scalar row, broadcast back (never a collect of node state)
      val dangling = pr.join(dang, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("in_rank"), lit(0.0)) + col("dmass") / n))
            .as("rank"))
      val (nextPr, nextIds) = trackedCheckpoint(next)
      free(prIds)
      pr = nextPr; prIds = nextIds
      i += 1
    }
    // the returned pr is checkpointed (self-contained) — release the
    // edge-sized working frames NOW instead of pinning e/nodes/eDeg
    // (eDeg is the largest frame in the op) in executor storage until
    // the context cleaner happens to run (the connectedComponents
    // leak-class lesson: waiting degraded BENCH_r03/r04)
    free(eIds ++ nodeIds ++ eDegIds ++ dangIds)
    pr
  }

  /** Degree summary per node: (node, out_deg, in_deg) over the edge
    * SET — the cheap first look at any graph. One aggregate per
    * direction, full-outer merged. */
  def degrees(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
