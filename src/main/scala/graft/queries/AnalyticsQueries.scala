package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Fingerprint, Funnel, Scale, Sketch, TimeSeries}
import graft.schema.Tables

/** Product/corpus-analytics surface beyond the reference: time-series
  * gap-fill, ordered-step funnels, cohort retention, bounded top-k per
  * group, winnowing fingerprints, and the Z-order clustering key — each
  * oracle-checked against DuckDB on the shared fixtures.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(38, 2))

  /** Funnel definition shared by query and oracle: view → click →
    * purchase, later steps within 7 days of the user's first view. */
  private val funnelSteps = Seq("view", "click", "purchase")
  private val funnelHorizonSecs = 7L * 86400

  private val winnowK = 8
  private val winnowW = 4

  // pair detection uses LONGER grams: shared 27-char passages are rare
  // enough in the fixture corpus to keep candidate buckets tiny, which
  // is exactly the tuning a real corpus needs against boilerplate
  private val pairK = 20
  private val pairW = 8
  private val pairMaxBucket = 100
  private val pairMinShared = 2

  private val hhSupport = 0.1
  private val hhEps = 0.001

  private val zBits = 10
  private val zMod = 1L << zBits

  // layout-audit measurement shared by q_layout_audit and
  // q_hilbert_audit — ONE probe set and file count, so the two
  // layouts stay comparable
  private val auditProbes = Seq(13L, 300L, 517L, 700L, 1000L)
  private val auditFiles = 8

  /** Bipartite user↔event-type interaction graph shared by q_degrees
    * and q_pagerank ("the same bipartite graph" is one definition). */
  private def bipartiteEdges(s: SparkSession, dir: String): DataFrame = {
    val uv = t(s, dir, "events")
      .select(concat(lit("u:"), col("user_id").cast("string")).as("u"),
        concat(lit("t:"), col("event_type")).as("v")).distinct()
    uv.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(uv.select(col("v").as("src"), col("u").as("dst")))
  }

  /** The oracle-side twin of [[bipartiteEdges]]: a shared `e` CTE. */
  private val bipartiteEdgesCte: String =
    """WITH e AS (
      |  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
      |    't:' || event_type AS dst FROM events
      |  UNION
      |  SELECT DISTINCT 't:' || event_type,
      |    'u:' || CAST(user_id AS VARCHAR) FROM events)""".stripMargin

  /** Value-exact DuckDB restatement of [[graft.ops.Sketch.kmvSetOps]]
    * over the finished/open order custkey sets: the same xxhash64 (the
    * XxhashSql pipeline) over each DISTINCT key set, min-k retained
    * arrays via list_sort + slice, and the estimator arithmetic with
    * the Scala-rendered normalization literals — every double is
    * computed through the identical operation sequence. */
  private def kmvOverlapOracleSql(k: Int): String = {
    val c1 = graft.ops.Sketch.KmvShift.toString
    val c2 = graft.ops.Sketch.KmvScale.toString
    def hashes(st: String): String = {
      val p = new XxhashSql.Prog(
        s"SELECT DISTINCT o_custkey AS uid FROM orders WHERE o_orderstatus = '$st'")
      val h = XxhashSql.hashLong(p, XxhashSql.unsigned("uid"), "42")
      p.render(s"${XxhashSql.signed(h)} AS h")
    }
    def u(x: String) = s"((CAST($x AS DOUBLE) + $c1) / $c2)"
    def theta(arr: String) =
      s"(CASE WHEN len($arr) >= $k THEN ${u(s"($arr)[$k]")} ELSE 1.0 END)"
    def est(arr: String) =
      s"(CASE WHEN len($arr) >= $k THEN ${(k - 1).toDouble} / ${u(s"($arr)[$k]")}" +
        s" ELSE CAST(len($arr) AS DOUBLE) END)"
    s"""WITH ha AS (${hashes("F")}),
       |hb AS (${hashes("O")}),
       |r AS (
       |  SELECT (SELECT list_sort(list(h)) FROM ha)[1:$k] AS ra,
       |         (SELECT list_sort(list(h)) FROM hb)[1:$k] AS rb),
       |m AS (
       |  SELECT ra, rb,
       |    list_sort(list_distinct(list_concat(ra, rb)))[1:$k] AS rm,
       |    LEAST(${theta("ra")}, ${theta("rb")}) AS th
       |  FROM r),
       |ex AS (
       |  SELECT
       |    (SELECT COUNT(*) FROM ha) AS exact_a,
       |    (SELECT COUNT(*) FROM hb) AS exact_b,
       |    (SELECT COUNT(*) FROM (
       |       SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
       |       INTERSECT
       |       SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'))
       |      AS exact_intersect)
       |SELECT CAST($k AS INTEGER) AS k,
       |  ROUND(${est("ra")}, 9) AS nd_a_est,
       |  ROUND(${est("rb")}, 9) AS nd_b_est,
       |  ROUND(${est("rm")}, 9) AS nd_union_est,
       |  ROUND(CAST(len(list_filter(ra,
       |      x -> list_contains(rb, x) AND ${u("x")} < th)) AS DOUBLE) / th, 9)
       |    AS nd_intersect_est,
       |  ROUND(CAST(len(list_filter(ra,
       |      x -> NOT list_contains(rb, x) AND ${u("x")} < th)) AS DOUBLE) / th, 9)
       |    AS nd_a_only_est,
       |  CAST(exact_a AS BIGINT) AS exact_a,
       |  CAST(exact_b AS BIGINT) AS exact_b,
       |  CAST(exact_intersect AS BIGINT) AS exact_intersect,
       |  CAST(exact_a - exact_intersect AS BIGINT) AS exact_a_only
       |FROM m, ex""".stripMargin
  }

  /** [[kmvOverlapOracleSql]] generalized to the q_kmv_matrix pairs:
    * one retained-set CTE per order status, one estimator block per
    * (a < b) status pair, jaccard from the rounded estimates. */
  private def kmvMatrixOracleSql(k: Int): String = {
    val c1 = graft.ops.Sketch.KmvShift.toString
    val c2 = graft.ops.Sketch.KmvScale.toString
    def hashes(st: String): String = {
      val p = new XxhashSql.Prog(
        s"SELECT DISTINCT o_custkey AS uid FROM orders WHERE o_orderstatus = '$st'")
      val h = XxhashSql.hashLong(p, XxhashSql.unsigned("uid"), "42")
      p.render(s"${XxhashSql.signed(h)} AS h")
    }
    def u(x: String) = s"((CAST($x AS DOUBLE) + $c1) / $c2)"
    def theta(arr: String) =
      s"(CASE WHEN len($arr) >= $k THEN ${u(s"($arr)[$k]")} ELSE 1.0 END)"
    def est(arr: String) =
      s"(CASE WHEN len($arr) >= $k THEN ${(k - 1).toDouble} / ${u(s"($arr)[$k]")}" +
        s" ELSE CAST(len($arr) AS DOUBLE) END)"
    val statuses = Seq("F", "O", "P")
    val hashCtes = statuses.map(st =>
      s"h$st AS (${hashes(st)}),\n" +
        s"r$st AS (SELECT (SELECT list_sort(list(h)) FROM h$st)[1:$k] AS ret)")
      .mkString(",\n")
    def pair(a: String, b: String): String =
      s"""SELECT '$a' AS group_a, '$b' AS group_b, CAST($k AS INTEGER) AS k,
         |  ROUND(${est("ra")}, 9) AS nd_a_est,
         |  ROUND(${est("rb")}, 9) AS nd_b_est,
         |  ROUND(${est("rm")}, 9) AS nd_union_est,
         |  ROUND(CAST(len(list_filter(ra,
         |      x -> list_contains(rb, x) AND ${u("x")} < th)) AS DOUBLE) / th, 9)
         |    AS nd_intersect_est,
         |  CASE WHEN ROUND(${est("rm")}, 9) > 0
         |    THEN ROUND(ROUND(CAST(len(list_filter(ra,
         |        x -> list_contains(rb, x) AND ${u("x")} < th)) AS DOUBLE) / th, 9)
         |      / ROUND(${est("rm")}, 9), 9)
         |    ELSE 0.0 END AS jaccard_est
         |FROM (
         |  SELECT ra, rb,
         |    list_sort(list_distinct(list_concat(ra, rb)))[1:$k] AS rm,
         |    LEAST(${theta("ra")}, ${theta("rb")}) AS th
         |  FROM (SELECT (SELECT ret FROM r$a) AS ra,
         |               (SELECT ret FROM r$b) AS rb))""".stripMargin
    val pairs = for {
      i <- statuses.indices; j <- statuses.indices if i < j
    } yield pair(statuses(i), statuses(j))
    s"""WITH $hashCtes
       |SELECT * FROM (
       |${pairs.mkString("\nUNION ALL\n")})
       |ORDER BY group_a, group_b""".stripMargin
  }

  /** DuckDB restatement of [[graft.expr.catalyst.HilbertKernel.d]]:
    * the same per-level fold, one derived column per intermediate so
    * operand duplication stays O(1) (the XxhashSql.Prog pattern). */
  private def hilbertOracleSql: String = {
    val p = new XxhashSql.Prog(
      s"SELECT p_partkey, CAST(p_partkey % $zMod AS BIGINT) AS hx0, " +
        s"CAST((CAST(p_size AS BIGINT) * 7919) % $zMod AS BIGINT) AS hy0 " +
        "FROM part")
    var x = "hx0"; var y = "hy0"; var d = "CAST(0 AS BIGINT)"
    for (i <- 0 until zBits) {
      val s = 1L << (zBits - 1 - i)
      val rx = p.add(s"CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END")
      val ry = p.add(s"CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END")
      d = p.add(s"$d + ${s * s} * xor(3 * $rx, $ry)")
      val tx = p.add(s"CASE WHEN $ry = 0 AND $rx = 1 THEN ${s - 1} - $x ELSE $x END")
      val ty = p.add(s"CASE WHEN $ry = 0 AND $rx = 1 THEN ${s - 1} - $y ELSE $y END")
      val nx = p.add(s"CASE WHEN $ry = 0 THEN $ty ELSE $tx END")
      val ny = p.add(s"CASE WHEN $ry = 0 THEN $tx ELSE $ty END")
      x = nx; y = ny
    }
    p.render(s"p_partkey, CAST($d AS BIGINT) AS hval") + " ORDER BY p_partkey"
  }

  /** The q_zorder3 coordinate triple as SQL fragments (one definition
    * shared by the z and hilbert 3-D oracles). */
  private def coord3Sql = Seq(
    s"CAST(p_partkey % $zMod AS BIGINT)",
    s"CAST((CAST(p_size AS BIGINT) * 7919) % $zMod AS BIGINT)",
    s"CAST((CAST(round(p_retailprice * 100, 0) AS BIGINT) * 104729) % $zMod AS BIGINT)")

  /** The same triple as Spark columns (the q_zorder3 derivations —
    * round BEFORE the long cast: Spark truncates double→long, DuckDB
    * rounds; round(…, 0) pins both). */
  private def coord3Cols = Seq(
    pmod(col("p_partkey"), lit(zMod)),
    pmod(col("p_size").cast("long") * 7919L, lit(zMod)),
    pmod(round(col("p_retailprice") * 100, 0).cast("long") * 104729L, lit(zMod)))

  /** DuckDB restatement of [[graft.expr.catalyst.HilbertKernel.dN]]
    * (Skilling's transpose, n = 3): inverse undo, Gray encode, and the
    * bit interleave, one derived column per mutated register — the
    * hilbertOracleSql pattern extended to the n-D walk. */
  private def hilbert3OracleSql: String = {
    val p = new XxhashSql.Prog(
      s"SELECT p_partkey, ${coord3Sql(0)} AS c0, ${coord3Sql(1)} AS c1, " +
        s"${coord3Sql(2)} AS c2 FROM part")
    val x = Array("c0", "c1", "c2")
    // inverse undo
    var q = 1L << (zBits - 1)
    while (q > 1) {
      val pm = q - 1
      for (i <- 0 until 3) {
        if (i == 0) {
          // the i = 0 else-branch is a no-op (t = (x0 ^ x0) & p = 0)
          x(0) = p.add(
            s"CASE WHEN (${x(0)} & $q) > 0 THEN xor(${x(0)}, $pm) ELSE ${x(0)} END")
        } else {
          val cond = p.add(s"CASE WHEN (${x(i)} & $q) > 0 THEN 1 ELSE 0 END")
          val t = p.add(
            s"CASE WHEN $cond = 1 THEN 0 ELSE xor(${x(0)}, ${x(i)}) & $pm END")
          x(0) = p.add(
            s"CASE WHEN $cond = 1 THEN xor(${x(0)}, $pm) ELSE xor(${x(0)}, $t) END")
          x(i) = p.add(s"xor(${x(i)}, $t)") // t = 0 when cond: a no-op
        }
      }
      q >>= 1
    }
    // Gray encode
    x(1) = p.add(s"xor(${x(1)}, ${x(0)})")
    x(2) = p.add(s"xor(${x(2)}, ${x(1)})")
    var t = "CAST(0 AS BIGINT)"
    q = 1L << (zBits - 1)
    while (q > 1) {
      t = p.add(s"CASE WHEN (${x(2)} & $q) > 0 THEN xor($t, ${q - 1}) ELSE $t END")
      q >>= 1
    }
    for (i <- 0 until 3) x(i) = p.add(s"xor(${x(i)}, $t)")
    // interleave: level j's dim-i bit lands at 3j + (2 - i) — dim 0
    // most significant within the level, the kernel's append order
    val h = (for { j <- (0 until zBits).reverse; i <- 0 to 2 } yield
      s"(((${x(i)} >> $j) & 1) << ${3 * j + (2 - i)})").mkString("(", " | ", ")")
    p.render(s"p_partkey, CAST($h AS BIGINT) AS hval3") + " ORDER BY p_partkey"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Daily-spine gap-fill with forward fill (ops.TimeSeries): per-user
    // purchase-value series regularized from each user's first purchase
    // day to the table's last day; missing days carry the last observed
    // value forward and are flagged observed=false.
    "q_gapfill" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(dec(sum(dec(col("value")))).cast("double").as("value_ffill"))
      TimeSeries.gapFillDaily(daily, "user_id", "day", Seq("value_ffill"))
        .select(col("user_id"), col("day").cast("timestamp").as("day"),
          col("value_ffill"), col("observed"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Per-group z-score anomaly report (ops.Anomaly): events whose value
    // sits more than 3 population standard deviations from its
    // event_type's mean. The stats frame is GROUP-sized and broadcast —
    // one scan plus a per-row projection, no row shuffle at any scale.
    // z rounds to 4dp INSIDE the operator so thresholding is
    // reproducible across engines (the operator's documented contract).
    "q_anomaly" -> ((s, dir) => {
      graft.ops.Anomaly.outliers(
          t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
          "value", Seq("event_type"), threshold = 3.0)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"),
          round(col("grp_mean"), 4).as("grp_mean"),
          round(col("grp_std"), 4).as("grp_std"),
          col("z"))
        .orderBy(col("event_id"))
    }),

    // Degree summary over the same bipartite graph — the cheap first
    // look before ranking: one aggregate per direction, full-outer
    // merged; symmetric construction makes out_deg == in_deg, which the
    // oracle independently restates.
    "q_degrees" -> ((s, dir) =>
      graft.ops.Graph.degrees(bipartiteEdges(s, dir)).orderBy(col("node"))),

    // Robust anomaly report (median/MAD — the baseline the outliers
    // cannot corrupt): events beyond 3.5 robust sigmas of their
    // event_type's median. Two group-sized stats passes broadcast back;
    // rz rounds inside the operator (engine-reproducible thresholding).
    "q_anomaly_robust" -> ((s, dir) => {
      graft.ops.Anomaly.robustZScores(
          t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
          "value", Seq("event_type"))
        .filter(abs(col("rz")) > 3.5)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"),
          round(col("grp_median"), 4).as("grp_median"),
          round(col("grp_mad"), 4).as("grp_mad"),
          col("rz"))
        .orderBy(col("event_id"))
    }),

    // Per-group winsorization: values clamped into their event_type's
    // exact [p1, p99] quantiles — one bounds pass (group-sized,
    // broadcast) + one clamping scan.
    "q_winsorize" -> ((s, dir) => {
      graft.ops.Anomaly.winsorize(
          t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
          "value", Seq("event_type"), loPct = 0.01, hiPct = 0.99)
        .select(col("event_id"), col("event_type"),
          round(col("value_wins"), 4).as("value_wins"),
          round(col("grp_lo"), 4).as("grp_lo"),
          round(col("grp_hi"), 4).as("grp_hi"))
        .orderBy(col("event_id"))
    }),

    // Ordered-step funnel (ops.Funnel): users who viewed, then clicked
    // strictly after the first view, then purchased after that click —
    // all within 7 days of the first view. Per-stage reach + conversion.
    "q_funnel" -> ((s, dir) => {
      Funnel.summary(t(s, dir, "events"), "user_id", "ts", "event_type",
        funnelSteps, Some(funnelHorizonSecs))
    }),

    // PageRank over the bipartite user↔event-type interaction graph
    // (ops.Graph): 3 synchronous damped rounds, each ONE edge-vs-rank
    // join + a map-side-combined aggregate — (node, double) pairs are
    // all that shuffle; rounds checkpoint so lineage stays flat. The
    // symmetric construction has no dangling nodes; the operator's
    // dangling redistribution is spec-gated separately. The oracle
    // restates the SAME 3 rounds as unrolled CTEs.
    "q_pagerank" -> ((s, dir) => {
      graft.ops.Graph.pageRank(bipartiteEdges(s, dir), iters = 3)
        .select(col("node"), round(col("rank"), 8).as("rank"))
        .orderBy(col("node"))
    }),

    // Shuffle-key skew diagnosis (ops.Scale.skewReport): the
    // measurement that decides whether salting/AQE-skew handling is
    // needed BEFORE the join runs. Top-10 heaviest user_ids with the
    // global shape; orderBy+limit plans as TakeOrderedAndProject (a
    // distributed per-partition top-k), never a global window sort
    // over the key counts.
    "q_skew_report" -> ((s, dir) =>
      graft.ops.Scale.skewReport(t(s, dir, "events"), Seq("user_id"), topK = 10)
        .orderBy(col("rank"))),

    // Approximate distinct-overlap (ops.Sketch.distinctOverlap): how
    // many order custkeys exist among customers, WITHOUT running the
    // join — two HLL passes + inclusion-exclusion. The gate computes
    // the exact answer too and requires the estimates within 10%.
    "q_distinct_overlap" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val est = graft.ops.Sketch.distinctOverlap(o, "o_custkey", c, "c_custkey")
      val exact = o.select(col("o_custkey")).distinct()
        .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("exact_intersect"))
        .crossJoin(broadcast(o.agg(
          countDistinct(col("o_custkey")).as("exact_a"))))
        .crossJoin(broadcast(c.agg(
          countDistinct(col("c_custkey")).as("exact_b"))))
      est.crossJoin(broadcast(exact)).select(
        col("exact_a"), col("exact_b"), col("exact_intersect"),
        (abs(col("nd_a") - col("exact_a")) * 10 <= col("exact_a"))
          .as("a_within_10pct"),
        (abs(col("nd_b") - col("exact_b")) * 10 <= col("exact_b"))
          .as("b_within_10pct"),
        (abs(col("nd_intersect_est") - col("exact_intersect")) * 10
          <= col("exact_intersect")).as("intersect_within_10pct"))
    }),

    // KMV / theta-sketch set operations (ops.Sketch.kmvSetOps): the
    // audience-overlap question answered with DIRECT intersection and
    // difference estimators (HLL's inclusion-exclusion compounds error
    // and cannot do A\B at all), and — because the retained hash sets
    // are a pure function of the key sets — the ESTIMATES themselves
    // are value-exact cross-engine: the oracle reproduces them through
    // the restated xxhash64 pipeline, bit for bit. Exact counts ride
    // along as the accuracy context (the q_distinct_overlap posture).
    "q_kmv_overlap" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      // partially-overlapping key sets (≈4% symmetric difference at
      // sf0.01): customers with finished vs open orders
      def keys(st: String) =
        o.filter(col("o_orderstatus") === st).select(col("o_custkey"))
      val est = graft.ops.Sketch.kmvSetOps(
        keys("F"), "o_custkey", keys("O"), "o_custkey", k = 64)
      val exact = keys("F").distinct()
        .join(keys("O").distinct(), Seq("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("exact_intersect"))
        .crossJoin(broadcast(keys("F")
          .agg(countDistinct(col("o_custkey")).as("exact_a"))))
        .crossJoin(broadcast(keys("O")
          .agg(countDistinct(col("o_custkey")).as("exact_b"))))
      est.crossJoin(broadcast(exact)).select(
        col("k"), col("nd_a_est"), col("nd_b_est"), col("nd_union_est"),
        col("nd_intersect_est"), col("nd_a_only_est"),
        col("exact_a"), col("exact_b"), col("exact_intersect"),
        (col("exact_a") - col("exact_intersect")).as("exact_a_only"))
    }),

    // Pairwise KMV overlap MATRIX (Sketch.kmvOverlapMatrix): one corpus
    // pass builds a bounded sketch per order-status group, every status
    // pair's overlap/jaccard estimates come from the k-long retained
    // sets alone — the source-overlap audit a training-mix curator runs
    // before weighting sources. Same value-exact contract as
    // q_kmv_overlap: retained sets are pure functions of the key sets,
    // so the estimates reproduce bit-for-bit through the oracle's
    // restated xxhash64 pipeline.
    "q_kmv_matrix" -> ((s, dir) => {
      graft.ops.Sketch.kmvOverlapMatrix(
          t(s, dir, "orders"), "o_custkey", "o_orderstatus", k = 64)
        .orderBy(col("group_a"), col("group_b"))
    }),

    // Persisted KMV sketch state (Sketch.writeKmvState / absorbKmvState):
    // the distinct-count member of the mergeable-state family. Seeded
    // from one third of orders, two batches absorbed — the absorbed
    // state must be BIT-IDENTICAL to the one-shot sketch over all
    // orders (min-k over a distinct set is associative), which is
    // exactly what the oracle computes: a hash mismatch here means the
    // absorb path diverged from the one-shot path.
    "q_kmv_incr" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val statePath = graft.Scratch.dir("graft-kmvstate", dir)
      graft.ops.Sketch.writeKmvState(
        o.filter(col("o_orderkey") % 3 === 0), "o_custkey", k = 64, statePath)
      graft.ops.Sketch.absorbKmvState(
        o.filter(col("o_orderkey") % 3 === 1), "o_custkey", statePath)
      graft.ops.Sketch.absorbKmvState(
        o.filter(col("o_orderkey") % 3 === 2), "o_custkey", statePath)
      graft.ops.Sketch.readKmvState(s, statePath)
    }),

    // TIME-TRAVEL read of a persisted state (the r14 StateStore seam's
    // free Iceberg-class read, mirroring q_bm25_time_travel for the
    // mergeable-state family): seed the KMV sketch from a third of
    // orders (version v), absorb the rest (v+1), then read BOTH
    // versions — the as-of read must reproduce the seed-only sketch
    // VALUE-EXACTLY (the oracle restates its xxhash64/min-k pipeline
    // over the same slice) even though the current version has
    // absorbed everything. The audit question this answers in
    // production: "what had we seen before this batch?"
    "q_state_time_travel" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val statePath = graft.Scratch.dir("graft-kmvtt", dir)
      graft.ops.Sketch.writeKmvState(
        o.filter(col("o_orderkey") % 3 === 0), "o_custkey", k = 64, statePath)
      val v1 = graft.ops.StateStore.snapshot(s, statePath).version
      graft.ops.Sketch.absorbKmvState(
        o.filter(col("o_orderkey") % 3 =!= 0), "o_custkey", statePath)
      graft.ops.Sketch.readKmvState(s, statePath, asOfVersion = Some(v1))
        .select(col("k"), col("n_kept").as("n_kept_v1"),
          col("nd_est").as("nd_est_v1"))
        .crossJoin(graft.ops.Sketch.readKmvState(s, statePath)
          .select(col("n_kept").as("n_kept_cur"),
            col("nd_est").as("nd_est_cur")))
    }),

    // Cohort retention: customers grouped by first-order month; how many
    // ordered again k months later (k ≤ 12). The classic retention
    // triangle — two shuffles (first-order agg, cohort-offset agg).
    "q_cohort_retention" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("month"))
      val first = o.groupBy(col("o_custkey")).agg(min(col("month")).as("cohort_month"))
      o.join(first, Seq("o_custkey"))
        .select(col("cohort_month"),
          months_between(col("month"), col("cohort_month")).cast("long").as("month_offset"),
          col("o_custkey"))
        .filter(col("month_offset") <= 12)
        .groupBy(col("cohort_month"), col("month_offset"))
        .agg(countDistinct(col("o_custkey")).as("active_customers"))
        .orderBy(col("cohort_month"), col("month_offset"))
    }),

    // Bounded top-k per group via the argmax-k aggregate (k rows per
    // partition through the shuffle, O(n log k) — the scale-safe
    // replacement for row_number-then-filter, which sorts EVERY group
    // member; the oracle IS that window formulation, proving identical
    // results). Ties: higher price first, then lower orderkey.
    "q_topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      val top3 = column(graft.expr.catalyst.TopKByScore(
        expression(struct(col("o_totalprice"),
          col("o_orderkey").cast("long"))), 3).toAggregateExpression())
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(top3.as("__top"))
        .select(col("o_orderpriority"), posexplode(col("__top")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("long").as("rnk"),
          col("col.id").as("o_orderkey"),
          col("col.score").as("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),

    // Winnowing fingerprints (ops.Fingerprint): the full selected-hash
    // set per document, hash-compared against DuckDB running the
    // IDENTICAL rolling-hash arithmetic — any shared substring of
    // length ≥ k+w−1 between two documents shares a fingerprint.
    "q_winnow" -> ((s, dir) => {
      Fingerprint.winnow(t(s, dir, "documents"), "doc_id", "text",
          winnowK, winnowW)
        .orderBy(col("doc_id"), col("fp"))
    }),

    // Substring-overlap candidate pairs from winnowed fingerprints
    // (ops.Fingerprint.overlapCandidates): documents sharing ≥ 2
    // selected fingerprints of 20-char grams — bucket-local pair
    // combinatorics, never a corpus self-join; the oracle restates the
    // whole chain (winnow → capped buckets → pairs → shared counts).
    "q_winnow_pairs" -> ((s, dir) => {
      Fingerprint.overlapCandidates(t(s, dir, "documents"), "doc_id", "text",
          pairK, pairW, minShared = pairMinShared, maxBucket = pairMaxBucket)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Heavy hitters: keys with ≥ 10% support, exact counts cross-checked
    // against a count-min sketch (ops.Sketch) — estimate ≥ exact and
    // ≤ exact + eps·N surfaced as assertion-oracle booleans (the
    // frequency-sketch companion of q_approx_distinct's HLL).
    "q_heavy_hitters" -> ((s, dir) => {
      Sketch.heavyHittersCms(t(s, dir, "events"), "event_type",
          support = hhSupport, eps = hhEps)
        .orderBy(col("event_type"))
    }),

    // Z-order clustering key (ops.Scale.zValue): bit-interleave of two
    // bucketed dimensions, oracle-proven against the same expansion in
    // DuckDB. The layout writer built on it (Scale.writeZOrdered) is
    // footer-stat-verified in AnalyticsSpec.
    "q_zorder" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          Scale.zValue(pmod(col("p_partkey"), lit(zMod)),
            pmod(col("p_size").cast("long") * 7919L, lit(zMod)), zBits).as("zval"))
        .orderBy(col("p_partkey"))
    }),

    // LAYOUT AUDIT (ops.Layout): write the 3-dim z-ordered layout and a
    // single-column-sorted control to scratch, then measure — from the
    // files themselves — the fraction of files a point filter must
    // read per dimension. The driver-visible gate asserts the z layout
    // skips files on its secondary dims STRICTLY better than the
    // column sort (and bounds the primary dim absolutely); file counts
    // are exact. A writeZOrderedN regression that stops clustering
    // flips the booleans and the oracle hash goes red.
    "q_layout_audit" -> ((s, dir) => {
      import graft.ops.Layout
      val nF = auditFiles
      val zdf = t(s, dir, "part").select(
        col("p_partkey"),
        pmod(col("p_partkey"), lit(zMod)).as("a"),
        pmod(col("p_size").cast("long") * 7919L, lit(zMod)).as("b"),
        pmod(round(col("p_retailprice") * 100, 0).cast("long") * 104729L,
          lit(zMod)).as("c"))
      val base = graft.Scratch.dir("graft-layout", dir)
      Scale.writeZOrderedN(zdf, s"$base/z", Seq("a", "b", "c"),
        bits = zBits, nFiles = nF)
      zdf.repartitionByRange(nF, col("a")).sortWithinPartitions(col("a"))
        .write.mode("overwrite").parquet(s"$base/plain")
      // checkpoint the stats frames (see q_hilbert_audit — each
      // readFraction/count call re-ran the footer-stats aggregation)
      val zs = graft.ops.Reliable.checkpoint(
        Layout.fileStats(s, s"$base/z", Seq("a", "b", "c")))
      val ps = graft.ops.Reliable.checkpoint(
        Layout.fileStats(s, s"$base/plain", Seq("a", "b", "c")))
      def f(st: org.apache.spark.sql.DataFrame, d: String) =
        Layout.readFraction(st, d, auditProbes)
      import s.implicits._
      Seq((zs.count(), ps.count(),
        f(zs, "a") < 0.9,
        f(zs, "b") < f(ps, "b"), f(zs, "c") < f(ps, "c")))
        .toDF("n_files_z", "n_files_plain", "z_skips_a",
          "z_beats_plain_b", "z_beats_plain_c")
    }),

    // Dense 0-based global index (ops.Scale.zipWithOrderedIndex): the
    // scale-safe replacement for row_number() OVER (ORDER BY …) — range
    // partition + per-partition numbering + driver offset cumsum over
    // #partitions scalars, entirely in DataFrame ops (no RDD seam, no
    // global single-partition window). Oracle-pinned against DuckDB's
    // actual row_number over the same total order at every SF.
    "q_ordered_index" -> ((s, dir) => {
      Scale.zipWithOrderedIndex(
          t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
            col("c_acctbal")),
          Seq(col("c_nationkey"), col("c_acctbal"), col("c_custkey")), "idx")
        .orderBy(col("c_custkey"))
    }),

    // Hilbert LAYOUT AUDIT (the q_layout_audit posture on the curve
    // layout): write the Hilbert-clustered layout and a single-column
    // sort to scratch, measure per-dim point-filter read fractions
    // from the file footers. Gates: the curve layout bounds BOTH dims
    // (connected regions -> tight min/max on each) while the plain
    // sort reads everything on b.
    "q_hilbert_audit" -> ((s, dir) => {
      import graft.ops.Layout
      val nF = auditFiles
      val hdf = t(s, dir, "part").select(
        col("p_partkey"),
        pmod(col("p_partkey"), lit(zMod)).as("a"),
        pmod(col("p_size").cast("long") * 7919L, lit(zMod)).as("b"))
      val base = graft.Scratch.dir("graft-hilbert", dir)
      Scale.writeHilbertOrdered(hdf, s"$base/h", "a", "b",
        bits = zBits, nFiles = nF)
      hdf.repartitionByRange(nF, col("a")).sortWithinPartitions(col("a"))
        .write.mode("overwrite").parquet(s"$base/plain")
      // checkpoint the (file-count-sized) stats frames and read each
      // fraction ONCE: every readFraction/count call re-ran the full
      // footer-stats aggregation over the written layout (7 scans of h
      // where 1 suffices — guide §1.2)
      val hs = graft.ops.Reliable.checkpoint(
        Layout.fileStats(s, s"$base/h", Seq("a", "b")))
      val ps = graft.ops.Reliable.checkpoint(
        Layout.fileStats(s, s"$base/plain", Seq("a", "b")))
      def f(st: org.apache.spark.sql.DataFrame, d: String) =
        Layout.readFraction(st, d, auditProbes)
      val (ha, hb, pb) = (f(hs, "a"), f(hs, "b"), f(ps, "b"))
      import s.implicits._
      Seq((hs.count(), ps.count(),
        ha < 0.9, hb < 0.9, hb < pb))
        .toDF("n_files_h", "n_files_plain", "h_skips_a", "h_skips_b",
          "h_beats_plain_b")
    }),

    // Hilbert-curve layout key (ops.Scale.hilbertValue): the 2-D
    // space-filling curve with strictly better locality than Z-order
    // (consecutive positions are ALWAYS adjacent cells — adjacency and
    // bijection exhaustively pinned in AnalyticsSpec). Fused integer
    // kernel; the oracle replays the classic xy→d walk step for step
    // (quadrant fold + frame rotation per level) as derived columns —
    // value-exact, the q_zorder posture.
    "q_hilbert" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          Scale.hilbertValue(pmod(col("p_partkey"), lit(zMod)),
            pmod(col("p_size").cast("long") * 7919L, lit(zMod)), zBits).as("hval"))
        .orderBy(col("p_partkey"))
    }),

    // n-column Z-order key (ops.Scale.zValueN, VERDICT r8 item 7):
    // 3-way bit-round-robin over bucketed (key, size, retailprice)
    // dims — the layout key that gives a file tight min/max stats on
    // ALL THREE columns (file-skipping measured in AnalyticsSpec);
    // oracle-proven against the identical SQL expansion (zValueSqlN).
    "q_zorder3" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          Scale.zValueN(coord3Cols, zBits).as("zval"))
        .orderBy(col("p_partkey"))
    }),

    // 3-D Hilbert index (Skilling's n-D transpose walk,
    // Scale.hilbertValueN) over the SAME coordinate triple as
    // q_zorder3 — value-exact: the oracle replays inverse-undo, Gray
    // encode and the bit interleave as derived columns. Adjacency and
    // bijection are exhaustively pinned in AnalyticsSpec (the property
    // that makes a contiguous index range ONE connected 3-D region
    // where Z-order teleports).
    "q_hilbert3" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          Scale.hilbertValueN(coord3Cols, zBits).as("hval3"))
        .orderBy(col("p_partkey"))
    }),

    // Footer-measured 3-D layout audit (the q_hilbert_audit posture):
    // the Hilbert-3 layout must bound ALL THREE dims per file, and its
    // MEAN probe read fraction across the dims must match-or-beat the
    // Z-order-3 layout's (+0.1 noise rail — fractions quantize at
    // 1/(files·probes) = 0.025 per boundary wobble). Measured result
    // this gate protects (8 files, 5 probes/dim): mean fraction h vs z
    // = 0.27 vs 0.29 (sf0.001), 0.53 vs 0.55 (sf0.01), 0.49 vs 0.58
    // (sf0.1) — Hilbert wins the aggregate at every SF, but NOT every
    // single dim at small SFs (sf0.01 dim c measured 0.65 vs 0.50):
    // the n-D curve trades per-dim worst case for total locality, so a
    // per-dim dominance gate would be asserting something the data
    // disproves.
    "q_hilbert3_audit" -> ((s, dir) => {
      import graft.ops.Layout
      val nF = auditFiles
      val hdf = t(s, dir, "part").select(
        col("p_partkey"),
        coord3Cols(0).as("a"), coord3Cols(1).as("b"), coord3Cols(2).as("c"))
      val base = graft.Scratch.dir("graft-hilbert3", dir)
      Scale.writeHilbertOrderedN(hdf, s"$base/h", Seq("a", "b", "c"),
        bits = zBits, nFiles = nF)
      Scale.writeZOrderedN(hdf, s"$base/z", Seq("a", "b", "c"),
        bits = zBits, nFiles = nF)
      // checkpoint + read each fraction once — the booleans and the
      // means previously re-ran the footer-stats aggregation per call
      // (11 layout scans where 3 suffice — guide §1.2)
      val hs = graft.ops.Reliable.checkpoint(
        Layout.fileStats(s, s"$base/h", Seq("a", "b", "c")))
      val zs = graft.ops.Reliable.checkpoint(
        Layout.fileStats(s, s"$base/z", Seq("a", "b", "c")))
      def f(st: org.apache.spark.sql.DataFrame, d: String) =
        Layout.readFraction(st, d, auditProbes)
      val (ha, hb, hc) = (f(hs, "a"), f(hs, "b"), f(hs, "c"))
      import s.implicits._
      val hMean = (ha + hb + hc) / 3.0
      val zMean = (f(zs, "a") + f(zs, "b") + f(zs, "c")) / 3.0
      Seq((hs.count(), zs.count(),
        ha < 0.9, hb < 0.9, hc < 0.9,
        hMean <= zMean + 0.1))
        .toDF("n_files_h", "n_files_z", "h_skips_a", "h_skips_b", "h_skips_c",
          "h_mean_le_z")
    }),
  )

  /** Winnowing restated as SQL CTEs ending in `f(doc_id, fp)` — the
    * DISTINCT selected-fingerprint set, from the SAME hash expansion
    * as the Spark kernel (Fingerprint.gramHashSql). */
  private def winnowCte(k: Int, w: Int): String = {
    val hashSql = Fingerprint.gramHashSql("text", "pos", k)
    s"""d AS (
       |  SELECT doc_id, text, length(text) - ${k - 1} AS maxpos
       |  FROM documents WHERE length(text) >= ${k + w - 1}),
       |g AS (
       |  SELECT doc_id, text, maxpos,
       |    unnest(generate_series(1, maxpos)) AS pos
       |  FROM d),
       |h AS (SELECT doc_id, maxpos, pos, $hashSql AS h FROM g),
       |m AS (
       |  SELECT doc_id, maxpos, pos,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
       |  FROM h),
       |f AS (SELECT DISTINCT doc_id, fp FROM m WHERE pos <= maxpos - ${w - 1})""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS DOUBLE) AS day_value
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |bounds AS (SELECT user_id, MIN(day) AS d0 FROM daily GROUP BY 1),
        |gmax AS (SELECT MAX(day) AS d1 FROM daily),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds, gmax)
        |SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS value_ffill,
        |  d.day_value IS NOT NULL AS observed
        |FROM spine s LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    // the same 3 damped rounds unrolled as explicit CTEs — no dangling
    // terms because the bipartite construction gives every node an
    // out-edge
    "q_pagerank" -> {
      val iters = 3
      val base =
        s"""$bipartiteEdgesCte,
          |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
          |nodes AS (SELECT DISTINCT src AS node FROM e
          |          UNION SELECT DISTINCT dst FROM e),
          |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM nodes),
          |pr0 AS (SELECT node, 1.0/c AS r FROM nodes, nn)""".stripMargin
      val steps = (1 to iters).map { i =>
        s"""pr$i AS (
           |  SELECT n.node, 0.15/nn.c + 0.85 * COALESCE(s.cs, 0) AS r
           |  FROM nodes n CROSS JOIN nn
           |  LEFT JOIN (
           |    SELECT e.dst AS node, SUM(p.r / deg.d) AS cs
           |    FROM e JOIN pr${i - 1} p ON e.src = p.node
           |    JOIN deg ON e.src = deg.src
           |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
      }
      base + ",\n" + steps.mkString(",\n") +
        s"\nSELECT node, round(r, 8) AS rank FROM pr$iters ORDER BY node"
    },

    // same population statistics, same 4dp-rounded z, same > threshold;
    // join null-safely (IS NOT DISTINCT FROM) — the operator scores
    // null-group rows against the null group's own statistics
    "q_anomaly" ->
      """WITH s AS (
        |  SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
        |  round(m, 4) AS grp_mean, round(sd, 4) AS grp_std,
        |  round((e.value - m) / sd, 4) AS z
        |FROM events e JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
        |WHERE sd > 0 AND abs(round((e.value - m) / sd, 4)) > 3.0
        |ORDER BY e.event_id""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (
        |  SELECT COALESCE(CAST(user_id AS VARCHAR), '<null>') AS key,
        |    COUNT(*) AS key_rows
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT CAST(SUM(key_rows) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(MAX(key_rows) AS BIGINT) AS max_key_rows FROM c),
        |t AS (
        |  SELECT key, key_rows,
        |    ROW_NUMBER() OVER (ORDER BY key_rows DESC, key) AS rank
        |  FROM c)
        |SELECT CAST(rank AS INTEGER) AS rank, key,
        |  CAST(key_rows AS BIGINT) AS key_rows, n_rows, n_keys, max_key_rows,
        |  ROUND(max_key_rows / (CAST(n_rows AS DOUBLE) / n_keys), 4)
        |    AS skew_factor
        |FROM t, s WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // KMV estimates restated VALUE-EXACTLY: the same xxhash64 over the
    // distinct key sets (XxhashSql pipeline), the same min-k retained
    // arrays (list_sort + slice), and the same normalization /
    // estimator double arithmetic with identical spliced literals —
    // DuckDB reproduces every estimate bit for bit, the property that
    // distinguishes KMV from the assertion-gated HLL twin below.
    "q_kmv_overlap" -> kmvOverlapOracleSql(k = 64),

    "q_kmv_matrix" -> kmvMatrixOracleSql(k = 64),

    // the one-shot sketch over ALL orders — absorb associativity makes
    // the incremental state equal it bit for bit
    "q_kmv_incr" -> {
      val c1 = graft.ops.Sketch.KmvShift.toString
      val c2 = graft.ops.Sketch.KmvScale.toString
      val p = new XxhashSql.Prog(
        "SELECT DISTINCT o_custkey AS uid FROM orders")
      val h = XxhashSql.hashLong(p, XxhashSql.unsigned("uid"), "42")
      val hs = p.render(s"${XxhashSql.signed(h)} AS h")
      s"""WITH hs AS ($hs),
         |r AS (SELECT (SELECT list_sort(list(h)) FROM hs)[1:64] AS arr)
         |SELECT CAST(64 AS INTEGER) AS k,
         |  CAST(len(arr) AS INTEGER) AS n_kept,
         |  ROUND(CASE WHEN len(arr) >= 64
         |    THEN 63.0 / ((CAST((arr)[64] AS DOUBLE) + $c1) / $c2)
         |    ELSE CAST(len(arr) AS DOUBLE) END, 9) AS nd_est
         |FROM r""".stripMargin
    },

    // both versions' sketches restated value-exactly: the as-of read
    // over the seed slice, the current read over all orders
    "q_state_time_travel" -> {
      val c1 = graft.ops.Sketch.KmvShift.toString
      val c2 = graft.ops.Sketch.KmvScale.toString
      def hashed(where: String): String = {
        val p = new XxhashSql.Prog(
          s"SELECT DISTINCT o_custkey AS uid FROM orders $where")
        val h = XxhashSql.hashLong(p, XxhashSql.unsigned("uid"), "42")
        p.render(s"${XxhashSql.signed(h)} AS h")
      }
      def est(arr: String): String =
        s"""ROUND(CASE WHEN len($arr) >= 64
           |  THEN 63.0 / ((CAST(($arr)[64] AS DOUBLE) + $c1) / $c2)
           |  ELSE CAST(len($arr) AS DOUBLE) END, 9)""".stripMargin
      s"""WITH hs1 AS (${hashed("WHERE o_orderkey % 3 = 0")}),
         |r1 AS (SELECT (SELECT list_sort(list(h)) FROM hs1)[1:64] AS arr),
         |hs2 AS (${hashed("")}),
         |r2 AS (SELECT (SELECT list_sort(list(h)) FROM hs2)[1:64] AS arr)
         |SELECT CAST(64 AS INTEGER) AS k,
         |  CAST(len(r1.arr) AS INTEGER) AS n_kept_v1,
         |  ${est("r1.arr")} AS nd_est_v1,
         |  CAST(len(r2.arr) AS INTEGER) AS n_kept_cur,
         |  ${est("r2.arr")} AS nd_est_cur
         |FROM r1, r2""".stripMargin
    },

    // the oracle states the exact overlap; the estimates are
    // engine-internal and gated by the within-10% booleans
    "q_distinct_overlap" ->
      """WITH a AS (SELECT COUNT(DISTINCT o_custkey) AS exact_a FROM orders),
        |b AS (SELECT COUNT(DISTINCT c_custkey) AS exact_b FROM customer),
        |i AS (SELECT COUNT(*) AS exact_intersect FROM (
        |  SELECT DISTINCT o_custkey FROM orders
        |  JOIN customer ON o_custkey = c_custkey))
        |SELECT CAST(exact_a AS BIGINT) AS exact_a,
        |  CAST(exact_b AS BIGINT) AS exact_b,
        |  CAST(exact_intersect AS BIGINT) AS exact_intersect,
        |  TRUE AS a_within_10pct, TRUE AS b_within_10pct,
        |  TRUE AS intersect_within_10pct
        |FROM a, b, i""".stripMargin,

    "q_degrees" ->
      s"""$bipartiteEdgesCte,
        |o AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_deg
        |      FROM e GROUP BY 1),
        |i AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_deg
        |      FROM e GROUP BY 1)
        |SELECT COALESCE(o.node, i.node) AS node,
        |  COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
        |FROM o FULL JOIN i ON o.node = i.node ORDER BY node""".stripMargin,

    // same median/MAD estimators (quantile_cont == Spark percentile),
    // same consistency constant, same rounded threshold; null-safe joins
    "q_anomaly_robust" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(e.value - med.m), 0.5) AS md
        |  FROM events e JOIN med ON e.event_type IS NOT DISTINCT FROM med.event_type
        |  GROUP BY 1)
        |SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
        |  round(m, 4) AS grp_median, round(md, 4) AS grp_mad,
        |  round((e.value - m) / (1.4826 * md), 4) AS rz
        |FROM events e
        |JOIN med ON e.event_type IS NOT DISTINCT FROM med.event_type
        |JOIN mad ON e.event_type IS NOT DISTINCT FROM mad.event_type
        |WHERE md > 0 AND abs(round((e.value - m) / (1.4826 * md), 4)) > 3.5
        |ORDER BY e.event_id""".stripMargin,

    // same exact quantile bounds, same clamp; null-safe join. The
    // clamp is NULL-guarded: DuckDB's LEAST/GREATEST SKIP nulls (so a
    // bare clamp would coerce a NULL value to grp_lo) while the Spark
    // operator's documented contract keeps null values NULL.
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.01) AS lo,
        |    quantile_cont(value, 0.99) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  CASE WHEN e.value IS NULL THEN NULL
        |    ELSE round(LEAST(GREATEST(e.value, lo), hi), 4) END AS value_wins,
        |  round(lo, 4) AS grp_lo, round(hi, 4) AS grp_hi
        |FROM events e JOIN b ON e.event_type IS NOT DISTINCT FROM b.event_type
        |ORDER BY e.event_id""".stripMargin,

    "q_funnel" -> {
      val horizon = s"INTERVAL ${funnelHorizonSecs} SECONDS"
      s"""WITH v AS (
         |  SELECT user_id, MIN(ts) AS t1 FROM events
         |  WHERE event_type = '${funnelSteps(0)}' GROUP BY 1),
         |c AS (
         |  SELECT e.user_id, v.t1, MIN(e.ts) AS t2
         |  FROM events e JOIN v USING (user_id)
         |  WHERE e.event_type = '${funnelSteps(1)}' AND e.ts > v.t1
         |    AND e.ts <= v.t1 + $horizon
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT e.user_id, MIN(e.ts) AS t3
         |  FROM events e JOIN c USING (user_id)
         |  WHERE e.event_type = '${funnelSteps(2)}' AND e.ts > c.t2
         |    AND e.ts <= c.t1 + $horizon
         |  GROUP BY 1),
         |s AS (
         |  SELECT 1 AS step, '${funnelSteps(0)}' AS stage, COUNT(*) AS keys FROM v
         |  UNION ALL SELECT 2, '${funnelSteps(1)}', COUNT(*) FROM c
         |  UNION ALL SELECT 3, '${funnelSteps(2)}', COUNT(*) FROM p),
         |b AS (SELECT keys AS base FROM s WHERE step = 1)
         |SELECT CAST(step AS BIGINT) AS step, stage, keys,
         |  ROUND(CAST(keys AS DOUBLE) / CAST(base AS DOUBLE), 4) AS conversion
         |FROM s, b ORDER BY step""".stripMargin
    },

    "q_cohort_retention" ->
      """WITH o AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS month FROM orders),
        |f AS (SELECT o_custkey, MIN(month) AS cohort_month FROM o GROUP BY 1)
        |SELECT f.cohort_month,
        |  CAST(date_diff('month', f.cohort_month, o.month) AS BIGINT) AS month_offset,
        |  COUNT(DISTINCT o.o_custkey) AS active_customers
        |FROM o JOIN f USING (o_custkey)
        |WHERE date_diff('month', f.cohort_month, o.month) <= 12
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_topk_per_group" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey, o_totalprice
        |FROM r WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,

    "q_winnow" ->
      s"""WITH ${winnowCte(winnowK, winnowW)}
         |SELECT doc_id, fp FROM f
         |ORDER BY doc_id, fp""".stripMargin,

    "q_winnow_pairs" ->
      s"""WITH ${winnowCte(pairK, pairW)},
         |b AS (SELECT fp, COUNT(*) AS n FROM f GROUP BY 1),
         |p AS (
         |  SELECT f1.doc_id AS id_a, f2.doc_id AS id_b
         |  FROM f f1 JOIN f f2 ON f1.fp = f2.fp AND f1.doc_id < f2.doc_id
         |  JOIN b ON b.fp = f1.fp
         |  WHERE b.n <= $pairMaxBucket)
         |SELECT id_a, id_b, COUNT(*) AS n_shared FROM p GROUP BY 1, 2
         |HAVING COUNT(*) >= $pairMinShared
         |ORDER BY id_a, id_b""".stripMargin,

    // assertion-oracle: exact heavy-hitter counts; the CMS bound
    // booleans must come back TRUE from the Spark side
    "q_heavy_hitters" ->
      s"""WITH t AS (SELECT COUNT(*) AS total FROM events)
         |SELECT event_type, COUNT(*) AS n,
         |  TRUE AS est_ge_exact, TRUE AS est_within_eps
         |FROM events, t GROUP BY event_type, t.total
         |HAVING COUNT(*) >= $hhSupport * t.total
         |ORDER BY event_type""".stripMargin,

    "q_zorder" -> {
      val z = Scale.zValueSql(s"CAST(p_partkey % $zMod AS BIGINT)",
        s"CAST((CAST(p_size AS BIGINT) * 7919) % $zMod AS BIGINT)", zBits)
      s"""SELECT p_partkey, $z AS zval FROM part ORDER BY p_partkey""".stripMargin
    },

    // assertion-oracle: exact file counts + the expected layout verdict
    "q_layout_audit" ->
      """SELECT CAST(8 AS BIGINT) AS n_files_z,
        |  CAST(8 AS BIGINT) AS n_files_plain,
        |  TRUE AS z_skips_a, TRUE AS z_beats_plain_b,
        |  TRUE AS z_beats_plain_c""".stripMargin,

    // the distributed two-phase numbering must equal the engine's own
    // global rank exactly (0-based), over the identical total order
    "q_ordered_index" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  CAST(row_number() OVER (ORDER BY c_nationkey, c_acctbal, c_custkey) - 1
        |    AS BIGINT) AS idx
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the classic xy→d walk replayed as one derived-column chain per
    // level (quadrant fold + rotation — the XxhashSql.Prog pattern)
    "q_hilbert" -> hilbertOracleSql,

    "q_hilbert_audit" ->
      """SELECT CAST(8 AS BIGINT) AS n_files_h,
        |  CAST(8 AS BIGINT) AS n_files_plain,
        |  TRUE AS h_skips_a, TRUE AS h_skips_b,
        |  TRUE AS h_beats_plain_b""".stripMargin,

    // identical 3-way bit positions via the shared generator
    "q_zorder3" -> {
      val z = Scale.zValueSqlN(coord3Sql, zBits)
      s"""SELECT p_partkey, $z AS zval FROM part ORDER BY p_partkey""".stripMargin
    },

    "q_hilbert3" -> hilbert3OracleSql,

    // the audit's numbers are FOOTER-measured in Spark; the oracle
    // states the layout contract (both layouts land the requested file
    // count; hilbert bounds every dim and matches-or-beats z on the
    // mean read fraction — the per-dim measurements are in the query
    // doc)
    "q_hilbert3_audit" ->
      s"""SELECT CAST($auditFiles AS BIGINT) AS n_files_h,
         |  CAST($auditFiles AS BIGINT) AS n_files_z,
         |  TRUE AS h_skips_a, TRUE AS h_skips_b, TRUE AS h_skips_c,
         |  TRUE AS h_mean_le_z""".stripMargin,
  )
}
