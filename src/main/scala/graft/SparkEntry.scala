package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.Financial
import graft.ops.{Dedup, Merge}
import graft.queries.{AnalyticsQueries, CurationQueries, EventQueries, FinancialQueries, MultimodalQueries, PipelineQueries, SimilarityQueries, TextQueries}
import graft.schema.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §7 (build plan). Each entry exercises one operator family from the
  * inventory over the driver parquet fixtures; `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL on the same tables.
  *
  * Determinism: every query ends in a total ORDER BY on its key columns
  * (both sides), and aggregate outputs are cast to explicit exact types
  * (DECIMAL) or rounded doubles so the hash compare is stable.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)


  private def dec(c: Column): Column = c.cast(DecimalType(38, 2))

  /** Output canonicalization (VERDICT r1 item 1): aggregate exactly in
    * DECIMAL (order-independent across partitions), then surface the
    * FINAL column as DOUBLE so Spark-parquet-via-pandas and DuckDB
    * `fetchdf()` agree on representation (`Decimal('253942.00')` vs
    * float64). Every oracle applies the same outer CAST(.. AS DOUBLE). */
  private def decd(c: Column): Column = c.cast("double")

  /** Flagship (driver smoke-checks rows>0 on sf0.001): the full Stellar
    * pipeline DAG — the reference's richest task (SURVEY §3.3) as one
    * declarative job — plus the original composite query below it. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.queries("q_stellar_daily")(spark, "/root/testdata/sf0.001")

  /** The original round-1 composite flagship (kept as a secondary
    * exemplar: range scan, broadcast dims, top-1-per-key, YoY join). */
  def entryComposite(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")

    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))

    val slice = orders.filter(col("o_orderdate") > lit("1996-01-01").cast("timestamp")
      && col("o_orderdate") <= lit("2001-01-01").cast("timestamp"))

    val latest = Dedup.top1PerKey(slice, Seq("o_custkey"),
      Seq(col("o_orderdate"), col("o_orderkey")))

    val daily = slice.groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("date"))
      .agg(dec(sum(dec(col("o_totalprice")))).as("volume"), count(lit(1)).as("txns"))
    val prev = daily.select(col("o_custkey"), col("date"),
      col("volume").as("prev_volume"))
      .withColumn("date", date_add(col("date"), 14))
    val withYoy = daily.join(prev, Seq("o_custkey", "date"), "left")
      .withColumn("volume_yoy", Financial.yoy(col("volume").cast("double"),
        col("prev_volume").cast("double")))

    withYoy.join(latest.select(col("o_custkey"), col("o_orderkey").as("latest_order")),
        Seq("o_custkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select("o_custkey", "date", "volume", "txns", "volume_yoy",
        "latest_order", "n_name", "r_name")
  }

  /** One entry per implemented operator from SURVEY.md §2 (reference
    * surface below; beyond-reference LLM-pipeline surface contributed by
    * the graft.queries.* modules). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ TextQueries.queries ++ SimilarityQueries.queries ++
      EventQueries.queries ++ FinancialQueries.queries ++
      PipelineQueries.queries ++ MultimodalQueries.queries ++
      CurationQueries.queries ++ AnalyticsQueries.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.1/2.2 scans, projections, predicates ----

    // P1 column projection + P2 half-open incremental range (watermark
    // slice). Filter + pruning reach the parquet scan (PushedFilters).
    "q_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") <= lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P3/P4 point + compound predicates; P6 NOT-IN blocklist after lower()
    // (Bifrost.py:101-103 pseudo-asset filter re-expressed over events).
    "q_blocklist_filter" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(!lower(col("event_type")).isin("error", "view")
          && col("value").isNotNull && col("user_id") > 10)
        .select(col("event_id"), col("event_type"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    // ---- §2.4 aggregations ----

    // A1 + T3: watermark seed MIN(created_at) − 1s (metadata-only on
    // parquet row-group stats).
    "q_min_watermark" -> ((s, dir) => {
      t(s, dir, "orders")
        .agg((min(col("o_orderdate")) - expr("INTERVAL 1 SECOND")).as("watermark"))
    }),

    // A2 DISTINCT projection.
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderstatus")).distinct()
        .orderBy(col("o_orderstatus"))
    }),

    // grouped agg (beyond-reference §2.4 grouped rollups the facts imply):
    // hash aggregate w/ partial (map-side) combine; exact DECIMAL sums.
    "q_group_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decd(sum(dec(col("l_quantity")))).as("sum_qty"),
          decd(sum(dec(col("l_extendedprice")))).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A3 first-seen dedup under explicit deterministic order (§7.7 #4).
    "q_first_seen_dedup" -> ((s, dir) => {
      // order must be TOTAL per key (l_linenumber repeats at sf>=0.01) —
      // the deterministic-arrival-order requirement of SURVEY §7.7 #4.
      Dedup.firstSeen(t(s, dir, "lineitem"),
          Seq("l_orderkey"), Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .orderBy(col("l_orderkey"))
    }),

    // ---- §2.3 joins ----

    // J1 chain-dim lookup generalized: fact ⋈ broadcast dims (inner drops
    // non-matching, P7 semantics), grouped rollup per region/nation.
    "q_dim_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), decd(sum(dec(col("c_acctbal")))).as("acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // P7 guarded existence as semi-join (EXISTS).
    "q_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // P7 logged-drop side output as anti-join (NOT EXISTS).
    "q_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J3/W1: top-1-per-key (latest row per key) then usable as a lookup.
    "q_top1_per_key" -> ((s, dir) => {
      Dedup.top1PerKey(t(s, dir, "orders"),
          Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_custkey"))
    }),

    // J4/J5 + F5: point-in-time self-join at exact −14d offset (the
    // reference's YoY/QoQ — utils.py:92/:99), as equi-join on shifted
    // date (not lag) so sparse dates scale (SURVEY §7.6).
    "q_yoy_selfjoin" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("date"))
        .agg(dec(sum(dec(col("o_totalprice")))).as("volume"))
      val prev = daily.select(col("o_orderpriority"),
        date_add(col("date"), 14).as("date"), col("volume").as("prev_volume"))
      daily.join(prev, Seq("o_orderpriority", "date"), "left")
        // date → timestamp on output: engines agree on temporal encodings
        // for timestamps, while DATE round-trips ambiguously via pandas.
        .select(col("o_orderpriority"), col("date").cast("timestamp").as("date"),
          decd(col("volume")).as("volume"),
          Financial.yoy(col("volume").cast("double"),
            col("prev_volume").cast("double")).as("volume_yoy"))
        .orderBy(col("o_orderpriority"), col("date"))
    }),

    // ---- §2.6 upsert / merge ----

    // U2 partial-column merge: incoming batch updates only `total_price`,
    // existing-only keys keep their row, new keys insert whole row.
    "q_merge_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cut = lit("1999-01-01").cast("timestamp")
      def agg(df: DataFrame): DataFrame = df
        .groupBy(col("o_custkey"))
        .agg(dec(sum(dec(col("o_totalprice")))).as("total_price"),
          count(lit(1)).as("n_orders"))
      val existing = agg(orders.filter(col("o_orderdate") < cut))
      val incoming = agg(orders.filter(col("o_orderdate") >= cut))
      Merge.upsert(existing, incoming, Seq("o_custkey"), Seq("total_price"))
        .withColumn("total_price", decd(col("total_price")))
        .orderBy(col("o_custkey"))
    }),

    // T1/T2/T5 lifecycle made driver-visible: the whole range processed
    // as THREE half-open watermark slices, each merged into the keyed
    // state with Merge.upsert, the middle slice applied TWICE (an
    // at-least-once replay). Because slices partition the (custkey,
    // date) grain and upserts are idempotent, the final state must
    // equal the one-shot whole-range aggregate — which is exactly what
    // the oracle computes.
    "q_incremental_replay" -> ((s, dir) => {
      import java.sql.Timestamp
      val orders = t(s, dir, "orders")
      def daily(df: DataFrame): DataFrame = df
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("date"))
        .agg(decd(sum(dec(col("o_totalprice")))).as("volume"),
          count(lit(1)).as("n_orders"))
      val cuts = Seq("1970-01-01 00:00:00", "1996-01-01 00:00:00",
        "1999-01-01 00:00:00", "2999-01-01 00:00:00").map(Timestamp.valueOf)
      val slices = cuts.sliding(2).map { case Seq(lo, hi) =>
        daily(graft.ops.Incremental.slice(orders, col("o_orderdate"), lo, hi))
      }.toSeq
      val replayed = Seq(slices(0), slices(1), slices(1), slices(2))
      val empty = daily(orders.limit(0))
      replayed.foldLeft(empty)(
          Merge.upsert(_, _, Seq("o_custkey", "date"), Seq("volume", "n_orders")))
        .select(col("o_custkey"), col("date").cast("timestamp").as("date"),
          col("volume"), col("n_orders"))
        .orderBy(col("o_custkey"), col("date"))
    }),

    // Warehouse MAINTENANCE end-to-end, driver-visible: a scripted
    // lifecycle over a real date-partitioned parquet layout — initial
    // write, schema-evolving merge (a new `score` column arrives),
    // targeted key deletion (one key spans two dates; another empties
    // its whole date partition), small-file compaction — then the
    // final table is read back and compared row-for-row against the
    // oracle's literal expectation. Every step is the disk-mutating op
    // (Scale.writeDatePartitioned / Merge.upsertEvolving /
    // Scale.deleteKeys / Scale.compact), not an in-memory simulation.
    "q_warehouse_maint" -> ((s, dir) => {
      import s.implicits._
      val base = graft.Scratch.dir("graft-maint", dir)
      val init = Seq(
        (10L, "2024-01-01", 1.0), (11L, "2024-01-01", 2.0),
        (10L, "2024-01-02", 3.0), (12L, "2024-01-02", 4.0),
        (13L, "2024-01-03", 5.0), (14L, "2024-01-04", 6.0))
        .toDF("user_id", "dt", "v")
      graft.ops.Scale.writeDatePartitioned(init, base, "dt")
      val incoming = Seq((12L, "2024-01-02", 4.5, 0.9),
        (15L, "2024-01-05", 7.0, 0.5)).toDF("user_id", "dt", "v", "score")
      // partition-column inference types dt as DATE on read-back; the
      // lifecycle keeps it a plain string key
      val merged = Merge.upsertEvolving(s.read.parquet(base)
          .select(col("user_id"), col("dt").cast("string").as("dt"), col("v")),
        incoming, Seq("user_id", "dt"), Seq("v")).transform(graft.ops.Reliable.checkpoint)
      graft.ops.Scale.writeDatePartitioned(merged, base, "dt")
      graft.ops.Scale.deleteKeys(s, base, "dt", "user_id", Seq(10L, 14L))
      // compaction is per LEAF partition by contract (compact refuses a
      // partitioned root — flattening it would retype dt); data files
      // don't carry the partition column, so the root read after a leaf
      // rewrite still infers dt from the directory name
      graft.ops.Scale.compact(s, s"$base/dt=2024-01-02")
      s.read.parquet(base)
        .select(col("user_id"), col("dt").cast("string").as("dt"),
          col("v"), col("score"))
        .orderBy(col("user_id"))
    }),

    // Bloom-pruned semi join (the explicit runtime-filter shape): the
    // fact side is pre-filtered by a broadcast bloom sketch of the
    // (filtered) build side's keys BEFORE its shuffle; the exact semi
    // join then removes false positives, so the answer is identical to
    // the plain semi join the oracle runs — only the shuffle volume
    // changes at scale.
    "q_bloom_semi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      graft.ops.Bloom.semiJoinPruned(li, urgent, "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), decd(sum(dec(col("l_quantity")))).as("qty"))
        .orderBy(col("l_returnflag"))
    }),

    // The reference's N+1 per-row lookup (SURVEY §3.1 step 5) written as
    // the correlated scalar subquery it semantically is — Catalyst's
    // RewriteCorrelatedScalarSubquery decorrelates it into one aggregate
    // + join (PlanSpec asserts no per-row execution shape survives).
    "q_correlated_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("v_cust_corr")
      t(s, dir, "orders").createOrReplaceTempView("v_ord_corr")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT MAX(o_totalprice) FROM v_ord_corr
          |   WHERE o_custkey = c_custkey) AS max_order
          |FROM v_cust_corr ORDER BY c_custkey""".stripMargin)
    }),

    // SQL API surface: the same engine driven entirely through
    // spark.sql over registered views (TPC-H Q3 shape: filters on three
    // tables, two joins, grouped aggregate, ordered).
    "q_sql_api" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql(
        """SELECT l_orderkey,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)))
          |    AS DOUBLE) AS revenue,
          |  CAST(o_orderdate AS TIMESTAMP) AS orderdate, o_orderpriority
          |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
          |JOIN v_lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1995-03-15'
          |  AND l_shipdate > TIMESTAMP '1995-03-15'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey
          |LIMIT 20""".stripMargin)
    }),

    // ---- §2.9 set operations ----

    "q_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .union(o.filter(col("o_totalprice") > 400000).select(col("o_custkey")))
        .distinct().orderBy(col("o_custkey"))
    }),

    "q_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    "q_except" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.select(col("c_custkey"))
        .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey"))
    }),
  )

  /** DuckDB-equivalent ANSI SQL per query (same tables, same column
    * names/aliases — the driver sorts columns by name before hashing).
    * Queries absent here (probabilistic/hash-specific ops) get the
    * driver's rows-only check and are unit-tested instead. */
  def oracleSql: Map[String, String] =
    coreOracleSql ++ TextQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      EventQueries.oracleSql ++ FinancialQueries.oracleSql ++
      PipelineQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      CurationQueries.oracleSql ++ AnalyticsQueries.oracleSql

  private def coreOracleSql: Map[String, String] = Map(

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '1997-01-01' AND l_shipdate <= TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_blocklist_filter" ->
      """SELECT event_id, event_type, user_id
        |FROM events
        |WHERE lower(event_type) NOT IN ('error','view')
        |  AND value IS NOT NULL AND user_id > 10
        |ORDER BY event_id""".stripMargin,

    "q_min_watermark" ->
      "SELECT min(o_orderdate) - INTERVAL 1 SECOND AS watermark FROM orders",

    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus",

    "q_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_first_seen_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
        |ORDER BY l_orderkey""".stripMargin,

    "q_dim_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_top1_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM orders
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,

    "q_yoy_selfjoin" ->
      """WITH daily AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS date,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS volume
        |  FROM orders GROUP BY 1, 2)
        |SELECT c.o_orderpriority, CAST(c.date AS TIMESTAMP) AS date,
        |  CAST(c.volume AS DOUBLE) AS volume,
        |  CASE WHEN p.volume IS NOT NULL AND p.volume <> 0 THEN
        |    ROUND((CAST(c.volume AS DOUBLE) - CAST(p.volume AS DOUBLE))
        |          / CAST(p.volume AS DOUBLE) * 100, 2) + 0.0
        |  END AS volume_yoy
        |FROM daily c
        |LEFT JOIN daily p
        |  ON p.o_orderpriority = c.o_orderpriority AND p.date = c.date - 14
        |ORDER BY c.o_orderpriority, c.date""".stripMargin,

    "q_merge_upsert" ->
      """WITH ex AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS total_price,
        |    COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1),
        |inc AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS total_price,
        |    COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01' GROUP BY 1)
        |SELECT COALESCE(ex.o_custkey, inc.o_custkey) AS o_custkey,
        |  CAST(CASE WHEN inc.o_custkey IS NOT NULL THEN inc.total_price
        |            ELSE ex.total_price END AS DOUBLE) AS total_price,
        |  CASE WHEN ex.o_custkey IS NOT NULL THEN ex.n_orders ELSE inc.n_orders END AS n_orders
        |FROM ex FULL OUTER JOIN inc ON ex.o_custkey = inc.o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q_incremental_replay" ->
      """SELECT o_custkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS date,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS volume,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_custkey, date""".stripMargin,

    "q_bloom_semi" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the oracle states the post-lifecycle table literally: merge with
    // schema evolution, delete keys 10 and 14, compact — Spark must
    // read exactly these rows back from the maintained parquet layout
    "q_warehouse_maint" ->
      """SELECT * FROM (VALUES
        |  (CAST(11 AS BIGINT), '2024-01-01', CAST(2.0 AS DOUBLE), CAST(NULL AS DOUBLE)),
        |  (CAST(12 AS BIGINT), '2024-01-02', CAST(4.5 AS DOUBLE), CAST(0.9 AS DOUBLE)),
        |  (CAST(13 AS BIGINT), '2024-01-03', CAST(5.0 AS DOUBLE), CAST(NULL AS DOUBLE)),
        |  (CAST(15 AS BIGINT), '2024-01-05', CAST(7.0 AS DOUBLE), CAST(0.5 AS DOUBLE))
        |) AS t(user_id, dt, v, score)
        |ORDER BY user_id""".stripMargin,

    "q_correlated_subquery" ->
      """SELECT c_custkey,
        |  (SELECT MAX(o_totalprice) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_sql_api" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)))
        |    AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS TIMESTAMP) AS orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,

    "q_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
  )
}
