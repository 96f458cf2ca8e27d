package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.schema.Tables

/** Event-stream-shaped batch queries over the `events` / `orders` /
  * `lineitem` fixtures: JSON extraction, tumbling-window aggregation
  * (the batch twin of the Structured Streaming pipeline in
  * graft.streaming), full window-function surface, approx-distinct
  * sketches, and generator/unpivot (SURVEY §2.5, §2.8, §2.10, §2.11).
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(38, 2))

  /** Final-output canonicalization (VERDICT r1 item 1): exact DECIMAL
    * aggregation inside, DOUBLE on the surfaced column, matching an
    * outer CAST(.. AS DOUBLE) in every oracle — so the driver's
    * pandas-vs-fetchdf() hash compares identical float64s. */
  private def decd(c: Column): Column = c.cast("double")

  /** Session gap shared by BOTH sessionize queries and their oracle
    * (sessionizeOracleSql interpolates it) — the funnelHorizonSecs
    * pattern: one definition, no hard-coded twin to drift. */
  private val sessionGapSeconds = 6 * 3600

  /** As-of frames shared by q_asof_join / q_asof_fwd — the pairs
    * differ ONLY in direction, so the projections must stay one
    * definition. */
  private def asofFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = t(s, dir, "events")
    (e.select(col("event_id"), col("user_id"), col("ts")),
      e.filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), col("ts").as("click_ts"),
          col("value").as("click_value"), col("event_id").as("click_id")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON scalar extraction (get_json_object on events.props) + rollup.
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type"))
    }),

    // Tumbling 1-hour window aggregation — identical code runs under
    // Structured Streaming with a watermark (graft.streaming.EventStream);
    // here executed in batch for the oracle.
    "q_tumbling_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          decd(sum(dec(col("value")))).as("value_sum"))
        .select(col("window.start").as("hour_start"), col("event_type"),
          col("n_events"), col("value_sum"))
        .orderBy(col("hour_start"), col("event_type"))
    }),

    // Full window-function surface: row_number / rank / dense_rank (with
    // ties on the date grain), lag, and a 3-row moving frame sum.
    "q_window_funcs" -> ((s, dir) => {
      val byOrder = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byDay = Window.partitionBy(col("o_custkey"))
        .orderBy(to_date(col("o_orderdate")))
      // ranks cast to BIGINT (DuckDB emits BIGINT; Spark INTEGER) and
      // window sums surfaced as DOUBLE — VERDICT r1 width/repr fixes.
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(byOrder).cast("long").as("rn"),
        rank().over(byDay).cast("long").as("rnk"),
        dense_rank().over(byDay).cast("long").as("drnk"),
        ntile(4).over(byOrder).cast("long").as("quartile"),
        percent_rank().over(byDay).as("pct_rnk"),
        cume_dist().over(byDay).as("cume"),
        lag(col("o_totalprice"), 1).over(byOrder).as("prev_price"),
        decd(sum(dec(col("o_totalprice")))
          .over(byOrder.rowsBetween(-2, 0))).as("mov3_sum"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Pivot (wide form — the inverse of q_unpivot's stack): per-user
    // bucket, one decimal value-sum column per event type. Explicit
    // pivot value list keeps the schema static (no extra distinct scan).
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(sum(col("value").cast(DecimalType(38, 2))).cast("double"))
        .orderBy(col("user_bucket"))
    }),

    // Exact interpolated percentiles per group (sort-based; the
    // approx_percentile sketch is the at-scale variant, rows-only like
    // q_approx_distinct). Rounded to 4 dp: Spark and DuckDB use
    // differently-ordered interpolation arithmetic.
    "q_percentile" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // Approx-percentile sketch (the at-scale variant of q_percentile's
    // exact sort-based path: a mergeable bounded-memory sketch instead
    // of a per-group sort) with the driver-visible quality gate of the
    // other approximate ops — Spark emits the EXACT p50/p90 alongside
    // booleans asserting the sketch lands within the rank-error bound
    // implied by accuracy=1000 (generous value-tolerance: 5% of the
    // group's value spread; measured well inside at every SF).
    "q_approx_pct" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          expr("approx_percentile(value, 0.5, 1000)").as("a50"),
          expr("approx_percentile(value, 0.9, 1000)").as("a90"),
          (max(col("value")) - min(col("value"))).as("spread"))
        .select(col("event_type"), col("p50"), col("p90"),
          (abs(col("a50") - col("p50")) <= col("spread") * 0.05).as("p50_ok"),
          (abs(col("a90") - col("p90")) <= col("spread") * 0.05).as("p90_ok"))
        .orderBy(col("event_type"))
    }),

    // Deterministic min-k quantile sketch (Sketch.minKSample): per
    // event_type, the 64 rows with the smallest xxhash64(event_id) are
    // a uniform sample whose winners are a pure function of the ids —
    // so unlike q_approx_pct's assertion-gated sketch, the ESTIMATES
    // here are value-exact cross-engine: the oracle restates the XXH64
    // chain (XxhashSql), the (h, value) selection window, and Spark's
    // exact-percentile interpolation operation-for-operation. The
    // at-scale story is the aggregate's: map-side partial min-k ships
    // ≤ 64 entries per (partition, group), and persisted samples merge
    // associatively (q_quantile_sketch_merge pins it in-plan).
    "q_quantile_sketch" -> ((s, dir) => {
      val sk = graft.ops.Sketch.minKSample(t(s, dir, "events"),
        Seq("event_type"), Seq(col("event_id")), col("value"), m = 64)
      sk.select(col("event_type"), col("n_rows"),
          size(col("sample")).cast("long").as("n_sampled"),
          round(graft.ops.Sketch.sampleQuantile(col("sample"), 0.5), 4).as("p50_est"),
          round(graft.ops.Sketch.sampleQuantile(col("sample"), 0.9), 4).as("p90_est"))
        .orderBy(col("event_type"))
    }),

    // Mergeability of the min-k sample, pinned IN-PLAN: the corpus is
    // split by event_id parity, each half sampled independently (the
    // "two persisted drops" of the absorb story), the two samples
    // re-aggregated through the same min-k — and the result must equal
    // the one-shot sample ENTRY FOR ENTRY, not just in distribution.
    // The oracle states the one-shot estimate and a TRUE for the
    // equality, so a merge-order or trim bug goes hash-red.
    "q_quantile_sketch_merge" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def half(pred: Column) = graft.ops.Sketch.minKSample(e.filter(pred),
        Seq("event_type"), Seq(col("event_id")), col("value"), m = 64)
      val halves = half(col("event_id") % 2 === 0)
        .unionByName(half(col("event_id") % 2 =!= 0))
      // THE library merge (Sketch.mergeSamples — same code the state
      // absorb runs), so the pin exercises the real semantics, not a
      // private re-implementation
      val reagg = graft.ops.Sketch.mergeSamples(halves, Seq("event_type"), 64)
      val oneShot = graft.ops.Sketch.minKSample(e, Seq("event_type"),
        Seq(col("event_id")), col("value"), m = 64)
        .select(col("event_type"), col("n_rows").as("n_rows_1"),
          col("sample").as("sample_1"))
      reagg.join(oneShot, Seq("event_type"))
        .select(col("event_type"),
          (col("n_rows") === col("n_rows_1") &&
            col("sample") === col("sample_1")).as("merge_equals_oneshot"),
          round(graft.ops.Sketch.sampleQuantile(col("sample"), 0.5), 4).as("p50_est"))
        .orderBy(col("event_type"))
    }),

    // The PERSISTED face of the same associativity: seed the sample
    // state from a third of events, absorb the other two thirds as
    // batches (each absorb = one min-k pass over the batch + a
    // state-sized re-trim, never a corpus rescan), then read the state
    // back — the oracle is the ONE-SHOT selection over all of events
    // (shared text with q_quantile_sketch), so drift between the
    // absorb path and the one-shot path goes hash-red.
    "q_quantile_sketch_incr" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val statePath = graft.Scratch.dir("graft-qstate", dir)
      def slice(r: Int) = e.filter(pmod(col("event_id"), lit(3)) === r)
      graft.ops.Sketch.writeSampleState(slice(0), Seq("event_type"),
        Seq(col("event_id")), col("value"), m = 64, statePath)
      graft.ops.Sketch.absorbSampleState(slice(1), Seq("event_type"),
        Seq(col("event_id")), col("value"), m = 64, statePath)
      graft.ops.Sketch.absorbSampleState(slice(2), Seq("event_type"),
        Seq(col("event_id")), col("value"), m = 64, statePath)
      graft.ops.Sketch.readSampleState(s, statePath)
        .select(col("event_type"), col("n_rows"),
          size(col("sample")).cast("long").as("n_sampled"),
          round(graft.ops.Sketch.sampleQuantile(col("sample"), 0.5), 4).as("p50_est"),
          round(graft.ops.Sketch.sampleQuantile(col("sample"), 0.9), 4).as("p90_est"))
        .orderBy(col("event_type"))
    }),

    // Skew-salted dim join, oracle-proven IDENTICAL to the plain join:
    // events are joined to a per-type aggregate on event_type — a
    // pathologically hot key (5 distinct values over the whole fact
    // table). Scale.saltedJoin spreads each hot key over 8 salt
    // buckets (deterministic salt from event_id), so no single reducer
    // owns a whole key; the tiny per-type side replicates 8×. The
    // oracle runs the UNSALTED join — salting must change the
    // distribution, never the answer.
    "q_salted_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val perType = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_n"))
      graft.ops.Scale.saltedJoin(e, perType, Seq("event_type"),
          nSalts = 8, saltSource = col("event_id"))
        .select(col("event_id"), col("event_type"), col("type_n"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of: for each event, the EARLIEST 'click' of the same
    // user at-or-after it — the "next fill after the order" direction
    // of q_asof_join, same one-shuffle union+window shape.
    "q_asof_fwd" -> ((s, dir) => {
      val (left, right) = asofFrames(s, dir)
      graft.ops.AsofJoin.asof(left, right, Seq("user_id"),
          leftTs = "ts", rightTs = "click_ts",
          rightCols = Seq("click_value"), tiebreak = col("click_id"),
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("click_value"))
        .orderBy(col("event_id"))
    }),

    // Batch twin of streaming.EventStream.intervalJoin (the same code
    // path the watermarked stream-stream join runs): each purchase
    // pairs with the same user's clicks in the prior 30 minutes. The
    // time-range predicate is what bounds stream state; in batch it is
    // a plain range join.
    "q_interval_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      graft.streaming.EventStream.intervalJoin(
          e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("pts"), col("value").as("amount")),
          "pts",
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts").as("cts")),
          "cts",
          keys = Seq("user_id"), window = "30 minutes")
        .select(col("user_id"), col("pts"), col("cts"), col("amount"))
        .orderBy(col("user_id"), col("pts"), col("cts"))
    }),

    // Gap-based sessionization (batch path of streaming.Sessionize; the
    // flatMapGroupsWithState streaming twin is spec-tested equal).
    "q_sessionize" -> ((s, dir) => {
      graft.streaming.Sessionize.sessionizeBatch(
          t(s, dir, "events").select(col("user_id"), col("ts")),
          gapSeconds = sessionGapSeconds)
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Spark's NATIVE session_window grouping — the built-in the custom
    // formulations are benchmarked against; produces EXACTLY
    // q_sessionize's sessions (the built-in's merge is inclusive at
    // prev+gap, measured + spec-pinned) so the two formulations are
    // mutually oracle-pinned.
    "q_sessionize_native" -> ((s, dir) => {
      graft.streaming.Sessionize.sessionizeNative(
          t(s, dir, "events").select(col("user_id"), col("ts")),
          gapSeconds = sessionGapSeconds)
        .orderBy(col("user_id"), col("session_start"))
    }),

    // HLL approx-distinct sketch with a driver-visible quality assertion
    // (VERDICT r2 item 3 — the last approximate op without one). The HLL
    // estimate itself is engine-specific so it can't be hashed against
    // DuckDB; instead Spark emits the EXACT per-group distinct alongside
    // a boolean asserting the sketch's relative error is within 3× the
    // requested rsd (0.05 → bound 0.15; HLL++ error is ~Gaussian with
    // σ=rsd, so 3σ is a deterministic-in-practice yet meaningful gate —
    // fixture error measures <2%). Oracle computes the exact counts and
    // expects within_bound=TRUE: an HLL regression flips the hash red.
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.15).as("within_bound"))
        .orderBy(col("event_type"))
    }),

    // As-of join: for each event, the latest prior 'click' value of the
    // same user (right.ts <= left.ts) — one shuffle+sort per key, no
    // range explosion (ops.AsofJoin). Oracle: DuckDB's native ASOF JOIN.
    "q_asof_join" -> ((s, dir) => {
      val (left, right) = asofFrames(s, dir)
      graft.ops.AsofJoin.asof(left, right, Seq("user_id"),
          leftTs = "ts", rightTs = "click_ts",
          rightCols = Seq("click_value"), tiebreak = col("click_id"))
        .select(col("event_id"), col("user_id"), col("click_value"))
        .orderBy(col("event_id"))
    }),

    // Equi + range join (SURVEY §2.3 absent-in-reference row): lineitems
    // shipped within 30 days of their order's date. The equi key keeps
    // the join hash-partitioned; the range predicate filters post-match
    // (no interval explosion).
    "q_range_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_shipped_30d"))
        .orderBy(col("o_orderkey"))
    }),

    // Hierarchical rollup totals (SURVEY §2.4 beyond-reference surface).
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          decd(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Cube over two event dimensions.
    "q_cube" -> ((s, dir) => {
      t(s, dir, "events")
        .cube(col("event_type"), (col("user_id") % 10).as("user_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("user_bucket"))
    }),

    // Explicit grouping sets (the general form behind rollup/cube).
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("v_ord_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
          |FROM v_ord_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    }),

    // Weighted average with exact decimal arithmetic (order-independent
    // across partitions — the expression twin of the typed WeightedMean
    // Aggregator).
    "q_weighted_avg" -> ((s, dir) => {
      // sums are exact decimals; the DIVISION runs in double (one IEEE
      // op on identical operands in both engines) — a decimal division
      // rounds at engine-specific derived scales and flipped the last
      // ulp on q_ohlc_vwap's data; same hardening here
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg((sum((col("l_extendedprice") * col("l_quantity")).cast(DecimalType(38, 4)))
            .cast("double")
            / sum(col("l_quantity").cast(DecimalType(38, 4))).cast("double"))
          .as("weighted_price"))
        .orderBy(col("l_returnflag"))
    }),

    // OHLC/VWAP bars — the market-data summary the reference's DEX
    // domain consumes (price series → per-instrument time bars):
    // open/close are the first/last tick by (ts, event_id) — picked via
    // struct min/max, so they ride the SAME hash aggregate as
    // high/low/volume (one shuffle, map-side partials, never a sorted
    // window); vwap sums per-row DECIMAL casts (so partition order
    // can't move a double sum) but DIVIDES as double — both engines
    // then run one IEEE division on identical operands, where a
    // decimal division would round at engine-specific scales (observed
    // 1-ulp flips at sf0.1). Zero-volume bars yield NULL vwap (ANSI
    // division guard). Volume comes from the props JSON (the tick's
    // size field), exercising extraction inside an aggregate.
    "q_ohlc_vwap" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("vol", get_json_object(col("props"), "$.k").cast("long"))
      e.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("close"),
          count(lit(1)).as("n_trades"),
          sum(col("vol")).as("volume"),
          when(sum(col("vol")) === 0, lit(null))
            .otherwise(
              sum((col("value") * col("vol")).cast(DecimalType(38, 4)))
                .cast("double") / sum(col("vol")).cast("double"))
            .as("vwap"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // Generator/unpivot (stack) — the Stellar token0/token1 unpivot
    // exemplar (SURVEY §3.3): wide metric columns → (metric, value) rows.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          expr("stack(2, 'discount', l_discount, 'tax', l_tax) as (metric, value)"))
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(38, 4)))
            .cast("double").as("value_sum"))
        .select(col("metric"), col("n"), col("value_sum"))
        .orderBy(col("metric"))
    }),
  )

  private val sessionizeOracleSql: String =
    s"""WITH e AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > ${sessionGapSeconds * 1000L}
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(COUNT(*) AS INT) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Value-exact restatement of the min-k quantile sketch: the XXH64
    * chain over event_id (XxhashSql — the q_epoch_shuffle precedent),
    * the (h, value) selection window, and Spark Percentile's TWO-SIDED
    * interpolation ((ceil(pos)−pos)·v[lo] + (pos−lo)·v[hi] over
    * pos = p·(n−1) — NOT the algebraically equal lower+(hi−lo)·frac
    * form, which differs in the last ulp) mirrored
    * operation-for-operation; both engines run the same IEEE
    * double steps, rounded 4 dp at the surface. `merge` emits the
    * q_quantile_sketch_merge shape — associativity makes the merged
    * sample the one-shot sample, so the oracle is the SAME selection
    * plus a TRUE for the pinned equality. */
  private def quantileSketchOracle(m: Int, merge: Boolean): String = {
    import XxhashSql.{Prog, hashLong, signed, unsigned}
    val p = new Prog("SELECT event_type, value, " +
      s"${unsigned("event_id")} AS u FROM events " +
      "WHERE value IS NOT NULL AND event_id IS NOT NULL")
    val h = hashLong(p, "u", "42")
    val hashed = p.render(s"event_type, value, ${signed(h)} AS h")
    // Spark Percentile's exact steps: pos = p*(n-1); integral pos is
    // the value itself; else (ceil(pos)-pos)*v[lo] + (pos-lo)*v[hi]
    def quant(prob: Double, alias: String): String =
      s"""ROUND(CASE
         |    WHEN ceil(${prob}e0 * (len(vals) - 1)) = floor(${prob}e0 * (len(vals) - 1))
         |    THEN vals[CAST(floor(${prob}e0 * (len(vals) - 1)) AS BIGINT) + 1]
         |    ELSE (ceil(${prob}e0 * (len(vals) - 1)) - ${prob}e0 * (len(vals) - 1))
         |           * vals[CAST(floor(${prob}e0 * (len(vals) - 1)) AS BIGINT) + 1]
         |       + (${prob}e0 * (len(vals) - 1) - floor(${prob}e0 * (len(vals) - 1)))
         |           * vals[CAST(ceil(${prob}e0 * (len(vals) - 1)) AS BIGINT) + 1]
         |    END, 4) AS $alias""".stripMargin
    val tail =
      if (merge)
        s"""SELECT event_type, TRUE AS merge_equals_oneshot,
           |  ${quant(0.5, "p50_est")}
           |FROM sampled ORDER BY event_type""".stripMargin
      else
        s"""SELECT event_type, n_rows,
           |  CAST(len(vals) AS BIGINT) AS n_sampled,
           |  ${quant(0.5, "p50_est")},
           |  ${quant(0.9, "p90_est")}
           |FROM sampled ORDER BY event_type""".stripMargin
    s"""WITH hashed AS ($hashed),
       |ranked AS (
       |  SELECT event_type, value, h,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, value) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_rows
       |  FROM hashed),
       |sampled AS (
       |  SELECT event_type, n_rows, list(value ORDER BY value) AS vals
       |  FROM ranked WHERE rn <= $m GROUP BY event_type, n_rows)
       |$tail""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
        |  MIN(CAST(props->>'$.k' AS BIGINT)) AS k_min,
        |  MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER w AS rn,
        |  RANK() OVER d AS rnk,
        |  DENSE_RANK() OVER d AS drnk,
        |  NTILE(4) OVER w AS quartile,
        |  PERCENT_RANK() OVER d AS pct_rnk,
        |  CUME_DIST() OVER d AS cume,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
        |    OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       d AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE))
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    // open/close via first/last-tick window ranks — the declarative
    // restatement of the struct-min/max aggregate trick
    "q_ohlc_vwap" ->
      """WITH ticks AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
        |    value, CAST(props->>'$.k' AS BIGINT) AS vol,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, hour,
        |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  MAX(value) AS high,
        |  MIN(value) AS low,
        |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  COUNT(*) AS n_trades,
        |  CAST(SUM(vol) AS BIGINT) AS volume,
        |  CASE WHEN SUM(vol) = 0 THEN NULL
        |       ELSE CAST(SUM(CAST(value * vol AS DECIMAL(38,4))) AS DOUBLE)
        |            / CAST(SUM(vol) AS DOUBLE) END AS vwap
        |FROM ticks GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin,

    "q_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS weighted_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE) AS view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(38,2)) END) AS DOUBLE) AS purchase
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.9), 4) AS p90,
        |  COUNT(*) AS n
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_approx_pct" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.9), 4) AS p90,
        |  TRUE AS p50_ok, TRUE AS p90_ok
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_quantile_sketch" -> quantileSketchOracle(m = 64, merge = false),

    "q_quantile_sketch_merge" -> quantileSketchOracle(m = 64, merge = true),

    // associativity: the absorbed state IS the one-shot sample
    "q_quantile_sketch_incr" -> quantileSketchOracle(m = 64, merge = false),

    "q_salted_join" ->
      """WITH t AS (
        |  SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, t.type_n
        |FROM events e JOIN t USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_asof_fwd" ->
      """SELECT l.event_id, l.user_id, r.click_value
        |FROM (SELECT event_id, user_id, ts FROM events) l
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts AS click_ts, value AS click_value
        |  FROM events WHERE event_type = 'click' AND value IS NOT NULL) r
        |  ON l.user_id = r.user_id AND r.click_ts >= l.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_interval_join" ->
      """SELECT p.user_id, p.ts AS pts, c.ts AS cts, p.value AS amount
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY p.user_id, pts, cts""".stripMargin,

    // gap in MILLISECONDS (epoch_ms == Spark unix_millis): whole-second
    // truncation would split sub-second feeds differently from the
    // streaming twin's ms arithmetic. ONE definition serves both the
    // gap-flag and native-session_window queries — the two are
    // mutually pinned to identical sessions (inclusive at prev+gap,
    // measured against Spark's UpdatingSessionsIterator), and a shared
    // oracle makes that equivalence impossible to drift silently.
    "q_sessionize" -> sessionizeOracleSql,

    "q_sessionize_native" -> sessionizeOracleSql,

    // q_approx_distinct: the HLL estimate is engine-specific, so the
    // oracle asserts the exact counts plus the error-bound boolean the
    // Spark side derives from the sketch (assertion-oracle pattern).
    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  COUNT(*) AS n, TRUE AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, r.click_value
        |FROM (SELECT event_id, user_id, ts FROM events) l
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts AS click_ts, value AS click_value
        |  FROM events WHERE event_type = 'click' AND value IS NOT NULL) r
        |  ON l.user_id = r.user_id AND r.click_ts <= l.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_range_join" ->
      """SELECT o_orderkey, COUNT(*) AS n_shipped_30d
        |FROM orders JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n
        |FROM events
        |GROUP BY CUBE (event_type, user_id % 10)
        |ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin,

    "q_unpivot" ->
      """WITH u AS (
        |  SELECT l_orderkey, 'discount' AS metric, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, 'tax', l_tax FROM lineitem)
        |SELECT metric, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS value_sum
        |FROM u GROUP BY metric ORDER BY metric""".stripMargin,
  )
}
