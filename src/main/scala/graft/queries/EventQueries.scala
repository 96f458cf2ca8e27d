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
          dec(sum(dec(col("value")))).as("value_sum"))
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
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(byOrder).as("rn"),
        rank().over(byDay).as("rnk"),
        dense_rank().over(byDay).as("drnk"),
        lag(dec(col("o_totalprice")), 1).over(byOrder).as("prev_price"),
        dec(sum(dec(col("o_totalprice")))
          .over(byOrder.rowsBetween(-2, 0))).as("mov3_sum"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // HLL approx-distinct sketch (no exact oracle — approx values are
    // engine-specific; rows-only check + tolerance asserted in spec).
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
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
            .cast(DecimalType(38, 4)).as("value_sum"))
        .select(col("metric"), col("n"), col("value_sum"))
        .orderBy(col("metric"))
    }),
  )

  def oracleSql: Map[String, String] = Map(

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  SUM(CAST(props->>'$.k' AS BIGINT)) AS k_sum,
        |  MIN(CAST(props->>'$.k' AS BIGINT)) AS k_min,
        |  MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER w AS rn,
        |  RANK() OVER d AS rnk,
        |  DENSE_RANK() OVER d AS drnk,
        |  LAG(CAST(o_totalprice AS DECIMAL(38,2)), 1) OVER w AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
        |    OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS mov3_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       d AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE))
        |ORDER BY o_custkey, rn""".stripMargin,

    // q_approx_distinct: no oracle (sketches are engine-specific).

    "q_unpivot" ->
      """WITH u AS (
        |  SELECT l_orderkey, 'discount' AS metric, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, 'tax', l_tax FROM lineitem)
        |SELECT metric, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS value_sum
        |FROM u GROUP BY metric ORDER BY metric""".stripMargin,
  )
}
