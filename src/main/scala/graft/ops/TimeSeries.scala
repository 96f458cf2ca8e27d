package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: the daily-spine + forward-fill op behind
  * "carry the last observed price/TVL forward over missing days" — the
  * gap the reference's daily tasks leave implicit (a day with no rows
  * simply vanishes from its MySQL tables; downstream consumers then
  * self-join against holes, cf. the −14d lookup in Hydration.py:124-126
  * which silently misses when the shifted day is absent).
  *
  * Scale shape: the spine explode is O(keys × days) rows of fixed width
  * (key, date) — never the payload; the fill is ONE window shuffle on
  * the key; the global max date is a 1-row broadcast scalar (same
  * posture as the surrogate-key readback in pipeline.Warehouse).
  */
object TimeSeries {

  /** Per-key daily spine + forward fill.
    *
    * Input: at most one row per (key, date) observation (`dateCol` must
    * be DATE-typed; pre-aggregate duplicates first — enforced loudly).
    * Output: one row per (key, date) for EVERY date from the key's first
    * observation to the global max date, with each value column
    * forward-filled (last non-null at-or-before the row's date, so an
    * observed NULL value keeps the previous observation) plus an
    * `observed` flag marking rows that existed in the input.
    *
    * Keys appear from their own first date — not the global min — so a
    * key born late is not back-filled with leading NULLs, and every
    * series extends to the same right edge (the natural shape for
    * "latest state as of the table's last load day").
    */
  def gapFillDaily(df: DataFrame, keyCol: String, dateCol: String,
                   valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "no value columns to fill")
    require(!df.columns.contains("observed"),
      "column name observed is reserved by gapFillDaily")
    require(!df.columns.contains("__obs"),
      "column name __obs is reserved by gapFillDaily")
    require(!df.columns.contains("__mk") && !df.columns.contains("__md"),
      "column names __mk, __md are reserved by gapFillDaily")
    require(df.schema(dateCol).dataType ==
        org.apache.spark.sql.types.DateType,
      s"$dateCol must be DATE-typed (got ${df.schema(dateCol).dataType})")

    // global right edge: 1-row broadcast scalar
    val gmax = df.agg(max(col(dateCol)).as("__gmax"))
    val spine = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"),
        count(col(dateCol)).as("__n"), // non-null dates
        countDistinct(col(dateCol)).as("__nd"),
        sum(when(col(dateCol).isNull, 1L).otherwise(0L)).as("__nulls"))
      .crossJoin(broadcast(gmax))
      // NULL dates have no place on a daily spine, and duplicate
      // (key, date) rows would make the fill order-dependent — each
      // gets its own named failure. The asserts live in FILTERs
      // (coalesce(NULL-on-pass, true)) so column pruning cannot
      // optimize the checks away
      .filter(coalesce(assert_true(col("__nulls") === 0,
        lit(s"gapFillDaily: NULL $dateCol rows in input — drop or date them first")),
        lit(true)))
      .filter(coalesce(assert_true(col("__n") === col("__nd"),
        lit(s"gapFillDaily: duplicate ($keyCol, $dateCol) rows in input — " +
          "pre-aggregate to one row per key-date")), lit(true)))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__gmax"))).as(dateCol))

    val marked = df.withColumn("__obs", lit(true))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE key join: groupBy builds a spine for the null-key
    // group (an unmapped id is ordinary dirty data), so a plain
    // equi-join would emit its spine rows all-null while silently
    // dropping every observation — the null-key group must gap-fill
    // exactly like any other (the Linkage lesson)
    val joined = spine.join(
        marked.withColumnRenamed(keyCol, "__mk")
          .withColumnRenamed(dateCol, "__md"),
        col(keyCol) <=> col("__mk") && col(dateCol) === col("__md"),
        "left")
      .drop("__mk", "__md")
    val filled = valueCols.foldLeft(joined) { (acc, v) =>
      acc.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled
      .withColumn("observed", coalesce(col("__obs"), lit(false)))
      .drop("__obs")
  }
}
