package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a pipeline runs before
  * trusting a new drop of 100 TB: per-column row/null/distinct counts
  * and min/max, computed in ONE aggregation pass over the table (never
  * one job per column — profiling a 40-column table costs the same scan
  * as profiling one).
  */
object Profile {

  /** Profile `cols` of `df`: one output row per column with
    * (column, n_rows, n_null, n_distinct, min_value, max_value) —
    * min/max rendered as strings post-aggregation so heterogeneous
    * column types share one tall result frame.
    *
    * `exact = false` (the 100 TB default) uses `approx_count_distinct`
    * (HLL++): every statistic is then a partial-aggregable sketch and
    * the whole profile is one map-side-combined pass. `exact = true`
    * uses COUNT(DISTINCT …): Spark plans multi-distinct aggregates by
    * Expanding the input ×|cols| before the shuffle — exact answers at
    * |cols|× the shuffle volume, the right trade only for oracle
    * verification or small dims (documented here so nobody flips the
    * flag on a 100 TB fact table casually). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns $missing not in ${df.columns.toSeq}")
    require(cols.distinct == cols, "profile columns must be distinct")
    val nd: Column => Column =
      if (exact) c => count_distinct(c) else c => approx_count_distinct(c)
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        nd(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
