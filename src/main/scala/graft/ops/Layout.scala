package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout auditing: measure, from the data itself, how well a
  * parquet layout will PRUNE before a 100 TB job relies on it.
  *
  * A skipping scan reads a file iff the predicate overlaps the file's
  * footer min/max for the filtered column — and footers are derived
  * from the rows, so per-file min/max grouped by `input_file_name()`
  * IS the exact skipping behavior, computable with one distributed
  * pass and no footer-API dependency. [[Scale.writeZOrderedN]] claims
  * multi-column skipping; this is the operator that verifies the claim
  * on the actual files (AnalyticsSpec asserted it test-side; a real
  * deployment audits production tables with this instead).
  */
object Layout {

  /** Per-file column statistics of a parquet directory: one row per
    * data file — (file, n_rows, <c>_min, <c>_max per audited column).
    * One map-side-combined aggregate; the output is FILE-count-sized. */
  def fileStats(spark: SparkSession, path: String,
                cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column to audit")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Average fraction of files a point filter on `c` must read, over
    * `probes` — THE layout-quality number (1.0 = the column is
    * unbounded per file, no skipping; small = tight stats). Computed
    * from a [[fileStats]] frame: file-count-sized, so the scalar read
    * is bounded. */
  def readFraction(stats: DataFrame, c: String, probes: Seq[Long]): Double = {
    require(probes.nonEmpty, "readFraction needs at least one probe")
    val spark = stats.sparkSession
    import spark.implicits._
    val row = stats
      .join(broadcast(probes.toDF("__p")))
      .agg(
        avg(when(col(s"${c}_min") <= col("__p") &&
          col("__p") <= col(s"${c}_max"), 1.0).otherwise(0.0)).as("frac"))
      .first()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }
}
