package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical anomaly detection — the monitoring pass a pipeline runs
  * over a new data drop before training on it (value spikes, broken
  * feeds, unit mix-ups show up as per-group outliers).
  *
  * Scale posture: the stats frame is GROUP-sized (one row per group —
  * orders of magnitude smaller than the data), so scoring is one full
  * scan plus a broadcast-joined per-row projection: no row-level
  * shuffle at any input size. Group stats aggregate map-side-partially.
  */
object Anomaly {

  /** Backtick-quote a raw column name for expr() interpolation (the
    * Profile.profileState convention): an unquoted name like `a-b`
    * would PARSE as the expression a minus b — silently wrong stats. */
  private def q(c: String): String = "`" + c.replace("`", "``") + "`"


  /** Broadcast-join `df` to its group-sized `stats` frame NULL-SAFELY:
    * groupBy keeps a stats row for the null group, so the join must
    * match it (`<=>` per key) — a plain equi-join would silently drop
    * every null-group row from the scored output (rows-never-dropped is
    * part of the winsorize contract, and a dropped row is a silent
    * anomaly-report gap for the others). Stats group columns are
    * prefixed before the join so the predicate is unambiguous, then
    * dropped. */
  private def joinStats(df: DataFrame, stats: DataFrame,
                        groupCols: Seq[String]): DataFrame = {
    val s = stats.select(stats.columns.map(c =>
      if (groupCols.contains(c)) col(c).as(s"__g_$c") else col(c)): _*)
    val cond = groupCols.map(k => col(k) <=> col(s"__g_$k")).reduce(_ && _)
    df.join(broadcast(s), cond).drop(groupCols.map(k => s"__g_$k"): _*)
  }

  /** Per-group z-scores: appends (grp_mean, grp_std, z) computed
    * against each row's group population statistics (stddev_pop: the
    * drop being scored IS the population). Rows in single-value groups
    * (stddev 0) and null values get null z — flagged by neither side.
    *
    * `roundTo`: decimal places to round z to (negative = no rounding).
    * Rounding belongs to the OPERATOR contract, not just the oracle:
    * downstream thresholding on a rounded z is reproducible across
    * engines and runs, while raw double z-scores near the threshold
    * flip with summation order. */
  def zScores(df: DataFrame, valueCol: String, groupCols: Seq[String],
              roundTo: Int = 4): DataFrame = {
    require(groupCols.nonEmpty, "zScores needs at least one group column")
    // the broadcast assumes groups << rows; a caller grouping on a
    // near-unique key would replicate a runaway frame to every task —
    // fail loudly at the boundary instead (Guard rail). The stats
    // lineage is one cheap aggregate, so the guard's extra pass is
    // cheaper than a checkpoint at any realistic group count.
    val stats = Guard.broadcastSmall(
      df.groupBy(groupCols.map(col): _*)
        .agg(avg(col(valueCol)).as("grp_mean"),
          stddev_pop(col(valueCol)).as("grp_std")),
      s"zScores group statistics over ${groupCols.mkString(", ")}")
    val z = (col(valueCol) - col("grp_mean")) / col("grp_std")
    joinStats(df, stats, groupCols)
      .withColumn("z",
        when(col("grp_std") > 0,
          if (roundTo >= 0) round(z, roundTo) else z))
  }

  /** Rows whose |z| exceeds `threshold` within their group — the
    * outlier report. Same scan/broadcast shape as [[zScores]]. */
  def outliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
               threshold: Double, roundTo: Int = 4): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    zScores(df, valueCol, groupCols, roundTo)
      .filter(abs(col("z")) > threshold)
  }

  /** Robust per-group z-scores (median/MAD — the estimator that does
    * not let the outliers it hunts corrupt its own baseline, unlike
    * mean/stddev): appends (grp_median, grp_mad, rz) with
    * rz = (x − median) / (1.4826·MAD), 1.4826 the standard normal
    * consistency constant. Two scans (median, then MAD of residuals
    * against the broadcast median) + one scoring scan — all stats
    * frames group-sized and Guard-broadcast. Null rz when MAD is 0
    * (constant-majority group) — same degenerate-group policy as
    * [[zScores]]. */
  def robustZScores(df: DataFrame, valueCol: String, groupCols: Seq[String],
                    roundTo: Int = 4): DataFrame = {
    require(groupCols.nonEmpty, "robustZScores needs at least one group column")
    val what = s"robustZScores group statistics over ${groupCols.mkString(", ")}"
    val med = Guard.broadcastSmall(
      df.groupBy(groupCols.map(col): _*)
        .agg(expr(s"percentile(${q(valueCol)}, 0.5)").as("grp_median")), what)
    val mad = Guard.broadcastSmall(
      joinStats(df, med, groupCols)
        .groupBy(groupCols.map(col): _*)
        .agg(expr(s"percentile(abs(${q(valueCol)} - grp_median), 0.5)").as("grp_mad")),
      what)
    val rz = (col(valueCol) - col("grp_median")) / (lit(1.4826) * col("grp_mad"))
    joinStats(joinStats(df, med, groupCols), mad, groupCols)
      .withColumn("rz",
        when(col("grp_mad") > 0,
          if (roundTo >= 0) round(rz, roundTo) else rz))
  }

  /** Per-group winsorization: clamp `valueCol` into its group's
    * [loPct, hiPct] exact quantiles — the outlier-taming transform a
    * feature pipeline runs where dropping rows is not an option.
    * Appends (grp_lo, grp_hi, <valueCol>_wins); null values stay null.
    * One stats scan + one clamping scan, bounds group-sized and
    * Guard-broadcast. */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                loPct: Double = 0.01, hiPct: Double = 0.99): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    require(loPct >= 0 && hiPct <= 1 && loPct < hiPct,
      s"need 0 <= loPct < hiPct <= 1, got [$loPct, $hiPct]")
    val bounds = Guard.broadcastSmall(
      df.groupBy(groupCols.map(col): _*)
        .agg(expr(s"percentile(${q(valueCol)}, $loPct)").as("grp_lo"),
          expr(s"percentile(${q(valueCol)}, $hiPct)").as("grp_hi")),
      s"winsorize group bounds over ${groupCols.mkString(", ")}")
    joinStats(df, bounds, groupCols)
      // guard the null case explicitly: Spark's least/greatest SKIP
      // nulls, so an unguarded clamp would turn a null value into the
      // lower bound instead of keeping it null
      .withColumn(s"${valueCol}_wins",
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("grp_lo")), col("grp_hi"))))
  }
}
