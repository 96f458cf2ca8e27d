package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark-driven incremental batch machinery (SURVEY §2.10).
  *
  * The reference drives everything from an `etl_control(task_name,
  * last_run)` table (SqlDbEtl.py:22-29, :72-110): each task reads the
  * half-open slice (last_run, end_time], processes it idempotently
  * (all sinks are upserts), and advances the watermark forward-only.
  */
object Incremental {

  /** Half-open incremental slice: created_at > lo AND created_at <= hi —
    * the core range predicate (P2; Bifrost.py:90 et al.). Catalyst pushes
    * this to the parquet row-group stats / JDBC WHERE clause, and at scale
    * it prunes date partitions (SURVEY §7.6). */
  def slice(df: DataFrame, ts: Column, lo: Timestamp, hi: Timestamp): DataFrame =
    df.filter(ts > lit(lo) && ts <= lit(hi))

  /** Watermark seed: MIN(created_at) − 1s on first run so the strict `>`
    * still includes the minimum row (T3 — Bifrost.py:73; A1 seed scan
    * SqlDbEtl.py:133-140). Metadata-only on parquet (row-group min stats).
    * The single collect here is a scalar — the one permitted driver read. */
  def seedWatermark(df: DataFrame, ts: Column): Option[Timestamp] =
    Option(df.agg(min(ts)).first().getTimestamp(0))
      .map(t => new Timestamp(t.getTime - 1000L))

  /** Batch end boundary: now truncated to the hour (T2 — SqlDbEtl.py:98-99). */
  def hourBoundary(spark: SparkSession): Timestamp =
    spark.range(1).select(date_trunc("hour", current_timestamp()))
      .first().getTimestamp(0)

  /** Tiny keyed watermark store persisted as JSON lines under `dir` —
    * the etl_control equivalent (U5/T1). One file per task; forward-only
    * advance is enforced here (SqlDbEtl.py:106 guard). Driver-side state
    * is O(#tasks), never O(data). */
  final class ControlTable(dir: String) {
    private val base = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(base)
    private def p(task: String) =
      base.resolve(java.net.URLEncoder.encode(task, "UTF-8") + ".watermark")

    def lastRun(task: String): Option[Timestamp] = {
      val f = p(task)
      if (java.nio.file.Files.exists(f))
        Some(Timestamp.valueOf(java.nio.file.Files.readString(f).trim))
      else None
    }

    /** Forward-only: ignores regressions, like SqlDbEtl.py:106.
      * Write-temp-then-ATOMIC_MOVE: an in-place overwrite killed
      * mid-write would leave a truncated timestamp that bricks every
      * later lastRun parse (the reference's etl_control UPDATE is
      * atomic; the file replacement must be too). */
    def advance(task: String, to: Timestamp): Unit = {
      val keep = lastRun(task).forall(_.before(to))
      if (keep) {
        val target = p(task)
        val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
        java.nio.file.Files.writeString(tmp, to.toString)
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** One incremental run: seed-or-load watermark, slice, apply, advance.
    * `apply` receives the slice and returns the max processed timestamp
    * (or None when the slice was empty → watermark holds, T1). */
  def run(ctl: ControlTable, task: String, src: DataFrame, ts: Column,
          end: Timestamp)(apply: DataFrame => Option[Timestamp]): Unit = {
    val lo = ctl.lastRun(task).orElse(seedWatermark(src, ts))
    lo.foreach { l =>
      val newLast = apply(slice(src, ts, l, end))
      newLast.foreach(ctl.advance(task, _))
    }
  }
}
