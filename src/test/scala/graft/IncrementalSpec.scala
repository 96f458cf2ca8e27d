package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Incremental

/** Watermark machinery (SURVEY §2.10, quirk Q7): half-open slice
  * boundaries, 1-second seed back-off, forward-only advance. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def src = Seq(
    (1L, ts("2025-05-01 00:00:00")),
    (2L, ts("2025-05-01 01:00:00")),
    (3L, ts("2025-05-01 02:00:00"))).toDF("id", "created_at")

  test("slice is half-open: strict > lo, inclusive <= hi") {
    val got = Incremental.slice(src, col("created_at"),
        ts("2025-05-01 00:00:00"), ts("2025-05-01 02:00:00"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(2L, 3L))  // row at lo excluded, at hi included
  }

  test("seedWatermark = MIN(created_at) - 1s (strict > still admits min row)") {
    val seed = Incremental.seedWatermark(src, col("created_at")).get
    assert(seed === ts("2025-04-30 23:59:59"))
    val got = Incremental.slice(src, col("created_at"), seed, ts("2025-05-02 00:00:00"))
      .count()
    assert(got === 3L)
  }

  test("seedWatermark on empty source -> None") {
    val empty = src.filter(lit(false))
    assert(Incremental.seedWatermark(empty, col("created_at")).isEmpty)
  }

  test("ControlTable: forward-only advance, per-task isolation") {
    val dir = Files.createTempDirectory("graft-ctl").toString
    val ctl = new Incremental.ControlTable(dir)
    assert(ctl.lastRun("t1").isEmpty)
    ctl.advance("t1", ts("2025-05-01 01:00:00"))
    assert(ctl.lastRun("t1").get === ts("2025-05-01 01:00:00"))
    ctl.advance("t1", ts("2025-05-01 00:30:00"))  // regression ignored
    assert(ctl.lastRun("t1").get === ts("2025-05-01 01:00:00"))
    ctl.advance("t1", ts("2025-05-01 02:00:00"))
    assert(ctl.lastRun("t1").get === ts("2025-05-01 02:00:00"))
    assert(ctl.lastRun("t2").isEmpty)
  }

  test("run: seeds on first pass, advances, then processes only the delta") {
    val dir = Files.createTempDirectory("graft-run").toString
    val ctl = new Incremental.ControlTable(dir)
    var seen = Seq.empty[Long]
    def apply(df: org.apache.spark.sql.DataFrame): Option[Timestamp] = {
      val rows = df.select("id", "created_at").collect()
      seen = seen ++ rows.map(_.getLong(0))
      rows.map(_.getTimestamp(1)).sorted.lastOption
    }
    Incremental.run(ctl, "t", src, col("created_at"), ts("2025-05-01 01:00:00"))(apply)
    assert(seen.sorted === Seq(1L, 2L))  // first batch: up to end boundary
    Incremental.run(ctl, "t", src, col("created_at"), ts("2025-05-01 03:00:00"))(apply)
    assert(seen.sorted === Seq(1L, 2L, 3L))  // second: only the delta
  }
}
