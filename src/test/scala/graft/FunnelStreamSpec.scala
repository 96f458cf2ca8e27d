package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Funnel
import graft.streaming.FunnelStream

/** Stream==batch contract for the funnel (VERDICT r6 item 8): the
  * stateful streaming funnel must emit exactly the rows
  * [[Funnel.stageTimes]] computes relationally on the same events —
  * including events arriving out of order across micro-batches (the
  * case the watermark-buffered replay exists for). */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("signup", "view", "purchase")

  test("replay machine == batch stageTimes on assorted shapes") {
    // (events, label) pairs exercising the tricky orderings
    val cases: Seq[(Seq[(Long, String, String)], String)] = Seq(
      (Seq((1L, "2025-05-01 10:00:00", "signup"),
        (1L, "2025-05-01 10:05:00", "view"),
        (1L, "2025-05-01 10:20:00", "purchase")), "clean conversion"),
      (Seq((1L, "2025-05-01 10:05:00", "view"),        // view BEFORE signup
        (1L, "2025-05-01 10:10:00", "signup"),          // must not count
        (1L, "2025-05-01 10:30:00", "view"),
        (1L, "2025-05-01 10:40:00", "purchase")), "step-2 before step-1 skipped"),
      (Seq((1L, "2025-05-01 10:00:00", "signup"),
        (1L, "2025-05-01 10:00:00", "view")), "same-ts tie needs strict after"),
      (Seq((1L, "2025-05-01 10:00:00", "signup"),
        (1L, "2025-05-01 12:00:00", "view")), "view outside horizon dropped"),
      (Seq((1L, "2025-05-01 09:00:00", "view"),
        (1L, "2025-05-01 09:30:00", "purchase")), "never signed up: no stages"))
    cases.foreach { case (evts, label) =>
      val df = evts.map { case (u, t, s) => (u, ts(t), s) }.toDF("user_id", "ts", "step")
      val batch = Funnel.stageTimes(df, "user_id", "ts", "step", steps,
          withinSeconds = Some(3600L))
        .orderBy("step").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getTimestamp(3).getTime)).toSeq
      val machine = FunnelStream.replay(
          evts.map { case (_, t, s) => (ts(t).getTime, s) }.sortBy(identity),
          steps, withinMs = Some(3600L * 1000))
        .map { case (i, s, t) => (i.toLong, s, t) }
      assert(machine === batch, s"case: $label")
    }
  }

  test("streaming funnel survives a checkpointed restart with buffered state intact") {
    implicit val sqlCtx = spark.sqlContext
    val sink = java.nio.file.Files.createTempDirectory("graft-funnel-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString
    val mem = MemoryStream[FunnelStream.Event]
    def runOnce(): Unit = {
      val q = FunnelStream.stageTimesStream(mem.toDS(), steps,
          withinSeconds = Some(3600L), lateness = "30 minutes",
          quiesceSeconds = 600L)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
    }
    // run 1: only the first two stages arrive, then the query STOPS —
    // user 1's buffer lives in the state store
    mem.addData(FunnelStream.Event(1L, ts("2025-05-01 10:00:00"), "signup"),
      FunnelStream.Event(1L, ts("2025-05-01 10:05:00"), "view"))
    runOnce()
    // run 2 (same checkpoint): the purchase plus watermark advancers —
    // the recovered state must still hold the earlier events
    mem.addData(FunnelStream.Event(1L, ts("2025-05-01 10:20:00"), "purchase"))
    runOnce()
    mem.addData(FunnelStream.Event(99L, ts("2025-05-02 12:00:00"), "signup"))
    runOnce()
    mem.addData(FunnelStream.Event(99L, ts("2025-05-03 12:00:00"), "signup"))
    runOnce()
    val got = spark.read.parquet(sink).filter(col("user_id") === 1L)
      .select("step", "stage", "step_ts")
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toString))
    assert(got.toSeq === Seq(
      (1L, "signup", "2025-05-01 10:00:00.0"),
      (2L, "view", "2025-05-01 10:05:00.0"),
      (3L, "purchase", "2025-05-01 10:20:00.0")),
      s"full funnel must assemble across the restart, got ${got.toSeq}")
  }

  test("streaming funnel emits the same stage rows as batch, across out-of-order batches") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      FunnelStream.Event(1L, ts("2025-05-01 10:05:00"), "view"),     // arrives first,
      FunnelStream.Event(2L, ts("2025-05-01 10:00:00"), "signup"),
      FunnelStream.Event(2L, ts("2025-05-01 10:02:00"), "view"))
    val batch2 = Seq(
      FunnelStream.Event(1L, ts("2025-05-01 10:01:00"), "signup"),   // ...but ts-earlier
      FunnelStream.Event(1L, ts("2025-05-01 10:30:00"), "purchase"),
      FunnelStream.Event(2L, ts("2025-05-01 10:20:00"), "purchase"))
    val all = batch1 ++ batch2

    val mem = MemoryStream[FunnelStream.Event]
    val q = FunnelStream.stageTimesStream(mem.toDS(), steps,
        withinSeconds = Some(3600L), lateness = "30 minutes",
        quiesceSeconds = 600L)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // advance the watermark past every key's quiesce horizon
      mem.addData(FunnelStream.Event(99L, ts("2025-05-02 12:00:00"), "signup"))
      q.processAllAvailable()
      mem.addData(FunnelStream.Event(99L, ts("2025-05-03 12:00:00"), "signup"))
      q.processAllAvailable()

      val streamed = spark.table("funnel_stream")
        .filter(col("user_id") < 99)
        .select("user_id", "step", "stage", "step_ts")
        .orderBy("user_id", "step").collect().map(_.toSeq)
      val batch = Funnel.stageTimes(
          all.map(e => (e.user_id, e.ts, e.step)).toDF("user_id", "ts", "step"),
          "user_id", "ts", "step", steps, withinSeconds = Some(3600L))
        .select(col("user_id"), col("step"), col("stage"), col("step_ts"))
        .orderBy("user_id", "step").collect().map(_.toSeq)
      assert(batch.nonEmpty, "fixture must convert at least one key")
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("funnel lateness across a restart: within-watermark rows join, older rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val sink = java.nio.file.Files.createTempDirectory("graft-funnel-late").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-funnel-lck").toString
    val mem = MemoryStream[FunnelStream.Event]
    def runOnce(): Unit = {
      val q = FunnelStream.stageTimesStream(mem.toDS(), steps,
          withinSeconds = Some(3600L), lateness = "30 minutes",
          quiesceSeconds = 600L)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
    }
    // run 1: user 1's first two stages; the advancer puts the
    // watermark at 10:30 (11:00 − 30 min) before the restart
    mem.addData(FunnelStream.Event(1L, ts("2025-05-01 10:00:00"), "signup"),
      FunnelStream.Event(1L, ts("2025-05-01 10:05:00"), "view"))
    runOnce()
    mem.addData(FunnelStream.Event(99L, ts("2025-05-01 11:00:00"), "signup"))
    runOnce()
    // run 2 (recovered checkpoint): user 1's purchase lands BELOW the
    // recovered 10:30 watermark — dropped by contract, even though the
    // buffered state would convert; user 2's full funnel rides ABOVE
    // the watermark in the same batch — fully counted
    mem.addData(FunnelStream.Event(1L, ts("2025-05-01 10:20:00"), "purchase"),
      FunnelStream.Event(2L, ts("2025-05-01 10:35:00"), "signup"),
      FunnelStream.Event(2L, ts("2025-05-01 10:40:00"), "view"),
      FunnelStream.Event(2L, ts("2025-05-01 10:45:00"), "purchase"))
    runOnce()
    mem.addData(FunnelStream.Event(99L, ts("2025-05-02 12:00:00"), "signup"))
    runOnce()
    mem.addData(FunnelStream.Event(99L, ts("2025-05-03 12:00:00"), "signup"))
    runOnce()

    val streamed = spark.read.parquet(sink).filter(col("user_id") < 99)
      .select("user_id", "step", "stage", "step_ts")
      .orderBy("user_id", "step").collect().map(_.toSeq)
    // == batch over the KEPT events only (the late purchase excluded)
    val kept = Seq((1L, ts("2025-05-01 10:00:00"), "signup"),
      (1L, ts("2025-05-01 10:05:00"), "view"),
      (2L, ts("2025-05-01 10:35:00"), "signup"),
      (2L, ts("2025-05-01 10:40:00"), "view"),
      (2L, ts("2025-05-01 10:45:00"), "purchase"))
    val batch = Funnel.stageTimes(kept.toDF("user_id", "ts", "step"),
        "user_id", "ts", "step", steps, withinSeconds = Some(3600L))
      .select(col("user_id"), col("step"), col("stage"), col("step_ts"))
      .orderBy("user_id", "step").collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
    // and concretely: user 1 must NOT show a purchase stage
    assert(!streamed.exists(r => r.head == 1L && r(2) == "purchase"),
      "a below-watermark purchase must not convert the funnel")
    assert(streamed.count(_.head == 2L) === 3, "user 2 converts fully")
  }
}
