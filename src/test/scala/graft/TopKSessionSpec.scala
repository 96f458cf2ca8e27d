package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.Sessionize

/** TypedImperativeAggregate top-k vs the window formulation, and
  * sessionization stream/batch equivalence. */
class TopKSessionSpec extends SparkSpec {
  import spark.implicits._

  test("TopKByScore aggregate == row_number window top-k (ties included)") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 5000).map { i =>
      (i.toLong % 7, rnd.nextInt(50).toDouble, i.toLong) // many score ties
    }
    val df = rows.toDF("g", "score", "id")

    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val topK = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("score"), col("id"))), 10).toAggregateExpression())
    val agg = df.groupBy(col("g")).agg(topK.as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("e.id").as("id"), col("e.score").as("score"))

    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val win = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("g"), col("rank").cast("long"), col("id"), col("score"))

    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }

  test("TopKByScore: NaN scores rank FIRST (the nan-safe desc window order)") {
    // a NaN at the heap root must not block replacements, and NaN
    // entries must sort first like row_number over (score DESC) does
    val df = Seq((1L, Double.NaN, 1L), (1L, 5.0, 2L), (1L, 9.0, 3L),
      (2L, 7.0, 1L), (2L, Double.NaN, 2L))
      .toDF("g", "score", "id")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val topK = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("score"), col("id"))), 2).toAggregateExpression())
    val agg = df.groupBy(col("g")).agg(topK.as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val win = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select(col("g"), col("rank").cast("long"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg === win)
    assert(agg === Set((1L, 1L, 1L), (1L, 2L, 3L), (2L, 1L, 2L), (2L, 2L, 1L)))
  }

  test("TopKByScore: groups smaller than k return all rows, best first") {
    val df = Seq((1L, 5.0, 10L), (1L, 7.0, 11L)).toDF("g", "score", "id")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val topK = column(graft.expr.catalyst.TopKByScore(
      expression(struct(col("score"), col("id"))), 10).toAggregateExpression())
    val got = df.groupBy("g").agg(topK.as("t")).select(explode(col("t")))
      .collect().map(r => r.getStruct(0)).map(s => (s.getDouble(0), s.getLong(1)))
    assert(got.toSeq === Seq((7.0, 11L), (5.0, 10L)))
  }

  test("sessionizeBatch groups events by gap") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2025-05-01 10:00:00")), (1L, ts("2025-05-01 10:10:00")),
      (1L, ts("2025-05-01 15:00:00")),                 // > 30 min gap: new session
      (2L, ts("2025-05-01 09:00:00"))
    ).toDF("user_id", "ts")
    val got = Sessionize.sessionizeBatch(events, gapSeconds = 1800)
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(3)))
    assert(got.toSeq === Seq(
      (1L, "2025-05-01 10:00:00.0", 2),
      (1L, "2025-05-01 15:00:00.0", 1),
      (2L, "2025-05-01 09:00:00.0", 1)))
  }

  test("streaming sessionization emits the same closed sessions as batch") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val data = Seq(
      Sessionize.Event(1L, ts("2025-05-01 10:00:00")),
      Sessionize.Event(1L, ts("2025-05-01 10:10:00")),
      Sessionize.Event(1L, ts("2025-05-01 15:00:00")),
      Sessionize.Event(2L, ts("2025-05-01 09:00:00")))
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionizeStream(mem.toDS(), gapSeconds = 1800,
        lateness = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // advance watermark far enough to time out every open session
      mem.addData(Sessionize.Event(99L, ts("2025-05-02 12:00:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-05-03 12:00:00")))
      q.processAllAvailable()

      val streamed = spark.table("sessions")
        .filter(col("user_id") < 99)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start").collect().map(_.toSeq)
      val batch = Sessionize.sessionizeBatch(
          data.map(e => (e.user_id, e.ts)).toDF("user_id", "ts"), 1800)
        .orderBy("user_id", "session_start").collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("sessionization lateness: within-watermark stragglers join, older rows drop") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionizeStream(mem.toDS(), gapSeconds = 1800,
        lateness = "10 minutes")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      // batch A opens the session; batch B's advancer moves the
      // watermark to 10:30
      mem.addData(Sessionize.Event(1L, ts("2025-05-01 10:00:00")),
        Sessionize.Event(1L, ts("2025-05-01 10:10:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-05-01 10:40:00")))
      q.processAllAvailable()
      // batch C: one straggler BELOW the 10:30 watermark (dropped by
      // contract) and one above it (joins the still-open session —
      // its event-time timeout 10:40 has not passed the watermark)
      mem.addData(Sessionize.Event(1L, ts("2025-05-01 10:20:00")),
        Sessionize.Event(1L, ts("2025-05-01 10:32:00")))
      q.processAllAvailable()
      // advance far enough to time the session out, twice (emit lag)
      mem.addData(Sessionize.Event(99L, ts("2025-05-02 12:00:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-05-03 12:00:00")))
      q.processAllAvailable()

      val got = spark.table("sessions_late").filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getTimestamp(1).toString, r.getInt(2)))
      // == batch over the KEPT rows: the dropped straggler must not
      // count (n_events 3, not 4), the within-lateness one must
      val kept = Seq((1L, ts("2025-05-01 10:00:00")),
        (1L, ts("2025-05-01 10:10:00")), (1L, ts("2025-05-01 10:32:00")))
      val batch = Sessionize.sessionizeBatch(kept.toDF("user_id", "ts"), 1800)
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getTimestamp(1).toString, r.getInt(2)))
      assert(got.toSeq === batch.toSeq)
      assert(got.toSeq === Seq(("2025-05-01 10:00:00.0",
        "2025-05-01 10:32:00.0", 3)))
    } finally q.stop()
  }

  test("sessionization: an out-of-order straggler EARLIER than the open session extends it backward") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionizeStream(mem.toDS(), gapSeconds = 1800,
        lateness = "20 minutes")
      .writeStream.format("memory").queryName("sessions_back")
      .outputMode("append").start()
    try {
      // batch A opens the session at 10:40 (watermark 10:20)
      mem.addData(Sessionize.Event(1L, ts("2025-05-01 10:40:00")))
      q.processAllAvailable()
      // batch B: a within-lateness straggler EARLIER than the open
      // session's start — must extend the session BACKWARD, so
      // session_start is 10:25, exactly what the batch twin computes
      mem.addData(Sessionize.Event(1L, ts("2025-05-01 10:25:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-05-02 12:00:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-05-03 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("sessions_back").filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getTimestamp(1).toString, r.getInt(2)))
      val batch = Sessionize.sessionizeBatch(
          Seq((1L, ts("2025-05-01 10:40:00")), (1L, ts("2025-05-01 10:25:00")))
            .toDF("user_id", "ts"), 1800)
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getTimestamp(1).toString, r.getInt(2)))
      assert(got.toSeq === batch.toSeq)
      assert(got.toSeq === Seq(("2025-05-01 10:25:00.0",
        "2025-05-01 10:40:00.0", 2)))
    } finally q.stop()
  }

  test("sessionization: a bridge event arriving one batch AFTER the two intervals it fuses merges them (stream == batch)") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionizeStream(mem.toDS(), gapSeconds = 1800,
        lateness = "2 hours")
      .writeStream.format("memory").queryName("sessions_bridge")
      .outputMode("append").start()
    try {
      // batch A: TWO intervals 40 min apart (> 30 min gap); with the
      // 2 h lateness both stay open in state — the pre-r10 one-
      // interval state emitted the 10:00 interval here, making the
      // later bridge unmergeable
      mem.addData(Sessionize.Event(1L, ts("2025-05-01 10:00:00")),
        Sessionize.Event(1L, ts("2025-05-01 10:40:00")))
      q.processAllAvailable()
      // batch B: the bridge — within gap of BOTH intervals; must fuse
      // them into one session exactly like the batch twin
      mem.addData(Sessionize.Event(1L, ts("2025-05-01 10:20:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-05-02 12:00:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-05-03 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("sessions_bridge").filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getTimestamp(1).toString, r.getInt(2)))
      val batch = Sessionize.sessionizeBatch(
          Seq((1L, ts("2025-05-01 10:00:00")), (1L, ts("2025-05-01 10:40:00")),
            (1L, ts("2025-05-01 10:20:00"))).toDF("user_id", "ts"), 1800)
        .select("session_start", "session_end", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getTimestamp(1).toString, r.getInt(2)))
      assert(got.toSeq === batch.toSeq)
      assert(got.toSeq === Seq(("2025-05-01 10:00:00.0",
        "2025-05-01 10:40:00.0", 3)))
    } finally q.stop()
  }

  test("sessionization state rail: beyond maxOpenIntervals the OLDEST intervals emit early, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[Sessionize.Event]
    // cap at 2 open intervals; lateness huge so nothing watermark-closes
    val q = Sessionize.sessionizeStream(mem.toDS(), gapSeconds = 1800,
        lateness = "10 days", maxOpenIntervals = 2)
      .writeStream.format("memory").queryName("sessions_rail")
      .outputMode("append").start()
    try {
      // four disjoint intervals (1 h apart, 30 min gap) in one batch
      mem.addData(Sessionize.Event(1L, ts("2025-05-01 08:00:00")),
        Sessionize.Event(1L, ts("2025-05-01 09:00:00")),
        Sessionize.Event(1L, ts("2025-05-01 10:00:00")),
        Sessionize.Event(1L, ts("2025-05-01 11:00:00")))
      q.processAllAvailable()
      // the two OLDEST forced out immediately (bounded state), the two
      // newest held open despite the 10-day lateness
      val early = spark.table("sessions_rail").filter(col("user_id") === 1L)
        .select("session_start", "forced").collect()
        .map(r => (r.getTimestamp(0).toString, r.getBoolean(1))).sorted
      assert(early.toSeq === Seq(("2025-05-01 08:00:00.0", true),
        ("2025-05-01 09:00:00.0", true)),
        "cap-forced emissions must carry forced = true")
      // advance the watermark far enough to close the rest
      mem.addData(Sessionize.Event(99L, ts("2025-06-01 12:00:00")))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(99L, ts("2025-07-01 12:00:00")))
      q.processAllAvailable()
      val all = spark.table("sessions_rail").filter(col("user_id") === 1L)
        .select("session_start", "n_events", "forced").collect()
        .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getBoolean(2)))
        .sorted
      // watermark-closed rows stay forced = false — the flag separates
      // the degraded emissions from the disjointness-guaranteed ones
      assert(all.toSeq === Seq(("2025-05-01 08:00:00.0", 1, true),
        ("2025-05-01 09:00:00.0", 1, true), ("2025-05-01 10:00:00.0", 1, false),
        ("2025-05-01 11:00:00.0", 1, false)))
    } finally q.stop()
  }

  test("native session_window == gap-flag batch, boundary INCLUDED (inclusive merge)") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2025-05-01 10:00:00")), (1L, ts("2025-05-01 10:20:00")),
      (1L, ts("2025-05-01 11:30:00")), (2L, ts("2025-05-01 09:00:00")))
      .toDF("user_id", "ts")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getInt(3))).toSet
    assert(
      rows(Sessionize.sessionizeNative(events, gapSeconds = 1800)) ===
        rows(Sessionize.sessionizeBatch(events, gapSeconds = 1800)),
      "built-in and gap-flag formulations must agree")
    // the built-in's merge is INCLUSIVE at exactly prev + gap —
    // measured here because it is easy to misremember as exclusive
    // (window end = ts + gap reads like a half-open interval); both
    // formulations merge the boundary event
    val boundary = Seq((1L, ts("2025-05-01 10:00:00")),
      (1L, ts("2025-05-01 10:30:00"))).toDF("user_id", "ts")
    assert(Sessionize.sessionizeNative(boundary, gapSeconds = 1800)
      .count() === 1L)
    assert(Sessionize.sessionizeBatch(boundary, gapSeconds = 1800)
      .count() === 1L)
    // null-ts events belong to no session and DROP in both forms (the
    // native analyzer injects IsNotNull; batch filters explicitly —
    // previously it emitted a (null, null) pseudo-session)
    val dirty = Seq((1L, Option(ts("2025-05-01 10:00:00"))),
      (1L, Option.empty[Timestamp])).toDF("user_id", "ts")
    assert(Sessionize.sessionizeBatch(dirty, gapSeconds = 1800).count() === 1L)
    assert(Sessionize.sessionizeNative(dirty, gapSeconds = 1800).count() === 1L)
  }

  test("sessionizeBatch: the gap compares milliseconds, not truncated seconds") {
    // events 10.9 s apart with gap 10 s: whole-second truncation reads
    // the diff as 10 <= 10 and merges; millisecond arithmetic splits —
    // the streaming twin's semantics
    val df = Seq(
      (1L, new Timestamp(1000L)),      // 00:00:01.000
      (1L, new Timestamp(11900L)))     // 00:00:11.900
      .toDF("user_id", "ts")
    val sessions = Sessionize.sessionizeBatch(df, gapSeconds = 10)
    assert(sessions.count() === 2L,
      "a 10.9 s gap must split sessions at gap 10 s")
  }
}
