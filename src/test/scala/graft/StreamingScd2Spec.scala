package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Merge
import graft.streaming.{EventStream, Scd2Stream}

/** Streamed SCD-2 maintenance: micro-batches must fold into EXACTLY
  * the history the batch operator builds over the same sequence,
  * restarts must not double-version, replays must no-op. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def hist(path: String) =
    spark.read.parquet(s"$path/state").collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("tier")),
        Option(r.getTimestamp(r.fieldIndex("valid_from"))).map(_.toString).orNull,
        Option(r.getTimestamp(r.fieldIndex("valid_to"))).map(_.toString).orNull))
      .toSet

  test("streamed SCD-2 across 3 micro-batches + restart == batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val p = java.nio.file.Files.createTempDirectory("graft-sscd2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sscd2-ck").toString
    val b0 = Seq((1L, "gold", ts("2024-01-01 00:00:00")),
      (2L, "iron", ts("2024-01-01 00:00:00")))
    val b1 = Seq((1L, "platinum", ts("2024-02-01 00:00:00")),
      (3L, "new", ts("2024-02-01 00:00:00")),
      // within-batch duplicate: last writer (later ts) wins
      (3L, "stale", ts("2024-01-15 00:00:00")))
    val b2 = Seq((2L, "bronze", ts("2024-03-01 00:00:00")))

    val fn = Scd2Stream.scd2Batch(p, Seq("id"), "ts")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("id", "tier", "ts"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    mem.addData(b0: _*); runOnce()
    mem.addData(b1: _*); runOnce() // restart boundary
    mem.addData(b2: _*); runOnce()

    // batch fold over the same sequence
    def dedup(b: Seq[(Long, String, java.sql.Timestamp)]) =
      Merge.lastWriterWins(b.toDF("id", "tier", "ts"), Seq("id"),
        Seq(col("ts"))).drop("ts")
    val empty = dedup(b0).filter(lit(false))
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val folded = Seq(b0, b1, b2).foldLeft(empty) { (h, b) =>
      Merge.scd2Upsert(h, dedup(b), Seq("id"),
        lit(b.map(_._3).max(Ordering.by((t: java.sql.Timestamp) => t.getTime))))
    }
    val expect = folded.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getTimestamp(2)).map(_.toString).orNull,
      Option(r.getTimestamp(3)).map(_.toString).orNull)).toSet
    assert(hist(p) === expect, "streamed history diverges from the batch fold")
    // sanity: the duplicate resolved to 'new', version chain for id=1 closed
    assert(hist(p).exists(r => r._1 == 3L && r._2 == "new" && r._4 == null))
    assert(hist(p).exists(r => r._1 == 1L && r._2 == "gold" && r._4 != null))

    // committed replay out-of-band: no duplicate versions
    fn(b1.toDF("id", "tier", "ts"), 1L)
    assert(hist(p) === expect, "replay of a committed batch must be a no-op")
  }

  test("partial SCD-2 apply fails loudly") {
    val p = java.nio.file.Files.createTempDirectory("graft-sscd2p").toString
    val fn = Scd2Stream.scd2Batch(p, Seq("id"), "ts")
    fn(Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("id", "tier", "ts"), 0L)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=1.started"), false).close()
    val e = intercept[IllegalStateException] {
      fn(Seq((1L, "b", ts("2024-02-01 00:00:00"))).toDF("id", "tier", "ts"), 1L)
    }
    assert(e.getMessage.contains("PARTIAL apply"))
    assert(hist(p).map(_._2) === Set("a"))
  }

  test("non-empty batch with all-null event times is refused before touching history") {
    val p = java.nio.file.Files.createTempDirectory("graft-sscd2n").toString
    val fn = Scd2Stream.scd2Batch(p, Seq("id"), "ts")
    fn(Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("id", "tier", "ts"), 0L)
    val before = hist(p)
    // max(ts) over an all-null column is null — applying it would open
    // null-valid_from versions and leave two 'current' rows per key
    val e = intercept[IllegalArgumentException] {
      fn(Seq((1L, "b", null.asInstanceOf[java.sql.Timestamp]))
        .toDF("id", "tier", "ts"), 1L)
    }
    assert(e.getMessage.contains("all null"))
    assert(hist(p) === before, "refused batch must leave history untouched")
    // and the batch id is NOT marked committed: a fixed redelivery applies
    fn(Seq((1L, "b", ts("2024-02-01 00:00:00"))).toDF("id", "tier", "ts"), 1L)
    assert(hist(p).exists(r => r._1 == 1L && r._2 == "b" && r._4 == null))
  }
}
