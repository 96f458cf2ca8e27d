package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Merge
import graft.streaming.{CdcStream, EventStream}

/** Streamed CDC: an upsert+tombstone stream must maintain the persisted
  * snapshot exactly, the change log must classify every transition, the
  * log replay must reconstruct the state (the applyDiff fold theorem),
  * and redeliveries must skip via the StreamOnce markers. */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  test("3 micro-batches with update/delete/reinsert: state, log, replay, restart") {
    implicit val sqlCtx = spark.sqlContext
    val statePath = java.nio.file.Files.createTempDirectory("graft-cdc-st").toString + "/s"
    val logPath = java.nio.file.Files.createTempDirectory("graft-cdc-log").toString + "/l"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ck").toString

    val fn = CdcStream.changeLogBatch(statePath, logPath, Seq("k"),
      tombstoneCol = Some("dead"))
    val mem = MemoryStream[(Long, String, Boolean)]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("k", "v", "dead"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    // batch 0: inserts 1,2,3
    mem.addData((1L, "a", false), (2L, "b", false), (3L, "c", false))
    runOnce()
    // batch 1 (after a restart): update 2, delete 3, no-op upsert 1
    mem.addData((1L, "a", false), (2L, "B", false), (3L, "ignored", true))
    runOnce()
    // batch 2: re-insert 3, tombstone for unknown key 9 (no-op)
    mem.addData((3L, "c2", false), (9L, "x", true))
    runOnce()

    val state = spark.read.parquet(statePath)
    assert(state.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      .toList === List((1L, "a"), (2L, "B"), (3L, "c2")))

    val log = spark.read.parquet(logPath)
    val byBatch = log.select(col("batch_id"), col("k"), col("change_op"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(byBatch === Set(
      (0L, 1L, "insert"), (0L, 2L, "insert"), (0L, 3L, "insert"),
      (1L, 2L, "update"), (1L, 3L, "delete"),
      (2L, 3L, "insert")))
    // the no-op upsert of key 1 in batch 1 must NOT appear
    assert(log.filter(col("batch_id") === 1 && col("k") === 1).isEmpty)

    // replay theorem: folding applyDiff over the log in batch order
    // over an empty snapshot reconstructs the state exactly
    val empty = state.filter(lit(false))
    val batches = log.select(col("batch_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val replayed = batches.foldLeft(empty) { (acc, b) =>
      Merge.applyDiff(acc, log.filter(col("batch_id") === b), Seq("k"))
    }
    assert(replayed.orderBy("k").collect().map(_.toSeq).toList ===
      state.orderBy("k").collect().map(_.toSeq).toList)

    // a committed batch redelivered out-of-band is a no-op
    fn(Seq((1L, "zzz", false)).toDF("k", "v", "dead"), 0L)
    assert(spark.read.parquet(statePath).filter(col("k") === 1)
      .head().getString(1) === "a", "replayed batch must be skipped")
    assert(spark.read.parquet(logPath).count() === 6)
  }

  test("partial batch (started without committed) fails loudly") {
    val statePath = java.nio.file.Files.createTempDirectory("graft-cdc-p").toString + "/s"
    val logPath = java.nio.file.Files.createTempDirectory("graft-cdc-pl").toString + "/l"
    val fs = new org.apache.hadoop.fs.Path(logPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$logPath/_stream_batches"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$logPath/_stream_batches/batch_id=4.started"), false).close()
    val e = intercept[IllegalStateException] {
      CdcStream.changeLogBatch(statePath, logPath, Seq("k"))(
        Seq((1L, "a")).toDF("k", "v"), 4L)
    }
    assert(e.getMessage.contains("PARTIAL apply"))
  }
}
