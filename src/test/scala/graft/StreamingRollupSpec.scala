package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.AggState
import graft.streaming.{EventStream, RollupStream}

/** Streamed maintenance of the keyed rollup state: micro-batches must
  * converge to EXACTLY the one-shot aggregate (decimal sums are
  * associative), restarts must not double-count, replays must no-op,
  * and partial applies must fail loudly. */
class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range): Seq[(String, Double)] =
    ids.map(i => (s"g${i % 5}", i * 0.25))

  private def snap(path: String) =
    AggState.readAggState(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3), r.getDouble(4), r.getDouble(5))).toSet

  test("streamed rollup across 3 micro-batches + restart == one-shot aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val all = rows(0 until 90)
    val (seed, arrivals) = all.splitAt(30)
    val p = java.nio.file.Files.createTempDirectory("graft-sroll").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sroll-ck").toString
    AggState.writeAggState(seed.toDF("g", "v"), Seq("g"), Seq("v"), p, nBuckets = 8)

    val fn = RollupStream.rollupAppendBatch(p)
    val mem = MemoryStream[(String, Double)]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("g", "v"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    mem.addData(arrivals.slice(0, 20): _*)
    runOnce()
    mem.addData(arrivals.slice(20, 40): _*)
    runOnce()   // restart boundary
    mem.addData(arrivals.slice(40, 60): _*)
    runOnce()

    val pRef = java.nio.file.Files.createTempDirectory("graft-sroll-ref").toString
    AggState.writeAggState(all.toDF("g", "v"), Seq("g"), Seq("v"), pRef, nBuckets = 8)
    assert(snap(p) === snap(pRef),
      "streamed rollup diverges from the one-shot aggregate")

    // committed replay out-of-band: no double-counted sums
    fn(arrivals.slice(0, 20).toDF("g", "v"), 0L)
    assert(snap(p) === snap(pRef), "replay of a committed batch must be a no-op")
  }

  test("partial rollup append (started without committed) retries safely, never double-counts") {
    // manifest-versioned state (r14 StateStore): a stale started
    // marker retries instead of refusing, and the commit tag closes
    // the committed-but-unmarked zombie window
    val p = java.nio.file.Files.createTempDirectory("graft-sroll-part").toString
    AggState.writeAggState(rows(0 until 10).toDF("g", "v"),
      Seq("g"), Seq("v"), p, nBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/_stream_batches"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=5.started"), false).close()
    def n(): Long = AggState.readAggState(spark, p)
      .agg(sum(col("n_rows"))).first().getLong(0)
    // crashed-before-commit attempt: the retry applies exactly once
    RollupStream.rollupAppendBatch(p)(rows(50 until 60).toDF("g", "v"), 5L)
    assert(n() === 20L, "the retried batch must apply exactly once")
    RollupStream.rollupAppendBatch(p)(rows(50 until 60).toDF("g", "v"), 5L)
    assert(n() === 20L, "replay after the retry double-counted")
    // zombie that committed (tag landed) but died before its marker:
    // the retry must detect the commit and no-op
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=6.started"), false).close()
    AggState.appendAggState(rows(60 until 70).toDF("g", "v"), p,
      streamTag = Some("stream-batch-6"))
    assert(n() === 30L)
    RollupStream.rollupAppendBatch(p)(rows(60 until 70).toDF("g", "v"), 6L)
    assert(n() === 30L,
      "retry after a committed-but-unmarked attempt double-counted")
    // other batch ids are unaffected
    RollupStream.rollupAppendBatch(p)(rows(70 until 80).toDF("g", "v"), 7L)
    assert(n() === 40L)
  }
}
