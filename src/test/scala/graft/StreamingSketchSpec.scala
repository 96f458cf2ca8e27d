package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Sketch
import graft.streaming.{EventStream, SketchStream}

/** Streamed maintenance of the KMV sketch state: micro-batches must
  * converge to EXACTLY the one-shot sketch (min-k over a distinct set
  * is associative), restarts must not re-absorb, and the shared
  * marker+tag replay contract holds even though a KMV re-absorb would
  * be value-harmless. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def est(path: String): (Int, Int, Double) = {
    val r = Sketch.readKmvState(spark, path).head()
    (r.getInt(0), r.getInt(1), r.getDouble(2))
  }

  test("streamed KMV absorbs across 3 micro-batches + restart == one-shot sketch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val all = (0L until 3000L).toDF("k").collect().map(_.getLong(0)).toSeq
    val (seed, arrivals) = all.splitAt(1000)
    val p = java.nio.file.Files.createTempDirectory("graft-skmv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-skmv-ck").toString
    Sketch.writeKmvState(seed.toDF("k"), "k", k = 128, p)

    val fn = SketchStream.kmvAppendBatch(p, "k")
    val mem = MemoryStream[Long]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("k"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    // overlapping batches on purpose: re-seen keys must not perturb
    // the retained set (distinct semantics through the stream too)
    mem.addData(arrivals.slice(0, 800): _*)
    runOnce()
    mem.addData(arrivals.slice(600, 1400): _*)
    runOnce()   // restart boundary
    mem.addData(arrivals.slice(1200, 2000): _*)
    runOnce()

    val pRef = java.nio.file.Files.createTempDirectory("graft-skmv-ref").toString
    Sketch.writeKmvState(all.toDF("k"), "k", k = 128, pRef)
    assert(est(p) === est(pRef),
      "streamed sketch diverged from the one-shot")
    // the retained ARRAYS are identical, not just the estimates
    val ra = graft.ops.StateStore.readSingle(spark, p).head().getSeq[Long](1)
    val rb = graft.ops.StateStore.readSingle(spark, pRef).head().getSeq[Long](1)
    assert(ra === rb)
    // committed replay out-of-band is skipped (marker fast path)
    val before = graft.ops.IndexManifest.versions(spark, p).max
    fn(arrivals.slice(0, 800).toDF("k"), 0L)
    assert(graft.ops.IndexManifest.versions(spark, p).max === before,
      "replay of a committed batch must not commit a new version")
  }

  test("partial KMV absorb (started without committed) retries safely; zombie tag no-ops") {
    val p = java.nio.file.Files.createTempDirectory("graft-skmv-part").toString
    // k=128 > every count below: the estimator stays on its exact
    // (unsaturated) path, so the assertions compare whole numbers
    Sketch.writeKmvState((0L until 50L).toDF("k"), "k", k = 128, p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/_stream_batches"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=2.started"), false).close()
    def nd(): Double = Sketch.readKmvState(spark, p).head().getDouble(2)
    SketchStream.kmvAppendBatch(p, "k")((50L until 60L).toDF("k"), 2L)
    assert(nd() === 60.0, "the retried batch must apply")
    // zombie that committed (tag landed) but died before its marker
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=3.started"), false).close()
    Sketch.absorbKmvState((60L until 70L).toDF("k"), "k", p,
      streamTag = Some("stream-batch-3"))
    val vAfter = graft.ops.IndexManifest.versions(spark, p).max
    SketchStream.kmvAppendBatch(p, "k")((60L until 70L).toDF("k"), 3L)
    assert(nd() === 70.0)
    assert(graft.ops.IndexManifest.versions(spark, p).max === vAfter,
      "retry after a committed-but-unmarked attempt must not re-commit")
  }
}
