package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{Ann, TextIndex}
import graft.streaming.{EventStream, IndexStream}

/** Streamed maintenance of the persisted retrieval indexes: a stream
  * of micro-batches must converge to EXACTLY the index a batch job
  * would build over the same data (append==rebuild lifted to
  * streaming), restarts must not double-append, and a partial append
  * must fail loudly rather than double-count. */
class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecRows(ids: Range): Seq[(Long, Array[Float])] = {
    ids.map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
  }

  test("streamed IVF appends across 3 micro-batches + restart == batch rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val all = vecRows(0 until 120)
    val (seed, arrivals) = all.splitAt(60)
    val p = java.nio.file.Files.createTempDirectory("graft-sivf").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sivf-ck").toString
    Ann.writeIvfIndex(seed.toDF("id", "vec"), p, nLists = 8, trainIters = 2)

    val fn = IndexStream.ivfAppendBatch(p)
    val mem = MemoryStream[(Long, Array[Float])]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("id", "vec"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    // two micro-batches, stop, RESTART the same checkpoint, third batch
    mem.addData(arrivals.slice(0, 20): _*)
    runOnce()
    mem.addData(arrivals.slice(20, 40): _*)
    runOnce()
    mem.addData(arrivals.slice(40, 60): _*)
    runOnce()

    // probe equality vs a from-scratch rebuild over seed ∪ arrivals
    // with the SAME stored centroids
    val cents = Ann.readIvfCentroids(spark, p)
    val pRef = java.nio.file.Files.createTempDirectory("graft-sivf-ref").toString
    Ann.writeIvfIndex(all.toDF("id", "vec"), pRef, nLists = 8,
      centroidsOverride = Some(cents))
    val qs = all.take(6).toDF("id", "vec")
    def triples(path: String) = Ann.probeIvfIndex(qs, path, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(triples(p) === triples(pRef),
      "streamed index diverges from the batch rebuild")
    // every arrival landed exactly once
    def listCount(path: String): Long = graft.ops.IndexManifest
      .pin(spark, path).read(spark, "lists", Some("cid")).get.count()
    assert(listCount(p) === all.size.toLong)

    // a committed batch redelivered out-of-band is SKIPPED
    fn(arrivals.slice(0, 20).toDF("id", "vec"), 0L)
    assert(listCount(p) === all.size.toLong,
      "replay of a committed batch must be a no-op")
    assert(triples(p) === triples(pRef))
  }

  test("partial append (started without committed) retries safely, never double-counts") {
    // the manifest-versioned appends publish atomically, so a stale
    // started-marker from a crashed attempt (which by construction
    // changed nothing) is cleared and the batch re-applied — the
    // pre-manifest loud refusal survives only for non-atomic sinks
    // (StreamOnce's default mode, spec'd in StreamingCdcSpec)
    val p = java.nio.file.Files.createTempDirectory("graft-sivf-part").toString
    Ann.writeIvfIndex(vecRows(0 until 30).toDF("id", "vec"), p, nLists = 4)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/_stream_batches"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=7.started"), false).close()
    def listCount(): Long = graft.ops.IndexManifest
      .pin(spark, p).read(spark, "lists", Some("cid")).get.count()
    IndexStream.ivfAppendBatch(p)(vecRows(100 until 110).toDF("id", "vec"), 7L)
    assert(listCount() === 40L, "the retried batch must apply exactly once")
    // the retry committed: a replay of batch 7 is now a no-op
    IndexStream.ivfAppendBatch(p)(vecRows(100 until 110).toDF("id", "vec"), 7L)
    assert(listCount() === 40L, "replay after the retry double-counted")
    // other batch ids are unaffected
    IndexStream.ivfAppendBatch(p)(vecRows(200 until 210).toDF("id", "vec"), 8L)
    assert(listCount() === 50L)
  }

  test("zombie attempt that committed before its marker: the retry no-ops via the commit tag, never double-applies") {
    // THE window the started/committed markers alone cannot close: an
    // attempt finishes its atomic manifest commit and releases the
    // writer lock, but dies (or is partitioned away) before creating
    // its committed marker. The retry sees started-without-committed
    // and re-applies — which must detect the landed commit and no-op.
    val p = java.nio.file.Files.createTempDirectory("graft-sivf-zomb").toString
    Ann.writeIvfIndex(vecRows(0 until 30).toDF("id", "vec"), p, nLists = 4)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/_stream_batches"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=7.started"), false).close()
    // the zombie's completed apply: manifest committed WITH the batch
    // tag, no committed marker
    val batch = vecRows(100 until 110).toDF("id", "vec")
    Ann.appendToIvfIndex(batch, p, streamTag = Some("stream-batch-7"))
    val vAfterZombie = graft.ops.IndexManifest.pin(spark, p).version
    def listCount(): Long = graft.ops.IndexManifest
      .pin(spark, p).read(spark, "lists", Some("cid")).get.count()
    assert(listCount() === 40L)

    // the redelivery: must skip, not double-append
    IndexStream.ivfAppendBatch(p)(batch, 7L)
    assert(listCount() === 40L,
      "retry after a committed-but-unmarked attempt double-applied the batch")
    assert(graft.ops.IndexManifest.pin(spark, p).version === vAfterZombie,
      "the no-op retry must not commit a new manifest version")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=7.committed")),
      "the retry must record the batch as committed")
    // and a later replay takes the cheap marker fast path
    IndexStream.ivfAppendBatch(p)(batch, 7L)
    assert(listCount() === 40L)
    // a DIFFERENT batch still applies (tags are per batch id)
    IndexStream.ivfAppendBatch(p)(vecRows(200 until 210).toDF("id", "vec"), 8L)
    assert(listCount() === 50L)
  }

  test("streamed BIN appends across 3 micro-batches + restart == batch rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val all = vecRows(0 until 120)
    val (seed, arrivals) = all.splitAt(60)
    val p = java.nio.file.Files.createTempDirectory("graft-sbin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sbin-ck").toString
    Ann.writeIvfIndexBin(seed.toDF("id", "vec"), p, nLists = 8, trainIters = 2)

    val fn = IndexStream.ivfAppendBatch(p, variant = "bin")
    val mem = MemoryStream[(Long, Array[Float])]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("id", "vec"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    mem.addData(arrivals.slice(0, 20): _*)
    runOnce()
    mem.addData(arrivals.slice(20, 40): _*)
    runOnce()   // restart boundary
    mem.addData(arrivals.slice(40, 60): _*)
    runOnce()

    val cents = Ann.readIvfCentroids(spark, p)
    val pRef = java.nio.file.Files.createTempDirectory("graft-sbin-ref").toString
    Ann.writeIvfIndexBin(all.toDF("id", "vec"), pRef, nLists = 8,
      centroidsOverride = Some(cents))
    val qs = all.take(6).toDF("id", "vec")
    def triples(path: String) = Ann.probeIvfIndexBin(qs, path, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(triples(p) === triples(pRef),
      "streamed BIN index diverges from the batch rebuild")
    def listCount(path: String): Long = graft.ops.IndexManifest
      .pin(spark, path).read(spark, "lists", Some("cid")).get.count()
    assert(listCount(p) === all.size.toLong)
    // committed replay out-of-band is skipped
    fn(arrivals.slice(0, 20).toDF("id", "vec"), 0L)
    assert(listCount(p) === all.size.toLong)
  }

  test("streamed BM25 appends across 3 micro-batches + restart == batch rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 40L).map { i =>
      val rnd = new scala.util.Random(i)
      val words = Seq("hash", "join", "stream", "index", "merge", "probe",
        "vector", "token", "shard", "batch")
      (i, Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val (seed, arrivals) = docs.splitAt(20)
    val p = java.nio.file.Files.createTempDirectory("graft-sbm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sbm-ck").toString
    TextIndex.writeBm25Index(seed.toDF("doc_id", "text"), "doc_id", "text", p,
      nBuckets = 16)

    val fn = IndexStream.bm25AppendBatch(p, "doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("doc_id", "text"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    mem.addData(arrivals.slice(0, 7): _*)
    runOnce()
    mem.addData(arrivals.slice(7, 14): _*)
    runOnce()   // restart boundary
    mem.addData(arrivals.slice(14, 20): _*)
    runOnce()

    val pRef = java.nio.file.Files.createTempDirectory("graft-sbm-ref").toString
    TextIndex.writeBm25Index(docs.toDF("doc_id", "text"), "doc_id", "text", pRef,
      nBuckets = 16)
    def scores(path: String) =
      TextIndex.probeBm25Index(spark, path, Seq("hash", "stream", "probe"))
        .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
          round(col("score"), 9).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    assert(scores(p) === scores(pRef),
      "streamed BM25 index diverges from the batch rebuild")
    // committed replay out-of-band: no double-counted df/tf
    fn(arrivals.slice(0, 7).toDF("doc_id", "text"), 0L)
    assert(scores(p) === scores(pRef))
  }
}
