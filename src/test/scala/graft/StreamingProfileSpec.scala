package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Profile
import graft.streaming.{EventStream, ProfileStream}

/** Streamed maintenance of the mergeable profile state: micro-batches
  * must converge to EXACTLY the one-shot profile over the same rows
  * (HLL union is register-wise max — bit-exact, not approximate-equal),
  * restarts must not double-count, and replays must be no-ops. */
class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range): Seq[(Long, String, java.lang.Double)] =
    ids.map { i =>
      val v: java.lang.Double = if (i % 7 == 0) null else i * 1.5
      (i.toLong, s"cat_${i % 13}", v)
    }

  test("streamed profile across 3 micro-batches + restart == one-shot profile") {
    implicit val sqlCtx = spark.sqlContext
    val cols = Seq("id", "cat", "v")
    val all = rows(0 until 90)
    val (seed, arrivals) = all.splitAt(30)
    val p = java.nio.file.Files.createTempDirectory("graft-sprof").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sprof-ck").toString
    Profile.writeProfileState(seed.toDF("id", "cat", "v"), cols, p)

    val fn = ProfileStream.profileAppendBatch(p, cols)
    val mem = MemoryStream[(Long, String, java.lang.Double)]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(
        mem.toDF().toDF("id", "cat", "v"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    mem.addData(arrivals.slice(0, 20): _*)
    runOnce()
    mem.addData(arrivals.slice(20, 40): _*)
    runOnce()   // restart boundary
    mem.addData(arrivals.slice(40, 60): _*)
    runOnce()

    val pRef = java.nio.file.Files.createTempDirectory("graft-sprof-ref").toString
    Profile.writeProfileState(all.toDF("id", "cat", "v"), cols, pRef)
    def state(path: String) = Profile.readProfileState(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5)))).toSet
    assert(state(p) === state(pRef),
      "streamed profile state diverges from the one-shot profile")
    // small cardinality: the HLL estimate is exact here
    val cat = Profile.readProfileState(spark, p)
      .filter(col("column") === "cat").select("n_distinct_est").first().getLong(0)
    assert(cat === 13L)

    // committed replay out-of-band: no double-counted rows
    fn(arrivals.slice(0, 20).toDF("id", "cat", "v"), 0L)
    assert(state(p) === state(pRef), "replay of a committed batch must be a no-op")
  }

  test("streamed histogram across 3 micro-batches + restart == one-shot, bit-exact") {
    implicit val sqlCtx = spark.sqlContext
    val all = (0 until 90).map(i => Tuple1(i * 1.5 - 10)) // spans both overflows
    val (seed, arrivals) = all.splitAt(30)
    val p = java.nio.file.Files.createTempDirectory("graft-shist").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shist-ck").toString
    Profile.writeHistState(seed.toDF("v"), "v", 0.0, 100.0, 10, p)

    val fn = graft.streaming.ProfileStream.histAppendBatch(p)
    val mem = MemoryStream[Tuple1[Double]]
    def runOnce(): Unit = {
      val q = graft.streaming.EventStream.incrementalWriter(
        mem.toDF().toDF("v"), ckpt)(fn).start()
      try q.awaitTermination() finally q.stop()
    }
    mem.addData(arrivals.slice(0, 20): _*); runOnce()
    mem.addData(arrivals.slice(20, 40): _*); runOnce() // restart boundary
    mem.addData(arrivals.slice(40, 60): _*); runOnce()

    val pRef = java.nio.file.Files.createTempDirectory("graft-shist-ref").toString
    Profile.writeHistState(all.toDF("v"), "v", 0.0, 100.0, 10, pRef)
    def snap(q: String) = Profile.readHistState(spark, q).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(snap(p) === snap(pRef),
      "streamed histogram diverges from the one-shot")
    // committed replay out-of-band: no double-counted bins
    fn(arrivals.slice(0, 20).toDF("v"), 0L)
    assert(snap(p) === snap(pRef), "replay of a committed batch must be a no-op")
  }

  test("partial profile append (started without committed) retries safely, never double-counts") {
    // the manifest-versioned state absorbs publish atomically, so a
    // stale started marker retries instead of refusing (the r14
    // StateStore upgrade — pre-manifest this test asserted the loud
    // refusal), and the commit tag closes the committed-but-unmarked
    // zombie window
    val cols = Seq("id", "cat", "v")
    val p = java.nio.file.Files.createTempDirectory("graft-sprof-part").toString
    Profile.writeProfileState(rows(0 until 10).toDF("id", "cat", "v"), cols, p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/_stream_batches"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=3.started"), false).close()
    def nId(): Long = Profile.readProfileState(spark, p)
      .filter(col("column") === "id").select("n_rows").first().getLong(0)
    // crashed-before-commit attempt: the retry applies exactly once
    ProfileStream.profileAppendBatch(p, cols)(
      rows(50 until 60).toDF("id", "cat", "v"), 3L)
    assert(nId() === 20L, "the retried batch must apply exactly once")
    ProfileStream.profileAppendBatch(p, cols)(
      rows(50 until 60).toDF("id", "cat", "v"), 3L)
    assert(nId() === 20L, "replay after the retry double-counted")
    // zombie that committed (tag landed) but died before its marker:
    // the retry must detect the commit and no-op
    fs.create(new org.apache.hadoop.fs.Path(
      s"$p/_stream_batches/batch_id=4.started"), false).close()
    Profile.appendProfileState(rows(60 until 70).toDF("id", "cat", "v"),
      cols, p, streamTag = Some("stream-batch-4"))
    assert(nId() === 30L)
    ProfileStream.profileAppendBatch(p, cols)(
      rows(60 until 70).toDF("id", "cat", "v"), 4L)
    assert(nId() === 30L,
      "retry after a committed-but-unmarked attempt double-counted")
    // other batch ids are unaffected
    ProfileStream.profileAppendBatch(p, cols)(
      rows(70 until 80).toDF("id", "cat", "v"), 5L)
    assert(nId() === 40L)
  }
}
