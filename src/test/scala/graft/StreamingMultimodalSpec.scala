package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.EventStream

case class Ev(ts: Timestamp, event_type: String, value: Double)

/** Structured Streaming semantics (windowed aggs, watermark lateness,
  * streaming dedup) and multimodal decode/frame plumbing. */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming hourly window agg matches batch on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.hourlyTypeStatsStreaming(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(ts("2025-05-01 10:05:00"), "click", 1.0),
        Ev(ts("2025-05-01 10:45:00"), "click", 2.0),
        Ev(ts("2025-05-01 10:30:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 window
      mem.addData(Ev(ts("2025-05-01 12:00:00"), "late", 0.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .filter(col("hour_start") === ts("2025-05-01 10:00:00"))
        .orderBy("event_type").collect()
      assert(rows.map(r => (r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue)).toSeq ===
        Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))

      val batch = EventStream.hourlyTypeStats(
        Seq(Ev(ts("2025-05-01 10:05:00"), "click", 1.0),
          Ev(ts("2025-05-01 10:45:00"), "click", 2.0),
          Ev(ts("2025-05-01 10:30:00"), "view", 5.0)).toDF())
        .filter(col("hour_start") === ts("2025-05-01 10:00:00"))
        .orderBy("event_type").collect()
      assert(batch.map(r => (r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue)).toSeq ===
        rows.map(r => (r.getString(1), r.getLong(2), r.getDecimal(3).doubleValue)).toSeq)
    } finally q.stop()
  }

  test("incrementalWriter: checkpoint restart is exactly-once, replays are idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Merge
    val sink = java.nio.file.Files.createTempDirectory("graft-fbsink").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fbckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (batchId, rows)

    def mergeInto(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val b = batch.select(col("_1").as("k"), col("_2").as("v"))
      seen += ((batchId, b.count()))
      val existing =
        if (new java.io.File(sink).exists) spark.read.parquet(sink)
        else b.limit(0)
      // Merge.upsert is the same idempotent keyed merge the batch path
      // uses — an at-least-once redelivery re-merges to the same state
      Merge.upsert(existing, b, Seq("k"), Seq("v"))
        .localCheckpoint().coalesce(1).write.mode("overwrite").parquet(sink)
    }

    val mem = MemoryStream[(Long, Long)]
    def runOnce(): Unit = {
      val q = EventStream.incrementalWriter(mem.toDF(), ckpt)(mergeInto).start()
      try q.awaitTermination() finally q.stop()
    }

    mem.addData((1L, 10L), (2L, 20L))
    runOnce()
    // restart the SAME checkpoint with new data: only the new rows flow
    mem.addData((2L, 21L), (3L, 30L))
    runOnce()
    val afterTwo = spark.read.parquet(sink)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterTwo === Map(1L -> 10L, 2L -> 21L, 3L -> 30L))
    val rowsPerRun = seen.map(_._2)
    assert(rowsPerRun.sum === 4, s"rows delivered across runs: $seen — " +
      "a restart must resume from the recorded offset, not reprocess")
    // replay with nothing new: no data batch, sink unchanged
    val before = afterTwo
    runOnce()
    val after = spark.read.parquet(sink)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before)
  }

  test("stream-stream interval join matches the batch twin, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    // clicks join purchases of the same user within the prior 30 min
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStream.intervalJoin(
      clicks.toDF().toDF("user_id", "cts"), "cts",
      buys.toDF().toDF("user_id", "bts", "amount"), "bts",
      keys = Seq("user_id"), window = "30 minutes",
      lateness = Some("10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      val clickData = Seq(
        (1L, ts("2025-05-01 10:00:00")),
        (1L, ts("2025-05-01 11:00:00")),
        (2L, ts("2025-05-01 10:10:00")))
      val buyData = Seq(
        (1L, ts("2025-05-01 09:45:00"), 5.0),  // within 30m of 10:00 click
        (1L, ts("2025-05-01 10:50:00"), 7.0),  // within 30m of 11:00 click
        (2L, ts("2025-05-01 09:00:00"), 9.0))  // 70m before — outside
      clicks.addData(clickData: _*)
      buys.addData(buyData: _*)
      q.processAllAvailable()
      // push watermarks past every join window so results emit
      clicks.addData((99L, ts("2025-05-01 13:00:00")))
      buys.addData((99L, ts("2025-05-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("ssjoin")
        .filter(col("user_id") < 99)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getDouble(3))).toSet
      // identical code path on static frames
      val batch = EventStream.intervalJoin(
          clickData.toDF("user_id", "cts"), "cts",
          buyData.toDF("user_id", "bts", "amount"), "bts",
          keys = Seq("user_id"), window = "30 minutes")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getDouble(3))).toSet
      assert(got === batch)
      assert(got.size === 2 && !got.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("watermark drops events later than the lateness bound") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.hourlyTypeStatsStreaming(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts("2025-05-01 10:05:00"), "a", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2025-05-01 13:00:00"), "b", 1.0)) // watermark -> 12:50
      q.processAllAvailable()
      mem.addData(Ev(ts("2025-05-01 10:07:00"), "a", 100.0)) // too late: dropped
      mem.addData(Ev(ts("2025-05-01 15:00:00"), "c", 1.0))
      q.processAllAvailable()
      val a = spark.table("late_test")
        .filter(col("event_type") === "a").collect()
      assert(a.length === 1)
      assert(a(0).getLong(2) === 1L)  // the late row did not count
    } finally q.stop()
  }

  test("dedupStream: duplicate ids within the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("id", "ts")
    val q = EventStream.dedupStream(df, "1 hour", "id")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2025-05-01 10:00:00")), (1L, ts("2025-05-01 10:05:00")),
        (2L, ts("2025-05-01 10:06:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_test").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  private def mediaDf = Seq(
    (1L, "image", "hello world payload".getBytes("UTF-8")),
    (2L, "video", ("x" * 100).getBytes("UTF-8")),
    (3L, "audio", null.asInstanceOf[Array[Byte]])
  ).toDF("asset_id", "kind", "payload")

  test("multimodal: declarative decode == mapPartitions codec decode") {
    val a = Multimodal.withDecodedMeta(mediaDf)
      .select("asset_id", "meta.*").orderBy("asset_id").collect()
    val b = Multimodal.decodePartitions(mediaDf)
      .select("asset_id", "meta.*").orderBy("asset_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // null payload -> null meta
    val nullMeta = Multimodal.withDecodedMeta(mediaDf)
      .filter(col("asset_id") === 3L).select("meta").first()
    assert(nullMeta.isNullAt(0))
  }

  test("multimodal: frame sampling respects n_frames and step") {
    val decoded = Multimodal.withDecodedMeta(mediaDf)
    val frames = Multimodal.sampleFrames(decoded, step = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // asset 1: 19 bytes -> n_frames = 19%24+1 = 20 -> idx 0,4,8,12,16
    assert(frames.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(0, 4, 8, 12, 16))
    // asset 2: 100 bytes -> n_frames = 100%24+1 = 5 -> idx 0,4
    assert(frames.filter(_._1 == 2L).map(_._2).sorted.toSeq === Seq(0, 4))
    // null payload: no frames
    assert(!frames.exists(_._1 == 3L))
  }

  test("multimodal: real imageio codec — PNG round trip, digest determinism, corrupt degrade") {
    import spark.implicits._
    // encode real PNGs with known facts, decode through the DataFrame op
    val spec = Seq((1L, 20, 10, 0xFF8040), (2L, 3, 3, 0x000000))
      .toDF("asset_id", "w", "h", "rgb")
    val decoded = Multimodal.decodeImages(
        Multimodal.encodePng(spec, "w", "h", "rgb")
          .select(col("asset_id"), col("payload")))
      .select("asset_id", "decoded.*").orderBy("asset_id").collect()
    val r1 = decoded(0)
    assert((r1.getInt(1), r1.getInt(2)) === (20, 10))
    assert((r1.getLong(3), r1.getLong(4), r1.getLong(5)) ===
      (200L * 0xFF, 200L * 0x80, 200L * 0x40))
    // digest: deterministic across independent decodes of the same bytes
    val d1 = Multimodal.ImageCodec.decode(
      Multimodal.ImageCodec.encodePng(20, 10, 0xFF8040)).get
    assert(d1.pixelDigest === r1.getLong(6))
    // …and sensitive to one pixel changing
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.ImageCodec.encodePng(20, 10, 0xFF8040)))
    img.setRGB(5, 5, 0xFF8041)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.ImageCodec.decode(bos.toByteArray).get.pixelDigest
      !== d1.pixelDigest)
    // corrupt and null payloads degrade to null facts, not exceptions
    val junk = Seq((9L, "definitely not a png")).toDF("asset_id", "txt")
      .select(col("asset_id"), col("txt").cast("binary").as("payload"))
      .unionByName(Seq(10L).toDF("asset_id")
        .select(col("asset_id"), lit(null).cast("binary").as("payload")))
    val bad = Multimodal.decodeImages(junk).select("decoded").collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("multimodal: real pixel resize — clamp algebra, constant fills, no-upscale identity") {
    import Multimodal.ImageCodec
    // 40x20 clamped to maxDim 24: scale 0.6 -> 24x12; constant fill survives
    val big = ImageCodec.encodePng(40, 20, 0x102030)
    val small = ImageCodec.decode(ImageCodec.resize(big, 24).get).get
    assert((small.width, small.height) === (24, 12))
    assert((small.sumR, small.sumG, small.sumB) ===
      (24L * 12 * 0x10, 24L * 12 * 0x20, 24L * 12 * 0x30))
    // within maxDim: the ORIGINAL bytes come back untouched
    val ok = ImageCodec.encodePng(10, 24, 0xABCDEF)
    assert(ImageCodec.resize(ok, 24).get eq ok)
    // extreme aspect clamps to >= 1 px
    val sliver = ImageCodec.decode(
      ImageCodec.resize(ImageCodec.encodePng(100, 2, 0xFFFFFF), 24).get).get
    assert(sliver.width === 24 && sliver.height >= 1)
    // corrupt and null degrade to None
    assert(ImageCodec.resize("junk".getBytes, 24).isEmpty)
    assert(ImageCodec.resize(null, 24).isEmpty)
    // the DataFrame boundary replaces payloads in place
    import spark.implicits._
    val spec = Seq((1L, 40, 20, 0x102030), (2L, 8, 8, 0x010203))
      .toDF("asset_id", "w", "h", "rgb")
    val out = Multimodal.decodeImages(Multimodal.resizeImages(
        Multimodal.encodePng(spec, "w", "h", "rgb")
          .select(col("asset_id"), col("payload")), 24))
      .select("asset_id", "decoded.width", "decoded.height")
      .orderBy("asset_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList ===
      List((1L, 24, 12), (2L, 8, 8)))
  }

  test("multimodal: real WAV codec — PCM16 round trip, format parse, corrupt degrade") {
    import Multimodal.AudioCodec
    val samples = Array.tabulate[Short](50)(i => (if (i % 2 == 0) 1000 else -1000).toShort)
    val wav = AudioCodec.encodeWavPcm16(samples, 16000)
    // RIFF/WAVE container magic
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val d = AudioCodec.decode(wav).get
    assert(d.sampleRate === 16000 && d.channels === 1)
    assert(d.nSamples === 50L && d.sumAbs === 50L * 1000 && d.maxAbs === 1000)
    // interop: the direct RIFF writer's output parses identically
    // through javax.sound (the format is the contract, not the SPI)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val jf = ais.getFormat
    assert(jf.getSampleRate.toInt === 16000 && jf.getChannels === 1 &&
      jf.getSampleSizeInBits === 16 && !jf.isBigEndian)
    assert(ais.readAllBytes().length === 100, "payload length via javax parse")
    // ...and a javax-written container parses through the direct reader
    val raw = new Array[Byte](20)
    samples.take(10).zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val jbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw),
        new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false), 10L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, jbos)
    val jd = AudioCodec.decode(jbos.toByteArray).get
    assert(jd.sampleRate === 8000 && jd.nSamples === 10L && jd.maxAbs === 1000)
    // silence and zero-amp edges
    val silent = AudioCodec.decode(
      AudioCodec.encodeWavPcm16(new Array[Short](10), 8000)).get
    assert(silent.sumAbs === 0L && silent.maxAbs === 0)
    // corrupt/null degrade to None, never throw
    assert(AudioCodec.decode("junk".getBytes).isEmpty)
    assert(AudioCodec.decode(null).isEmpty)
    // DataFrame boundary: encode + decode through the ops
    import spark.implicits._
    val spec = Seq((1L, 40, 8000, 500), (2L, 10, 48000, 0))
      .toDF("asset_id", "n", "rate", "amp")
    val out = Multimodal.decodeAudio(
        Multimodal.encodeWav(spec, "n", "rate", "amp")
          .select(col("asset_id"), col("payload")))
      .select("asset_id", "decoded.*").orderBy("asset_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
      .toList === List((1L, 8000, 40L, 20000L), (2L, 48000, 10L, 0L)))
  }

  test("multimodal: windowed audio frames — energy per window, partial tail, corrupt skip") {
    import spark.implicits._
    // 10 samples of ±500 in windows of 4 -> frames (4,4,2)
    val spec = Seq((1L, 10, 8000, 500)).toDF("asset_id", "n", "rate", "amp")
    val enc = Multimodal.encodeWav(spec, "n", "rate", "amp")
      .select(col("asset_id"), col("payload"))
    val corrupt = Seq((9L, "nope")).toDF("asset_id", "txt")
      .select(col("asset_id"), col("txt").cast("binary").as("payload"))
    val got = Multimodal.audioFrames(enc.unionByName(corrupt), frameSamples = 4)
      .select("asset_id", "frame.*").orderBy("frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(got.toList === List(
      (1L, 0, 4, 4L * 500 * 500, 500),
      (1L, 1, 4, 4L * 500 * 500, 500),
      (1L, 2, 2, 2L * 500 * 500, 500)),
      "corrupt payloads must contribute zero frames; tail keeps true count")
  }

  test("multimodal: real animated-GIF video codec — frame round trip, sampling, corrupt skip") {
    import Multimodal.VideoCodec
    // 4 frames of 20x10 gray fills at 40 + 15·f: container parse + exact pixels
    val gif = VideoCodec.encodeGif(20, 10, 4, base = 40, grayStep = 15)
    // GIF89a container magic
    assert(new String(gif.take(6), "US-ASCII") === "GIF89a")
    val dv = VideoCodec.decode(gif).get
    assert((dv.width, dv.height, dv.nFrames) === (20, 10, 4))
    // every 2nd frame decodes to exact luma facts (luma of (g,g,g) == g)
    val (n, frames) = VideoCodec.sampleFrames(gif, step = 2).get
    assert(n === 4)
    assert(frames.map(f => (f.frameIdx, f.width, f.height, f.sumLuma, f.maxLuma))
      === Seq((0, 20, 10, 200L * 40, 40), (2, 20, 10, 200L * 70, 70)))
    // step 1 hits every frame
    assert(VideoCodec.sampleFrames(gif, step = 1).get._2.map(_.frameIdx) ===
      Seq(0, 1, 2, 3))
    // corrupt/null degrade to None, never throw
    assert(VideoCodec.decode("junk junk junk".getBytes).isEmpty)
    assert(VideoCodec.decode(null).isEmpty)
    assert(VideoCodec.sampleFrames("GIF89a-but-truncated".getBytes, 1).isEmpty)
    // DataFrame boundary: encode + real frame sampling through the ops;
    // corrupt payloads contribute zero rows
    import spark.implicits._
    val spec = Seq((1L, 20, 10, 4, 40, 15), (2L, 9, 8, 1, 200, 0))
      .toDF("asset_id", "w", "h", "nf", "base", "gstep")
    val enc = Multimodal.encodeGif(spec, "w", "h", "nf", "base", "gstep")
      .select(col("asset_id"), col("payload"))
    val corrupt = Seq((9L, "nope")).toDF("asset_id", "txt")
      .select(col("asset_id"), col("txt").cast("binary").as("payload"))
    val got = Multimodal.videoFrames(enc.unionByName(corrupt), step = 2)
      .select(col("asset_id"), col("n_frames"), col("frame.frame_idx"),
        col("frame.sum_luma"))
      .orderBy("asset_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.toList === List(
      (1L, 4, 0, 200L * 40), (1L, 4, 2, 200L * 70),
      (2L, 1, 0, 72L * 200)),
      "corrupt payloads must contribute zero frame rows")
  }

  test("streaming curation equals batch curation on the same documents") {
    implicit val sqlCtx = spark.sqlContext
    val docsData = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps on running today"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "x"),
      (4L, "a reasonable english sentence with enough variety to pass the filters"))
    val mem = MemoryStream[(Long, String)]
    val q = streaming.CurationStream
      .curate(mem.toDF().toDF("doc_id", "text"), col("text"))
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      mem.addData(docsData: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated")
        .select("doc_id", "quality", "dup5_ratio", "split")
        .orderBy("doc_id").collect().map(_.toSeq)
      val batch = streaming.CurationStream
        .curate(docsData.toDF("doc_id", "text"), col("text"))
        .select("doc_id", "quality", "dup5_ratio", "split")
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq)
      // the repetitive doc is filtered by dup ratio in both modes
      assert(!streamed.exists(_.head == 2L))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful content dedup stream equals batch exactByHash on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    // two distinct texts, each duplicated (different doc ids), plus a
    // unique doc; arrival order == doc_id order so the batch tiebreak
    // (min doc_id) and the stream's keep-first-arrival rule coincide
    val docsData = Seq(
      (1L, "the quick brown fox", ts("2025-05-01 10:00:00")),
      (2L, "an entirely different document", ts("2025-05-01 10:01:00")),
      (3L, "the quick brown fox", ts("2025-05-01 10:02:00")),
      (4L, "an entirely different document", ts("2025-05-01 10:03:00")),
      (5L, "a third unique text", ts("2025-05-01 10:04:00")))
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = streaming.CurationStream
      .dedupByContent(mem.toDF().toDF("doc_id", "text", "ts"),
        col("text"), "ts", "1 hour")
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      mem.addData(docsData.take(2): _*)
      q.processAllAvailable()
      mem.addData(docsData.drop(2): _*)   // dups arrive in a LATER micro-batch
      q.processAllAvailable()
      val streamed = spark.table("content_dedup")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val batch = graft.ops.Dedup.exactByHash(
          docsData.toDF("doc_id", "text", "ts"), "text", col("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(streamed === batch)
      assert(streamed === Seq(1L, 2L, 5L))
    } finally q.stop()
  }

  test("streaming incremental refresh maintains its own index; replays are idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val D = "dog cat fish bird lion tiger bear wolf fox deer"
    val E = "one lone unique document with entirely fresh wording here"
    val corpusPath = java.nio.file.Files.createTempDirectory("graft-sc-c").toString
    val indexPath = java.nio.file.Files.createTempDirectory("graft-sc-i").toString
    val dispPath = java.nio.file.Files.createTempDirectory("graft-sc-d").toString
    graft.streaming.CurationStream.seedRefresh(
      Seq((100L, A), (102L, "a totally separate seeded corpus document body"))
        .toDF("doc_id", "text"),
      "doc_id", "text", corpusPath, indexPath)

    val fn = graft.streaming.CurationStream.refreshBatch(
      corpusPath, indexPath, dispPath, "doc_id", "text",
      lq = length(col("text")) < 20)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append").foreachBatch(fn).start()
    try {
      mem.addData((1L, A), (2L, D))            // micro-batch 0
      q.processAllAvailable()
      mem.addData((3L, D), (4L, E), (5L, "tiny")) // micro-batch 1
      q.processAllAvailable()
    } finally q.stop()

    def dispositions = spark.read.parquet(dispPath)
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 3 is dup_corpus, NOT dup_batch: D was accepted in micro-batch
    // 0 and its bands were appended to the index the stream probes —
    // the stream maintains the index it reads
    val expected = Map(1L -> "dup_corpus", 2L -> "accepted",
      3L -> "dup_corpus", 4L -> "accepted", 5L -> "low_quality")
    assert(dispositions === expected)
    // curated corpus = seed + the accepted docs
    assert(spark.read.parquet(corpusPath).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L, 100L, 102L))

    // at-least-once replay of micro-batch 1: dynamic partition
    // overwrite rewrites its partitions — nothing duplicates
    fn(Seq((3L, D), (4L, E), (5L, "tiny")).toDF("doc_id", "text"), 1L)
    assert(dispositions === expected)
    assert(spark.read.parquet(dispPath).count() === 5)
    assert(spark.read.parquet(corpusPath).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L, 100L, 102L))
    assert(spark.read.parquet(indexPath).select("id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L, 100L, 102L))
  }

  test("multimodal: dHash brightness-invariant, pattern-sensitive, degrades safely") {
    import graft.multimodal.Multimodal.ImageCodec
    val a = ImageCodec.dHash(ImageCodec.encodePatternPng(24, 16, seed = 5, base = 10))
    val b = ImageCodec.dHash(ImageCodec.encodePatternPng(24, 16, seed = 5, base = 80))
    val c = ImageCodec.dHash(ImageCodec.encodePatternPng(24, 16, seed = 6, base = 10))
    assert(a.isDefined && c.isDefined)
    assert(a === b, "a pure brightness shift must not change the fingerprint")
    assert(a !== c, "a different gradient pattern must change the fingerprint")
    // all 25 fixture seeds stay pairwise distinct (the q_media_phash contract)
    val hashes = (0 until 25).map(s =>
      ImageCodec.dHash(ImageCodec.encodePatternPng(24, 16, s, base = 0)))
    assert(hashes.forall(_.isDefined) && hashes.distinct.size === 25)
    // degrade, never throw: corrupt bytes, null, sub-grid images
    assert(ImageCodec.dHash("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.dHash(null).isEmpty)
    assert(ImageCodec.dHash(ImageCodec.encodePng(4, 4, 0xffffff)).isEmpty)
  }

  test("multimodal: resize clamps the long side, preserves aspect floor") {
    val df = Seq((1L, 640, 480), (2L, 100, 50)).toDF("id", "w", "h")
      .select(col("id"), struct(col("w").as("width"), col("h").as("height"),
        lit(1).as("n_frames"), lit(8000).as("sample_rate")).as("meta"))
    val out = df.select(col("id"),
        Multimodal.resizeMeta(col("meta"), 320).as("m"))
      .select(col("id"), col("m.width"), col("m.height"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) === 320 && out(0).getInt(2) === 240)
    assert(out(1).getInt(1) === 100 && out(1).getInt(2) === 50)  // no upscale
  }
}
