package graft

import java.sql.{DriverManager, Timestamp}
import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.ops.{Incremental, Scale}
import graft.pipeline.{Tasks, Warehouse}

/** End-to-end composition: watermark-driven incremental batches (T1–T5)
  * driving a pipeline task, with the warehouse persisted through the
  * date-partitioned layout between batches — the full reference
  * lifecycle (SURVEY §3.1/§3.2) in one test. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("two hourly incremental batches: watermark advances, merges idempotent, layout prunes") {
    val ctlDir = Files.createTempDirectory("graft-int-ctl").toString
    val whDir = Files.createTempDirectory("graft-int-wh").toString
    val ctl = new Incremental.ControlTable(ctlDir)

    // source spans two hours; batch 1 covers hour 1, batch 2 hour 2
    val source = Seq(
      ("vDOT", 10.0, 1000.0, ts("2025-05-01 00:30:00")),
      ("vKSM", 20.0, 500.0, ts("2025-05-01 00:45:00")),
      ("vDOT", 11.0, 1100.0, ts("2025-05-01 01:30:00"))
    ).map { case (a, apy, tvl, t) =>
      (1L, a, 0.0, tvl, 0.0, 0L, apy, 0.0, 0.0, 0L, t)
    }.toDF("batch_id", "Asset", "Value", "tvl", "tvm", "holders", "apy",
      "apyBase", "apyReward", "totalIssuance", "created_at")

    var wh = Warehouse.withChains(spark, Seq((4, "Bifrost")))

    def runBatch(end: Timestamp): Unit =
      Incremental.run(ctl, "site", source, col("created_at"), end) { slice =>
        if (slice.isEmpty) None
        else {
          wh = Tasks.bifrostSite(slice, wh)
          // persist facts date-partitioned and reload (storage round-trip)
          Scale.writeDatePartitioned(
            wh.factYieldStats.withColumn("date", col("date")),
            s"$whDir/yield", "date")
          wh = wh.copy(factYieldStats =
            spark.read.parquet(s"$whDir/yield")
              .select(wh.factYieldStats.columns.map(col): _*))
          Some(slice.agg(max(col("created_at"))).first().getTimestamp(0))
        }
      }

    runBatch(ts("2025-05-01 01:00:00"))
    assert(ctl.lastRun("site").get === ts("2025-05-01 00:45:00"))
    val afterB1 = wh.factYieldStats.orderBy("token_id").collect()
    assert(afterB1.length === 2)
    assert(afterB1.map(_.getDecimal(4).doubleValue).toSeq === Seq(10.0, 20.0))

    runBatch(ts("2025-05-01 02:00:00"))
    assert(ctl.lastRun("site").get === ts("2025-05-01 01:30:00"))
    val afterB2 = wh.factYieldStats.orderBy("token_id", "date").collect()
    // vDOT got a second date row (01:30 is the same date -> update, not insert)
    assert(afterB2.length === 2)
    val vdot = afterB2.filter(_.getLong(0) === 1L)
    assert(vdot.map(_.getDecimal(4).doubleValue).toSeq === Seq(11.0)) // updated apy

    // replaying batch 2's window is a no-op (idempotent merge + forward-only watermark)
    runBatch(ts("2025-05-01 02:00:00"))
    assert(wh.factYieldStats.count() === 2)
    assert(ctl.lastRun("site").get === ts("2025-05-01 01:30:00"))
  }

  test("MergeSink seam: the same daily cycle lands identically through parquet and JDBC sinks") {
    import graft.sources.JdbcSource
    val keys = Seq("dt", "token_id")
    val upd = Seq("v")
    def df(rows: (String, Long, Double)*) = rows.toDF("dt", "token_id", "v")
    val b1 = df(("2025-05-01", 1L, 10.0), ("2025-05-01", 2L, 20.0),
      ("2025-05-02", 1L, 11.0))
    val b2 = df(("2025-05-02", 1L, 99.0), ("2025-05-02", 7L, 70.0))
    val want = Set(("2025-05-01", 1L, 10.0), ("2025-05-01", 2L, 20.0),
      ("2025-05-02", 1L, 99.0), ("2025-05-02", 7L, 70.0))

    // parquet sink: batch 1 creates the layout; batch 2 touches ONLY its
    // date partition; replaying batch 2 is a no-op
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    val sinkP = new ops.ParquetMergeSink(spark, dir, "dt", keyCol = Some("token_id"))
    sinkP.merge(b1, keys, upd)
    def fp(date: String): Map[String, (Long, String)] = {
      val d = new java.io.File(s"$dir/dt=$date")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
          .digest(Files.readAllBytes(f.toPath))
        f.getName -> (f.lastModified() -> md.map("%02x".format(_)).mkString)
      }.toMap
    }
    val untouchedBefore = fp("2025-05-01")
    assert(untouchedBefore.nonEmpty)
    sinkP.merge(b2, keys, upd)
    assert(fp("2025-05-01") === untouchedBefore,
      "untouched date partition was rewritten")
    def stateP = sinkP.read()
      .select($"dt".cast("string"), $"token_id", $"v")
      .as[(String, Long, Double)].collect().toSet
    assert(stateP === want)
    sinkP.merge(b2, keys, upd)   // idempotent replay
    assert(stateP === want)

    // JDBC sink through embedded Derby's MERGE dialect: same batches,
    // same final state — no read-modify-write, the DB key does the match
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby-sink").toString)
    val jurl = "jdbc:derby:memory:graftsink;create=true"
    val conn = DriverManager.getConnection(jurl)
    try {
      conn.createStatement().execute(
        "CREATE TABLE daily (dt VARCHAR(10), token_id BIGINT, v DOUBLE, " +
          "PRIMARY KEY (dt, token_id))")
    } finally conn.close()
    val sinkJ = new ops.JdbcMergeSink(spark, jurl, "daily", new Properties(),
      dialect = JdbcSource.DerbyMergeDialect)
    sinkJ.merge(b1, keys, upd)
    sinkJ.merge(b2, keys, upd)
    sinkJ.merge(b2, keys, upd)   // idempotent replay
    val stateJ = sinkJ.read()
      .select($"DT", $"TOKEN_ID", $"V")
      .as[(String, Long, Double)].collect().toSet
    assert(stateJ === want)
  }

  test("overwriteTouchedDates: single-date incremental merge leaves other date dirs byte-identical") {
    val dir = Files.createTempDirectory("graft-dyn-ow").toString
    val full = Seq(
      ("2025-05-01", 1L, 10.0), ("2025-05-01", 2L, 20.0),
      ("2025-05-02", 1L, 11.0), ("2025-05-03", 1L, 12.0)
    ).toDF("date", "token_id", "v")
    Scale.writeDatePartitioned(full, dir, "date", keyCol = Some("token_id"))

    // fingerprint every file under the dirs that must NOT be rewritten
    def fingerprints(date: String): Map[String, (Long, String)] = {
      val d = new java.io.File(s"$dir/date=$date")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = Files.readAllBytes(f.toPath)
        val md = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
        f.getName -> (f.lastModified() -> md.map("%02x".format(_)).mkString)
      }.toMap
    }
    val before01 = fingerprints("2025-05-01")
    val before03 = fingerprints("2025-05-03")
    assert(before01.nonEmpty && before03.nonEmpty)

    // daily cycle for 2025-05-02 only: prune-read the touched date,
    // merge the new slice in, write back just that partition
    val touched = spark.read.parquet(dir).filter($"date" === "2025-05-02")
      .select("date", "token_id", "v")
    val slice = Seq(("2025-05-02", 1L, 99.0), ("2025-05-02", 7L, 70.0))
      .toDF("date", "token_id", "v")
    val merged = ops.Merge.upsert(touched, slice,
      keys = Seq("date", "token_id"), updateCols = Seq("v"))
    Scale.overwriteTouchedDates(merged, dir, "date", keyCol = Some("token_id"))

    // untouched date dirs: same files, same bytes, same mtimes
    assert(fingerprints("2025-05-01") === before01)
    assert(fingerprints("2025-05-03") === before03)
    // touched date carries the merged content; table-wide read agrees
    val after = spark.read.parquet(dir)
      .select($"date".cast("string"), $"token_id", $"v")
      .as[(String, Long, Double)].collect().toSet
    assert(after === Set(
      ("2025-05-01", 1L, 10.0), ("2025-05-01", 2L, 20.0),
      ("2025-05-02", 1L, 99.0), ("2025-05-02", 7L, 70.0),
      ("2025-05-03", 1L, 12.0)))
    // the scoped dynamic mode did not leak into the session
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
      .equalsIgnoreCase("static"))
  }
}
