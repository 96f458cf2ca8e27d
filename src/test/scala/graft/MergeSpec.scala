package graft

import org.apache.spark.sql.functions._

import graft.ops.Merge

/** Upsert/merge semantics (SURVEY §2.6) — the reference's signature
  * operator. Idempotence is the core invariant: every reference write
  * is `INSERT … ON DUPLICATE KEY UPDATE`, so replaying a batch must be
  * a no-op (§2.10 T5). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def existing = Seq(
    (1L, "a", 10.0, 100L),
    (2L, "b", 20.0, 200L),
    (3L, "c", 30.0, 300L)).toDF("id", "sym", "price", "vol")

  private def incoming = Seq(
    (2L, "B2", 21.0, 999L),   // matched: only update-cols change
    (4L, "d", 40.0, 400L))    // new: whole row inserts
    .toDF("id", "sym", "price", "vol")

  test("partial-column upsert: matched row updates only updateCols") {
    val out = Merge.upsert(existing, incoming, Seq("id"), Seq("price"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val r2 = out(1)
    assert(r2.getString(1) === "b")     // non-update col keeps existing
    assert(r2.getDouble(2) === 21.0)    // update col takes incoming
    assert(r2.getLong(3) === 200L)      // non-update col keeps existing
    val r4 = out(3)
    assert(r4.getString(1) === "d" && r4.getDouble(2) === 40.0 && r4.getLong(3) === 400L)
  }

  test("upsert: a matched row's NULL non-update column stays NULL (no incoming leak)") {
    // ON DUPLICATE KEY UPDATE touches only the named columns — an
    // existing null must not be backfilled from the incoming row
    val ex = Seq((1L, Option.empty[String], 10.0, Option.empty[java.lang.Long]))
      .toDF("id", "sym", "price", "vol")
    val in = Seq((1L, Option("X"), 21.0, Option(java.lang.Long.valueOf(999L))))
      .toDF("id", "sym", "price", "vol")
    val r = Merge.upsert(ex, in, Seq("id"), Seq("price")).collect()(0)
    assert(r.isNullAt(1), "non-update col sym must keep its existing NULL")
    assert(r.getDouble(2) === 21.0)
    assert(r.isNullAt(3), "non-update col vol must keep its existing NULL")
  }

  test("upsert keeps existing-only rows unchanged") {
    val out = Merge.upsert(existing, incoming, Seq("id"), Seq("price"))
    val r1 = out.filter($"id" === 1L).collect()(0)
    assert(r1.getString(1) === "a" && r1.getDouble(2) === 10.0 && r1.getLong(3) === 100L)
  }

  test("upsert is idempotent: applying the same batch twice == once") {
    val once = Merge.upsert(existing, incoming, Seq("id"), Seq("price", "vol"))
    val twice = Merge.upsert(once, incoming, Seq("id"), Seq("price", "vol"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("replace overwrites the whole row on key match") {
    val out = Merge.replace(existing, incoming, Seq("id"))
    val r2 = out.filter($"id" === 2L).collect()(0)
    assert(r2.getString(1) === "B2" && r2.getDouble(2) === 21.0 && r2.getLong(3) === 999L)
  }

  test("lastWriterWins keeps the greatest-order row per key") {
    val df = Seq(
      (1L, "old", 1), (1L, "new", 2),
      (2L, "only", 1)).toDF("id", "v", "batch")
    val out = Merge.lastWriterWins(df, Seq("id"), Seq(col("batch")))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "new"), (2L, "only")))
  }

  test("upsert on compound key") {
    val ex = Seq((1L, "2024-01-01", 5.0), (1L, "2024-01-02", 6.0))
      .toDF("token", "date", "apy")
    val in = Seq((1L, "2024-01-02", 9.0), (2L, "2024-01-01", 1.0))
      .toDF("token", "date", "apy")
    val out = Merge.upsert(ex, in, Seq("token", "date"), Seq("apy"))
      .orderBy("token", "date").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "2024-01-01", 5.0), (1L, "2024-01-02", 9.0), (2L, "2024-01-01", 1.0)))
  }

  test("upsertEvolving: incoming gains a column — merge evolves instead of failing") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val incoming = Seq((2L, "B", 9.5), (3L, "c", 1.0)).toDF("id", "name", "score")
    // the strict merge refuses the widened schema…
    intercept[IllegalArgumentException] {
      graft.ops.Merge.upsert(existing, incoming, Seq("id"), Seq("name"))
    }
    // …the evolving merge aligns to the union schema
    val out = graft.ops.Merge.upsertEvolving(existing, incoming,
        Seq("id"), Seq("name"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSeq ===
      Seq((1L, "a", null), (2L, "B", 9.5), (3L, "c", 1.0)))
    // existing-side-only column survives a narrow replay too
    val replay = Seq((4L, "d")).toDF("id", "name")
    val out2 = graft.ops.Merge.upsertEvolving(
        graft.ops.Merge.upsertEvolving(existing, incoming, Seq("id"), Seq("name")),
        replay, Seq("id"), Seq("name"))
      .orderBy("id").collect()
    assert(out2.length === 4 && out2.last.isNullAt(2))
    // a genuine type change still fails loudly
    val clash = Seq((1L, 42)).toDF("id", "name")
    intercept[IllegalArgumentException] {
      graft.ops.Merge.upsertEvolving(existing, clash, Seq("id"), Seq("name"))
    }
  }

  test("upsertEvolving idempotence property on random widened batches") {
    // the replay-safety contract of the strict upsert must survive
    // schema evolution: applying the same widened batch twice == once
    val rnd = new scala.util.Random(31)
    (1 to 5).foreach { trial =>
      val existing = (1 to 50).map(i =>
        ((rnd.nextInt(30) + 1).toLong, s"v$i")).distinctBy(_._1)
        .toDF("id", "name")
      val incoming = (1 to 30).map(i =>
        ((rnd.nextInt(40) + 1).toLong, s"w$i", rnd.nextDouble()))
        .distinctBy(_._1).toDF("id", "name", "score")
      val once = graft.ops.Merge.upsertEvolving(existing, incoming,
        Seq("id"), Seq("name"))
      val twice = graft.ops.Merge.upsertEvolving(once, incoming,
        Seq("id"), Seq("name"))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty,
        s"trial $trial not idempotent")
    }
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def scd2Rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getTimestamp(2)).map(_.toString).orNull,
      Option(r.getTimestamp(3)).map(_.toString).orNull)).toSet

  test("scd2Upsert: change closes + opens, new key inserts, untouched stays open") {
    import spark.implicits._
    val t0 = "2024-01-01 00:00:00"; val t1 = "2024-02-01 00:00:00"
    val history = Seq(
      (1L, "gold", ts(t0), null.asInstanceOf[java.sql.Timestamp]),
      (2L, "iron", ts(t0), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "tier", "valid_from", "valid_to")
    val batch = Seq((1L, "platinum"), (3L, "new")).toDF("id", "tier")
    val out = Merge.scd2Upsert(history, batch, Seq("id"), lit(t1).cast("timestamp"))
    assert(scd2Rows(out) === Set(
      (1L, "gold", t0 + ".0", t1 + ".0"),       // closed
      (1L, "platinum", t1 + ".0", null),        // new version
      (2L, "iron", t0 + ".0", null),            // untouched (delta feed)
      (3L, "new", t1 + ".0", null)))            // fresh key
    // point-in-time reads
    assert(scd2Rows(Merge.scd2AsOf(out, lit(t0).cast("timestamp"))).map(_._2)
      === Set("gold", "iron"))
    assert(scd2Rows(Merge.scd2AsOf(out, lit(t1).cast("timestamp"))).map(_._2)
      === Set("platinum", "iron", "new"))
  }

  test("scd2Upsert: idempotent re-apply; null-safe attr compare; closeMissing") {
    import spark.implicits._
    val t0 = "2024-01-01 00:00:00"; val t1 = "2024-02-01 00:00:00"
    val history = Seq(
      (1L, null.asInstanceOf[String], ts(t0), null.asInstanceOf[java.sql.Timestamp]),
      (2L, "iron", ts(t0), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "tier", "valid_from", "valid_to")
    // null == null attr is a no-op; re-applying the same batch is stable
    val batch = Seq((1L, null.asInstanceOf[String])).toDF("id", "tier")
    val once = Merge.scd2Upsert(history, batch, Seq("id"), lit(t1).cast("timestamp"))
    val twice = Merge.scd2Upsert(once, batch, Seq("id"), lit(t1).cast("timestamp"))
    assert(scd2Rows(once) === scd2Rows(history), "null==null must be a no-op")
    assert(scd2Rows(twice) === scd2Rows(once), "re-apply must be idempotent")
    // null -> value is a change
    val change = Merge.scd2Upsert(history, Seq((1L, "bronze")).toDF("id", "tier"),
      Seq("id"), lit(t1).cast("timestamp"))
    assert(scd2Rows(change).contains((1L, null, t0 + ".0", t1 + ".0")))
    assert(scd2Rows(change).contains((1L, "bronze", t1 + ".0", null)))
    // full-snapshot semantics: absent key closes under closeMissing
    val snap = Merge.scd2Upsert(history, Seq((1L, null.asInstanceOf[String]))
        .toDF("id", "tier"),
      Seq("id"), lit(t1).cast("timestamp"), closeMissing = true)
    assert(scd2Rows(snap).contains((2L, "iron", t0 + ".0", t1 + ".0")),
      "missing key must close under closeMissing")
  }

  test("scd2Upsert: closed history is never touched; boundaries are [from, to)") {
    import spark.implicits._
    val t0 = "2024-01-01 00:00:00"; val t1 = "2024-02-01 00:00:00"
    val t2 = "2024-03-01 00:00:00"
    val history = Seq(
      (1L, "v1", ts(t0), ts(t1)),
      (1L, "v2", ts(t1), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "tier", "valid_from", "valid_to")
    val out = Merge.scd2Upsert(history, Seq((1L, "v3")).toDF("id", "tier"),
      Seq("id"), lit(t2).cast("timestamp"))
    assert(scd2Rows(out) === Set(
      (1L, "v1", t0 + ".0", t1 + ".0"),
      (1L, "v2", t1 + ".0", t2 + ".0"),
      (1L, "v3", t2 + ".0", null)))
    // at exactly t1 the v2 version (valid_from inclusive) is current
    assert(scd2Rows(Merge.scd2AsOf(out, lit(t1).cast("timestamp"))).map(_._2)
      === Set("v2"))
  }
}
