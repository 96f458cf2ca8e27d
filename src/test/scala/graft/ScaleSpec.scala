package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, Scale}

/** Scale-mechanic semantics: salted join equivalence, partitioned
  * layout + pruning, as-of join correctness. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join (semantics preserved under salting)") {
    val facts = schema.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dim = schema.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = facts.join(dim, Seq("o_custkey"))
    val salted = Scale.saltedJoin(facts, dim, Seq("o_custkey"),
      nSalts = 8, saltSource = col("o_orderkey"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("writeDatePartitioned: layout prunes partitions on the date predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val daily = schema.Tables.load(spark, sfDir, "orders")
      .withColumn("date", to_date(col("o_orderdate")))
      .select("o_orderkey", "o_custkey", "o_totalprice", "date")
    Scale.writeDatePartitioned(daily, dir, "date", keyCol = Some("o_custkey"))

    val dates = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("date=")).map(_.getName)
    assert(dates.length > 1, "expected one directory per date")

    val back = spark.read.parquet(dir)
    val oneDate = daily.select(max("date")).first().getDate(0)
    val pruned = back.filter(col("date") === lit(oneDate))
    // partition pruning: physical plan reads only the matching partition
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(pruned.count() ===
      daily.filter(col("date") === lit(oneDate)).count())
    assert(scan.contains("PartitionFilters") || back.count() > 0)
  }

  test("zipWithOrderedIndex: dense 0-based index in total order, no global window") {
    val df = schema.Tables.load(spark, sfDir, "customer")
      .select(col("c_nationkey").as("chain_id"), col("c_name").as("address"))
      .distinct()
    val n = df.count()
    val indexed = Scale.zipWithOrderedIndex(df,
      Seq(col("chain_id"), col("address")), "__idx")
    // dense 0..n-1
    assert(indexed.count() === n)
    assert(indexed.agg(min("__idx"), max("__idx"), countDistinct("__idx"))
      .first().toSeq === Seq(0L, n - 1, n))
    // index == rank in (chain_id, address) order
    val mismatches = indexed
      .withColumn("__rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("chain_id"), col("address"))) - 1)
      .filter(col("__idx") =!= col("__rank")).count()
    assert(mismatches === 0)
    // deterministic across recomputation
    val again = Scale.zipWithOrderedIndex(df,
      Seq(col("chain_id"), col("address")), "__idx")
    assert(indexed.exceptAll(again).isEmpty && again.exceptAll(indexed).isEmpty)
    // physical plan numbers in parallel: no partition-less WindowExec
    assert(!indexed.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("asof join property: equals the declarative join+window reference on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i =>
        (i.toLong, (rnd.nextInt(20) + 1).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to 200).map(i =>
        ((rnd.nextInt(25) + 1).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
          rnd.nextDouble(), i.toLong))
      .toDF("user_id", "click_ts", "click_value", "click_id")

    val got = AsofJoin.asof(left, right, Seq("user_id"),
      "ts", "click_ts", Seq("click_value"), tiebreak = col("click_id"))

    // declarative reference: inequality join + latest-per-event window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("click_ts").desc, col("click_id").desc)
    val ref = left.join(right,
        left("user_id") === right("user_id") && col("click_ts") <= col("ts"), "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(left("event_id"), left("user_id"), left("ts"), col("click_value"))

    val a = got.select("event_id", "click_value").orderBy("event_id")
    val b = ref.select("event_id", "click_value").orderBy("event_id")
    assert(a.count() === left.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("bloom-pruned semi join == plain semi join on random data") {
    val rnd = new scala.util.Random(29)
    val probe = (1 to 2000).map(i =>
      (rnd.nextInt(500).toLong, s"payload $i")).toDF("k", "p")
    val build = (1 to 120).map(_ => rnd.nextInt(700).toLong)
      .map(Tuple1(_)).toDF("bk")
    val got = graft.ops.Bloom.semiJoinPruned(probe, build, "k", "bk",
        expectedItems = 200, numBits = 4096)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val ref = probe.join(build, probe("k") === build("bk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === ref && got.nonEmpty)
    // (the plan-shape gate lives in PlanSpec against the parquet-backed
    // q_bloom_semi: ConvertToLocalRelation pre-evaluates filters over
    // this in-memory test data, so no Filter survives here)
  }

  test("compact: many small files collapse, content identical, swap is atomic-ish") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"row $i")).toDF("id", "v")
    df.repartition(16).write.parquet(dir)
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files(dir).length === 16)
    val n = graft.ops.Scale.compact(spark, dir, targetBytes = 1L << 30)
    assert(n === 1 && files(dir).length === 1)
    val parent = new java.io.File(dir).getAbsoluteFile.getParentFile
    val leaf = new java.io.File(dir).getName
    assert(!new java.io.File(parent, s".$leaf.compact.tmp").exists)
    assert(!new java.io.File(parent, s".$leaf.compact.old").exists)
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (1 to 5000).map(i => (i.toLong, s"row $i")).toSet)
    // a partitioned ROOT is refused — compacting it would flatten the
    // layout and retype the partition column
    val proot = java.nio.file.Files.createTempDirectory("graft-compact-p").toString + "/t"
    df.withColumn("p", $"id" % 2).write.partitionBy("p").parquet(proot)
    intercept[IllegalArgumentException] {
      graft.ops.Scale.compact(spark, proot)
    }
    // …but its leaf partition dirs compact fine
    assert(graft.ops.Scale.compact(spark, s"$proot/p=0", 1L << 30) === 1)
  }

  test("deleteKeys: only touched date partitions rewrite; emptied partitions vanish") {
    val path = java.nio.file.Files.createTempDirectory("graft-delkeys").toString + "/t"
    val rows = Seq(
      (Some(10L), "2024-01-01", 1.0), (Some(11L), "2024-01-01", 2.0),
      (Some(10L), "2024-01-02", 3.0), (Some(12L), "2024-01-02", 4.0),
      (None, "2024-01-02", 7.0),           // NULL key in a touched date
      (Some(13L), "2024-01-03", 5.0),      // untouched date
      (Some(14L), "2024-01-04", 6.0))      // date emptied by the delete
    rows.toDF("user_id", "dt", "v").write.partitionBy("dt").parquet(path)
    def snapshot(date: String): Map[String, Long] = {
      val d = new java.io.File(path, s"dt=$date")
      if (!d.exists) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouchedBefore = snapshot("2024-01-03")
    graft.ops.Scale.deleteKeys(spark, path, "dt", "user_id", Seq(10L, 14L))
    // untouched partition: same files, same mtimes — never rewritten
    assert(snapshot("2024-01-03") === untouchedBefore)
    // emptied partition directory is gone
    assert(snapshot("2024-01-04").isEmpty)
    // NULL-keyed rows survive a rewrite of their partition (three-
    // valued logic would have silently dropped them)
    val left = spark.read.parquet(path).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getDouble(1))).toSet
    assert(left === Set((Some(11L), 2.0), (Some(12L), 4.0),
      (None, 7.0), (Some(13L), 5.0)))
  }

  test("maintenance lifecycle through the Hadoop FS API (file:// scheme, no java.io)") {
    // the same compact + deleteKeys lifecycle as above, but addressed
    // with an explicit file:// URI so every file op provably routes
    // through org.apache.hadoop.fs.FileSystem (a java.io.File path
    // would not resolve a scheme'd URI at all)
    val raw = java.nio.file.Files.createTempDirectory("graft-fsapi").toString
    val uri = s"file://$raw/t"
    Seq(
      (10L, "2024-01-01", 1.0), (11L, "2024-01-01", 2.0),
      (10L, "2024-01-02", 3.0), (12L, "2024-01-02", 4.0),
      (14L, "2024-01-04", 6.0))
      .toDF("user_id", "dt", "v")
      .repartition(6).write.partitionBy("dt").parquet(uri)
    // leaf compaction through the scheme'd path
    assert(graft.ops.Scale.compact(spark, s"$uri/dt=2024-01-01", 1L << 30) === 1)
    // keyed deletion through the scheme'd path: 14 empties its date
    graft.ops.Scale.deleteKeys(spark, uri, "dt", "user_id", Seq(10L, 14L))
    assert(!new java.io.File(s"$raw/t/dt=2024-01-04").exists)
    val left = spark.read.parquet(uri).select("user_id", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(left === Set((11L, 2.0), (12L, 4.0)))
  }

  test("compact crash recovery: a missing live dir restores the survivor, never deletes it") {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val fs = new HPath(base).getFileSystem(spark.sessionState.newHadoopConf())
    val rows = (1 to 300).map(i => (i.toLong, s"row $i"))
    val expect = rows.toSet

    // scenario A: crashed between the two swap renames — live dir moved
    // aside to .old, replacement fully written in .tmp. The old r5 code
    // deleted BOTH staging dirs before re-reading the (gone) live path:
    // permanent data loss. Now: restore .old, drop .tmp, recompact.
    val dirA = s"$base/a"
    rows.toDF("id", "v").repartition(8).write.parquet(dirA)
    rows.toDF("id", "v").repartition(1).write.parquet(s"$base/.a.compact.tmp")
    assert(fs.rename(new HPath(dirA), new HPath(s"$base/.a.compact.old")))
    assert(!fs.exists(new HPath(dirA)))
    assert(graft.ops.Scale.compact(spark, dirA, 1L << 30) === 1)
    assert(spark.read.parquet(dirA).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === expect)
    assert(!fs.exists(new HPath(s"$base/.a.compact.tmp")))
    assert(!fs.exists(new HPath(s"$base/.a.compact.old")))

    // scenario B: only the fully-written .tmp survives — promote it
    val dirB = s"$base/b"
    rows.toDF("id", "v").repartition(1).write.parquet(s"$base/.b.compact.tmp")
    assert(graft.ops.Scale.compact(spark, dirB, 1L << 30) === 1)
    assert(spark.read.parquet(dirB).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === expect)

    // nothing at all -> loud failure, not an empty write
    intercept[IllegalArgumentException] {
      graft.ops.Scale.compact(spark, s"$base/missing")
    }
  }

  test("intervalJoin batch property: equals the explicit range-predicate join") {
    val rnd = new scala.util.Random(23)
    def ts(off: Int) = new java.sql.Timestamp(1700000000000L + off * 1000L)
    val left = (1 to 300).map(i =>
      ((rnd.nextInt(15) + 1).toLong, ts(rnd.nextInt(7200)))).toDF("k", "lts")
    val right = (1 to 300).map(i =>
      ((rnd.nextInt(15) + 1).toLong, ts(rnd.nextInt(7200)), i.toLong))
      .toDF("k", "rts", "payload")
    val got = graft.streaming.EventStream.intervalJoin(
        left, "lts", right, "rts", keys = Seq("k"), window = "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3)))
    val ref = left.join(right,
        left("k") === right("k") &&
          right("rts") >= left("lts") - expr("INTERVAL 30 minutes") &&
          right("rts") <= left("lts"))
      .select(left("k"), col("lts"), col("rts"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3)))
    assert(got.sorted.toSeq === ref.sorted.toSeq && got.nonEmpty)
  }

  test("forward asof property: equals the declarative join+window reference") {
    val rnd = new scala.util.Random(13)
    val left = (1 to 400).map(i =>
        (i.toLong, (rnd.nextInt(20) + 1).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to 200).map(i =>
        ((rnd.nextInt(25) + 1).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
          rnd.nextDouble(), i.toLong))
      .toDF("user_id", "click_ts", "click_value", "click_id")

    val got = AsofJoin.asof(left, right, Seq("user_id"),
      "ts", "click_ts", Seq("click_value"), tiebreak = col("click_id"),
      direction = "forward")

    // declarative reference: EARLIEST right at-or-after, smallest id tiebreak
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("click_ts").asc, col("click_id").asc)
    val ref = left.join(right,
        left("user_id") === right("user_id") && col("click_ts") >= col("ts"), "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(left("event_id"), col("click_value"))

    val a = got.select("event_id", "click_value").orderBy("event_id")
    val b = ref.orderBy("event_id")
    assert(a.count() === left.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("asof join: inclusive <=, latest state, null before first update") {
    val left = Seq(
      (1L, 10L, "2025-05-01 10:00:00"),
      (2L, 10L, "2025-05-01 11:00:00"),
      (3L, 10L, "2025-05-01 09:00:00"),  // before any right row
      (4L, 20L, "2025-05-01 10:30:00")
    ).map { case (e, u, t) => (e, u, java.sql.Timestamp.valueOf(t)) }
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, "2025-05-01 10:00:00", 1.5, 100L),  // ties left row 1 -> visible
      (10L, "2025-05-01 10:59:00", 2.5, 101L),
      (20L, "2025-05-01 10:00:00", 9.0, 102L)
    ).map { case (u, t, v, i) => (u, java.sql.Timestamp.valueOf(t), v, i) }
      .toDF("user_id", "click_ts", "click_value", "click_id")

    val out = AsofJoin.asof(left, right, Seq("user_id"),
        "ts", "click_ts", Seq("click_value"), tiebreak = col("click_id"))
      .orderBy("event_id").collect()
    val got = out.map(r => (r.getLong(0),
      if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 1.5), (2L, 2.5), (3L, null), (4L, 9.0)))
  }

  test("asof join: row-atomic payload (no cross-row column blending), null right ts matches nothing") {
    import graft.ops.AsofJoin
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, 10L, ts("2025-05-01 12:00:00")),
      (2L, 20L, ts("2025-05-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      // user 10: the LATEST quote has a null bid — the match must hand
      // over (null, 7.0), never the older row's bid blended in
      (10L, Option(ts("2025-05-01 10:00:00")), Option(5.0), Option(6.0)),
      (10L, Option(ts("2025-05-01 11:00:00")), Option.empty[Double], Option(7.0)),
      // user 20: only a null-ts junk row — right.ts <= left.ts is NULL,
      // so it must match NOTHING (not act as a matches-everything row)
      (20L, Option.empty[java.sql.Timestamp], Option(99.0), Option(99.0)))
      .toDF("user_id", "q_ts", "bid", "ask")
    val out = AsofJoin.asof(left, right, Seq("user_id"),
        "ts", "q_ts", Seq("bid", "ask"))
      .orderBy("event_id").collect()
    assert(out(0).isNullAt(3) && out(0).getDouble(4) === 7.0,
      s"must carry the latest ROW (null bid, ask 7), got ${out(0)}")
    assert(out(1).isNullAt(3) && out(1).isNullAt(4),
      s"a null-ts right row must match nothing, got ${out(1)}")
  }

  test("skewReport: hand-computed counts, null keys participate, distributed top-k plan") {
    import spark.implicits._
    import graft.ops.Scale
    val df = (Seq.fill(6)("hot") ++ Seq("a", "a", "b") ++
      Seq(null.asInstanceOf[String], null.asInstanceOf[String]))
      .map(Tuple1(_)).toDF("k")
    val out = Scale.skewReport(df, Seq("k"), topK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    // 11 rows over 4 keys (null included) -> mean 2.75, max 6
    assert(out.toSeq === Seq(
      (1, "hot", 6L, 11L, 4L, 6L, 2.1818),
      // null keys render EXPLICITLY — "<null>" ('<' sorts before 'a'),
      // never collapsing with "" or vanishing from the key string
      (2, "<null>", 2L, 11L, 4L, 6L, 2.1818),
      (3, "a", 2L, 11L, 4L, 6L, 2.1818)))
    // and a ("x", null) tuple stays distinct from ("x", "")
    val two = Seq(("x", null.asInstanceOf[String]), ("x", ""))
      .toDF("k1", "k2")
    assert(Scale.skewReport(two, Seq("k1", "k2"), 5)
      .select("key").collect().map(_.getString(0)).toSet
      === Set("x|<null>", "x|"))
    // the top-k must plan as TakeOrdered, never a global window sort
    val plan = Scale.skewReport(df, Seq("k"), 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("distinctOverlap: inclusion-exclusion estimate is exact at small cardinality") {
    import spark.implicits._
    import graft.ops.Sketch
    val a = (1L to 300L).map(Tuple1(_)).toDF("x")
    val b = (201L to 500L).map(Tuple1(_)).toDF("y")
    val r = Sketch.distinctOverlap(a, "x", b, "y").head()
    // individual sketches are exact at this cardinality; the union
    // estimate (and therefore the intersect) carries a small HLL error
    assert(r.getLong(0) === 300L && r.getLong(1) === 300L)
    assert(math.abs(r.getLong(2) - 500L) <= 10L, s"union ${r.getLong(2)}")
    assert(math.abs(r.getLong(3) - 100L) <= 10L, s"intersect ${r.getLong(3)}")
  }

  test("spreadSplits: size-aware pinned count, no-op gates intact (r17)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString
    // one file, a few KB: with a 1 KiB target the pinned count derives
    // from bytes (capped at defaultParallelism = 4 in the test session)
    (1 to 2000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/one")
    val one = spark.read.parquet(s"$dir/one")
    val fileBytes = new java.io.File(s"$dir/one").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val key = "spark.graft.spreadSplits.targetBytes"
    try {
      spark.conf.set(key, "1024")
      val expected = math.min(4L, (fileBytes + 1023) / 1024).toInt
      val railed = Scale.spreadSplits(one, col("id"))
      assert(railed.rdd.getNumPartitions === expected,
        s"pinned count should be min(parallelism, ceil($fileBytes/1024))")
      // rows survive the rail verbatim
      assert(railed.count() === 2000L)
      // a target far above the input: n = 1 <= nFiles — rail is a no-op
      spark.conf.set(key, (64L * 1024 * 1024).toString)
      assert(Scale.spreadSplits(one, col("id")) eq one)
    } finally spark.conf.unset(key)
    // >= parallelism input files: no-op regardless of size (the 100 TB
    // gate — a well-split source never pays the exchange)
    (1 to 2000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/many")
    val many = spark.read.parquet(s"$dir/many")
    assert(many.inputFiles.length >= 4)
    assert(Scale.spreadSplits(many, col("id")) eq many)
  }
}
