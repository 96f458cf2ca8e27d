package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.{Funnel, Scale, TimeSeries}

/** Unit properties for the analytics operators (the DuckDB oracles in
  * AnalyticsQueries cover end-to-end values; these pin the operator
  * CONTRACTS on crafted frames where the edge cases are visible). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  test("gapFillDaily: fills every day to the global max, carries values, flags observed") {
    val in = Seq(
      (1L, d("2024-01-01"), Some(10.0)),
      (1L, d("2024-01-04"), Some(40.0)),
      (2L, d("2024-01-03"), Some(99.0)) // born late: no backfill before the 3rd
    ).toDF("k", "day", "v")
    val out = TimeSeries.gapFillDaily(in, "k", "day", Seq("v"))
      .orderBy($"k", $"day")
      .select($"k", $"day".cast("string"), $"v", $"observed")
      .as[(Long, String, Option[Double], Boolean)].collect()

    assert(out.toSeq == Seq(
      (1L, "2024-01-01", Some(10.0), true),
      (1L, "2024-01-02", Some(10.0), false),
      (1L, "2024-01-03", Some(10.0), false),
      (1L, "2024-01-04", Some(40.0), true),
      (2L, "2024-01-03", Some(99.0), true),
      (2L, "2024-01-04", Some(99.0), false)))
  }

  test("gapFillDaily: an observed NULL value keeps the previous observation but flags observed") {
    val in = Seq(
      (1L, d("2024-01-01"), Some(10.0)),
      (1L, d("2024-01-02"), None)
    ).toDF("k", "day", "v")
    val out = TimeSeries.gapFillDaily(in, "k", "day", Seq("v"))
      .orderBy($"day").select($"v", $"observed")
      .as[(Option[Double], Boolean)].collect()
    assert(out.toSeq == Seq((Some(10.0), true), (Some(10.0), true)))
  }

  test("gapFillDaily: duplicate (key, date) input fails loudly") {
    val in = Seq((1L, d("2024-01-01"), 1.0), (1L, d("2024-01-01"), 2.0))
      .toDF("k", "day", "v")
    val e = intercept[Exception] {
      TimeSeries.gapFillDaily(in, "k", "day", Seq("v")).collect()
    }
    assert(e.getMessage.contains("duplicate") ||
      e.getCause != null && e.getCause.getMessage.contains("duplicate"))
  }

  test("gapFillDaily: NULL dates fail loudly with their own message") {
    val in = Seq((1L, Some(d("2024-01-01")), 1.0), (1L, None, 2.0))
      .toDF("k", "day", "v")
    val e = intercept[Exception] {
      TimeSeries.gapFillDaily(in, "k", "day", Seq("v")).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("NULL"), msg)
  }

  test("heavyHittersCms: NULL keys are excluded from total and counts (CMS skips them)") {
    val rows: Seq[Option[String]] =
      Seq.fill(6)(Some("hot")) ++ Seq.fill(4)(None) ++ Seq(Some("one"))
    val out = graft.ops.Sketch.heavyHittersCms(rows.toDF("k"), "k", support = 0.5)
      .as[(String, Long, Boolean, Boolean)].collect()
    // 7 non-null rows: hot=6 ≥ 3.5 qualifies; NULL never appears even
    // though 4 rows carry it
    assert(out.toSeq == Seq(("hot", 6L, true, true)), out.mkString(", "))
  }

  test("funnel stageTimes: strict ordering within each key, horizon enforced") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val in = Seq(
      // key 1 completes all three in order
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 01:00:00"), "b"),
      (1L, ts("2024-01-01 02:00:00"), "c"),
      // key 2: b BEFORE its first a — must not count as step 2
      (2L, ts("2024-01-01 01:00:00"), "b"),
      (2L, ts("2024-01-01 02:00:00"), "a"),
      // key 3: completes b only outside the 2h horizon
      (3L, ts("2024-01-01 00:00:00"), "a"),
      (3L, ts("2024-01-01 05:00:00"), "b")
    ).toDF("k", "ts", "step")

    val times = Funnel.stageTimes(in, "k", "ts", "step", Seq("a", "b", "c"),
      withinSeconds = Some(7200L))
    val byKey = times.select($"k", $"step", $"step_ts").as[(Long, Long, java.sql.Timestamp)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap

    assert(byKey(1L).length == 3)
    assert(byKey(1L)(0).before(byKey(1L)(1)) && byKey(1L)(1).before(byKey(1L)(2)))
    assert(byKey(2L).length == 1, "pre-first-step events must not advance the funnel")
    assert(byKey(3L).length == 1, "horizon must bound later steps")
  }

  test("funnel summary: emits every step (0-count included), monotone non-increasing") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val in = Seq((1L, ts("2024-01-01 00:00:00"), "a"))
      .toDF("k", "ts", "step")
    val out = Funnel.summary(in, "k", "ts", "step", Seq("a", "b"))
      .orderBy($"step").select($"step", $"keys", $"conversion")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1L, 1.0), (2L, 0L, 0.0)))
  }

  test("funnel summary on fixtures: counts match the naive window-scan reference") {
    val e = graft.schema.Tables.load(spark, sfDir, "events")
    val out = Funnel.summary(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), Some(7L * 86400))
      .select($"step", $"keys").as[(Long, Long)].collect().toMap
    // reference: per-user collected scan (test-scale only)
    val byUser = e.select($"user_id", $"ts", $"event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._2.getTime, r._3)))
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    byUser.foreach { case (_, evs) =>
      val t1 = evs.collectFirst { case (_, t, "view") => t }
      t1.foreach { t1v =>
        n1 += 1
        val lim = t1v.getTime + 7L * 86400 * 1000
        val t2 = evs.collectFirst { case (_, t, "click")
          if t.getTime > t1v.getTime && t.getTime <= lim => t }
        t2.foreach { t2v =>
          n2 += 1
          val t3 = evs.collectFirst { case (_, t, "purchase")
            if t.getTime > t2v.getTime && t.getTime <= lim => t }
          t3.foreach(_ => n3 += 1)
        }
      }
    }
    assert(out(1L) == n1 && out(2L) == n2 && out(3L) == n3,
      s"got $out want ($n1, $n2, $n3)")
  }

  test("heavyHittersCms: exact counts, support cut, and CMS bounds hold") {
    val rows = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 15).map(i => s"cold$i")
    val df = rows.toDF("k")
    val out = graft.ops.Sketch.heavyHittersCms(df, "k", support = 0.2)
      .orderBy($"k").as[(String, Long, Boolean, Boolean)].collect()
    assert(out.toSeq == Seq(("hot", 60L, true, true), ("warm", 25L, true, true)),
      out.mkString(", "))
  }

  test("zValue: interleaves bits (reference implementation parity, random inputs)") {
    def ref(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val got = rows.toDF("a", "b")
      .select(Scale.zValue($"a", $"b", 10).as("z")).as[Long].collect()
    assert(got.toSeq == rows.map { case (a, b) => ref(a, b, 10) })
    // z is monotone in each dim when the other is fixed
    assert(ref(3, 5, 10) < ref(4, 5, 10) && ref(3, 5, 10) < ref(3, 6, 10))
  }

  test("zValue: out-of-range input fails loudly") {
    val e = intercept[Exception] {
      Seq((1L << 12, 1L)).toDF("a", "b")
        .select(Scale.zValue($"a", $"b", 10)).collect()
    }
    assert(e.getMessage.contains("zValue") ||
      e.getCause != null && e.getCause.getMessage.contains("zValue"))
  }

  test("writeZOrdered: point filters on the non-sort dim skip most files (column sort reads all)") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val n = 1 << 14
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(n)((rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
      .toDF("a", "b")
    val nFiles = 16

    Scale.writeZOrdered(df, s"$dir/z", "a", "b", bits = 10, nFiles = nFiles)
    df.repartitionByRange(nFiles, $"a").sortWithinPartitions($"a")
      .write.parquet(s"$dir/plain")

    // the z-order claim is NOT total area (16 contiguous z-ranges tile
    // the same area a 16-range column sort does), nor worst-case file
    // width (a range straddling a top-level curve corner can span a
    // full dim) — it is FILE SKIPPING: a filter on the non-sort dim
    // must read every file of a column-sorted layout, but only the few
    // z-files whose min/max stats overlap the predicate. Metric: the
    // average fraction of files whose [min,max] on b contains a probe
    // point.
    def stats(path: String): Array[(Long, Long)] = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length == nFiles)
      files.map { f =>
        val r = spark.read.parquet(f).agg(min($"b"), max($"b"))
          .as[(Long, Long)].head()
        r
      }
    }
    val probes = Seq(13L, 300L, 517L, 700L, 1000L)
    def readFraction(st: Array[(Long, Long)]): Double =
      probes.map(p => st.count { case (lo, hi) => lo <= p && p <= hi }).sum
        .toDouble / (probes.size * nFiles)
    val zFrac = readFraction(stats(s"$dir/z"))
    val plainFrac = readFraction(stats(s"$dir/plain"))
    assert(plainFrac > 0.99,
      s"column sort leaves b unbounded per file — every probe reads all files (got $plainFrac)")
    assert(zFrac < 0.6 * plainFrac,
      s"z-order must let point filters on b skip most files: z=$zFrac plain=$plainFrac")
  }

  test("zValueN: 3-column round-robin parity with a reference fold; 2-col == zValue") {
    def ref(xs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits; c <- xs.indices)
        z |= ((xs(c) >> i) & 1L) << (i * xs.size + c)
      z
    }
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 8).toLong,
      rnd.nextInt(1 << 8).toLong, rnd.nextInt(1 << 8).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(Scale.zValueN(Seq($"a", $"b", $"c"), 8).as("z")).as[Long].collect()
    assert(got.toSeq == rows.map { case (a, b, c) => ref(Seq(a, b, c), 8) })
    // the 2-ary wrapper and the n-ary form agree bit for bit
    val two = rows.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    assert(two.select(Scale.zValue($"a", $"b", 8)).as[Long].collect().toSeq ==
      two.select(Scale.zValueN(Seq($"a", $"b"), 8)).as[Long].collect().toSeq)
    intercept[IllegalArgumentException] {
      Scale.zValueN(Seq($"a", $"b", $"c"), 22) // 3*22 > 63
    }
  }

  test("writeZOrderedN: 3-column layout skips files on point filters of EVERY dim") {
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    val n = 1 << 14
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(n)((rnd.nextInt(1 << 7).toLong, rnd.nextInt(1 << 7).toLong,
      rnd.nextInt(1 << 7).toLong)).toDF("a", "b", "c")
    val nFiles = 16
    Scale.writeZOrderedN(df, s"$dir/z3", Seq("a", "b", "c"), bits = 7, nFiles = nFiles)
    df.repartitionByRange(nFiles, $"a").sortWithinPartitions($"a")
      .write.parquet(s"$dir/plain")
    def readFraction(path: String, dim: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length == nFiles)
      val st = files.map { f =>
        spark.read.parquet(f).agg(min(col(dim)), max(col(dim)))
          .as[(Long, Long)].head()
      }
      val probes = Seq(13L, 47L, 90L, 121L)
      probes.map(p => st.count { case (lo, hi) => lo <= p && p <= hi }).sum
        .toDouble / (probes.size * nFiles)
    }
    // the single-column sort bounds only a; b and c read everything
    assert(readFraction(s"$dir/plain", "b") > 0.99)
    // the 3-col z layout skips files for point filters on EACH dim
    // (coarser than 2-col per the bits/n trade-off — gate at 0.75)
    for (dim <- Seq("a", "b", "c"))
      assert(readFraction(s"$dir/z3", dim) < 0.75,
        s"3-col z-order must bound $dim per file")
  }

  test("hilbertValue: bijection + unit-step adjacency, exhaustively at bits=4") {
    // THE Hilbert property Z-order lacks: consecutive curve positions
    // are Manhattan-adjacent cells. Exhaustive over the 16x16 grid:
    // d is a bijection onto [0, 256) and walking d in order moves
    // exactly one cell each step.
    val bits = 4
    val side = 1 << bits
    val cells = for { x <- 0 until side; y <- 0 until side } yield
      (x.toLong, y.toLong)
    val d = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.ops.Scale.hilbertValue(col("x"), col("y"), bits).as("d"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    assert(d.size === side * side, "xy -> d must be a bijection")
    assert(d.keys.min === 0L && d.keys.max === (side * side - 1).toLong)
    for (i <- 0L until (side * side - 1).toLong) {
      val (x1, y1) = d(i); val (x2, y2) = d(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"step $i -> ${i + 1} jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbertValueN: 3-D bijection + unit-step adjacency, exhaustively at bits=3") {
    // Skilling's n-D transpose walk must keep THE Hilbert property in
    // 3-D: exhaustive over the 8x8x8 cube, d bijects onto [0, 512) and
    // consecutive d values are Manhattan-adjacent cells
    val bits = 3
    val side = 1 << bits
    val cells = for { x <- 0 until side; y <- 0 until side; z <- 0 until side }
      yield (x.toLong, y.toLong, z.toLong)
    val d = cells.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        graft.ops.Scale.hilbertValueN(Seq(col("x"), col("y"), col("z")), bits)
          .as("d"))
      .collect()
      .map(r => r.getLong(3) -> (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toMap
    val total = side * side * side
    assert(d.size === total, "xyz -> d must be a bijection")
    assert(d.keys.min === 0L && d.keys.max === (total - 1).toLong)
    for (i <- 0L until (total - 1).toLong) {
      val (x1, y1, z1) = d(i); val (x2, y2, z2) = d(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) === 1L,
        s"step $i -> ${i + 1} jumps from ($x1,$y1,$z1) to ($x2,$y2,$z2)")
    }
  }

  test("hilbertValueN: 2-D variant also holds bijection + adjacency (orientation may differ from hilbertValue)") {
    val bits = 4
    val side = 1 << bits
    val cells = for { x <- 0 until side; y <- 0 until side } yield
      (x.toLong, y.toLong)
    val d = cells.toDF("x", "y")
      .select(graft.ops.Scale.hilbertValueN(Seq(col("x"), col("y")), bits).as("d"),
        col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d.size === side * side)
    for (i <- 0L until (side * side - 1).toLong) {
      val (x1, y1) = d(i); val (x2, y2) = d(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
    }
  }

  test("hilbertValue: loud on out-of-range input; null in, null out") {
    val ex = intercept[Exception] {
      Seq((1024L, 1L)).toDF("a", "b")
        .select(graft.ops.Scale.hilbertValue(col("a"), col("b"), 10)).collect()
    }
    assert(ex.getMessage.contains("hilbert input") ||
      ex.getCause != null && ex.getCause.getMessage.contains("hilbert input"))
    val n = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(graft.ops.Scale.hilbertValue(col("a"), col("b"), 10)).head()
    assert(n.isNullAt(0))
  }

  test("writeHilbertOrdered: layout skips files on point filters of BOTH dims") {
    val dir = java.nio.file.Files.createTempDirectory("hilbert2").toString
    val n = 1 << 14
    val rnd = new scala.util.Random(23)
    val df = Seq.fill(n)((rnd.nextInt(1 << 7).toLong, rnd.nextInt(1 << 7).toLong))
      .toDF("a", "b")
    val nFiles = 16
    Scale.writeHilbertOrdered(df, s"$dir/h", "a", "b", bits = 7, nFiles = nFiles)
    df.repartitionByRange(nFiles, $"a").sortWithinPartitions($"a")
      .write.parquet(s"$dir/plain")
    import graft.ops.Layout
    val probes = Seq(13L, 47L, 90L, 121L)
    val hs = Layout.fileStats(spark, s"$dir/h", Seq("a", "b"))
    val ps = Layout.fileStats(spark, s"$dir/plain", Seq("a", "b"))
    // the single-column sort bounds only a; b reads everything
    assert(Layout.readFraction(ps, "b", probes) > 0.99)
    // the hilbert layout bounds BOTH dims (connected regions -> tight
    // min/max on each); same 0.6 gate the 2-col z layout clears
    assert(Layout.readFraction(hs, "a", probes) < 0.6,
      "hilbert layout must bound a per file")
    assert(Layout.readFraction(hs, "b", probes) < 0.6,
      "hilbert layout must bound b per file")
  }

  test("Layout.fileStats/readFraction: per-file stats equal hand-derived footers") {
    import graft.ops.Layout
    val dir = java.nio.file.Files.createTempDirectory("layoutfs").toString
    // two files with KNOWN disjoint ranges: partitionBy on a 2-value
    // column yields one leaf dir each; audit the leaves separately
    (1L to 100L).map(i => (i, i * 3)).toDF("k", "v")
      .repartitionByRange(2, $"k").sortWithinPartitions($"k")
      .write.parquet(s"$dir/t")
    val st = Layout.fileStats(spark, s"$dir/t", Seq("k", "v")).collect()
    assert(st.length === 2)
    assert(st.map(_.getLong(st.head.fieldIndex("n_rows"))).sum === 100L)
    // the two files tile [1,100] on k disjointly (range partition)
    val ranges = st.map(r => (r.getLong(r.fieldIndex("k_min")),
      r.getLong(r.fieldIndex("k_max")))).sortBy(_._1)
    assert(ranges.head._1 === 1L && ranges.last._2 === 100L)
    assert(ranges.head._2 < ranges.last._1, "range files must not overlap on k")
    // probe containment arithmetic: a probe inside one file's range
    // reads 1 of 2 files; outside both reads none
    val stats = Layout.fileStats(spark, s"$dir/t", Seq("k"))
    assert(Layout.readFraction(stats, "k", Seq(ranges.head._1)) === 0.5)
    assert(Layout.readFraction(stats, "k", Seq(1000L)) === 0.0)
  }

  test("anomaly z-scores: hand-computed group stats, null for degenerate groups") {
    import spark.implicits._
    import graft.ops.Anomaly
    // group a: values 0,10,20 -> mean 10, stddev_pop sqrt(200/3)
    // group b: single value -> stddev 0 -> null z
    val df = Seq(("a", 1L, 0.0), ("a", 2L, 10.0), ("a", 3L, 20.0),
      ("b", 4L, 99.0)).toDF("g", "id", "v")
    val out = Anomaly.zScores(df, "v", Seq("g")).orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        Option(r.get(r.fieldIndex("z"))).map(_.asInstanceOf[Double])))
    val sd = math.sqrt(200.0 / 3)
    def z(v: Double) = math.round((v - 10.0) / sd * 10000) / 10000.0
    assert(out.toSeq === Seq((1L, Some(z(0))), (2L, Some(z(10))),
      (3L, Some(z(20))), (4L, None)),
      "single-value group must yield null z, not infinity")
  }

  test("anomaly outliers: only |z| above threshold survive; nulls never flag") {
    import spark.implicits._
    import graft.ops.Anomaly
    // 20 values at 10 plus one spike: the spike's z is large, others ~ -0.22
    val df = ((1L to 20L).map(i => ("g", i, 10.0)) :+ (("g", 99L, 1000.0)))
      .toDF("g", "id", "v")
    val got = Anomaly.outliers(df, "v", Seq("g"), threshold = 3.0)
      .select("id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(99L))
  }

  test("robust z-scores: outliers cannot corrupt the median/MAD baseline") {
    import spark.implicits._
    import graft.ops.Anomaly
    // values 1..9 plus a huge spike: median 5.5, MAD 2.5 — the spike
    // barely moves them (it DOES inflate mean/stddev, which is the point)
    val df = ((1 to 9).map(i => ("g", i.toLong, i.toDouble)) :+ (("g", 99L, 1e6)))
      .toDF("g", "id", "v")
    val out = Anomaly.robustZScores(df, "v", Seq("g"))
      .select("id", "grp_median", "grp_mad", "rz").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.forall(r => r._2 === 5.5 && r._3 === 2.5))
    val spike = out.find(_._1 == 99L).get
    assert(spike._4 > 1000, "the spike must score enormous against the robust baseline")
    // classic z would dilute: the spike is < 3 classic sigmas here
    val classic = Anomaly.zScores(df, "v", Seq("g"))
      .filter(col("id") === 99L).select("z").first().getDouble(0)
    assert(classic < 3.5, s"mean/stddev baseline self-corrupts (z=$classic)")
    // degenerate: constant-majority group -> MAD 0 -> null rz
    val const = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0), ("c", 4L, 9.0))
      .toDF("g", "id", "v")
    assert(Anomaly.robustZScores(const, "v", Seq("g"))
      .filter(col("rz").isNotNull).count() === 0L)
  }

  test("winsorize clamps into exact group quantiles; nulls stay null") {
    import spark.implicits._
    import graft.ops.Anomaly
    val df = ((1 to 100).map(i => ("g", i.toLong, java.lang.Double.valueOf(i.toDouble)))
      :+ (("g", 999L, null.asInstanceOf[java.lang.Double])))
      .toDF("g", "id", "v")
    val out = Anomaly.winsorize(df, "v", Seq("g"), loPct = 0.1, hiPct = 0.9)
      .select("id", "v_wins").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toMap
    // exact interpolated p10/p90 of 1..100 are 10.9 and 90.1 (compare
    // at 1e-9: the interpolation arithmetic carries float error)
    def approx(o: Option[Double], v: Double) =
      o.exists(x => math.abs(x - v) < 1e-9)
    assert(approx(out(1L), 10.9) && approx(out(5L), 10.9))
    assert(approx(out(100L), 90.1) && approx(out(95L), 90.1))
    assert(out(50L) === Some(50.0), "interior values pass through untouched")
    assert(out(999L) === None, "null values must stay null, not clamp to the bound")
  }

  test("anomaly family scores null-group rows against the null group — never drops them") {
    import spark.implicits._
    import graft.ops.Anomaly
    // groupBy keeps a stats row for the null group; the score joins
    // must match it null-safely or these rows silently vanish
    val df = Seq((Option("a"), 1L, 0.0), (Option("a"), 2L, 10.0),
      (Option.empty[String], 3L, 0.0), (Option.empty[String], 4L, 4.0),
      (Option.empty[String], 5L, 8.0)).toDF("g", "id", "v")
    val z = Anomaly.zScores(df, "v", Seq("g"))
    assert(z.count() === 5L, "zScores must keep every row incl. null group")
    val nullZ = z.filter(col("g").isNull && col("id") === 5L).first()
    assert(nullZ.getDouble(nullZ.fieldIndex("grp_mean")) === 4.0,
      "null-group rows score against the NULL group's own statistics")
    assert(Anomaly.robustZScores(df, "v", Seq("g")).count() === 5L)
    val w = Anomaly.winsorize(df, "v", Seq("g"), loPct = 0.25, hiPct = 0.75)
    assert(w.count() === 5L, "winsorize documents rows are never dropped")
    assert(w.filter(col("g").isNull).count() === 3L)
  }

  test("anomaly percentile ops backtick-quote the value column name") {
    import spark.implicits._
    import graft.ops.Anomaly
    // an unquoted "a-b" would PARSE as column a minus column b inside
    // expr("percentile(...)") — silently wrong stats when both exist
    val df = Seq(("g", 1.0, 100.0), ("g", 3.0, 100.0), ("g", 5.0, 100.0))
      .toDF("g", "a-b", "a")
    val rz = Anomaly.robustZScores(df, "a-b", Seq("g"))
    assert(rz.select("grp_median").distinct().head().getDouble(0) === 3.0,
      "median must be of the LITERAL a-b column, not a minus b")
    val w = Anomaly.winsorize(df, "a-b", Seq("g"), loPct = 0.0, hiPct = 1.0)
    assert(w.select("grp_hi").distinct().head().getDouble(0) === 5.0)
  }

  test("gapFillDaily: the null-key group gap-fills like any other (no silent drop)") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Date.valueOf("2025-05-01"), Option(10.0)),
      (Option(1L), Date.valueOf("2025-05-03"), Option(30.0)),
      (Option.empty[Long], Date.valueOf("2025-05-01"), Option(5.0)),
      (Option.empty[Long], Date.valueOf("2025-05-02"), Option(7.0)))
      .toDF("k", "d", "v")
    val out = TimeSeries.gapFillDaily(df, "k", "d", Seq("v"))
    val nullRows = out.filter(col("k").isNull).orderBy("d").collect()
    assert(nullRows.length === 3, // 05-01..05-03 (global right edge)
      s"null-key spine must span to the global max, got ${nullRows.length}")
    assert(nullRows.map(_.getDouble(2)).toSeq === Seq(5.0, 7.0, 7.0),
      "null-key observations must survive and forward-fill")
    assert(nullRows.map(_.getBoolean(3)).toSeq === Seq(true, true, false))
  }

  test("funnel summary: zero step-1 completions yields NULL conversions, not NaN") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq((1L, ts("2025-05-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "stage")
    val out = Funnel.summary(df, "user_id", "ts", "stage",
        Seq("signup", "view")) // nobody completes step 1 'signup'
      .orderBy("step").collect()
    assert(out.forall(_.isNullAt(3)),
      "0/0 conversion must be NULL, not NaN: " + out.mkString(", "))
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L),
      "keys counted from the spine even when base is empty" +
        " (a later step cannot fire without step 1 in-order)")
  }
}
