package graft

import org.apache.spark.sql.functions._

import graft.ops.{Merge, Profile}

/** Snapshot CDC diff classification (null-safe compares, changed-column
  * lists, empty diff on identical snapshots) and the one-pass column
  * profiler's statistics. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("k", "v", "w")

  test("insert/update/delete classification with null-safe compares") {
    val oldS = Seq((1L, "a", "p"), (2L, "b", "q"), (3L, null, "r"), (4L, "d", "s"))
      .toDF("k", "v", "w")
    val newS = Seq((2L, "b", "q"), (3L, "x", "r"), (4L, null, "s"), (5L, "e", "t"))
      .toDF("k", "v", "w")
    val got = Merge.snapshotDiff(oldS, newS, Seq("k"))
      .orderBy("k")
      .select(col("k"), col("change_op"), col("changed_cols"),
        col("v_old"), col("v_new"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toList,
        r.getString(3), r.getString(4)))
    assert(got.toList === List(
      (1L, "delete", Nil, "a", null),
      (3L, "update", List("v"), null, "x"),
      (4L, "update", List("v"), "d", null),
      (5L, "insert", Nil, null, "e")))
  }

  test("multi-column updates list changed columns sorted; unchanged keys absent") {
    val oldS = snap((1L, "a", "p"), (2L, "b", "q"))
    val newS = snap((1L, "A", "P"), (2L, "b", "q"))
    val got = Merge.snapshotDiff(oldS, newS, Seq("k")).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Seq[String]]("changed_cols").toList === List("v", "w"))
    // identical snapshots diff to empty
    assert(Merge.snapshotDiff(oldS, oldS, Seq("k")).isEmpty)
  }

  test("null-valued keys: delete+insert by default, matched under nullSafeKeys") {
    val oldS = Seq((Option(1L), "a"), (Option.empty[Long], "z")).toDF("k", "v")
    val newS = Seq((Option(1L), "a"), (Option.empty[Long], "y")).toDF("k", "v")
    def ops(df: org.apache.spark.sql.DataFrame) =
      df.select(col("change_op"), col("v_old"), col("v_new"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ops(Merge.snapshotDiff(oldS, newS, Seq("k"))) ===
      Set(("delete", "z", null), ("insert", null, "y")))
    assert(ops(Merge.snapshotDiff(oldS, newS, Seq("k"), nullSafeKeys = true)) ===
      Set(("update", "z", "y")))
  }

  test("applyDiff(old, snapshotDiff(old, new)) reconstructs new exactly") {
    val oldS = Seq((1L, "a", "p"), (2L, "b", "q"), (3L, null.asInstanceOf[String], "r"),
      (4L, "d", "s")).toDF("k", "v", "w")
    val newS = Seq((2L, "b", "q"), (3L, "x", "r"), (4L, null.asInstanceOf[String], "s"),
      (5L, "e", "t")).toDF("k", "v", "w")
    val rebuilt = Merge.applyDiff(oldS, Merge.snapshotDiff(oldS, newS, Seq("k")),
      Seq("k"))
    assert(rebuilt.columns.toSeq === oldS.columns.toSeq)
    val a = rebuilt.orderBy("k").collect().map(_.toSeq).toList
    val b = newS.orderBy("k").collect().map(_.toSeq).toList
    assert(a === b)
    // empty diff is the identity
    val same = Merge.applyDiff(oldS, Merge.snapshotDiff(oldS, oldS, Seq("k")),
      Seq("k"))
    assert(same.orderBy("k").collect().map(_.toSeq).toList ===
      oldS.orderBy("k").collect().map(_.toSeq).toList)
  }

  test("schema / key validation fails loudly") {
    val a = snap((1L, "a", "p"))
    intercept[IllegalArgumentException] {
      Merge.snapshotDiff(a, a.drop("w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Merge.snapshotDiff(a, a, Seq("nope"))
    }
  }

  test("profile: per-column stats in one pass, exact and sketch modes") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]),
      (3L, "b")).toDF("id", "s")
    for (exact <- Seq(true, false)) {
      val p = Profile.profile(df, Seq("id", "s"), exact = exact)
        .orderBy("column").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))
      assert(p.toList === List(
        ("id", 4L, 0L, 3L, "1", "3"),
        ("s", 4L, 1L, 2L, "a", "b")))
    }
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("missing"))
    }
  }

  test("incremental profile state: 3-batch merge == one-shot, estimates bit-exact") {
    import graft.ops.Profile
    val df = (1 to 90).map(i =>
      (i.toLong % 30, if (i % 7 == 0) null else s"v${i % 11}"))
      .toDF("id", "s")
    val cols = Seq("id", "s")
    val inc = java.nio.file.Files.createTempDirectory("graft-ps-i").toString + "/s"
    val one = java.nio.file.Files.createTempDirectory("graft-ps-o").toString + "/s"
    Profile.writeProfileState(df.filter(col("id") % 3 === 0), cols, inc)
    Profile.appendProfileState(df.filter(col("id") % 3 === 1), cols, inc)
    Profile.appendProfileState(df.filter(col("id") % 3 === 2), cols, inc)
    Profile.writeProfileState(df, cols, one)
    def read(p: String) = Profile.readProfileState(spark, p).orderBy("column")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5))).toList
    val got = read(inc)
    assert(got === read(one), "merged state must equal the one-shot state")
    // small-cardinality HLL is exact: 30 ids, 11 string values
    assert(got === List(("id", 90L, 0L, 30L, 0.0, 29.0),
      ("s", 90L, 12L, 11L, null, null)))
  }

  test("histogram: closed-top bins, empty bins present, degenerate and null edges") {
    val df = Seq(0.0, 1.0, 2.5, 9.9, 10.0, 10.0).map(Tuple1(_)).toDF("v")
    val h = Profile.histogram(df, "v", nBins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // w = 2: [0,2)->2, [2,4)->1, [4,6)->0, [6,8)->0, [8,10]->3 (max lands last)
    assert(h.map(x => (x._1, x._4)).toList ===
      List((0L, 2L), (1L, 1L), (2L, 0L), (3L, 0L), (4L, 3L)))
    assert(h.head._2 === 0.0 && h.last._3 === 10.0)

    val one = Profile.histogram(Seq(7.0, 7.0).map(Tuple1(_)).toDF("v"), "v", 4)
      .collect()
    assert(one.length === 1 && one.head.getLong(3) === 2L,
      "min==max must collapse to a single full bin")

    val withNull = Seq(Some(1.0), None, Some(3.0)).map(Tuple1(_)).toDF("v")
    assert(Profile.histogram(withNull, "v", 2)
      .agg(sum(col("n_rows"))).head().getLong(0) === 2L, "nulls excluded")

    assert(Profile.histogram(Seq.empty[Tuple1[Option[Double]]].toDF("v"), "v", 3)
      .isEmpty, "empty input yields an empty histogram")
  }

  test("distributionDrift: identical snapshots score exactly zero; shifts and overflow mass register") {
    val a = (0 until 400).map(i => Tuple1((i % 100).toDouble)).toDF("x")
    // identical frames: pa == pb in every cell -> PSI and JSD are 0.0
    // EXACTLY (each term is algebraically zero, no accumulation)
    val same = Profile.distributionDrift(a, a, "x", 0.0, 100.0, 10).head()
    assert(same.getDouble(3) === 0.0 && same.getDouble(4) === 0.0)
    assert(same.getLong(1) === 400L && same.getLong(2) === 400L)

    // disjoint support: JSD approaches its ln 2 bound, PSI explodes
    val b = (0 until 400).map(i => Tuple1(100.0 + (i % 100))).toDF("x")
    val far = Profile.distributionDrift(a, b, "x", 0.0, 200.0, 10).head()
    assert(far.getDouble(4) > 0.6 && far.getDouble(4) <= math.log(2.0) + 1e-9,
      s"disjoint JSD ${far.getDouble(4)}")
    assert(far.getDouble(3) > 1.0, s"disjoint PSI ${far.getDouble(3)}")

    // mass BEYOND the bounds must register (overflow bins participate):
    // b2 == a inside the range but adds out-of-range rows -> drift > 0
    val b2 = a.unionAll((0 until 200).map(_ => Tuple1(999.0)).toDF("x"))
    val ov = Profile.distributionDrift(a, b2, "x", 0.0, 100.0, 10).head()
    assert(ov.getDouble(3) > 0.1,
      s"out-of-range drift must be counted, got PSI ${ov.getDouble(3)}")

    // smoothing: empty-vs-nonempty bins never produce infinities
    val c = Seq(Tuple1(5.0)).toDF("x")
    val sm = Profile.distributionDrift(a, c, "x", 0.0, 100.0, 10).head()
    assert(!sm.getDouble(3).isInfinite && !sm.getDouble(4).isNaN)
  }

  test("ngramDrift: identical corpora score zero; vocabulary replacement explodes; OOV mass counted") {
    val mk = (texts: Seq[String]) =>
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val a = mk(Seq.fill(20)("the quick brown fox jumps") ++
      Seq.fill(10)("lazy dogs sleep all day"))
    // identical corpora: every cell's shares agree -> exactly zero
    val same = Profile.ngramDrift(a, a, "text", n = 2, k = 10).head()
    assert(same.getDouble(7) === 0.0 && same.getDouble(8) === 0.0)
    assert(same.getInt(2) <= 10, "vocab capped at k")
    // disjoint vocabulary (the rot13/scraper-regression shape): large
    // PSI, JSD pushed toward its bound
    val b = mk(Seq.fill(20)("zzz yyy xxx www vvv") ++
      Seq.fill(10)("uuu ttt sss rrr qqq"))
    val far = Profile.ngramDrift(a, b, "text", n = 2, k = 10).head()
    assert(far.getDouble(7) > 1.0, s"disjoint PSI ${far.getDouble(7)}")
    assert(far.getDouble(8) > 0.3, s"disjoint JSD ${far.getDouble(8)}")
    // OOV accounting: every incidence outside the top-k vocab counts
    val oov = Profile.ngramDrift(a, b, "text", n = 2, k = 3).head()
    assert(oov.getLong(5) + 3 >= oov.getLong(3) - oov.getLong(5),
      "vocab of 3 must leave most incidences OOV")
    assert(oov.getLong(3) === same.getLong(3), "n_a is corpus-invariant")
    // k larger than the vocabulary: n_vocab reports the real size
    val tiny = mk(Seq("aa bb"))
    val small = Profile.ngramDrift(tiny, tiny, "text", n = 2, k = 100).head()
    assert(small.getInt(2) === 1 && small.getDouble(7) === 0.0)
  }

  test("schemaDrift: added/removed/retyped classified; agreement is empty") {
    import org.apache.spark.sql.types._
    val expected = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", DoubleType)))
    val actual = StructType(Seq(StructField("a", LongType),
      StructField("b", IntegerType), StructField("d", StringType)))
    val drift = graft.ops.Profile.schemaDrift(expected, actual)
    assert(drift === Seq(
      ("d", "added", None, Some("STRING")),
      ("c", "removed", Some("DOUBLE"), None),
      ("b", "retyped", Some("STRING"), Some("INT"))))
    assert(graft.ops.Profile.schemaDrift(expected, expected).isEmpty)
  }

  test("integrityReport: orphans counted, null FKs exempt, orphan rows returned") {
    val child = Seq((Option(1L), "a"), (Option(1L), "b"), (Option(5L), "c"),
      (Option(5L), "d"), (Option.empty[Long], "e")).toDF("fk", "payload")
    val parent = Seq((1L, "p")).toDF("pk", "x")
    val rep = Profile.integrityReport(child, Seq("fk"), parent, Seq("pk"))
      .head()
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getLong(3)) ===
      (5L, 1L, 2L, 1L))
    val bad = Profile.orphans(child, Seq("fk"), parent, Seq("pk"))
      .orderBy("payload").collect().map(_.getString(1)).toList
    assert(bad === List("c", "d"))
    // intact relation reports zero orphans
    val clean = Profile.integrityReport(
      Seq((1L, "a")).toDF("fk", "p"), Seq("fk"), parent, Seq("pk")).head()
    assert(clean.getLong(2) === 0L && clean.getLong(3) === 0L)
  }

  test("histogram state: absorb == one-shot, overflow visible, quantile interpolation") {
    def rows(r: Range) = r.map(i => Tuple1(i.toDouble)).toDF("v")
    val p = java.nio.file.Files.createTempDirectory("graft-hstate").toString
    // bounds [0, 100) x 10 bins; values -5..119 exercise both overflows
    Profile.writeHistState(rows(-5 until 40), "v", 0.0, 100.0, 10, p)
    Profile.appendHistState(rows(40 until 120), p)
    val pRef = java.nio.file.Files.createTempDirectory("graft-hstate-r").toString
    Profile.writeHistState(rows(-5 until 120), "v", 0.0, 100.0, 10, pRef)
    def snap(q: String) = Profile.readHistState(spark, q).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(snap(p) === snap(pRef), "absorbed bins diverge from one-shot")
    val s = snap(p)
    assert(s.forall(r => r._4 == 10L), "each in-range bin holds exactly 10 ints")
    assert(s.head._5 === 5L && s.head._6 === 20L, "overflows must be visible")
    // uniform 0..99 in-range: interpolated median is 50 ± numerical dust
    assert(math.abs(Profile.histQuantile(spark, p, 0.5) - 50.0) < 1.0)
    assert(Profile.histQuantile(spark, p, 0.0) === 0.0)
    // empty state -> NaN, not a crash
    val pe = java.nio.file.Files.createTempDirectory("graft-hstate-e").toString
    Profile.writeHistState(rows(0 until 0), "v", 0.0, 1.0, 4, pe)
    assert(Profile.histQuantile(spark, pe, 0.5).isNaN)
  }

  test("candidateKeys: unique non-null columns certify; nulls and dups disqualify") {
    val df = Seq((1L, Option(10), "a"), (2L, Option(20), "a"),
      (3L, None: Option[Int], "b")).toDF("id", "v", "s")
    val got = Profile.candidateKeys(df, Seq("id", "v", "s")).collect()
      .map(r => (r.getString(0), r.getBoolean(4))).toMap
    assert(got === Map("id" -> true, "v" -> false /* null */ ,
      "s" -> false /* dup  */))
  }

  test("functionalDependency: holds, violations counted, null dep skipped") {
    val df = Seq((1, "x", "p"), (1, "x", "q"), (2, "y", "p"),
      (3, null.asInstanceOf[String], "p"), (3, "z", "p"))
      .toDF("det", "dep", "other")
    // det->dep: group 1 -> {x}, group 2 -> {y}, group 3 -> {null, z} == {z}
    val ok = Profile.functionalDependency(df, Seq("det"), "dep").head()
    assert(ok.getBoolean(0) === true && ok.getLong(1) === 3L)
    // det->other: group 1 -> {p, q} violates
    val bad = Profile.functionalDependency(df, Seq("det"), "other").head()
    assert(bad.getBoolean(0) === false)
    assert(bad.getLong(2) === 1L && bad.getLong(3) === 2L)
    intercept[IllegalArgumentException] {
      Profile.functionalDependency(df, Seq("det"), "det")
    }
  }
}
