package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.Vectors
import graft.ops.Dedup

/** The fused native kernels (graft.expr.catalyst) must be bit-identical
  * to the declarative formulations they replace — that equivalence is
  * what carries oracle-parity from the (verified) HOF expressions over
  * to the fast path. */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("DotProduct kernel == aggregate(zip_with) on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
        Vectors.dot($"a", $"b").as("fast"), hofDot($"a", $"b").as("slow"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad === 0)
  }

  test("DotProduct kernel null semantics: length mismatch and null element -> null") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(Seq(1.0, 2.0), Seq(1.0)),             // length mismatch
      Row(Seq(1.0, null), Seq(1.0, 2.0)),       // null element
      Row(null, Seq(1.0)),                      // null array
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)))        // clean
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = df.select(Vectors.dot($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq === Seq(null, null, null, 11.0))
  }

  test("L2SquaredDistance kernel == HOF formulation") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextFloat()), Array.fill(32)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val bad = df.select(Vectors.l2Sq($"a", $"b").as("fast"), hof.as("slow"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad === 0)
  }

  private val unicodeEdge = Seq(
    (2000L, "Größe STRAßE über"),          // German sharp-s / umlauts
    (2001L, "数据 引擎 批处理 数据"),          // CJK tokens
    (2002L, "café CAFÉ café"),       // composed vs combining accents
    (2003L, "emoji 🚀 rocket 🚀 emoji"),
    (2004L, " nbsp separated"),  // non-breaking space is NOT \s… it is in Java regex? kept as edge
    (2005L, "tab\tand\nnewline  runs"))

  test("ShingleArray kernel == declarative shingles (incl. unicode)") {
    val rnd = new scala.util.Random(17)
    val vocab = Seq("alpha", "Beta", "GAMMA", "δέλτα", "x1", "y,z")
    val texts = (0 until 120).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")) }
    val df = (texts ++ unicodeEdge).toDF("id", "text")
    val bad = df.select(
        Dedup.shingles($"text", 3).as("fast"),
        Dedup.shinglesDeclarative($"text", 3).as("slow"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad === 0)
  }

  test("SimHash64 kernel == declarative simhash (incl. unicode)") {
    val rnd = new scala.util.Random(19)
    val vocab = Seq("the", "data", "Engine", "rocket", "号", "straße")
    val texts = (0 until 120).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(20) + 1)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")) }
    val df = (texts ++ unicodeEdge).toDF("id", "text")
    val bad = df.select(
        Dedup.simhash64($"text").as("fast"),
        Dedup.simhash64Declarative($"text").as("slow"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad === 0)
  }

  test("QuantizeInt8 kernel == declarative formulation (incl. edge vectors)") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[Tuple1[Seq[Option[Float]]]] =
      (0 until 200).map(i =>
        Tuple1(Seq.fill(64)(Option(rnd.nextFloat() * 2 - 1)))) ++
      Seq(Tuple1(Seq(Some(0f), Some(0f), Some(0f))),          // zero vector
        Tuple1(Seq.empty[Option[Float]]),                     // empty
        Tuple1(Seq(Some(-1.5f), Some(0.5f), Some(1.5f), Some(-0.5f))), // negative halves
        Tuple1(Seq(Some(1e-30f), Some(-1e-30f))),             // denormal-ish
        Tuple1(Seq(Some(1.0f), None)),                        // null element, max > 0
        Tuple1(Seq(Some(0f), None)),                          // null element, max = 0
        Tuple1(Seq[Option[Float]](None, None)))               // all-null
    val df = rows.toDF("v")
    val bad = df.select(
        Vectors.quantizeInt8($"v").as("fast"),
        Vectors.quantizeInt8Declarative($"v").as("slow"))
      .filter(not($"fast.scale" <=> $"slow.scale") || not($"fast.q" <=> $"slow.q"))
      .count()
    assert(bad === 0)
  }

  test("QuantizeInt8 kernel degrades NaN/Inf vectors to zeros instead of crashing") {
    // the ANSI declarative form THROWS (cast(NaN as tinyint) overflow)
    // whenever a non-finite element reaches the ratio — NaN even enters
    // the active branch because Spark's `>` ranks NaN above every
    // number. A single corrupt embedding would kill a corpus-wide
    // scan; the kernel quantizes such vectors to zeros and carries the
    // non-finite magnitude through the scale
    val df = Seq(
      Tuple1(Seq(Some(Float.PositiveInfinity), Some(1.0f))),
      Tuple1(Seq(Some(Float.NegativeInfinity), Some(-2.0f)))).toDF("v")
    val got = df.select(Vectors.quantizeInt8($"v").as("qz"))
      .select($"qz.scale", $"qz.q").collect()
    got.foreach { r =>
      assert(r.getFloat(0).isPosInfinity)
      assert(r.getSeq[Byte](1) === Seq[Byte](0, 0))
    }
    val nan = Seq(Tuple1(Seq(Some(1.0f), Some(Float.NaN)))).toDF("v")
      .select(Vectors.quantizeInt8($"v").as("qz"))
      .select($"qz.scale", $"qz.q").collect().head
    assert(nan.getFloat(0).isNaN)
    assert(nan.getSeq[Byte](1) === Seq[Byte](0, 0))
  }

  // The old assignment formulation nearestLists replaced: broadcast-join
  // the centroids onto every row, rank with a row_number window over
  // (csim desc, cid). Kept here as the parity reference — the kernel
  // must reproduce its ordering bit-for-bit, including the degenerate
  // orderings (NaN first, null-score centroids last, ties on cid asc).
  private def windowNearest(cents: org.apache.spark.sql.DataFrame,
                            df: org.apache.spark.sql.DataFrame,
                            n: Int, metric: String) = {
    import org.apache.spark.sql.expressions.Window
    val c = cents.select(col("cid").cast("long").as("cid"), col("cv"),
      Vectors.l2Norm(col("cv")).as("cn"))
    // cosine reference: csim DESC (NaN first, nulls last) — the shape
    // nearestLists always used. L2 reference: RAW distance ASC (NaN
    // last) — the shape the replaced PQ training window used; negating
    // would flip NaN-poisoned centroids to rank first.
    val withSim = df.withColumn("__vn", Vectors.l2Norm(col("vec")))
      .join(broadcast(c))
      .withColumn("csim", metric match {
        case "cosine" => when(col("cn") > 0,
          Vectors.dot(col("vec"), col("cv")) / (col("__vn") * col("cn")))
        case "l2" => Vectors.l2Sq(col("vec"), col("cv"))
      })
    val ord = if (metric == "cosine") col("csim").desc
      else col("csim").asc_nulls_last
    val w = Window.partitionBy(col("id")).orderBy(ord, col("cid"))
    withSim.withColumn("__r", row_number().over(w)).filter(col("__r") <= n)
      .select(col("id"), col("__r"), col("cid"))
  }

  private def kernelNearest(cents: org.apache.spark.sql.DataFrame,
                            df: org.apache.spark.sql.DataFrame,
                            n: Int, metric: String) = {
    val packed = cents.agg(collect_list(struct(
      col("cid").cast("long").as("cid"), col("cv"),
      Vectors.l2Norm(col("cv")).as("cn"))).as("__cents"))
    df.crossJoin(broadcast(packed))
      .select(col("id"), posexplode(
        Vectors.nearestCents(col("vec"), col("__cents"), n, metric))
        .as(Seq("__p", "cid")))
      .select(col("id"), (col("__p") + 1).cast("int").as("__r"), col("cid"))
  }

  test("NearestCents kernel == row_number window, both metrics, with edge rows") {
    val rnd = new scala.util.Random(23)
    val dim = 16
    // NO zero vector here: ANSI division makes the window reference
    // THROW on 0/0 under cosine — the kernel's degrade-to-NaN behavior
    // for that row is asserted separately below
    val vecs = (0 until 120).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))) ++ Seq(
      (501L, { val a = Array.fill(dim)(rnd.nextFloat()); a(3) = Float.NaN; a }))
    val df = vecs.toDF("id", "vec")
    val cents = ((0 until 7).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))) ++ Seq(
      (7L, Array.fill(dim)(0.0f)),                 // zero norm: invalid under cosine
      (8L, { val a = Array.fill(dim)(rnd.nextFloat()); a(0) = Float.NaN; a }), // NaN norm
      (9L, vecs(3)._2.clone()),                    // exact duplicate of a corpus vector
      (10L, vecs(3)._2.clone())))                  // duplicated centroid: cid tiebreak
      .toDF("cid", "cv")
    for (metric <- Seq("cosine", "l2"); n <- Seq(1, 3)) {
      val slow = windowNearest(cents, df, n, metric)
      val fast = kernelNearest(cents, df, n, metric)
      val joined = slow.withColumnRenamed("cid", "slow_cid")
        .join(fast.withColumnRenamed("cid", "fast_cid"), Seq("id", "__r"), "full")
      val total = joined.count()
      val agree = joined.filter(col("slow_cid") === col("fast_cid")).count()
      assert(total === vecs.size.toLong * n, s"$metric n=$n row count")
      assert(agree === total, s"$metric n=$n: kernel diverges from window\n" +
        joined.filter(not(col("slow_cid") <=> col("fast_cid")))
          .orderBy(col("id"), col("__r")).limit(10).collect().mkString("\n"))
    }
  }

  test("NearestCents: zero vector degrades to NaN ties (lowest cids) where ANSI division throws") {
    val dim = 4
    val df = Seq((1L, Array.fill(dim)(0.0f))).toDF("id", "vec")
    val cents = ((0 until 5).map(i => (i.toLong,
      Array.fill(dim)((i + 1).toFloat))) :+ (5L, Array.fill(dim)(0.0f)))
      .toDF("cid", "cv")
    // window reference: ANSI DIVIDE_BY_ZERO kills the scan
    val thrown = intercept[Exception] {
      windowNearest(cents, df, 3, "cosine").collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"), thrown.getMessage)
    // kernel: 0/0 = NaN for every valid centroid -> all tie -> cid asc;
    // the zero-norm CENTROID (cid 5) stays invalid and ranks last
    val got = kernelNearest(cents, df, 3, "cosine")
      .orderBy(col("__r")).collect().map(_.getLong(2))
    assert(got.toSeq === Seq(0L, 1L, 2L))
  }

  test("NearestCents l2: NaN-poisoned centroid is quarantined, never captures rows") {
    val dim = 4
    val df = (1 to 5).map(i => (i.toLong, Array.fill(dim)(i.toFloat)))
      .toDF("id", "vec")
    val nanCv = Array.fill(dim)(Float.NaN)
    val cents = Seq((0L, nanCv), (1L, Array.fill(dim)(2.0f)),
      (2L, Array.fill(dim)(4.0f))).toDF("cid", "cv")
    val packed = cents.agg(collect_list(struct(
      col("cid").cast("long").as("cid"), col("cv"),
      Vectors.l2Norm(col("cv")).as("cn"))).as("__cents"))
    val got = df.crossJoin(broadcast(packed))
      .select(col("id"),
        Vectors.nearestCents(col("vec"), col("__cents"), 1, "l2")
          .getItem(0).as("cid"))
      .orderBy(col("id")).collect().map(_.getLong(1))
    // every row lands on a REAL centroid (1 or 2); the NaN centroid
    // (cid 0, lowest id — would win every tie under NaN-first) never
    // captures anything
    assert(got.toSeq === Seq(1L, 1L, 1L, 2L, 2L), got.toSeq.toString)
  }

  test("NearestCents: null vector -> null pick list; mismatched-dim centroid ranks last") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Seq(1.0f, 0.0f)), Row(2L, null))), schema)
    val cents = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.5f, 0.5f, 0.5f))) // wrong dim: invalid, ranks behind cid 0
      .toDF("cid", "cv")
    val packed = cents.agg(collect_list(struct(
      col("cid").cast("long").as("cid"), col("cv"),
      Vectors.l2Norm(col("cv")).as("cn"))).as("__cents"))
    val got = df.crossJoin(broadcast(packed))
      .select(col("id"),
        Vectors.nearestCents(col("vec"), col("__cents"), 2, "cosine").as("picks"))
      .orderBy(col("id")).collect()
    assert(got(0).getSeq[Long](1) === Seq(0L, 1L))
    assert(got(1).isNullAt(1), "null vec must yield a null pick list")
  }

  test("MinHashSignature kernel == declarative minhash over shingles") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("the", "spark", "engine", "data", "row", "fast", "slow",
      "table", "join", "agg", "Mixed", "CASE", "punct,", "x")
    val texts = (0 until 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")) }
    // plus whitespace / short-doc / empty-ish edge cases
    val edge = Seq((1000L, "one two"), (1001L, "one"), (1002L, "  padded   text  "),
      (1003L, "a b c"), (1004L, "A  B\tC d"))
    val df = (texts ++ edge).toDF("id", "text")
    val k = 6
    val slow = array((0 until k).map(i =>
      Dedup.minhash(Dedup.shinglesDeclarative($"text", 3), i)): _*)
    val bad = df.select(
        Dedup.minhashSignature($"text", 3, k).as("fast"), slow.as("slow"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad === 0)
  }

  test("DecodeEntities kernel == declarative single-pass decode (incl. numeric refs, edge pieces)") {
    // every decode shape in one fixture set: named tiers, decimal/hex
    // refs, escaped forms, surrogates/overflow/malformed (stay
    // literal), boundary run lengths (6 digits ok / 7 not; 5 hex ok /
    // 6 not), lone and trailing '&', consecutive '&&', empty string,
    // and the synthetic q_html_extract page itself
    val cases = Seq(
      "", "&", "a&", "&&", "a&&b", "plain text",
      "it&#8217;s &#x2019;ok&#x2019;",
      "a &mdash; b &hellip; c &ndash; d &lsquo;s&rsquo; &ldquo;q&rdquo;",
      "&amp;lt;b&amp;gt; &#38;amp; &apos;x&apos; &nbsp;end",
      "&#65535; &#65536; &#0; &#55296; &#57343; &#57344;",
      "&#999999; &#1000000; &#x20; &#xfffff; &#x10000; &#xD800;",
      "&#; &#x; &#xZ; &bogus; &ampx; &lt &lt;",
      "a&#10;b&#9;c &#039; &#x0041;")
    val d = schema.Tables.load(spark, sfDir, "documents").limit(50)
      .select(concat(lit("<p>doc "), $"doc_id",
        lit(" &amp; &#8217; body</p><nav>x</nav>"), $"text").as("s"))
      .unionByName(cases.toDF("s"))
      .unionByName(Seq(Tuple1(null: String)).toDF("s"))
    val bad = d.select(
        graft.ops.Curation.decodeEntities($"s").as("fast"),
        graft.ops.Curation.decodeEntitiesDeclarative($"s").as("slow"))
      .filter(not($"fast" <=> $"slow"))
    assert(bad.count() === 0, bad.collect().mkString("\n"))
  }

}
