package graft

import org.apache.spark.sql.functions._

import graft.expr.{Text, Vectors}

/** Text-analysis expression semantics + vector/ANN quality. */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  /** Manifest-resolved absolute segment dirs of one layout component. */
  private def segDirs(p: String, comp: String): Seq[String] =
    graft.ops.IndexManifest.pin(spark, p).segments(comp).map(s => s"$p/${s.dir}")

  /** The component's logical frame (segments unioned, excludes applied). */
  private def compDf(p: String, comp: String,
                     bucket: String = null): org.apache.spark.sql.DataFrame =
    graft.ops.IndexManifest.pin(spark, p).read(spark, comp, Option(bucket)).get

  /** parquet file names per bucket dir under one segment directory. */
  private def bucketFiles(segDir: String): Map[String, Set[String]] =
    new java.io.File(segDir).listFiles()
      .filter(f => f.isDirectory && f.getName.contains("="))
      .map(d => d.getName ->
        d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
      .toMap

  test("tokens/tokenCount: whitespace runs, empty string") {
    val df = Seq("one two  three", "", "  padded  ", "a\tb\nc").map(Tuple1(_)).toDF("t")
    val got = df.select(Text.tokenCount($"t")).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(3, 0, 1, 3))
  }

  test("subwordCount splits words, digits, punct runs") {
    val df = Seq(Tuple1("hello, world42!")).toDF("t")
    // hello | , | world | 4 | 2 | !
    assert(df.select(Text.subwordCount($"t")).first().getInt(0) === 6)
  }

  test("langId identifies stopword-bearing sentences; und on no evidence") {
    val df = Seq(
      ("en", "the cat sat on the mat and it was happy"),
      ("de", "der hund ist nicht mit der katze"),
      ("fr", "le chat est dans la maison pour le moment"),
      ("es", "el gato es una mascota en la casa"),
      ("und", "zzz qqq xxx")).toDF("expected", "text")
    val got = df.select($"expected", Text.langId($"text")).collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0), r.toString))
  }

  test("langId: a hit-count tie is ambiguity -> und, not the greatest lang string") {
    // 'the' hits en; 'que' hits BOTH fr and es -> three-way tie at 1
    val tied = Seq(Tuple1("the que zzz")).toDF("text")
      .select(Text.langId($"text")).head().getString(0)
    assert(tied === "und", s"tie must yield und, got $tied")
  }

  test("fingerprint64 is whitespace/case insensitive") {
    val df = Seq(("A  b\tC", "a b c"), ("x y", "x  z")).toDF("t1", "t2")
    val got = df.select(
      (Text.fingerprint64($"t1") === Text.fingerprint64($"t2")).as("eq")).collect()
    assert(got(0).getBoolean(0) === true)
    assert(got(1).getBoolean(0) === false)
  }

  test("qualityScore in [0,1]; prose scores above punct noise") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and it was a good day for running in the park with friends",
      "#$%^& !!! ??? ### @@@ %%%").toDF("t")
    val got = df.select(Text.qualityScore($"t")).collect().map(_.getDouble(0))
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("cosine: self-similarity 1.0, orthogonal 0.0, zero vector null") {
    val df = Seq(
      (Array(1.0f, 0f, 2f), Array(1.0f, 0f, 2f)),
      (Array(1.0f, 0f, 0f), Array(0f, 1.0f, 0f)),
      (Array(0f, 0f, 0f), Array(1.0f, 0f, 0f))).toDF("a", "b")
    val got = df.select(Vectors.cosine($"a", $"b")).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(got(1).getDouble(0) === 0.0)
    assert(got(2).isNullAt(0))
  }

  test("lshBucket: deterministic, in [0, 2^nBits)") {
    val df = schema.Tables.load(spark, sfDir, "embeddings")
    val b1 = df.select($"vec_id", Vectors.lshBucket($"embedding", 8).as("b"))
    val buckets = b1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets.values.forall(b => b >= 0 && b < 256))
    val b2 = b1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets === b2)
  }

  test("lshBuckets kernel: table 0 of 1×nBits == declarative lshBucket") {
    val e = schema.Tables.load(spark, sfDir, "embeddings").limit(100)
    val bad = e.select(
        Vectors.lshBucket($"embedding", 6).as("slow"),
        element_at(Vectors.lshBuckets($"embedding", 6, 1), 1).as("fast"))
      .filter(not($"fast" <=> $"slow")).count()
    assert(bad === 0)
  }

  test("lshBuckets kernel: null-element and empty vectors bucket 0, like the declarative form") {
    // declarative: a null element nulls the projection and an empty
    // vector has a null fold — both fall to bit 0; the kernel must not
    // read null slots as 0.0 (hash-dependent buckets) or set all bits
    // on empty (2^nBits - 1)
    val rows = Seq(
      (1L, Seq[java.lang.Float](1.0f, null, 0.5f)),
      (2L, Seq.empty[java.lang.Float]),
      (3L, Seq[java.lang.Float](1.0f, -2.0f, 0.5f)))
    val df = spark.createDataFrame(rows).toDF("id", "vec")
    val rowsOut = df.select($"id",
        Vectors.lshBucket($"vec", 4).as("slow"),
        element_at(Vectors.lshBuckets($"vec", 4, 1), 1).as("fast"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    rowsOut.foreach { case (id, slow, fast) =>
      assert(slow === fast, s"kernel/declarative divergence for id $id")
    }
    assert(rowsOut.filter(_._1 != 3L).forall(r => r._2 === 0),
      "degenerate vectors must bucket 0")
  }

  private def annGround(k: Int): (org.apache.spark.sql.DataFrame, Map[Long, Set[Long]]) = {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val brute = graft.ops.Ann.bruteTopK(e.filter($"id" < 20), e, k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    (e, brute)
  }

  test("multi-table LSH ANN: recall@5 well above single-probe, candidates pruned") {
    val (e, brute) = annGround(5)
    val lsh = graft.ops.Ann.lshTopK(e.filter($"id" < 20), e, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      lsh.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.4, s"mean LSH recall@5 = $mean")
  }

  test("IVF-Flat ANN: recall@5 on clustered fixture embeddings") {
    val (e, brute) = annGround(5)
    val ivf = graft.ops.Ann.ivfTopK(e.filter($"id" < 20), e, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      ivf.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.4, s"mean IVF recall@5 = $mean")
  }

  test("quantizeInt8: reconstruction error bounded by half a quantization step") {
    val e = schema.Tables.load(spark, sfDir, "embeddings").limit(50)
    val bad = e.select($"embedding".as("v"), Vectors.quantizeInt8($"embedding").as("qz"))
      .select(explode(arrays_zip($"v", $"qz.q")).as("z"), $"qz.scale")
      .select(($"z.v".cast("double") - $"scale" * $"z.q".cast("double")).as("err"), $"scale")
      // round-to-nearest: |v - scale·q| ≤ scale/2 (+ float eps slack)
      .filter(abs($"err") > $"scale" * 0.5 + 1e-6)
      .count()
    assert(bad === 0)
    // zero vector: scale 0, all-zero q
    val z = Seq(Tuple1(Array(0f, 0f, 0f))).toDF("v")
      .select(Vectors.quantizeInt8($"v").as("qz"))
      .select($"qz.scale", $"qz.q").collect().head
    assert(z.getFloat(0) === 0f && z.getSeq[Byte](1) === Seq[Byte](0, 0, 0))
  }

  test("quantizedTopK with exhaustive rerank == bruteTopK exactly") {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val n = e.count().toInt
    val brute = graft.ops.Ann.bruteTopK(e.filter($"id" < 8), e, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // rerankFactor covering the whole corpus: the approximate stage
    // cannot drop anyone, so exact rerank must reproduce brute force
    val quant = graft.ops.Ann.quantizedTopK(e.filter($"id" < 8), e, 5,
        rerankFactor = n / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(quant === brute)
  }

  test("signPack kernel == declarative HOF twin; hamming counts sign mismatches") {
    import graft.expr.Vectors
    // 70 dims forces a 2-word packing (the word-boundary path); values
    // cross zero so both strict-positive branches are exercised
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(70)(j =>
        if ((i + j) % 7 == 0) 0.0f else (rnd.nextFloat() - 0.5f))))
    val df = vecs.toDF("id", "vec")
    val packed = df.select($"id", Vectors.signPack($"vec").as("k"),
        Vectors.signPackDeclarative($"vec").as("d"))
      .collect()
    packed.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"kernel/declarative divergence at id ${r.getLong(0)}")
    }
    // hamming == per-coordinate sign-mismatch count (zero packs as 0)
    val hd = df.as("a").crossJoin(df.as("b"))
      .filter($"a.id" < 3 && $"b.id" < 3)
      .select($"a.id", $"b.id",
        Vectors.hamming(Vectors.signPack($"a.vec"), Vectors.signPack($"b.vec"))
          .as("hd"),
        size(filter(zip_with($"a.vec", $"b.vec",
          (x, y) => (x > 0) =!= (y > 0)), p => p)).cast("long").as("want"))
      .collect()
    hd.foreach(r => assert(r.getLong(2) === r.getLong(3)))
    // self-distance 0; null element -> null pack IN BOTH FORMS
    assert(hd.filter(r => r.getLong(0) == r.getLong(1)).forall(_.getLong(2) == 0L))
    val nulled = transform($"vec", x => when(isnan(x), lit(null)).otherwise(x))
    val withNull = Seq((1L, Array(1.0f, Float.NaN))).toDF("id", "vec")
      .select(Vectors.signPack(nulled).as("p"),
        Vectors.signPackDeclarative(nulled).as("d")).head()
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
    // empty vector -> EMPTY word array in both forms (the declarative
    // twin must not let sequence(0, -1) fabricate a descending range)
    val empty = Seq(Tuple1(Array.empty[Float])).toDF("vec")
      .select(Vectors.signPack($"vec").as("p"),
        Vectors.signPackDeclarative($"vec").as("d")).head()
    assert(empty.getSeq[Long](0).isEmpty && empty.getSeq[Long](1).isEmpty)
    // NaN packs as 0 in BOTH forms (Catalyst '>' ranks NaN above every
    // number; the kernel's Java compare is false for NaN — the twin
    // must not set a phantom sign bit)
    val nan = Seq(Tuple1(Array(Float.NaN, 1.0f, -1.0f))).toDF("vec")
      .select(Vectors.signPack($"vec").as("p"),
        Vectors.signPackDeclarative($"vec").as("d")).head()
    assert(nan.getSeq[Long](0) === Seq(2L), s"kernel NaN pack: $nan")
    assert(nan.getSeq[Long](1) === Seq(2L), s"declarative NaN pack: $nan")
  }

  test("binaryTopK with exhaustive rerank == bruteTopK exactly") {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val n = e.count().toInt
    val brute = graft.ops.Ann.bruteTopK(e.filter($"id" < 8), e, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bin = graft.ops.Ann.binaryTopK(e.filter($"id" < 8), e, 5,
        rerankFactor = n / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(bin === brute)
  }

  test("quantizedTopK at rerankFactor=4: high recall vs brute force") {
    val (e, brute) = annGround(5)
    val got = graft.ops.Ann.quantizedTopK(e.filter($"id" < 20), e, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      got.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.9, s"mean int8 recall@5 = $mean")
  }

  test("persisted IVF index: partition-pruned probe == in-memory ivfTopK") {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = e.filter($"id" < 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    graft.ops.Ann.writeIvfIndex(e, path, nLists = 16)

    // one directory per list on disk, inside the manifest's live segment
    val listSeg = segDirs(path, "lists") match { case Seq(one) => one }
    val listDirs = new java.io.File(listSeg).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(listDirs.length == 16, s"expected 16 list dirs, got ${listDirs.length}")

    val probed = graft.ops.Ann.probeIvfIndex(queries, path, k = 5, nProbe = 4)
    // the lists scan must prune to the probed lists at PLANNING time —
    // a partition filter on cid, not a post-scan filter
    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // root whose children aren't visible to collect() before execution
    val scans = probed.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lists")) => s
    }
    assert(scans.nonEmpty, "no file scan over the lists layout found")
    // keep only the statically-evaluable conjuncts: the join also earns
    // a DynamicPruningSubquery here, which listFiles cannot evaluate
    val staticFilters = scans.head.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(staticFilters.nonEmpty,
      s"lists scan has no static partition filters:\n${scans.head}")
    val prunedParts = scans.map(_.relation.location
      .listFiles(staticFilters, Nil).length).max
    assert(prunedParts < 16, s"probe read $prunedParts of 16 partitions — no pruning")

    // identical answers to the in-memory path with the same centroids
    val cents = graft.ops.Ann.readIvfCentroids(spark, path)
    val mem = graft.ops.Ann.ivfTopK(queries, e, k = 5, nProbe = 4,
        centroidsOverride = Some(cents))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = probed.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === mem)
  }

  test("IVF index append: equals rebuild; stored segment keeps its exact files") {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val corpus = e.filter($"id" % 5 =!= 0)
    val batch = e.filter($"id" % 5 === 0)
    val pApp = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    val pFull = java.nio.file.Files.createTempDirectory("graft-ivf-appf").toString
    graft.ops.Ann.writeIvfIndex(corpus, pApp, nLists = 16, trainIters = 2)

    // the append lands in a NEW segment — the stored segment's files
    // are byte-stable (probes pinned mid-append are unaffected)
    val storedSeg = segDirs(pApp, "lists") match { case Seq(one) => one }
    val before = bucketFiles(storedSeg)
    graft.ops.Ann.appendToIvfIndex(batch, pApp)
    assert(bucketFiles(storedSeg) === before,
      "append must never rewrite a stored segment")
    val segsAfter = segDirs(pApp, "lists")
    assert(segsAfter.size === 2 && segsAfter.head === storedSeg,
      s"append must add exactly one new list segment: $segsAfter")
    // the new segment holds exactly the batch rows
    assert(spark.read.parquet(segsAfter(1)).count() === batch.count())

    // every corpus+batch row is in the logical lists exactly once
    assert(compDf(pApp, "lists", "cid").count() === e.count())

    // probes against the appended layout == a from-scratch rebuild over
    // corpus ∪ batch with the same centroids, triple for triple
    val cents = graft.ops.Ann.readIvfCentroids(spark, pApp)
    graft.ops.Ann.writeIvfIndex(e, pFull, nLists = 16,
      centroidsOverride = Some(cents))
    val qs = e.filter($"id" < 8)
    def triples(p: String) =
      graft.ops.Ann.probeIvfIndex(qs, p, k = 5, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(triples(pApp) === triples(pFull))

    // compaction consolidates the two segments into one; probe answers
    // are unchanged and a second compact is a no-op
    assert(graft.ops.Ann.compactIvfIndex(spark, pApp) === 1)
    assert(segDirs(pApp, "lists").size === 1)
    assert(triples(pApp) === triples(pFull),
      "compaction must not change probe answers")
    assert(graft.ops.Ann.compactIvfIndex(spark, pApp) === 0)
  }

  test("persisted BM25 index: partition-pruned probe == ad-hoc scoring bit-for-bit") {
    val d = schema.Tables.load(spark, sfDir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-idx").toString
    graft.ops.TextIndex.writeBm25Index(d, "doc_id", "text", path, nBuckets = 16)
    val postSeg = segDirs(path, "postings") match { case Seq(one) => one }
    val tbDirs = new java.io.File(postSeg).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("tb="))
    assert(tbDirs.nonEmpty && tbDirs.length <= 16)

    val probed = graft.ops.TextIndex.probeBm25Index(spark, path,
      Seq("hash", "join", "stream"))
    // the postings scan must prune to the query terms' buckets at
    // PLANNING time (same pruned-probe contract as the IVF index)
    val scans = probed.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(scans.nonEmpty, "no file scan over the postings layout found")
    val staticFilters = scans.head.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(staticFilters.nonEmpty,
      s"postings scan has no static partition filters:\n${scans.head}")
    val prunedParts = scans.map(_.relation.location
      .listFiles(staticFilters, Nil).length).max
    assert(prunedParts <= 3,
      s"3-term probe read $prunedParts term buckets — no pruning")

    // the indexed query must reproduce the ad-hoc q_bm25 head exactly
    // (incl. score_r9 — same formula, same fixed-order summation)
    val adhoc = SparkEntry.queries("q_bm25")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val indexed = SparkEntry.queries("q_bm25_index")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(indexed === adhoc)
    assert(adhoc.nonEmpty)
  }

  test("IVF-SQ8 index: tinyint lists, smaller than float layout, recall holds") {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val dirF = java.nio.file.Files.createTempDirectory("graft-ivf-f").toString
    val dirQ = java.nio.file.Files.createTempDirectory("graft-ivf-q8").toString
    graft.ops.Ann.writeIvfIndex(e, dirF, nLists = 16)
    graft.ops.Ann.writeIvfIndexSq8(e, dirQ, nLists = 16)

    // the stored list vectors are int8
    val listSchema = compDf(dirQ, "lists", "cid").schema
    assert(listSchema("nq").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true))
    def bytesUnder(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    val (fb, qb) = (bytesUnder(segDirs(dirF, "lists").head),
      bytesUnder(segDirs(dirQ, "lists").head))
    assert(qb < fb * 0.6, s"sq8 lists $qb bytes vs float $fb — expected a real shrink")

    // quantized-probe recall vs brute force on the fixture
    val brute = graft.ops.Ann.bruteTopK(e.filter($"id" < 20), e, 5)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val got = graft.ops.Ann.probeIvfIndexSq8(e.filter($"id" < 20), dirQ, k = 5)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      got.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.4, s"mean IVF-SQ8 recall@5 = $mean")
  }

  /** Planted-cluster fixture ADVERSARIAL for first-K seeding: 3
    * orthogonal clusters (one-hot centers e0/e1/e2), id→cluster chosen
    * so the first-3-by-id seed covers only clusters {0, 0, 1} — cluster
    * 2 gets no seed. Cluster-2 members carry a ±0.35 bias toward e0
    * (even ids) or e1 (odd ids), so under the degenerate seed the
    * cluster SPLITS across lists (evens land with cluster 0, odds with
    * cluster 1) and single-probe recall cannot reach 1; Lloyd
    * iterations must discover an e2-dominant centroid to reunite it. */
  private def plantedClusters(): org.apache.spark.sql.DataFrame = {
    val dim = 8
    val rows = (0L until 90L).map { id =>
      val cluster = if (id < 2) 0 else if (id == 2) 1 else (id % 3).toInt
      val biasDim = if (id % 2 == 0) 0 else 1
      val vec = Array.tabulate(dim) { d =>
        val base = if (d == cluster) 1.0f else 0.0f
        val bias = if (cluster == 2 && d == biasDim) 0.35f else 0.0f
        base + bias + ((id * 31 + d * 7) % 11 - 5).toFloat / 100.0f
      }
      (id, vec)
    }
    spark.createDataFrame(rows).toDF("id", "vec")
  }

  /** coverage(c) = best cosine between any centroid and cluster c's
    * true center — how well a centroid set represents the clusters. */
  private def minCoverage(cents: org.apache.spark.sql.DataFrame): Double = {
    val vecs = cents.collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    (0 until 3).map { c =>
      vecs.map { v =>
        v(c) / math.sqrt(v.map(x => x * x).sum)
      }.max
    }.min
  }

  test("trainCentroids: Lloyd iterations beat first-K seeding on planted clusters") {
    val e = plantedClusters()
    val queries = e.filter($"id" >= 80)  // last 10 ids, all 3 clusters
    def recallOf(ivf: org.apache.spark.sql.DataFrame): Double = {
      val brute = graft.ops.Ann.bruteTopK(queries, e, 5)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val got = ivf.collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val r = brute.map { case (q, nn) =>
        got.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
      r.sum / r.size
    }
    // the centroid set itself: training must lift the worst-covered
    // cluster (the seed leaves cluster 2 at bias level ~0.35)
    val covSeed = minCoverage(graft.ops.Ann.seedCentroids(e, 3))
    val covTrained = minCoverage(graft.ops.Ann.trainCentroids(e, 3, iters = 3))
    assert(covTrained > covSeed + 0.2,
      s"trained min-coverage $covTrained vs seeded $covSeed")
    // end-to-end: single-probe recall with trained centroids beats the
    // degenerate seed that splits cluster 2 across lists
    val seeded = recallOf(graft.ops.Ann.ivfTopK(queries, e, 5,
      nLists = 3, nProbe = 1))
    val trained = recallOf(graft.ops.Ann.ivfTopK(queries, e, 5,
      nLists = 3, nProbe = 1, trainIters = 3))
    assert(trained >= seeded,
      s"trained recall $trained < seeded recall $seeded")
    assert(trained >= 0.85, s"trained recall@5 = $trained")
  }

  test("semDedup: exact duplicates collapse to one prototypical copy; keepers clean") {
    // 3 orthogonal clusters interleaved by id (so the first-K seed
    // spreads across clusters), each member carrying a distinct
    // deterministic 5-dim jitter; ids 101-103 are an EXACT triplicate
    // of the pure cluster-0 axis. Identical vectors always co-cluster
    // (deterministic cid tie-break) and tie on cent_sim, so the lowest
    // id must survive and the other two must drop.
    val dim = 8
    def member(id: Long): Array[Float] = {
      val v = Array.fill(dim)(0.0f)
      v((id % 3).toInt) = 1.0f
      for (d <- 0 until 5)
        v(3 + d) = 0.02f * (((id * 7 + d * 13) % 61) - 30)
      v
    }
    val pure0 = { val v = Array.fill(dim)(0.0f); v(0) = 1.0f; v }
    val rows = (1L to 60L).map(id => (id, member(id))) ++
      Seq((101L, pure0), (102L, pure0), (103L, pure0))
    val vecs = spark.createDataFrame(rows).toDF("id", "vec")
    val thr = 0.999
    // fixture sanity: no accidental near-dups among the jittered members
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dp / (math.sqrt(a.map(x => x.toDouble * x).sum) *
            math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val members = (1L to 60L).map(id => id -> member(id))
    val maxNonDup = (for {
      (ia, va) <- members; (ib, vb) <- members if ia < ib
    } yield cos(va, vb)).max
    assert(maxNonDup < thr, s"fixture has accidental near-dup: $maxNonDup")

    val out = graft.ops.Ann.semDedup(vecs, k = 3, threshold = thr, iters = 3)
    val byId = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(byId.size === 63)
    assert(byId(101L)._2 && !byId(102L)._2 && !byId(103L)._2,
      s"triplicate resolution wrong: ${byId.view.filterKeys(_ > 100L).toMap}")
    // only the planted duplicates drop; every jittered member survives
    assert((1L to 60L).forall(byId(_)._2),
      s"non-duplicate dropped: ${byId.filter(e => !e._2._2).keys.toSeq.sorted}")
    // identical vectors landed in one cluster
    assert(Set(byId(101L)._1, byId(102L)._1, byId(103L)._1).size === 1)
  }

  test("semDedup: maxCluster cap keeps oversized clusters whole") {
    val dim = 4
    val v = Array.fill(dim)(1.0f)
    val rows = (1L to 20L).map(id => (id, v))  // one identical blob
    val vecs = spark.createDataFrame(rows).toDF("id", "vec")
    val capped = graft.ops.Ann.semDedup(vecs, k = 2, threshold = 0.9,
      iters = 1, maxCluster = 5)
    assert(capped.filter(!org.apache.spark.sql.functions.col("keep")).count() === 0L,
      "capped cluster must not generate pairs")
    val uncapped = graft.ops.Ann.semDedup(vecs, k = 2, threshold = 0.9, iters = 1)
    assert(uncapped.filter(org.apache.spark.sql.functions.col("keep")).count() === 1L,
      "identical blob must collapse to a single keeper")
  }

  test("semDedup: autoScaleK sizes k to ceil(sqrt(n)), never below k, and override wins") {
    // 64 distinct near-orthogonal vectors -> n=64, ceil(sqrt(64))=8:
    // with autoScaleK the output must use MORE clusters than the
    // passed k=2 (at least 3 distinct cids among 64 spread vectors),
    // and a centroidsOverride must bypass the scaling entirely.
    val dim = 8
    val rows = (0L until 64L).map { id =>
      val v = Array.fill(dim)(0.05f)
      v((id % dim).toInt) = 1.0f + 0.01f * (id / dim)
      (id, v)
    }
    val vecs = spark.createDataFrame(rows).toDF("id", "vec")
    val scaled = graft.ops.Ann.semDedup(vecs, k = 2, threshold = 0.999,
      iters = 2, autoScaleK = true)
    val nCids = scaled.select("cid").distinct().count()
    assert(nCids > 2L && nCids <= 8L,
      s"autoScaleK should target ceil(sqrt(64))=8 clusters, got $nCids")
    // floor: autoScaleK never shrinks k below the caller's value.
    // 4 vectors in 3 orthogonal directions (ids 0,1,2 seed the 3
    // centroids; id 3 duplicates direction 0): with the k=3 floor
    // honored, all 3 centroids claim a member — EXACTLY 3 distinct
    // cids. If the floor regressed to ceil(sqrt(4))=2, at most 2
    // centroids exist and the count drops.
    val smallRows = Seq(0L, 1L, 2L, 3L).map { id =>
      val v = Array.fill(dim)(0.0f); v((id % 3).toInt) = 1.0f; (id, v)
    }
    val small = spark.createDataFrame(smallRows).toDF("id", "vec")
    val floored = graft.ops.Ann.semDedup(small, k = 3, threshold = 0.999,
      iters = 1, autoScaleK = true)
    assert(floored.select("cid").distinct().count() === 3L,
      "k=3 floor must survive autoScaleK at n=4")
    // sampled training (active once n > 32*ceil(sqrt(n))): every input
    // row must still appear exactly once in the OUTPUT — the sample
    // feeds Lloyd only, never the assignment pass
    val big = spark.createDataFrame((0L until 2048L).map { id =>
      val v = Array.fill(dim)(0.05f); v((id % dim).toInt) = 1.0f; (id, v)
    }).toDF("id", "vec")
    val sampled = graft.ops.Ann.semDedup(big, k = 2, threshold = 0.999,
      iters = 1, autoScaleK = true)
    assert(sampled.count() === 2048L, "sampling must not drop output rows")
    assert(sampled.select("id").distinct().count() === 2048L)
    // override: explicit centroids disable the n-derived k entirely
    val cents = vecs.limit(1).select(
      org.apache.spark.sql.functions.lit(0L).as("cid"),
      org.apache.spark.sql.functions.col("vec").as("cv"))
    val overridden = graft.ops.Ann.semDedup(vecs, k = 2, threshold = 0.999,
      iters = 1, centroidsOverride = Some(cents), autoScaleK = true)
    assert(overridden.select("cid").distinct().count() === 1L,
      "centroidsOverride must win over autoScaleK")
  }

  test("nearDupPairsLsh: planted oversized bucket emits no pairs, bucket rows carry only ids") {
    // 40 identical all-ones vectors: same bucket in every LSH table ->
    // one giant bucket that must be dropped by the maxBucket backstop;
    // ids 1/2 are a genuine near-dup pair in a distinct direction
    val dim = 8
    val rows =
      Seq((1L, Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.01f)),
          (2L, Array.tabulate(dim)(d => if (d == 0) 0.98f else 0.012f))) ++
      (100L until 140L).map(id => (id, Array.fill(dim)(1.0f)))
    val vecs = spark.createDataFrame(rows).toDF("id", "vec")
    val pairs = graft.ops.Ann.nearDupPairsLsh(vecs, threshold = 0.9, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)) || pairs.contains((1L, 2L)),
      s"true near-dup pair missing from $pairs")
    assert(!pairs.exists { case (a, b) => a >= 100L || b >= 100L },
      s"oversized bucket leaked pairs: $pairs")
    // raising the cap re-admits the planted bucket's pairs
    val uncapped = graft.ops.Ann.nearDupPairsLsh(vecs, threshold = 0.9, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } === 40 * 39 / 2)
  }

  test("nearDupPairsLsh: corpus-aware bucket sizing keeps near-dups, spreads the corpus") {
    // 400 spread-out vectors + one planted near-identical pair. With
    // targetOccupancy the hyperplane count grows with the corpus
    // (sf1-smoke lesson: fixed 2^4 buckets/table go quadratic), and the
    // near-identical pair must STILL be found — the multi-table OR
    // construction is the recall hedge deeper bucketing relies on.
    val dim = 8
    val rnd = new scala.util.Random(31)
    val spread = (100L until 500L).map { id =>
      val v = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      (id, v)
    }
    val planted = Seq(
      (1L, Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.01f)),
      (2L, Array.tabulate(dim)(d => if (d == 0) 0.99f else 0.011f)))
    val vecs = spark.createDataFrame(planted ++ spread).toDF("id", "vec")
    val auto = graft.ops.Ann.nearDupPairsLsh(vecs, threshold = 0.98,
        targetOccupancy = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.contains((2L, 1L)) || auto.contains((1L, 2L)),
      s"planted near-dup lost under deeper bucketing: $auto")
    // same answer set as the fixed-shallow default on this corpus
    val shallow = graft.ops.Ann.nearDupPairsLsh(vecs, threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(shallow),
      "deeper bucketing must only prune candidates, never invent pairs")
  }

  test("trainCentroids: output schema matches seed (float vectors), empty lists survive") {
    val e = plantedClusters()
    val trained = graft.ops.Ann.trainCentroids(e, nLists = 3, iters = 2)
    assert(trained.columns.toSeq === Seq("cid", "cv"))
    assert(trained.schema("cv").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ===
      org.apache.spark.sql.types.FloatType)
    assert(trained.count() === 3)
  }

  test("IVF tombstone deletes: probes exclude immediately; purge reclaims and preserves answers") {
    import spark.implicits._
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val p = java.nio.file.Files.createTempDirectory("graft-ivf-tomb").toString
    graft.ops.Ann.writeIvfIndex(e, p, nLists = 16, trainIters = 2)
    val qs = e.filter($"id" < 8)
    def probeIds() = graft.ops.Ann.probeIvfIndex(qs, p, k = 5, nProbe = 4)
      .select($"qid", $"rank", $"nid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val before = probeIds()
    assert(before.exists(_._3 % 5 == 0), "fixture must rank some to-be-deleted ids")

    graft.ops.Ann.deleteFromIvfIndex(
      e.filter($"id" % 5 === 0).select($"id".as("nid")), p)
    val logical = probeIds()
    assert(logical.forall(_._3 % 5 != 0), "tombstoned ids surfaced in a probe")

    // purge: same probe answers, tombstone component emptied, logical
    // list rows reduced by exactly the tombstoned set
    val nBefore = compDf(p, "lists", "cid").count()
    val touched = graft.ops.Ann.purgeIvfTombstones(spark, p)
    assert(touched > 0)
    assert(segDirs(p, "tombstones").isEmpty,
      "purge must empty the tombstone component")
    assert(probeIds() === logical, "purge changed probe answers")
    val nAfter = compDf(p, "lists", "cid").count()
    assert(nAfter === nBefore - e.filter($"id" % 5 === 0).count(),
      "purge must drop exactly the tombstoned rows")
    // purging again is a no-op
    assert(graft.ops.Ann.purgeIvfTombstones(spark, p) === 0)
    // vacuum reclaims the superseded segments; probes stay correct
    val dropped = graft.ops.Ann.vacuumIvfIndex(spark, p)
    assert(dropped.nonEmpty, "purge must leave something for vacuum")
    assert(probeIds() === logical, "vacuum changed probe answers")
  }

  test("purge that empties a cell: cell logically gone, probe == rebuild over survivors") {
    import spark.implicits._
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val p = java.nio.file.Files.createTempDirectory("graft-ivf-empty").toString
    graft.ops.Ann.writeIvfIndex(e, p, nLists = 16, trainIters = 2)
    // tombstone EVERY member of one occupied cell (plus nothing else),
    // so the purge must erase that cell from the logical view
    val lists = compDf(p, "lists", "cid")
    val victim = lists.select($"cid").distinct()
      .orderBy($"cid").limit(1).head().getLong(0)
    // materialize the victim ids BEFORE the purge commits a new
    // manifest — a lazy frame over the pre-purge snapshot would read
    // stale state afterwards
    val victimIds = lists.filter($"cid" === victim)
      .select($"nid").collect().map(_.getLong(0)).toSeq
    assert(victimIds.nonEmpty)
    val victims = victimIds.map(Tuple1(_)).toDF("nid")
    graft.ops.Ann.deleteFromIvfIndex(victims, p)
    assert(graft.ops.Ann.purgeIvfTombstones(spark, p) >= 1)
    assert(compDf(p, "lists", "cid").filter($"cid" === victim).count() === 0L,
      "fully-tombstoned cell still has logical rows")
    assert(compDf(p, "lists", "cid")
      .filter($"nid".isin(victimIds: _*)).count() === 0L,
      "tombstoned rows outlived the purge")

    // probe-triple equality against a FROM-SCRATCH rebuild over the
    // surviving corpus with the same stored centroids — the purged
    // layout must be indistinguishable from never having indexed the
    // deleted rows
    val cents = graft.ops.Ann.readIvfCentroids(spark, p)
    val pRef = java.nio.file.Files.createTempDirectory("graft-ivf-emptyref").toString
    val survivors = e.join(victims.withColumnRenamed("nid", "id"), Seq("id"), "left_anti")
    graft.ops.Ann.writeIvfIndex(survivors, pRef, nLists = 16,
      centroidsOverride = Some(cents))
    val qs = e.filter($"id" < 8)
    def triples(path: String) = graft.ops.Ann.probeIvfIndex(qs, path, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(triples(p) === triples(pRef),
      "purged index diverges from a rebuild over the survivors")
  }

  test("hardNegatives: positives dropped, survivors re-ranked from 1, self excluded") {
    import spark.implicits._
    // 2-dim vectors on a fan: sim to q=(1,0) strictly decreases in id
    def v(i: Int): Array[Float] = Array(1.0f, i * 0.1f)
    val corpus = (0 to 6).map(i => (i.toLong, v(i))).toDF("id", "vec")
    val qs = corpus.filter($"id" === 0L)
    // positives: the truest match (id 1) and a mid-rank one (id 3)
    val pos = Seq((0L, 1L), (0L, 3L)).toDF("qid", "pos_id")
    val got = graft.ops.Ann.hardNegatives(qs, pos, corpus, k = 2,
        posPerQueryBound = 2)
      .orderBy("neg_rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // true order by sim: 1,2,3,4,5,6; drop positives {1,3} -> 2,4
    assert(got.toSeq === Seq((1L, 2L), (2L, 4L)))
  }

  test("hardNegativesIndexed: full-coverage probe mines identically to the brute path") {
    import spark.implicits._
    // same fan fixture as the brute test; the index probes BOTH of its
    // 2 seeded lists, so the candidate set is complete and the mined
    // (qid, neg_rank, nid, sim) rows must equal hardNegatives row for
    // row — the docstring's "swap the retrieval stage" claim as code
    def v(i: Int): Array[Float] = Array(1.0f, i * 0.1f)
    val corpus = (0 to 6).map(i => (i.toLong, v(i))).toDF("id", "vec")
    val qs = corpus.filter($"id" === 0L)
    val pos = Seq((0L, 1L), (0L, 3L)).toDF("qid", "pos_id")
    val p = java.nio.file.Files.createTempDirectory("graft-ivf-hn").toString
    graft.ops.Ann.writeIvfIndex(corpus, p, nLists = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "neg_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val brute = rows(graft.ops.Ann.hardNegatives(qs, pos, corpus, k = 2,
      posPerQueryBound = 2))
    val indexed = rows(graft.ops.Ann.hardNegativesIndexed(qs, pos, p, k = 2,
      posPerQueryBound = 2, nProbe = 2))
    assert(indexed === brute)
    // depthSlack only deepens the shortlist — never changes the answer
    val slacked = rows(graft.ops.Ann.hardNegativesIndexed(qs, pos, p, k = 2,
      posPerQueryBound = 2, nProbe = 2, depthSlack = 3))
    assert(slacked === brute)
  }

  test("rrfFuse: hand-computed contributions; one-list docs fuse with one term") {
    import spark.implicits._
    val l0 = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val l1 = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val got = graft.ops.TextIndex.rrfFuse(Seq(l0, l1), "doc_id", kRrf = 60)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq(
      (1L, 1L, r9(1.0 / 61)),
      (2L, 2L, r9(1.0 / 62 + 1.0 / 61)),
      (3L, 1L, r9(1.0 / 62))))
    // a doc duplicated WITHIN one list (bad upstream join) counts once
    // at its best rank — n_lists stays a list count, contributions
    // never double
    val dup = Seq((1L, 3L), (1L, 1L), (1L, 2L)).toDF("doc_id", "rank")
    val fused = graft.ops.TextIndex.rrfFuse(Seq(dup, l1), "doc_id", kRrf = 60)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fused.toSeq === Seq(
      (1L, 1L, r9(1.0 / 61)),
      (2L, 1L, r9(1.0 / 61)),
      (3L, 1L, r9(1.0 / 62))))
  }

  test("BM25 delete: tombstoned docs leave results at once; purge == rebuild over survivors; oversize set fails loudly") {
    import spark.implicits._
    val d = schema.Tables.load(spark, sfDir, "documents")
    val terms = Seq("hash", "join", "stream")
    val pDel = java.nio.file.Files.createTempDirectory("graft-bm25-del").toString
    val pSurv = java.nio.file.Files.createTempDirectory("graft-bm25-srv").toString
    graft.ops.TextIndex.writeBm25Index(d, "doc_id", "text", pDel, nBuckets = 16)
    val doomed = d.filter($"doc_id" % 5 === 0).select($"doc_id")
    graft.ops.TextIndex.deleteFromBm25Index(doomed, pDel)
    def probeRows(p: String) = graft.ops.TextIndex.probeBm25Index(spark, p, terms)
      .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
        round(col("score"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // PRE-purge: deletion is immediate for RESULTS (no tombstoned id
    // returns) even though df/n_docs/avgdl are stale by contract
    val prePurge = probeRows(pDel)
    assert(prePurge.nonEmpty && prePurge.forall(_._1 % 5 != 0),
      "tombstoned doc returned before purge")
    // an over-accumulated tombstone set refuses with the purge hint
    val ex = intercept[IllegalArgumentException] {
      graft.ops.TextIndex.probeBm25Index(spark, pDel, terms,
        maxTombstoneRows = 3).collect()
    }
    assert(ex.getMessage.contains("purgeBm25Tombstones"))
    // POST-purge: exact equality with a from-scratch rebuild over the
    // survivors — idf/avgdl shifts included (1e-9 contract on avgdl)
    val rewritten = graft.ops.TextIndex.purgeBm25Tombstones(spark, pDel)
    assert(rewritten > 0)
    graft.ops.TextIndex.writeBm25Index(d.filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", pSurv, nBuckets = 16)
    assert(probeRows(pDel).toSet === probeRows(pSurv).toSet)
    // purge is idempotent and a no-op with no tombstones
    assert(graft.ops.TextIndex.purgeBm25Tombstones(spark, pDel) === 0)
    // deleting ids absent from the index is a no-op
    graft.ops.TextIndex.deleteFromBm25Index(
      Seq(999999L).toDF("doc_id"), pDel)
    graft.ops.TextIndex.purgeBm25Tombstones(spark, pDel)
    assert(probeRows(pDel).toSet === probeRows(pSurv).toSet)

    // fully-tombstoned bucket with SURVIVORS elsewhere: the purged
    // logical view must hold no doc-1 row anywhere (right-to-erasure)
    // while untouched buckets keep serving; probe proves both at once
    val pAll = java.nio.file.Files.createTempDirectory("graft-bm25-all").toString
    val tiny = Seq((1L, "aaa bbb"), (2L, "aaa ccc")).toDF("doc_id", "text")
    graft.ops.TextIndex.writeBm25Index(tiny, "doc_id", "text", pAll, nBuckets = 4)
    graft.ops.TextIndex.deleteFromBm25Index(Seq(1L).toDF("doc_id"), pAll)
    assert(graft.ops.TextIndex.purgeBm25Tombstones(spark, pAll) > 0)
    val afterOne = compDf(pAll, "postings", "tb")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(afterOne === Set(2L), s"doc 1 rows must be logically gone: $afterOne")
    assert(compDf(pAll, "doclen").count() === 1L)
    // right-to-erasure is PHYSICAL after purge + vacuum: no live
    // segment file holds a doc-1 row (vacuum reclaims the pre-purge
    // postings/doclen segments the manifest no longer references)
    graft.ops.TextIndex.vacuumBm25Index(spark, pAll)
    segDirs(pAll, "postings").foreach { seg =>
      assert(spark.read.parquet(seg).filter($"doc_id" === 1L).count() === 0L,
        s"doc 1 rows physically survive in $seg after purge+vacuum")
    }
    // deleting the LAST document leaves a serving, APPENDABLE empty
    // index (empty segments preserve schemas; stats keep the bucketing
    // fan-out) — probe answers empty, and a later append revives it
    graft.ops.TextIndex.deleteFromBm25Index(Seq(2L).toDF("doc_id"), pAll)
    assert(graft.ops.TextIndex.purgeBm25Tombstones(spark, pAll) > 0)
    assert(graft.ops.TextIndex.probeBm25Index(spark, pAll, Seq("aaa"))
      .count() === 0L, "an all-deleted index must probe empty, not crash")
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "aaa eee")).toDF("doc_id", "text"), "doc_id", "text", pAll)
    val revived = graft.ops.TextIndex.probeBm25Index(spark, pAll, Seq("aaa"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(revived === Set(3L),
      s"an all-deleted index must accept appends and serve them: $revived")
  }

  test("time travel: an explicit earlier version answers as of that commit; vacuumed versions refuse loudly") {
    import spark.implicits._
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val p = java.nio.file.Files.createTempDirectory("graft-ivf-tt").toString
    graft.ops.Ann.writeIvfIndex(e.filter($"id" % 5 =!= 0), p,
      nLists = 16, trainIters = 2)
    val v1 = graft.ops.IndexManifest.pin(spark, p).version
    val qs = e.filter($"id" < 8)
    def triples(asOf: Option[Long]) =
      graft.ops.Ann.probeIvfIndex(qs, p, k = 5, nProbe = 4, asOfVersion = asOf)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val preAppend = triples(None)
    graft.ops.Ann.appendToIvfIndex(e.filter($"id" % 5 === 0), p)
    assert(graft.ops.IndexManifest.versions(spark, p) === Seq(v1, v1 + 1))
    // as-of the pre-append commit: exactly the pre-append answers,
    // even though the current snapshot has absorbed the batch
    assert(triples(Some(v1)) === preAppend,
      "time-travel probe diverged from the pre-append snapshot")
    assert(triples(None) !== preAppend,
      "fixture must make the append change some probe answer")
    // a version that never existed refuses loudly
    val exMissing = intercept[IllegalStateException] {
      graft.ops.Ann.probeIvfIndex(qs, p, k = 5, asOfVersion = Some(99L))
    }
    assert(exMissing.getMessage.contains("never committed"))
    // vacuum reclaims v1's manifest and superseded dirs: the
    // time-travel read now refuses loudly instead of dangling
    graft.ops.Ann.vacuumIvfIndex(spark, p)
    val exVac = intercept[IllegalStateException] {
      graft.ops.Ann.probeIvfIndex(qs, p, k = 5, asOfVersion = Some(v1))
    }
    assert(exVac.getMessage.contains("vacuum"))
    assert(triples(None) !== preAppend, "current reads survive vacuum")
  }

  test("manifest crash atomicity: uncommitted orphans are invisible; re-run and vacuum recover") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-bm25-crash").toString
    graft.ops.TextIndex.writeBm25Index(
      Seq((1L, "aaa bbb"), (2L, "aaa ccc ddd")).toDF("doc_id", "text"),
      "doc_id", "text", p, nBuckets = 4)
    def probe() = graft.ops.TextIndex.probeBm25Index(spark, p, Seq("aaa", "ccc"))
      .select(col("doc_id"), round(col("score"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val healthy = probe()

    // simulate a maintenance op that CRASHED mid-flight: it wrote new
    // segment directories (with wrong/partial content — here garbage
    // postings) but never committed a manifest. The layout must behave
    // as if nothing happened.
    Seq((99L, "zzz", 1L, 0))
      .toDF("doc_id", "term", "tf", "tb")
      .write.parquet(s"$p/postings-deadbeef0001")
    Seq((99L, 1L)).toDF("doc_id", "dl")
      .write.parquet(s"$p/doclen-deadbeef0001")
    assert(probe() === healthy, "orphan segments leaked into a probe")
    assert(compDf(p, "doclen").count() === 2L)

    // the crashed op's blind RE-RUN is safe (manifest not swapped =
    // nothing happened): an append of the same batch applies once
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "aaa zzz")).toDF("doc_id", "text"), "doc_id", "text", p)
    assert(compDf(p, "doclen").count() === 3L)

    // vacuum reclaims the orphans (and superseded stats) but keeps
    // every live segment; probes unchanged
    val dropped = graft.ops.TextIndex.vacuumBm25Index(spark, p)
    assert(dropped.exists(_.contains("deadbeef")),
      s"vacuum must reclaim the crashed op's orphans: $dropped")
    assert(!new java.io.File(s"$p/postings-deadbeef0001").exists())
    val after = probe()
    assert(after.map(_._1) === Set(1L, 2L, 3L))

    // a bypassed-lock commit collision fails loudly without clobbering
    val snapNow = graft.ops.IndexManifest.pin(spark, p)
    graft.ops.IndexManifest.commit(spark, p, Some(snapNow), snapNow.components)
    val ex = intercept[IllegalStateException] {
      graft.ops.IndexManifest.commit(spark, p, Some(snapNow), snapNow.components)
    }
    assert(ex.getMessage.contains("collision"))
  }

  test("torn manifest defense: a truncated or empty highest version file is invisible to readers, quarantined by the next commit, reclaimed by vacuum") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft-bm25-torn").toString
    graft.ops.TextIndex.writeBm25Index(
      Seq((1L, "aaa bbb"), (2L, "aaa ccc")).toDF("doc_id", "text"),
      "doc_id", "text", p, nBuckets = 4)
    def probe() = graft.ops.TextIndex.probeBm25Index(spark, p, Seq("aaa"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val healthy = probe()
    val v1 = graft.ops.IndexManifest.pin(spark, p).version

    // simulate a crash (or a concurrent commit observed mid-write on a
    // filesystem without atomic rename) that left a TORN file in the
    // next version slot: created, partially written, no end marker.
    // The dangerous variant is a prefix that still parses line-by-line
    // — header plus a cut-off body silently dropping the tombstones.
    def slot(v: Long) = new java.io.File(f"$p/_manifests/v$v%012d")
    val torn = slot(v1 + 1)
    java.nio.file.Files.write(torn.toPath,
      "graft-index-manifest 1\npostings=\n".getBytes("UTF-8"))

    // readers skip it: pin lands on v1, probes answer, versions() and
    // exists() treat the layout as healthy at v1
    assert(graft.ops.IndexManifest.pin(spark, p).version === v1,
      "a torn highest version file must not be pinned")
    assert(probe() === healthy, "torn manifest leaked into a probe")
    assert(graft.ops.IndexManifest.versions(spark, p) === Seq(v1))
    assert(graft.ops.IndexManifest.exists(spark, p))

    // an EMPTY slot file (create raced with pin before any byte) is
    // equally invisible
    val torn2 = slot(v1 + 2)
    java.nio.file.Files.write(torn2.toPath, Array.emptyByteArray)
    assert(graft.ops.IndexManifest.pin(spark, p).version === v1)

    // the torn file's body PARSES line-wise, so it is indistinguishable
    // from a pre-footer legacy manifest — the next maintenance op must
    // refuse LOUDLY with the remedy rather than quarantine it blindly
    // (quarantining a real legacy manifest would disown its segments)
    val exAmbig = intercept[IllegalStateException] {
      graft.ops.TextIndex.appendToBm25Index(
        Seq((3L, "aaa ddd")).toDF("doc_id", "text"), "doc_id", "text", p)
    }
    assert(exAmbig.getMessage.contains("no end marker"), exAmbig.getMessage)
    assert(probe() === healthy, "the refused append must not publish")
    // the documented remedy: verify + delete, then the retry proceeds
    assert(torn.delete())
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "aaa ddd")).toDF("doc_id", "text"), "doc_id", "text", p)
    assert(graft.ops.IndexManifest.pin(spark, p).version === v1 + 1)
    assert(probe() === Set(1L, 2L, 3L))

    // the EMPTY file now occupying the next slot is garbled beyond
    // doubt (no header) — the next op self-heals by quarantining it
    graft.ops.TextIndex.appendToBm25Index(
      Seq((4L, "aaa fff")).toDF("doc_id", "text"), "doc_id", "text", p)
    assert(graft.ops.IndexManifest.pin(spark, p).version === v1 + 2)
    assert(probe() === Set(1L, 2L, 3L, 4L))
    val mNames = new java.io.File(s"$p/_manifests").list().toSet
    assert(mNames.exists(_.startsWith("quarantine-")),
      s"garbled slot file must be quarantined, not lost: $mNames")
    assert(!mNames.exists(_.startsWith("inflight-")),
      s"commit temp file must not outlive the commit: $mNames")

    // vacuum reclaims quarantine debris and superseded versions
    graft.ops.TextIndex.vacuumBm25Index(spark, p)
    val afterVac = new java.io.File(s"$p/_manifests").list().toSet
      .filterNot(_.startsWith(".")) // local-FS checksum sidecars
    assert(afterVac === Set(f"v${v1 + 2}%012d"),
      s"vacuum must leave only the current manifest: $afterVac")
    assert(probe() === Set(1L, 2L, 3L, 4L))

    // explicit time-travel to a torn version stays LOUD — the caller
    // named it, so silence would serve a lie
    java.nio.file.Files.write(slot(v1 + 3).toPath,
      "graft-index-manifest 1\npostings=\n".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      graft.ops.TextIndex.probeBm25Index(spark, p, Seq("aaa"),
        asOfVersion = Some(v1 + 3)).collect()
    }
    assert(ex.getMessage.contains("end marker"))
  }

  test("snapshot isolation: a probe pinned before a purge sees fully-old state; a new probe sees fully-new") {
    import spark.implicits._
    val d = schema.Tables.load(spark, sfDir, "documents")
    val terms = Seq("hash", "join", "stream")
    val p = java.nio.file.Files.createTempDirectory("graft-bm25-iso").toString
    graft.ops.TextIndex.writeBm25Index(d, "doc_id", "text", p, nBuckets = 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
        round(col("score"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // pin a probe on the FULL corpus, then run the whole delete+purge
    // lifecycle underneath it before executing it
    val pinnedProbe = graft.ops.TextIndex.probeBm25Index(spark, p, terms)
    val fullCorpus = rows(graft.ops.TextIndex.probeBm25Index(spark, p, terms))
    graft.ops.TextIndex.deleteFromBm25Index(
      d.filter($"doc_id" % 5 === 0).select($"doc_id"), p)
    graft.ops.TextIndex.purgeBm25Tombstones(spark, p)
    assert(rows(pinnedProbe) === fullCorpus,
      "a probe pinned before the purge must see the full pre-purge state " +
        "(fully-old), never a mix")
    val fresh = rows(graft.ops.TextIndex.probeBm25Index(spark, p, terms))
    assert(fresh.nonEmpty && fresh.forall(_._1 % 5 != 0),
      "a probe opened after the purge must see only survivors (fully-new)")
    assert(fresh !== fullCorpus)

    // same contract on the IVF layouts
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val pv = java.nio.file.Files.createTempDirectory("graft-ivf-iso").toString
    graft.ops.Ann.writeIvfIndex(e, pv, nLists = 16, trainIters = 2)
    val qs = e.filter($"id" < 8)
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val pinnedIvf = graft.ops.Ann.probeIvfIndex(qs, pv, k = 5, nProbe = 4)
    val ivfFull = triples(graft.ops.Ann.probeIvfIndex(qs, pv, k = 5, nProbe = 4))
    graft.ops.Ann.deleteFromIvfIndex(
      e.filter($"id" % 5 === 0).select($"id".as("nid")), pv)
    graft.ops.Ann.purgeIvfTombstones(spark, pv)
    assert(triples(pinnedIvf) === ivfFull,
      "IVF probe pinned before the purge must see fully-old state")
    val ivfFresh = triples(graft.ops.Ann.probeIvfIndex(qs, pv, k = 5, nProbe = 4))
    assert(ivfFresh.forall(_._3 % 5 != 0))
    assert(ivfFresh !== ivfFull)
  }

  test("BM25 compact with pending tombstones: no resurrection, purge-after == rebuild") {
    import spark.implicits._
    // build → append → delete → COMPACT (segments consolidate while the
    // tombstones are pending) → purge → probe: compaction preserves the
    // logical state verbatim, so tombstoned rows survive the segment
    // merge (still logically deleted), the later purge must still drop
    // them, and nothing double-counts — equals a from-scratch rebuild
    // over the survivors
    val p = java.nio.file.Files.createTempDirectory("graft-bm25-cmp").toString
    val pRef = java.nio.file.Files.createTempDirectory("graft-bm25-cmpr").toString
    val d = schema.Tables.load(spark, sfDir, "documents")
    val terms = Seq("hash", "join", "stream")
    graft.ops.TextIndex.writeBm25Index(d.filter($"doc_id" % 3 =!= 0),
      "doc_id", "text", p, nBuckets = 8)
    graft.ops.TextIndex.appendToBm25Index(d.filter($"doc_id" % 3 === 0),
      "doc_id", "text", p)
    graft.ops.TextIndex.deleteFromBm25Index(
      d.filter($"doc_id" % 5 === 0).select($"doc_id"), p)
    assert(segDirs(p, "postings").size === 2, "append must add a segment")
    assert(graft.ops.TextIndex.compactBm25Index(spark, p) === 3,
      "compact must consolidate the appended postings/terms/doclen segments")
    assert(Seq("postings", "terms", "doclen")
      .forall(segDirs(p, _).size === 1))
    assert(segDirs(p, "tombstones").nonEmpty,
      "compact must carry pending tombstones verbatim")
    def probeRows(px: String) = graft.ops.TextIndex.probeBm25Index(spark, px, terms)
      .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
        round(col("score"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // tombstoned docs still excluded right after compact
    assert(probeRows(p).nonEmpty && probeRows(p).forall(_._1 % 5 != 0),
      "compact resurrected a tombstoned doc")
    assert(graft.ops.TextIndex.purgeBm25Tombstones(spark, p) > 0)
    graft.ops.TextIndex.writeBm25Index(d.filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", pRef, nBuckets = 8)
    assert(probeRows(p).toSet === probeRows(pRef).toSet,
      "compact-then-purge must equal a from-scratch rebuild over survivors")
    // a second compact over the already-consolidated layout is a no-op
    assert(graft.ops.TextIndex.compactBm25Index(spark, p) === 0)
  }

  test("index write-op lock: concurrent maintenance fails loudly; rebuild clears a stale lock") {
    import spark.implicits._
    val tiny = Seq((1L, "aaa bbb"), (2L, "aaa ccc")).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft-bm25-lock").toString
    graft.ops.TextIndex.writeBm25Index(tiny, "doc_id", "text", p, nBuckets = 4)
    // every completed op releases the lock
    assert(!new java.io.File(p, ".graft.index.lock").exists())
    // a held lock (concurrent op / crashed JVM) refuses append, delete
    // AND purge — the silent-corruption interleaves the scaladocs ban
    val lock = new java.io.File(p, ".graft.index.lock")
    assert(lock.createNewFile())
    val exA = intercept[IllegalStateException] {
      graft.ops.TextIndex.appendToBm25Index(
        Seq((3L, "ddd")).toDF("doc_id", "text"), "doc_id", "text", p)
    }
    assert(exA.getMessage.contains("locked"))
    intercept[IllegalStateException] {
      graft.ops.TextIndex.deleteFromBm25Index(Seq(1L).toDF("doc_id"), p)
    }
    intercept[IllegalStateException] {
      graft.ops.TextIndex.purgeBm25Tombstones(spark, p)
    }
    // the refused caller must NOT have deleted the holder's lock
    assert(lock.exists(), "a refused op must leave the holder's lock in place")
    // full rebuild is the documented remediation: clears the stale lock,
    // completes, and releases its own
    graft.ops.TextIndex.writeBm25Index(tiny, "doc_id", "text", p, nBuckets = 4)
    assert(!lock.exists())
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "ddd")).toDF("doc_id", "text"), "doc_id", "text", p)
    assert(!lock.exists())

    // same sentinel on the IVF layouts (shared IndexLock seam)
    val vecs = (0L until 32L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 13 - 6).toFloat)))
      .toDF("id", "vec")
    val pv = java.nio.file.Files.createTempDirectory("graft-ivf-lock").toString
    graft.ops.Ann.writeIvfIndex(vecs, pv, nLists = 4)
    assert(!new java.io.File(pv, ".graft.index.lock").exists())
    val vLock = new java.io.File(pv, ".graft.index.lock")
    assert(vLock.createNewFile())
    intercept[IllegalStateException] {
      graft.ops.Ann.appendToIvfIndex(
        Seq((100L, Array.fill(8)(1.0f))).toDF("id", "vec"), pv)
    }
    intercept[IllegalStateException] {
      graft.ops.Ann.deleteFromIvfIndex(Seq(1L).toDF("nid"), pv)
    }
    intercept[IllegalStateException] {
      graft.ops.Ann.purgeIvfTombstones(spark, pv)
    }
    assert(vLock.exists())
    graft.ops.Ann.writeIvfIndex(vecs, pv, nLists = 4) // rebuild clears stale
    assert(!vLock.exists())
  }

  test("BM25 index append: probes == full rebuild; untouched buckets keep their files") {
    import spark.implicits._
    val d = schema.Tables.load(spark, sfDir, "documents")
    val terms = Seq("hash", "join", "stream")
    val pApp = java.nio.file.Files.createTempDirectory("graft-bm25-app").toString
    val pFull = java.nio.file.Files.createTempDirectory("graft-bm25-appf").toString
    graft.ops.TextIndex.writeBm25Index(d.filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", pApp, nBuckets = 16)
    graft.ops.TextIndex.appendToBm25Index(d.filter($"doc_id" % 5 === 0),
      "doc_id", "text", pApp)
    graft.ops.TextIndex.writeBm25Index(d, "doc_id", "text", pFull, nBuckets = 16)
    def probeRows(p: String) = graft.ops.TextIndex.probeBm25Index(spark, p, terms)
      .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
        round(col("score"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // scores equal at the 1e-9 contract every ranked consumer rounds to
    // (avgdl is a double avg — addition order may differ in the last ulp)
    assert(probeRows(pApp) === probeRows(pFull))

    // stored-segment pinning: the append writes ONLY new segment dirs —
    // every stored postings/terms file is byte-stable
    val p2 = java.nio.file.Files.createTempDirectory("graft-bm25-pin").toString
    val train = Seq((1L, "beta beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    graft.ops.TextIndex.writeBm25Index(train, "doc_id", "text", p2, nBuckets = 16)
    val (postSeg0, termSeg0) =
      (segDirs(p2, "postings").head, segDirs(p2, "terms").head)
    val (postBefore, termsBefore) = (bucketFiles(postSeg0), bucketFiles(termSeg0))
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "zeta")).toDF("doc_id", "text"), "doc_id", "text", p2)
    assert(bucketFiles(postSeg0) === postBefore,
      "append rewrote a stored postings segment")
    assert(bucketFiles(termSeg0) === termsBefore,
      "append rewrote a stored terms segment")
    assert(segDirs(p2, "postings").size === 2 &&
      segDirs(p2, "terms").size === 2,
      "append must add one postings and one terms segment")
    // df additivity: every term's summed df equals its true doc count
    val dfs = compDf(p2, "terms", "tb")
      .groupBy($"term").agg(sum($"df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs === Map("beta" -> 1L, "gamma" -> 1L, "delta" -> 1L,
      "epsilon" -> 1L, "zeta" -> 1L))
  }

  test("appended layout compacts to one segment per component; probe answers unchanged") {
    // the maintenance story for the incremental index: appends leave
    // extra segments the probe must fan in over; compactBm25Index
    // restores one segment per component without changing a single
    // probe answer, and vacuum reclaims the superseded directories
    import spark.implicits._
    val d = schema.Tables.load(spark, sfDir, "documents")
    val terms = Seq("hash", "join", "stream")
    val p = java.nio.file.Files.createTempDirectory("graft-bm25-cpt").toString
    graft.ops.TextIndex.writeBm25Index(d.filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", p, nBuckets = 16)
    graft.ops.TextIndex.appendToBm25Index(d.filter($"doc_id" % 5 === 0),
      "doc_id", "text", p)
    def probeRows() = graft.ops.TextIndex.probeBm25Index(spark, p, terms)
      .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
        round(col("score"), 9))
      .collect().map(_.toSeq).toSet
    val before = probeRows()
    assert(graft.ops.TextIndex.compactBm25Index(spark, p) === 3)
    assert(Seq("postings", "terms", "doclen").forall(segDirs(p, _).size === 1))
    assert(probeRows() === before, "compaction must not change probe answers")
    val live = Seq("postings", "terms", "doclen", "stats").flatMap(segDirs(p, _))
    graft.ops.TextIndex.vacuumBm25Index(spark, p)
    live.foreach(dir => assert(new java.io.File(dir).exists(),
      s"vacuum deleted a live segment $dir"))
    assert(probeRows() === before, "vacuum must not change probe answers")
  }

  test("bm25Scores (ad-hoc) == probeBm25Index (persisted) on the fixture corpus") {
    val d = schema.Tables.load(spark, sfDir, "documents")
    val terms = Seq("hash", "join", "stream")
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-adhoc").toString
    graft.ops.TextIndex.writeBm25Index(d, "doc_id", "text", path, nBuckets = 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("matched_terms"), col("matched_tf"),
        round(col("score"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows(graft.ops.TextIndex.bm25Scores(d, "doc_id", "text", terms))
      === rows(graft.ops.TextIndex.probeBm25Index(spark, path, terms)))
  }

  test("nearDupCandidatesLsh: a vector flood diverts to flagged before any collection") {
    val v = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val near = Array(0.999f, 0.04f, 0.0f, 0.0f)
    val other = Array(0.0f, 1.0f, 0.0f, 0.0f)
    // 40 identical vectors share EVERY table's bucket; cap at 25
    val rows = Seq((1L, v), (2L, near), (3L, other)) ++
      (100L until 140L).map(i => (i, Array(0.5f, 0.5f, 0.5f, 0.5f)))
    val vecs = spark.createDataFrame(rows).toDF("id", "vec")
    val res = graft.ops.Ann.nearDupCandidatesLsh(vecs, threshold = 0.9,
      maxBucket = 25)
    val pairs = res.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists { case (a, b) => a >= 100 && b >= 100 },
      "flood bucket must not pair")
    assert(pairs.contains((1L, 2L)), s"planted near-dup must survive: $pairs")
    val flagged = res.flaggedBuckets.collect()
    // every flagged bucket holds the 40-vector flood (plus possibly a
    // normal vector that happens to share that table's bucket)
    assert(flagged.nonEmpty && flagged.forall(_.getAs[Long]("n_ids") >= 40L))
  }

  test("bm25: uppercase query terms normalize to the index's lowercase tokens") {
    val d = Seq((1L, "Bitcoin rallies again"), (2L, "ethereum dips"))
      .toDF("doc_id", "text")
    val hits = graft.ops.TextIndex.bm25Scores(d, "doc_id", "text",
      Seq("Bitcoin")).collect()
    assert(hits.length === 1 && hits(0).getLong(0) === 1L,
      "an uppercase query term must match the lowercased index tokens")
  }

  test("semanticDecontam: near-bench rows flag, orthogonal rows keep, null vecs survive") {
    val ax = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val ay = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val nearAx = Array(0.99f, 0.1f, 0.0f, 0.0f)
    val bench = spark.createDataFrame(Seq((100L, ax), (101L, ay)))
      .toDF("id", "vec")
    val corpus = spark.createDataFrame(Seq(
        (1L, nearAx),                          // ~0.995 cosine to bench 100
        (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),   // orthogonal to both
        (3L, ay)))                             // exact bench copy
      .toDF("id", "vec")
      .unionByName(spark.createDataFrame(Seq(Tuple1(4L))).toDF("id")
        .withColumn("vec",
          org.apache.spark.sql.functions.lit(null)
            .cast("array<float>")))            // unembeddable row
    val out = graft.ops.Ann.semanticDecontam(corpus, bench, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L), "no row may be dropped")
    assert(out(1L) === ((100L, true)), s"near-dup must flag: ${out(1L)}")
    assert(out(3L) === ((101L, true)), s"exact copy must flag: ${out(3L)}")
    assert(!out(2L)._2, "orthogonal row must not flag")
    assert(out(4L) === ((-1L, false)),
      "null-vec row must survive unflagged with null bench_id")
  }
}
