package graft

import org.apache.spark.sql.functions._

import graft.expr.catalyst.{PqAdcDistance, PqAdcTable, PqEncode, PqKernel}
import graft.ops.Ann

/** Product-quantization properties: kernel parity with a direct Scala
  * reference, the exhaustive-rerank == brute-force identity, and the
  * recall the two-stage scan must hold on the fixture embeddings. */
class PqSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  private def e = schema.Tables.load(spark, sfDir, "embeddings")
    .select($"vec_id".as("id"), $"embedding".as("vec"))

  private def refEncode(v: Array[Float], cbs: Array[Array[Array[Float]]]): Seq[Byte] =
    cbs.zipWithIndex.map { case (codes, s) =>
      val sub = codes(0).length
      codes.indices.minBy { c =>
        (0 until sub).map { j =>
          val d = v(s * sub + j) - codes(c)(j); d * d
        }.sum
      }.toByte
    }.toSeq

  private val rnd = new scala.util.Random(5)
  private def randCbs(m: Int, nCodes: Int, sub: Int) =
    Array.fill(m, nCodes, sub)(rnd.nextFloat() * 2 - 1)
  private def randVec(dim: Int) = Array.fill(dim)(rnd.nextFloat() * 2 - 1)

  test("PqEncode/PqAdcTable/PqAdcDistance == direct reference on random data") {
    val m = 4; val nCodes = 8; val sub = 4; val dim = m * sub
    val cbs = randCbs(m, nCodes, sub)
    val vecs = Seq.fill(50)(randVec(dim))
    val df = vecs.map(v => Tuple1(v)).toDF("vec")
    val got = df.select(
        column(PqEncode(expression($"vec"), cbs)).as("codes"),
        column(PqAdcTable(expression($"vec"), cbs)).as("tbl"))
      .select($"codes",
        column(PqAdcDistance(expression($"tbl"), expression($"codes"), nCodes))
          .as("selfd"))
      .as[(Seq[Byte], Float)].collect()
    vecs.zip(got).foreach { case (v, (codes, selfd)) =>
      assert(codes == refEncode(v, cbs))
      // self ADC distance = exact quantization error of the vector
      val refD = codes.zipWithIndex.map { case (c, s) =>
        (0 until sub).map { j =>
          val d = v(s * sub + j) - cbs(s)(c)(j); d * d
        }.sum
      }.sum
      assert(math.abs(selfd - refD) < 1e-4, s"$selfd vs $refD")
    }
  }

  test("ADC distance of a vector to its own code set is minimal over all code choices") {
    val m = 2; val nCodes = 6; val sub = 3
    val cbs = randCbs(m, nCodes, sub)
    val v = randVec(m * sub)
    val tblRow = Seq(Tuple1(v)).toDF("vec")
      .select(column(PqAdcTable(expression($"vec"), cbs)).as("tbl"))
      .as[Seq[Float]].head()
    val enc = refEncode(v, cbs)
    // every per-subspace table entry for the chosen code is the subspace min
    enc.zipWithIndex.foreach { case (c, s) =>
      val slice = tblRow.slice(s * nCodes, (s + 1) * nCodes)
      assert(slice(c) == slice.min)
    }
  }

  test("pqTopK with exhaustive rerank == bruteTopK exactly") {
    val emb = e
    val n = emb.count().toInt
    val brute = Ann.bruteTopK(emb.filter($"id" < 8), emb, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val pq = Ann.pqTopK(emb.filter($"id" < 8), emb, 5,
        rerankFactor = n / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(pq === brute)
  }

  test("pqTopK at m=16: high recall vs brute force on uniform-random fixtures") {
    // uniform random vectors are PQ's adversarial case (nothing to
    // compress); finer subspaces (m=16 → 4 dims each) hold recall
    // where the m=8 default needs a deeper rerank (measured 0.74@m=8
    // vs 0.92@m=16 at sf0.01, rerank×8)
    val emb = schema.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val brute = Ann.bruteTopK(emb.filter($"id" < 20), emb, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val got = Ann.pqTopK(emb.filter($"id" < 20), emb, 5,
        m = 16, nCodes = 16, rerankFactor = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      got.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.9, s"mean PQ recall@5 = $mean")
  }

  test("pqTopK on clustered data: default params, near-perfect recall") {
    // the honest PQ claim: real embedding corpora have cluster
    // structure, and there the default m=8 codebooks separate
    // neighbors cleanly
    val centers = Array.fill(20)(randVec(64))
    def jitter(c: Array[Float]) = {
      val raw = c.zip(randVec(64)).map { case (x, n) => x + 0.15f * n }
      val nrm = math.sqrt(raw.map(x => x * x).sum).toFloat
      raw.map(_ / nrm)
    }
    val pts = (0 until 400).map(i => (i.toLong, jitter(centers(i % 20)).toSeq))
    val emb = pts.toDF("id", "vec")
      .select($"id", $"vec".cast("array<float>").as("vec"))
    val brute = Ann.bruteTopK(emb.filter($"id" < 10), emb, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val got = Ann.pqTopK(emb.filter($"id" < 10), emb, 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = brute.map { case (q, nn) =>
      got.getOrElse(q, Set.empty).count(nn.contains).toDouble / nn.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.9, s"mean clustered PQ recall@5 = $mean")
  }

  test("persisted IVF-PQ: pruned partitions, codes-only candidate scan, exhaustive == brute") {
    val emb = e
    val queries = emb.filter($"id" < 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-pq-idx").toString
    Ann.writeIvfIndexPq(emb, path, nLists = 16)

    val n = emb.count().toInt
    val probed = Ann.probeIvfIndexPq(queries, path, k = 5, nProbe = 4)

    // 1) the lists scan prunes to the probed partitions at planning time
    val scans = probed.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lists")) => s
    }
    assert(scans.nonEmpty)
    val staticFilters = scans.head.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(staticFilters.nonEmpty, s"no static partition filter:\n${scans.head}")
    val prunedParts = scans.map(_.relation.location
      .listFiles(staticFilters, Nil).length).max
    assert(prunedParts < 16, s"probe read $prunedParts of 16 partitions")

    // 2) the candidate stage projects codes, never the float vectors —
    // the 32x-bandwidth claim is columnar projection, so it must be
    // visible in a scan's required schema
    val schemas = scans.map(_.requiredSchema.fieldNames.toSet)
    assert(schemas.exists(f => f.contains("codes") && !f.contains("nv")),
      s"no codes-only scan found: $schemas")

    // 3) probing every list with an exhaustive rerank reproduces brute
    // force exactly (nothing can be dropped)
    val brute = Ann.bruteTopK(queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Ann.probeIvfIndexPq(queries, path, k = 5, nProbe = 16,
        rerankFactor = n / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full === brute)
  }

  test("persisted IVF-BIN: pruned partitions, bits-only candidate scan, exhaustive == brute, append == rebuild") {
    val emb = e
    val queries = emb.filter($"id" < 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-bin-idx").toString
    Ann.writeIvfIndexBin(emb, path, nLists = 16)

    val n = emb.count().toInt
    val probed = Ann.probeIvfIndexBin(queries, path, k = 5, nProbe = 4)

    // 1) the lists scan prunes to the probed partitions at planning time
    val scans = probed.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lists")) => s
    }
    assert(scans.nonEmpty)
    val staticFilters = scans.head.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(staticFilters.nonEmpty, s"no static partition filter:\n${scans.head}")
    val prunedParts = scans.map(_.relation.location
      .listFiles(staticFilters, Nil).length).max
    assert(prunedParts < 16, s"probe read $prunedParts of 16 partitions")

    // 2) the candidate stage projects the packed sign words, never the
    // float vectors — the 32x-bandwidth claim is columnar projection,
    // so it must be visible in a scan's required schema
    val schemas = scans.map(_.requiredSchema.fieldNames.toSet)
    assert(schemas.exists(f => f.contains("bits") && !f.contains("nv")),
      s"no bits-only scan found: $schemas")

    // 3) probing every list with an exhaustive rerank reproduces brute
    // force exactly (nothing can be dropped)
    val brute = Ann.bruteTopK(queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Ann.probeIvfIndexBin(queries, path, k = 5, nProbe = 16,
        rerankFactor = n / 5 + 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full === brute)

    // 4) append == rebuild: the batch sign-packs exactly as the build
    // does, so probe triples match row for row
    val pApp = java.nio.file.Files.createTempDirectory("graft-ivf-bin-app").toString
    val cents = Ann.readIvfCentroids(spark, path)
    Ann.writeIvfIndexBin(emb.filter($"id" % 5 =!= 0), pApp, nLists = 16,
      centroidsOverride = Some(cents))
    Ann.appendToIvfIndexBin(emb.filter($"id" % 5 === 0), pApp)
    def triples(p: String) =
      Ann.probeIvfIndexBin(queries, p, k = 5, nProbe = 16,
          rerankFactor = n / 5 + 1)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(triples(pApp) === triples(path))
  }

  test("kernels return null on dimension mismatch (never read out of bounds)") {
    val cbs = randCbs(4, 8, 4) // expects 16-dim vectors
    val out = Seq(Tuple1(randVec(12).toSeq), Tuple1(randVec(16).toSeq))
      .toDF("vec").select($"vec".cast("array<float>").as("vec"))
      .select(column(PqEncode(expression($"vec"), cbs)).as("codes"),
        column(PqAdcTable(expression($"vec"), cbs)).as("tbl"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1),
      "12-dim input against 16-dim codebooks must be null")
    assert(!out(1).isNullAt(0) && !out(1).isNullAt(1))
  }

  test("adcDistance refuses a table/codes shape mismatch loudly (silent OOB otherwise)") {
    // a 4x8 table (m=4, nCodes=8) probed with m=6 codes would read
    // past the table on UnsafeArrayData without raising — must throw
    val df = Seq((Array.fill(32)(1.0f).toSeq, Array.fill(6)(1.toByte).toSeq))
      .toDF("tbl", "codes")
      .select($"tbl".cast("array<float>").as("tbl"),
        $"codes".cast("array<tinyint>").as("codes"))
    val e = intercept[Exception] {
      df.select(column(PqAdcDistance(expression($"tbl"),
        expression($"codes"), 8))).collect()
    }
    assert(e.getMessage.contains("shape mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("shape mismatch")),
      e.toString)
  }

  test("pqTopK with a codebooksOverride of a different code count still ranks correctly") {
    // the ADC stride must come from the actual codebooks, not the
    // nCodes parameter (which stays at its default 16 here)
    val emb = e
    val n = emb.count().toInt
    val cbs8 = Ann.trainPqCodebooks(emb, m = 8, nCodes = 8, iters = 1)
    val brute = Ann.bruteTopK(emb.filter($"id" < 8), emb, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val pq = Ann.pqTopK(emb.filter($"id" < 8), emb, 5,
        rerankFactor = n / 5 + 1, codebooksOverride = Some(cbs8))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(pq === brute)
  }

  test("trainPqCodebooks: m x nCodes x dim/m shape, deterministic across runs") {
    val emb = e
    val a = Ann.trainPqCodebooks(emb, m = 8, nCodes = 16, iters = 1)
    val b = Ann.trainPqCodebooks(emb, m = 8, nCodes = 16, iters = 1)
    assert(a.length == 8 && a.forall(_.length == 16) &&
      a.forall(_.forall(_.length == 8)))
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("pqTopK reports EXACT cosine sims (quantization affects candidates only)") {
    val emb = e
    val out = Ann.pqTopK(emb.filter($"id" < 4), emb, 3, rerankFactor = 8)
    val v = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    out.collect().foreach { r =>
      val (q, n, sim) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val (qv, nv) = (v(q), v(n))
      val exact = qv.zip(nv).map { case (a, b) => a * b }.sum /
        (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(nv.map(x => x * x).sum))
      assert(math.abs(sim - exact) < 1e-6, s"$q->$n: $sim vs $exact")
    }
  }
}
