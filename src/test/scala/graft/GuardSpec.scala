package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ann, Curation, Guard}

/** Broadcast-size guardrails: the operators whose plans replicate a
  * "small by contract" side must fail LOUDLY (named operator, named
  * cap) when that contract is violated — not OOM mid-job. */
class GuardSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = (1 to n).map(i => (i.toLong, Array(i.toFloat, 1f)))
    .toDF("id", "vec")

  test("oversized broadcast sides fail loudly with the operator's name") {
    val corpus = vecs(40)
    val bigQueries = vecs(30)
    val eBrute = intercept[IllegalArgumentException] {
      Ann.bruteTopK(bigQueries, corpus, k = 2, maxBroadcastRows = 10)
    }
    assert(eBrute.getMessage.contains("bruteTopK query batch"))
    val eLsh = intercept[IllegalArgumentException] {
      Ann.lshTopK(bigQueries, corpus, k = 2, maxBroadcastRows = 10)
    }
    assert(eLsh.getMessage.contains("lshTopK query batch"))
    val eQuant = intercept[IllegalArgumentException] {
      Ann.quantizedTopK(bigQueries, corpus, k = 2, maxBroadcastRows = 10)
    }
    assert(eQuant.getMessage.contains("quantizedTopK query batch"))

    // contamination: a "benchmark" whose gram set exceeds the cap
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val bigBench = (1 to 30).map(i => s"w$i x$i y$i z$i q$i r$i s$i t$i u$i")
      .map(Tuple1(_)).toDF("text")
    val eCont = intercept[IllegalArgumentException] {
      Curation.contamination(docs, "doc_id", "text", bigBench, "text",
        n = 8, maxBenchGrams = 10).collect()
    }
    assert(eCont.getMessage.contains("contamination benchmark gram set"))
  }

  test("IVF tombstone set past the cap fails loudly, naming purgeIvfTombstones") {
    // every probe anti-joins a BROADCAST of the tombstone table; the
    // table grows with each deleteFromIvfIndex batch until a purge, so
    // an unmaintained index must die with the maintenance hint — not
    // as a driver OOM deep inside the probe job (VERDICT r7 item 1)
    val corpus = vecs(40)
    val p = java.nio.file.Files.createTempDirectory("graft-ivf-guard").toString
    Ann.writeIvfIndex(corpus, p, nLists = 2)
    Ann.deleteFromIvfIndex(
      corpus.filter(col("id") <= 8).select(col("id").as("nid")), p)
    val e = intercept[IllegalArgumentException] {
      Ann.probeIvfIndex(vecs(2), p, k = 3, nProbe = 2, maxTombstoneRows = 4)
        .collect()
    }
    assert(e.getMessage.contains("purgeIvfTombstones"))
    // under the cap the same probe serves; after a purge the tombstone
    // table is gone and the cap is irrelevant again
    assert(Ann.probeIvfIndex(vecs(2), p, k = 3, nProbe = 2,
      maxTombstoneRows = 8).count() > 0)
    Ann.purgeIvfTombstones(spark, p)
    assert(Ann.probeIvfIndex(vecs(2), p, k = 3, nProbe = 2,
      maxTombstoneRows = 1).count() > 0)
  }

  test("hardNegatives: positives beyond posPerQueryBound fail loudly, not undercount") {
    val corpus = vecs(20)
    val qs = vecs(1)
    val pos = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("qid", "pos_id")
    val e = intercept[IllegalArgumentException] {
      Ann.hardNegatives(qs, pos, corpus, k = 5, posPerQueryBound = 2)
    }
    assert(e.getMessage.contains("posPerQueryBound"))
  }

  test("byte rail: wide rows that pass the row cap fail the byte cap, naming both figures") {
    // 100 rows (far under any row cap) of ~8 KB embeddings ≈ 800 KB of
    // data — a row-count rail waves it through, the byte rail must not
    // (VERDICT r14 item 5: at 100 TB, wide embedding rows defeat a row
    // cap; 4M rows × 768 floats is ~12 GB under the 4M-row default)
    val wide = (1 to 100).map(i => (i.toLong, Array.fill(2048)(i.toFloat)))
      .toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Guard.broadcastSmall(wide, "wide test frame",
        maxRows = 1000, maxBytes = 100L << 10)
    }
    assert(e.getMessage.contains("wide test frame"), e.getMessage)
    assert(e.getMessage.contains("wide rows defeat the row cap"), e.getMessage)
    // the same frame passes with an honest byte budget — the estimate
    // tracks the real data size (100 × 2048 × 4B ≈ 820 KB, plus slack)
    assert(Guard.broadcastSmall(wide, "wide test frame",
      maxRows = 1000, maxBytes = 4L << 20).count() === 100)
    // string width is measured, not guessed: 50 × 10 KB strings trip a
    // 256 KB cap even though a fixed-width estimate would not
    val texts = (1 to 50).map(i => (i.toLong, "x" * 10240)).toDF("id", "text")
    val e2 = intercept[IllegalArgumentException] {
      Guard.broadcastSmall(texts, "long-text frame",
        maxRows = 1000, maxBytes = 256L << 10)
    }
    assert(e2.getMessage.contains("long-text frame"))
    // narrow frames sail under both caps unchanged
    assert(Guard.broadcastSmall(vecs(40), "narrow frame").count() === 40)
  }

  test("byte rail: duplicate column names (legal post-join) and struct-wrapped wide arrays") {
    // duplicate names: col(name) would throw AnalysisException where
    // the rail must simply measure — fields are resolved positionally
    // (r15 ADVICE)
    val a = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "x")
    val dup = a.join(a.withColumnRenamed("id", "id2"), $"id" === $"id2")
      .drop("id2") // two columns both named "x"
    assert(dup.columns.count(_ == "x") === 2)
    assert(Guard.broadcastSmall(dup, "dup-name frame").count() === 20)
    // a wide array WRAPPED IN A STRUCT must not evade the cap behind
    // the flat struct fallback — the estimator recurses one level
    val wrapped = (1 to 100).map(i => (i.toLong, Array.fill(2048)(i.toFloat)))
      .toDF("id", "vec").select($"id", struct($"vec".as("v")).as("s"))
    val e = intercept[IllegalArgumentException] {
      Guard.broadcastSmall(wrapped, "struct-wrapped wide frame",
        maxRows = 1000, maxBytes = 100L << 10)
    }
    assert(e.getMessage.contains("struct-wrapped wide frame"), e.getMessage)
    // and with an honest budget the same frame passes — the recursion
    // measures, it does not just reject structs
    assert(Guard.broadcastSmall(wrapped, "struct-wrapped wide frame",
      maxRows = 1000, maxBytes = 4L << 20).count() === 100)
  }

  test("arithmetic rail: precomputed row/byte bounds fail loudly (autoDepth rerank shortlists)") {
    Guard.broadcastBudget(100, 64, "ok frame") // under both caps: no-op
    val e = intercept[IllegalArgumentException] {
      Guard.broadcastBudget(5000000L, 64, "big shortlist")
    }
    assert(e.getMessage.contains("big shortlist"), e.getMessage)
    // wide rows: 1M rows × 4 KB qv ≈ 4 GB — under the row cap, far over
    // the byte cap (the r15 ADVICE scenario: sqrt(n)-deep shortlists
    // joined with wide query vectors)
    val e2 = intercept[IllegalArgumentException] {
      Guard.broadcastBudget(1000000L, 4096, "wide shortlist")
    }
    assert(e2.getMessage.contains("wide rows defeat the row cap"), e2.getMessage)
  }

  test("guarded operators still work under the cap; guard returns the frame unchanged") {
    val corpus = vecs(40)
    val queries = vecs(5)
    val out = Ann.bruteTopK(queries, corpus, k = 3, maxBroadcastRows = 10)
    assert(out.count() === 15)
    // the guard itself neither drops rows nor reorders columns
    val g = Guard.broadcastSmall(corpus, "test frame", maxRows = 100)
    assert(g.columns.toSeq === corpus.columns.toSeq)
    assert(g.count() === 40)
  }
}
