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
