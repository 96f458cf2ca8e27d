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
