package graft

import org.apache.spark.sql.functions._

import graft.ops.Fingerprint

/** Winnowing fingerprint properties: parity with a direct Scala
  * reference implementation, and the SIGMOD'03 matching guarantee that
  * makes fingerprint buckets a COMPLETE candidate generator for shared
  * substrings of length ≥ k+w−1. */
class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  private val w = 4

  /** Direct reference: rolling hash + per-window min + distinct. */
  private def refWinnow(text: String): Set[Long] = {
    if (text.length < k + w - 1) return Set.empty
    val hashes = (0 to text.length - k).map { i =>
      text.substring(i, i + k).foldLeft(0L)((acc, c) =>
        (acc * Fingerprint.B + c.toLong) % Fingerprint.M)
    }
    hashes.sliding(w).map(_.min).toSet
  }

  test("winnow == reference implementation on random texts") {
    val rnd = new scala.util.Random(3)
    val texts = (1L to 40L).map { id =>
      val len = 11 + rnd.nextInt(120)
      (id, (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    }
    val got = Fingerprint.winnow(texts.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == refWinnow(t), s"doc $id text $t")
    }
  }

  test("matching guarantee: a shared substring of length k+w-1 shares a fingerprint") {
    val rnd = new scala.util.Random(17)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // plant the same (k+w-1)-char snippet inside two otherwise-random docs
    (1 to 20).foreach { trial =>
      val snippet = randText(k + w - 1)
      val a = randText(30) + snippet + randText(30)
      val b = randText(50) + snippet + randText(10)
      val fps = Fingerprint.winnow(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", k, w)
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      assert(fps(1L).intersect(fps(2L)).nonEmpty, s"trial $trial: $snippet")
    }
  }

  test("overlapCandidates: planted shared passage pairs the two docs; strangers don't pair") {
    val rnd = new scala.util.Random(23)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val passage = randText(40) // >> k+w-1: guarantees ≥ 2 shared fingerprints
    val docs = Seq(
      (1L, randText(60) + passage + randText(20)),
      (2L, randText(30) + passage + randText(50)),
      (3L, randText(150))).toDF("doc_id", "text")
    val pairs = Fingerprint.overlapCandidates(docs, "doc_id", "text", k, w,
        minShared = 2, maxBucket = 100)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2),
      pairs.mkString(", "))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("overlapCandidates: a bucket over maxBucket produces no pairs (boilerplate cap)") {
    val rnd = new scala.util.Random(29)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val boiler = randText(k + w - 1)
    // every doc shares ONLY the boilerplate snippet
    val docs = (1L to 10L).map(id => (id, randText(40) + boiler + randText(40)))
      .toDF("doc_id", "text")
    val uncapped = Fingerprint.overlapCandidates(docs, "doc_id", "text", k, w,
      minShared = 1, maxBucket = 1000)
    val capped = Fingerprint.overlapCandidates(docs, "doc_id", "text", k, w,
      minShared = 1, maxBucket = 5)
    // the snippet's one fully-interior window selects the same min hash
    // in every doc → one 10-doc bucket → all 45 pairs uncapped
    assert(uncapped.count() == 45)
    // at maxBucket=5 that bucket is dead; boundary windows can still
    // leak a few pairs through smaller snippet-gram buckets, but they
    // cannot reconstruct the full clique
    assert(capped.count() < 45)
  }

  test("fused kernel == declarative winnow on fixture documents") {
    val docs = graft.schema.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val kernel = Fingerprint.winnow(docs, "doc_id", "text", k, w)
      .as[(Long, Long)].collect().toSet
    val declarative = Fingerprint.winnowDeclarative(docs, "doc_id", "text", k, w)
      .as[(Long, Long)].collect().toSet
    assert(kernel == declarative)
    assert(kernel.nonEmpty)
  }

  test("documents shorter than k+w-1 emit no fingerprints") {
    val out = Fingerprint.winnow(
      Seq((1L, "tiny"), (2L, "a" * (k + w - 2))).toDF("doc_id", "text"),
      "doc_id", "text", k, w)
    assert(out.count() == 0)
  }

  test("gramHash stays inside whole-stage codegen (no UDF call in plan)") {
    val df = Seq((1L, "abcdefghijklmnop")).toDF("doc_id", "text")
      .select(Fingerprint.gramHash($"text", lit(1), k).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"), plan)
    assert(df.as[Long].head() ==
      "abcdefgh".foldLeft(0L)((acc, c) => (acc * Fingerprint.B + c.toLong) % Fingerprint.M))
  }
}
