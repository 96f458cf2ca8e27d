package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** [[graft.ops.Retrieval.rankedEval]] — hand-computed metric values and
  * the edge contracts (no relevant docs, unjudged query, cutoff,
  * graded ideal ordering). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def r9(x: Double) = math.round(x * 1e9) / 1e9

  test("rankedEval: hand-computed MRR/NDCG/precision/recall at k=3") {
    // q1: retrieved (d1, d2, d3); judged d2=3, d3=1, d9=2 (d9 missed)
    val ranked = Seq(
      (1L, 1, 101L), (1L, 2, 102L), (1L, 3, 103L),
      // q2: nothing relevant retrieved
      (2L, 1, 201L), (2L, 2, 202L), (2L, 3, 203L),
      // q3: perfect ordering of its two judged docs
      (3L, 1, 301L), (3L, 2, 302L), (3L, 3, 303L),
      // rank 4 exists but is beyond the cutoff: must not count
      (1L, 4, 109L)).toDF("qid", "rank", "nid")
    val qrels = Seq(
      (1L, 102L, 3.0), (1L, 103L, 1.0), (1L, 109L, 2.0),
      (2L, 299L, 1.0),
      (3L, 301L, 2.0), (3L, 302L, 1.0)).toDF("qid", "nid", "grade")

    val got = Retrieval.rankedEval(ranked, qrels, k = 3)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))

    def dcgTerm(g: Double, rank: Int) =
      (math.pow(2.0, g) - 1.0) / (math.log(rank + 1.0) / math.log(2.0))
    // q1 dcg: rank1 g=0, rank2 g=3, rank3 g=1; ideal = grades (3,2,1)
    val dcg1 = dcgTerm(0, 1) + dcgTerm(3, 2) + dcgTerm(1, 3)
    val idcg1 = dcgTerm(3, 1) + dcgTerm(2, 2) + dcgTerm(1, 3)
    assert(got(0)._1 === 1L)
    assert(got(0)._2 === r9(1.0 / 2))                 // first relevant at rank 2
    // AP: P@2 = 1/2 at the first relevant, P@3 = 2/3 at the second,
    // over n_rel = 3 judged relevant (trec_eval denominator)
    assert(got(0)._3 === r9((1.0 / 2 + 2.0 / 3) / 3))
    assert(got(0)._4 === r9(dcg1 / idcg1))
    assert(got(0)._5 === r9(2.0 / 3))                 // 2 relevant of k=3
    assert(got(0)._6 === r9(2.0 / 3))                 // 2 of 3 relevant found

    // q2: judged but nothing relevant retrieved -> all zeros except
    // the denominators' semantics (recall 0 of 1)
    assert(got(1) === ((2L, 0.0, 0.0, 0.0, 0.0, 0.0)))

    // q3: both judged docs retrieved in ideal order -> map and ndcg
    // exactly 1
    assert(got(2)._2 === 1.0)
    assert(got(2)._3 === 1.0)
    assert(got(2)._4 === 1.0)
    assert(got(2)._5 === r9(2.0 / 3))
    assert(got(2)._6 === 1.0)

    // macro summary: one row, metric means folded in qid order
    val s = Retrieval.rankedEvalSummary(
      Retrieval.rankedEval(ranked, qrels, k = 3)).head()
    assert(s.getLong(0) === 3L)
    assert(s.getDouble(1) === r9((0.5 + 0.0 + 1.0) / 3))          // macro mrr
    assert(s.getDouble(2) === r9(((0.5 + 2.0 / 3) / 3 + 1.0) / 3)) // macro map
  }

  test("rankedEval: unjudged query scores zero instead of dropping; grade ties break on nid") {
    val ranked = Seq((7L, 1, 1L), (7L, 2, 2L)).toDF("qid", "rank", "nid")
    val out = Retrieval.rankedEval(ranked, Seq.empty[(Long, Long, Double)]
        .toDF("qid", "nid", "grade"), k = 2)
      .collect()
    assert(out.length === 1, "unjudged query must still be emitted")
    assert(out(0).getDouble(1) === 0.0 && out(0).getDouble(2) === 0.0)

    // two docs with EQUAL grades: the ideal ordering must be
    // deterministic (nid asc), so a retrieval in (2, 1) order still
    // scores ndcg 1 — equal grades are interchangeable
    val r2 = Seq((8L, 1, 2L), (8L, 2, 1L)).toDF("qid", "rank", "nid")
    val q2 = Seq((8L, 1L, 2.0), (8L, 2L, 2.0)).toDF("qid", "nid", "grade")
    val m = Retrieval.rankedEval(r2, q2, k = 2).head()
    assert(m.getDouble(3) === 1.0, s"tied grades must give ndcg 1, got $m")

    // ADVICE r12: a qid whose ranked rows ALL sit beyond k zero-fills
    // instead of vanishing
    val beyond = Seq((9L, 5, 1L), (7L, 1, 1L)).toDF("qid", "rank", "nid")
    val z = Retrieval.rankedEval(beyond,
        Seq((9L, 1L, 1.0)).toDF("qid", "nid", "grade"), k = 2)
      .orderBy("qid").collect()
    assert(z.map(_.getLong(0)).toSeq === Seq(7L, 9L),
      "rank-beyond-k query must still be emitted")
    assert((1 to 5).forall(i => z(1).getDouble(i) === 0.0), z(1).toString)
  }

  test("calibrationReport: hand-computed bins and ECE; boundary, out-of-range and null contracts") {
    // bin 2 [0.2,0.3): conf (0.20, 0.25), labels (T, F)
    // bin 9 [0.9,1.0]: conf (0.95, 1.00), labels (T, T) — conf 1.0
    //                  closes into the TOP bin, no phantom bin 10
    // excluded: conf 1.5 / -0.1 / null, and a null label
    val rows = Seq(
      (Option(0.20), Option(true)), (Option(0.25), Option(false)),
      (Option(0.95), Option(true)), (Option(1.00), Option(true)),
      (Option(1.50), Option(true)), (Option(-0.1), Option(true)),
      (Option.empty[Double], Option(true)), (Option(0.5), Option.empty[Boolean]))
      .toDF("conf", "y")
    val got = Retrieval.calibrationReport(rows, col("conf"), col("y"), nBins = 10)
      .orderBy("bin").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 9L))
    val b2 = got(0); val b9 = got(1)
    assert(b2.getLong(1) === 2L && b9.getLong(1) === 2L)
    assert(b2.getDouble(2) === 0.225 && b2.getDouble(3) === 0.5)
    assert(b9.getDouble(2) === 0.975 && b9.getDouble(3) === 1.0)
    // ECE = (2/4)*|0.5-0.225| + (2/4)*|1.0-0.975| = 0.1375 + 0.0125
    assert(b2.getLong(5) === 4L)
    assert(b2.getDouble(6) === 0.15 && b9.getDouble(6) === 0.15)
    assert(b2.getDouble(4) === 0.275 && b9.getDouble(4) === 0.025)

    // string labels under ANSI: a malformed value fails LOUDLY (the
    // engine-wide contract — no silent nulling), and a tolerant caller
    // passes try_cast, whose nulls must leave the row out of n AND the
    // averages together — filtering on the pre-cast label would count
    // the row in n while avg skips it, splitting the ECE denominator
    val strRows = Seq(("0.25", "yes"), ("0.25", "no"), ("0.25", "maybe"))
      .toDF("conf", "y")
    intercept[Exception] {
      Retrieval.calibrationReport(strRows,
        col("conf").cast("double"), col("y"), nBins = 10).collect()
    }
    val sb = Retrieval.calibrationReport(strRows,
      col("conf").cast("double"), expr("try_cast(y AS boolean)"),
      nBins = 10).head()
    assert(sb.getLong(1) === 2L, s"null-cast label must not count in n: $sb")
    assert(sb.getDouble(3) === 0.5 && sb.getLong(5) === 2L)
  }
}
