package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.FunnelStream

/** Generative properties for the round-7 retrieval/funnel logic (raw
  * ScalaCheck Gen with fixed seeds — same harness as MergePropertySpec).
  *
  *  - rrfFuse must equal the direct RRF formula for arbitrary ranking
  *    lists (doc-wise sum of 1/(k+rank) over the lists containing it);
  *  - the streaming funnel's replay machine must equal a direct
  *    reference implementation of the batch semantics (stage i at the
  *    MIN step-i timestamp strictly after stage i−1 and within the
  *    horizon of stage 1) on random event tapes — the same equivalence
  *    the stream==batch spec pins on fixtures, here across thousands
  *    of generated orderings.
  */
class RetrievalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: rrfFuse == direct formula on random ranking lists") {
    val listGen: Gen[Map[Long, Long]] = for {
      n <- Gen.chooseNum(0, 12)
      docs <- Gen.pick(n, 0L to 19L)
    } yield docs.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
    val caseGen = for {
      nLists <- Gen.chooseNum(1, 3)
      lists <- Gen.listOfN(nLists, listGen)
    } yield lists

    (1 to 60).foreach { seed =>
      val lists = sample(caseGen, seed.toLong)
      val dfs = lists.map(m =>
        m.toSeq.toDF("doc_id", "rank"))
      val got = graft.ops.TextIndex.rrfFuse(dfs, "doc_id", kRrf = 60)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val docs = lists.flatMap(_.keys).toSet
      docs.foreach { d =>
        val contribs = lists.flatMap(_.get(d)).map(r => 1.0 / (60.0 + r))
        val expected = BigDecimal(contribs.foldLeft(0.0)(_ + _))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (nl, score) = got(d)
        assert(nl === contribs.size.toLong, s"seed $seed doc $d n_lists")
        assert(math.abs(score - expected) < 1e-12,
          s"seed $seed doc $d: $score vs $expected")
      }
      assert(got.keySet === docs, s"seed $seed doc set")
    }
  }

  test("property: funnel replay machine == direct batch-semantics reference") {
    val steps = Seq("a", "b", "c")
    // reference: stage 1 at min ts of step a; stage i at min ts of
    // step i strictly after stage i-1 and within horizon of stage 1
    def reference(evts: Seq[(Long, String)], withinMs: Option[Long]): Seq[(Int, String, Long)] = {
      var out = List.empty[(Int, String, Long)]
      var prev = 0L
      var t1 = 0L
      steps.zipWithIndex.foreach { case (st, i) =>
        if (out.size == i) { // previous stage reached
          val cand = evts.filter(_._2 == st).map(_._1).filter { t =>
            if (i == 0) true
            else t > prev && withinMs.forall(h => t <= t1 + h)
          }
          if (cand.nonEmpty) {
            val t = cand.min
            if (i == 0) t1 = t
            prev = t
            out = out :+ ((i + 1, st, t))
          }
        }
      }
      out
    }
    val evtGen = for {
      t <- Gen.chooseNum(0L, 40L)
      s <- Gen.oneOf("a", "b", "c", "x")
    } yield (t, s)
    val tapeGen = for {
      n <- Gen.chooseNum(0, 24)
      evts <- Gen.listOfN(n, evtGen)
      horizon <- Gen.oneOf(Option.empty[Long], Some(15L), Some(1000L))
    } yield (evts, horizon)

    (1 to 500).foreach { seed =>
      val (evts, horizon) = sample(tapeGen, seed.toLong)
      val got = FunnelStream.replay(evts.sortBy(identity), steps,
        horizon.map(_ * 1L))
      val want = reference(evts, horizon)
      assert(got === want, s"seed $seed tape $evts horizon $horizon")
    }
  }
}
