package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Merge

/** Generative properties of the keyed partial-column merge — the
  * reference's core invariant (SURVEY §2.10 T5): every write path is an
  * upsert, so replaying any batch must be a no-op, regardless of key
  * overlap or update-column subset. (Raw ScalaCheck Gen with fixed
  * seeds — the scalatest bridge artifact is not in the offline cache.) */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.chooseNum(0L, 15L)
    a <- Gen.chooseNum(-100.0, 100.0)
    b <- Gen.chooseNum(0L, 1000L)
  } yield (k, a, b)

  private val tableGen: Gen[List[(Long, Double, Long)]] = for {
    n <- Gen.chooseNum(0, 20)
    rows <- Gen.listOfN(n, rowGen)
  } yield rows.groupBy(_._1).map(_._2.head).toList  // unique per key

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val updateColChoices = Seq(Seq("v"), Seq("n"), Seq("v", "n"))

  test("property: upsert(upsert(e, i), i) == upsert(e, i) for random tables") {
    (0 until 10).foreach { s =>
      val ex = sample(tableGen, s * 2L + 1)
      val in = sample(tableGen, s * 2L + 2)
      val updateCols = updateColChoices(s % updateColChoices.size)
      val e = ex.toDF("k", "v", "n")
      val i = in.toDF("k", "v", "n")
      val once = Merge.upsert(e, i, Seq("k"), updateCols)
      val twice = Merge.upsert(once, i, Seq("k"), updateCols)
      assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
        s"not idempotent for seed $s updateCols=$updateCols ex=$ex in=$in")
    }
  }

  test("property: upsert output keys == union of input keys; one row per key") {
    (0 until 10).foreach { s =>
      val ex = sample(tableGen, 100 + s * 2L)
      val in = sample(tableGen, 101 + s * 2L)
      val out = Merge.upsert(ex.toDF("k", "v", "n"), in.toDF("k", "v", "n"),
        Seq("k"), Seq("v"))
      val outKeys = out.select("k").collect().map(_.getLong(0)).toSet
      assert(outKeys === (ex.map(_._1).toSet ++ in.map(_._1).toSet))
      assert(out.count() === outKeys.size.toLong)
    }
  }

  test("property: non-update columns of matched keys keep existing values") {
    (0 until 10).foreach { s =>
      val ex = sample(tableGen, 200 + s * 2L)
      val in = sample(tableGen, 201 + s * 2L)
      val out = Merge.upsert(ex.toDF("k", "v", "n"), in.toDF("k", "v", "n"),
          Seq("k"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      ex.foreach { case (k, _, n) => assert(out(k) === n, s"seed $s key $k") }
    }
  }
}
