package graft

import org.apache.spark.sql.functions._

import graft.ops.FrameEq

/** equalAsMultisets semantics — especially the null-safe join seam
  * (r16 ADVICE: a plain USING join never matches null keys, so two
  * equal null-bearing frames compared UNEQUAL). */
class FrameEqSpec extends SparkSpec {
  import spark.implicits._

  test("equal frames with null keys compare EQUAL (null-safe join)") {
    val a = Seq((Some(1), Some("x")), (None, Some("y")), (None, None))
      .toDF("k", "v")
    val b = Seq((None, None), (Some(1), Some("x")), (None, Some("y")))
      .toDF("k", "v")
    assert(FrameEq.equalAsMultisets(a, b))
  }

  test("null-bearing frames differing in multiplicity compare UNEQUAL") {
    val a = Seq((None, Some("y")), (None, Some("y")), (Some(1), Some("x")))
      .toDF("k", "v")
    val b = Seq((None, Some("y")), (Some(1), Some("x")), (Some(1), Some("x")))
      .toDF("k", "v")
    assert(!FrameEq.equalAsMultisets(a, b))
  }

  test("multiset semantics: same distinct rows, different counts, unequal") {
    val a = Seq(1, 1, 2).toDF("k")
    val b = Seq(1, 2, 2).toDF("k")
    assert(!FrameEq.equalAsMultisets(a, b))
    assert(FrameEq.equalAsMultisets(a, Seq(2, 1, 1).toDF("k")))
  }

  test("frames sharing lineage (self-derived sides) join unambiguously") {
    val base = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val a = base.filter(col("k") =!= 3)
    val b = base.filter(col("k") < 3)
    assert(FrameEq.equalAsMultisets(a, b))
    assert(!FrameEq.equalAsMultisets(a, base))
  }
}
