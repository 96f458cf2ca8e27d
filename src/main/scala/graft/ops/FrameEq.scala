package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiset (bag) equality of two same-schema frames in ONE Spark job.
  *
  * The lifecycle queries asserted "maintenance preserved logical state
  * verbatim" as `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` —
  * two actions, each planning a full except-all (and on the equal-state
  * happy path BOTH always run; the short-circuit never fires). The
  * per-row-count compare below is the same predicate — multiset diff
  * empty in both directions ⟺ per-distinct-row counts equal — in a
  * single aggregate + full-outer join + emptiness probe. Grouping and
  * exceptAll share Spark's binary row-equality semantics (null == null,
  * NaN == NaN, -0.0 == 0.0), so the answer is identical.
  *
  * Callers pass materialized (checkpointed) or cheap frames — the same
  * contract the exceptAll pair already required. */
private[graft] object FrameEq {

  def equalAsMultisets(a: DataFrame, b: DataFrame): Boolean = {
    require(a.columns.sameElements(b.columns),
      s"frame schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val keys = a.columns.toSeq
    // the join must be NULL-SAFE on every key (r16 ADVICE): a plain
    // USING join never matches null keys, so two equal frames carrying
    // a null would produce two unmatched rows and compare UNEQUAL —
    // contradicting the exceptAll semantics this check replaces.
    // Sides are renamed apart first: callers routinely pass frames
    // sharing lineage, where same-name attribute references would make
    // the <=> condition ambiguous.
    val ca = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__feq_ca"))
      .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__feq_a$i") }
        :+ col("__feq_ca"): _*)
    val cb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__feq_cb"))
      .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__feq_b$i") }
        :+ col("__feq_cb"): _*)
    val cond = keys.indices
      .map(i => col(s"__feq_a$i") <=> col(s"__feq_b$i")).reduce(_ && _)
    ca.join(cb, cond, "full_outer")
      .filter(not(col("__feq_ca") <=> col("__feq_cb")))
      .isEmpty
  }
}
