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
    val ca = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cb"))
    ca.join(cb, keys, "full_outer")
      .filter(not(col("__ca") <=> col("__cb")))
      .isEmpty
  }
}
