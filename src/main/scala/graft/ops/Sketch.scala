package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency sketching: heavy hitters by count-min sketch cross-checked
  * against exact counts. The CMS is the fixed-memory, mergeable
  * frequency summary for key spaces too large to count exactly (the
  * companion of the HLL distinct sketch in q_approx_distinct); its
  * one-sided guarantee — estimate ≥ true, ≤ true + eps·N with
  * probability ≥ confidence — is surfaced as driver-visible booleans,
  * the same assertion-oracle posture as the other approximate ops.
  */
object Sketch {

  /** Keys carrying at least `support` of all rows, with exact counts
    * and CMS quality booleans. Fully lazy — one plan: an aggregation
    * builds (total, sketch) as a 1-row frame, broadcast to the exact
    * per-key counts (≤ 1/support heavy keys by definition), each probed
    * in place via the graft_cms_estimate expression. No driver-side
    * sketch handling, so the query is plan-gateable like every other
    * entry.
    *
    * NULL keys are excluded on BOTH sides (the CMS aggregate skips
    * them; excluding them from the exact counts keeps the bounds
    * comparison meaningful). Deterministic for a fixed `seed`, so the
    * booleans are stable to hash-compare. At 100 TB the exact groupBy
    * is the part you'd replace (sketch-probed candidates from a
    * sample); here it is the point — the oracle states the exact
    * counts the sketch must bound.
    */
  def heavyHittersCms(df: DataFrame, keyCol: String, support: Double,
                      eps: Double = 0.001, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    require(support > 0 && support < 1, "support must be in (0, 1)")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val in = df.filter(col(keyCol).isNotNull)
    val sk = in.agg(
      count(lit(1)).as("__total"),
      count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
        .as("__cms"))
    val est = column(graft.expr.catalyst.CmsEstimate(
      expression(col("__cms")), expression(col(keyCol))))
    in.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .filter(col("n") >= col("__total") * support)
      .select(col(keyCol), col("n"),
        (est >= col("n")).as("est_ge_exact"),
        (est <= col("n") + ceil(col("__total") * eps).cast("long"))
          .as("est_within_eps"))
  }
}
