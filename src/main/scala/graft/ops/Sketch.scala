package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

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
    * and CMS quality booleans. One pass builds (total, sketch) — a
    * 1-row bounded collect; one exact groupBy finds the heavy keys
    * (≤ 1/support rows by definition — bounded); each heavy key is
    * probed against the deserialized sketch on the driver.
    *
    * Deterministic for a fixed `seed`, so the booleans are stable to
    * hash-compare. At 100 TB the exact groupBy is the part you'd drop
    * (sketch-only candidates from a sample instead); here it is the
    * point — the oracle states the exact counts the sketch must bound.
    */
  def heavyHittersCms(df: DataFrame, keyCol: String, support: Double,
                      eps: Double = 0.001, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    require(support > 0 && support < 1, "support must be in (0, 1)")
    val row = df.agg(
      count(lit(1)).as("n"),
      count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
        .as("cms")).head()
    val total = row.getLong(0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(row.getAs[Array[Byte]](1)))

    val heavy = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(support * total))
      .collect() // bounded: ≤ 1/support heavy keys can exist
    val bound = (eps * total).ceil.toLong
    val rows = heavy.toSeq.map { r =>
      val key = r.get(0)
      val exact = r.getLong(1)
      val est = cms.estimateCount(key)
      (key.toString, exact, est >= exact, est <= exact + bound)
    }
    df.sparkSession.createDataFrame(rows)
      .toDF(keyCol, "n", "est_ge_exact", "est_within_eps")
  }
}
