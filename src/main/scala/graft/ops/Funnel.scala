package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel: which keys performed step 1, then step 2
  * strictly after it, then step 3 after that … optionally all within a
  * bounded horizon of the first step. The product-analytics twin of the
  * reference's event tables (events → signup/view/click/purchase), and
  * the batch shape of a "did the user convert" query.
  *
  * Scale shape: per stage, the step-i events are projected to fixed-width
  * (key, ts) rows — the fact table's payload never shuffles — and joined
  * on the key to the previous stage's per-key frame (|keys| rows), then
  * reduced by groupBy(key).min(ts). The step-i (key, ts) rows themselves
  * DO shuffle when the per-key frame is too large to broadcast (each
  * event must meet its own key's previous-step time — that comparison
  * cannot pre-aggregate), so a funnel over 10^12 events costs S
  * hash-joins of narrow rows; nothing is ever a global sort or a window
  * over the raw stream.
  */
object Funnel {

  /** Per-key completion times, long format: one row per (key, step)
    * reached, with the step's completion timestamp. Step i (1-based) is
    * the EARLIEST `stepCol == steps(i-1)` event strictly after the
    * key's step-(i−1) time; step 1 is the key's earliest first-step
    * event. With `withinSeconds`, later steps must also land within
    * that horizon of the key's step-1 time (the funnel window).
    */
  def stageTimes(df: DataFrame, keyCol: String, tsCol: String,
                 stepCol: String, steps: Seq[String],
                 withinSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")

    val k = col(keyCol)
    // stage 1: earliest first-step event per key
    val first = df.filter(col(stepCol) === steps.head)
      .groupBy(k).agg(min(col(tsCol)).as("__t"))
      .select(k, col("__t").as("__t1"), col("__t"))

    // each later stage: min ts after the previous stage's time
    // (and within the horizon of t1 when bounded)
    val frames = steps.tail.scanLeft(first) { (prev, step) =>
      val horizon = withinSeconds match {
        case Some(s) =>
          col(tsCol) <= (col("__t1") + expr(s"INTERVAL $s SECONDS"))
        case None => lit(true)
      }
      df.filter(col(stepCol) === step)
        .select(k, col(tsCol))
        .join(prev.select(k, col("__t1"), col("__t")), Seq(keyCol))
        .filter(col(tsCol) > col("__t") && horizon)
        .groupBy(k, col("__t1"))
        .agg(min(col(tsCol)).as("__t"))
        .select(k, col("__t1"), col("__t"))
    }

    frames.zip(steps).zipWithIndex.map { case ((frame, step), i) =>
      frame.select(k,
        lit(i + 1).cast("long").as("step"),
        lit(step).as("stage"),
        col("__t").as("step_ts"))
    }.reduce(_.union(_))
  }

  /** Funnel summary: per step, how many keys reached it and the
    * conversion rate vs step 1 (IEEE double division of two exact
    * counts — bit-identical in any engine — rounded to 4 dp). One row
    * per step.
    */
  def summary(df: DataFrame, keyCol: String, tsCol: String,
              stepCol: String, steps: Seq[String],
              withinSeconds: Option[Long] = None): DataFrame = {
    val times = stageTimes(df, keyCol, tsCol, stepCol, steps, withinSeconds)
    // literal step spine so a stage no key reached still emits keys=0
    // (matching the SQL COUNT-of-empty semantics)
    val spine = df.sparkSession.createDataFrame(
      steps.zipWithIndex.map { case (st, i) => ((i + 1).toLong, st) })
      .toDF("step", "stage")
    val perStep = spine.join(
        times.groupBy(col("step"), col("stage")).agg(count(lit(1)).as("__k")),
        Seq("step", "stage"), "left")
      .select(col("step"), col("stage"), coalesce(col("__k"), lit(0L)).as("keys"))
    // step-1 count: 1-row broadcast scalar
    val base = perStep.filter(col("step") === 1)
      .select(col("keys").as("__base"))
    perStep.crossJoin(broadcast(base))
      .select(col("step"), col("stage"), col("keys"),
        // base = 0 (no key ever completed step 1 — a misspelled step
        // name or an empty day) must yield NULL conversions, not the
        // NaN of 0.0/0.0 that fails every downstream threshold compare
        // silently and breaks JSON serializers
        when(col("__base") > 0,
          round(col("keys").cast("double") / col("__base").cast("double"), 4))
          .as("conversion"))
      .orderBy(col("step"))
  }
}
