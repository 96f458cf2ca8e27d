package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

import graft.ops.Merge

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference's "streaming" is micro-batch-by-cron with a hand-rolled
  * watermark table (T1–T4). Here the same computations are written as
  * batch/stream-agnostic DataFrame transforms: applied to a batch frame
  * they are the oracle-checked queries; applied to a readStream frame
  * with `withWatermark` + checkpointing they subsume the reference's
  * etl_control machinery and add principled late-data handling (T5)
  * that the reference lacks.
  */
object EventStream {

  /** Tumbling 1-hour window per event type — the streaming-shaped
    * aggregation (same code runs in q_tumbling_window's batch oracle). */
  def hourlyTypeStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(38, 2)))
          .cast(DecimalType(38, 2)).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Watermarked variant for true streams: events later than
    * `lateness` behind the max seen ts are dropped and state is
    * reclaimed — bounded state at 100 TB/day rates. */
  def hourlyTypeStatsStreaming(events: DataFrame, lateness: String): DataFrame =
    hourlyTypeStats(events.withWatermark("ts", lateness))

  /** Streaming exact dedup on an id column under a watermark — the
    * streaming twin of Dedup.firstSeen (state: one key per id within
    * the lateness horizon). */
  def dedupStream(events: DataFrame, lateness: String, idCols: String*): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Watermarked stream-stream interval join: each left row pairs with
    * right rows sharing `keys` whose `rightTs` lies within
    * [leftTs − window, leftTs]. Both sides carry the same lateness
    * watermark, and the time-range predicate gives Spark the join
    * horizon it needs to EVICT state — without it a stream-stream join
    * buffers both streams forever (Spark refuses it in append mode for
    * that reason). State is bounded by rate × (lateness + window)
    * regardless of total stream volume — the property that lets this
    * run against an unbounded 100 TB/day feed.
    *
    * Batch twin: the identical join predicate on static frames (the
    * same code path — spec-asserted equal). Right-side non-key columns
    * must not clash with left's (rename upstream). */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keys: Seq[String], window: String,
                   lateness: Option[String] = None): DataFrame = {
    val (l, r) = lateness match {
      case Some(late) =>
        (left.withWatermark(leftTs, late), right.withWatermark(rightTs, late))
      case None => (left, right)
    }
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $window") &&
      r(rightTs) <= l(leftTs)
    keys.foldLeft(l.join(r, cond))((df, k) => df.drop(r(k)))
  }

  /** Incremental warehouse maintenance as a stream: every micro-batch
    * is merged into the keyed sink with the same Merge.upsert used in
    * batch (idempotent, so at-least-once replays are safe — the exact
    * property the reference relies on, SURVEY §2.10 T5).
    *
    * `mergeInto` receives (batchDf, batchId) and owns persistence;
    * checkpointLocation replaces the reference's etl_control table. */
  def incrementalWriter(transformed: DataFrame, checkpoint: String)(
      mergeInto: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    transformed.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(mergeInto)
}
