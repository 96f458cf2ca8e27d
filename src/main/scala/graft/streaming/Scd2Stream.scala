package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Merge, Reliable, Scale}

/** Streamed SCD Type-2 maintenance — the `foreachBatch` face of
  * [[Merge.scd2Upsert]]: a stream of dimension-attribute updates
  * maintains a persisted versioned history, so every fact joined later
  * can see the dimension AS IT WAS at the fact's own time
  * ([[Merge.scd2AsOf]]), and the warehouse's slowly-changing
  * dimensions keep up with arrivals without batch rebuilds.
  *
  * Each micro-batch carries keys + attributes + an event-time column;
  * the batch's version timestamp is max(tsCol) over the batch —
  * derived from the DATA, so a redelivered batch computes the same
  * timestamp and the idempotence of [[Merge.scd2Upsert]] at a fixed ts
  * composes with the [[StreamOnce]] markers. Within-batch duplicates
  * collapse last-writer-wins on tsCol (the unique-per-key upsert
  * contract).
  *
  * Layout: history parquet under `historyPath/state` (the
  * [[ProfileStream]] convention — the state overwrite cannot clobber
  * the sibling `_stream_batches` markers at the root). The state
  * rewrite is non-atomic, so markers stage exactly-once: committed
  * replays skip, partial applies fail loudly with the rebuild remedy.
  */
object Scd2Stream {

  /** foreachBatch writer applying each micro-batch to the persisted
    * SCD-2 history at `historyPath`. First batch bootstraps the
    * history. */
  def scd2Batch(historyPath: String, keys: Seq[String],
                tsCol: String): (DataFrame, Long) => Unit =
    (batchDf, batchId) => {
      val spark = batchDf.sparkSession
      // a committed replay skips BEFORE any batch materialization —
      // recovery-window redeliveries must cost one marker stat, not a
      // checkpoint plus a validation scan (appliedOnce re-checks under
      // its own marker protocol regardless)
      if (!StreamOnce.isCommitted(spark, historyPath, batchId)) {
      // validate BEFORE the exactly-once marker opens: a batch with
      // rows but an all-null event-time column would open versions with
      // null valid_from and never close them (two 'current' rows per
      // key — corrupt history). Refusing out here leaves NO started
      // marker, so a fixed redelivery of the same batch id applies
      // cleanly instead of tripping the partial-apply guard. The
      // max(ts) scan doubles as the batch version timestamp — computed
      // ONCE, reused inside the apply.
      val rawOpt =
        if (batchDf.isEmpty) None else Some(Reliable.checkpoint(batchDf))
      val tsOpt = rawOpt.map { raw =>
        val t = raw.agg(max(col(tsCol))).first().getTimestamp(0)
        require(t != null,
          s"SCD-2 batch $batchId has rows but $tsCol is all null — " +
            "cannot derive the batch version timestamp; fix the feed " +
            "or filter null event times upstream")
        t
      }
      StreamOnce.appliedOnce(spark, historyPath, batchId, "SCD-2 history") {
        rawOpt.zip(tsOpt).foreach { case (raw, batchTs) =>
          val incoming = Merge.lastWriterWins(raw, keys, Seq(col(tsCol)))
            .drop(tsCol)
          val statePath = s"$historyPath/state"
          val (fs, root) = Scale.resolve(spark, statePath)
          val history =
            if (fs.exists(root)) spark.read.parquet(statePath)
            else incoming
              .withColumn("valid_from", lit(null).cast("timestamp"))
              .withColumn("valid_to", lit(null).cast("timestamp"))
              .filter(lit(false))
          val next = Reliable.checkpoint(
            Merge.scd2Upsert(history, incoming, keys, lit(batchTs)))
          next.write.mode("overwrite").parquet(statePath)
        }
      }
      }
    }
}
