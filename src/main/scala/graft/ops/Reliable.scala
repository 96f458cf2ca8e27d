package graft.ops

import org.apache.spark.sql.DataFrame

/** Fault-tolerance seam for the operators that must eagerly materialize
  * an intermediate frame (iterative label propagation, Lloyd training,
  * probe assignments, pre-overwrite reads).
  *
  * `localCheckpoint` is the right default for a single-JVM deployment:
  * it truncates lineage and materializes without touching disk outside
  * the executors. But its blocks live ONLY on executors with lineage
  * gone — on a real cluster, losing one executor mid-iteration fails
  * the job unrecoverably. Routing every such site through this object
  * gives cluster deployments a one-line opt-in to reliable,
  * replicated-storage checkpoints:
  *
  * {{{
  *   spark.sparkContext.setCheckpointDir("hdfs://…/graft-ckpt")
  * }}}
  *
  * When a checkpoint dir is configured, `checkpoint(df)` uses Spark's
  * reliable `Dataset.checkpoint()` (files in the checkpoint dir survive
  * executor loss; set `spark.cleaner.referenceTracking.cleanCheckpoints
  * =true` to GC superseded rounds, or clear the dir between jobs).
  * Otherwise it falls back to `localCheckpoint()`. Results are
  * identical either way (spec-asserted); only the failure story
  * changes.
  */
private[graft] object Reliable {

  /** Eagerly materialize `df` with lineage truncation — reliable when
    * the context has a checkpoint dir, local otherwise. */
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
