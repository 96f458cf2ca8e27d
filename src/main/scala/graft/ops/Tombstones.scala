package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone-table lifecycle for the persisted-index erasure
  * paths (the IVF index keys deletes on `nid`, the BM25 index on
  * `doc_id`): ONE definition of the `$path/tombstones` append / exists
  * / read / clear plumbing and of the fully-tombstoned-partition
  * cleanup, so a fix in one erasure path cannot silently miss the
  * other — the r11 review caught exactly that divergence (the IVF
  * purge dropped emptied partition dirs; the hand-copied BM25 mirror
  * didn't).
  */
private[ops] object Tombstones {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append delete ids (single column `idCol`) to the tombstone table. */
  def append(ids: DataFrame, idCol: String, path: String): Unit =
    ids.select(col(idCol))
      .write.mode("append").parquet(s"$path/tombstones")

  /** The LOGICAL delete set — deduped at the read seam: erasure
    * requests are routinely re-issued (retries, idempotent upstream
    * jobs), and every consumer treats the table as a set (anti/semi
    * joins), so raw row count must never inflate the probe paths'
    * broadcastSmall rail or the broadcast itself. */
  def read(spark: SparkSession, path: String, idCol: String): DataFrame =
    spark.read.parquet(s"$path/tombstones").select(col(idCol)).distinct()

  def clear(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Dynamic partition overwrite only replaces partitions PRESENT in
    * the write — a fully-tombstoned partition keeps its stale
    * directory. Drop the named partition dirs explicitly (values are
    * pre-rendered `col=value` dir names). */
  def dropPartitionDirs(spark: SparkSession, tablePath: String,
                        dirs: Iterable[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dirs.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/$d"), true))
  }
}
