package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional-sink seam for [[Merge]] semantics.
  *
  * [[Merge.upsert]] is deliberately pure — it RETURNS the merged table
  * state. Getting that state durably into a warehouse is the sink's
  * job, and the right mechanics differ per storage; this trait is the
  * one surface a pipeline writes through, so swapping storage never
  * touches pipeline code:
  *
  *  - plain parquet ([[ParquetMergeSink]]): read back ONLY the date
  *    partitions the batch touches (partition-pruned), merge, rewrite
  *    exactly those partitions via dynamic partition overwrite —
  *    O(day), not O(table), per daily batch;
  *  - JDBC warehouse ([[JdbcMergeSink]]): stream the incoming slice as
  *    batched keyed upserts, one connection per partition — the
  *    reference's `INSERT … ON DUPLICATE KEY UPDATE` shape
  *    (SqlDbEtl.py:49-70) without its row-at-a-time round trips;
  *  - Delta/Iceberg: `merge(incoming, keys, updateCols)` maps 1:1 onto
  *    the transactional statement
  *    {{{
  *    MERGE INTO target t USING incoming s
  *      ON  t.k1 = s.k1 AND … -- one conjunct per key
  *      WHEN MATCHED THEN UPDATE SET c = s.c, … -- one per updateCol
  *      WHEN NOT MATCHED THEN INSERT *
  *    }}}
  *    (DeltaTable.merge / Iceberg's Spark SQL extension). Not shipped
  *    here — the sandbox build has no table-format jars — but an
  *    implementation is a ~10-line class against this trait, and it is
  *    what a 100 TB deployment with concurrent readers should use: the
  *    parquet sink's dynamic overwrite is atomic per partition
  *    directory only, not across the whole commit.
  *
  * Contract (same as Merge.upsert, spec-asserted): incoming unique per
  * key; matched rows update `updateCols` only; unmatched rows insert
  * whole; other existing rows byte-untouched. Re-applying a batch is a
  * no-op (idempotent), so at-least-once delivery upstream is safe.
  */
trait MergeSink {
  /** Apply one incoming batch to the sink's durable table state. */
  def merge(incoming: DataFrame, keys: Seq[String], updateCols: Seq[String]): Unit

  /** Read back the current durable table state. */
  def read(): DataFrame
}

/** [[MergeSink]] over a date-partitioned parquet layout
  * (Scale.writeDatePartitioned's posture). `keys` must include
  * `dateCol` — rows never move between date partitions under merge, so
  * each batch reads and rewrites only its own dates.
  *
  * First batch creates the layout; later batches partition-prune their
  * read-back to the touched dates (collected to the driver — bounded by
  * dates-per-batch, the same scalar posture as the watermark reads).
  * The read-back's partition column is cast to the incoming column's
  * type, so partition-value inference (string "2024-01-01" read back as
  * DATE) can never fail the merge's strict schema check. */
final class ParquetMergeSink(spark: SparkSession, path: String, dateCol: String,
                             keyCol: Option[String] = None,
                             filesPerPartition: Int = 1) extends MergeSink {

  def merge(incoming: DataFrame, keys: Seq[String], updateCols: Seq[String]): Unit = {
    require(keys.contains(dateCol),
      s"$dateCol must be a merge key — rows cannot move between date partitions")
    val (fs, root) = Scale.resolve(spark, path)
    if (!fs.exists(root)) {
      Scale.writeDatePartitioned(incoming, path, dateCol, keyCol, filesPerPartition)
    } else {
      val touched = incoming.select(col(dateCol)).distinct().collect().map(_.get(0))
      require(!touched.contains(null), s"null $dateCol in incoming batch")
      if (touched.nonEmpty) {
        val existing = read()
          .withColumn(dateCol, col(dateCol).cast(incoming.schema(dateCol).dataType))
          .select(incoming.columns.map(col): _*)
          .filter(col(dateCol).isin(touched: _*))
        val merged = Merge.upsert(existing, incoming, keys, updateCols)
          // materialize BEFORE the overwrite deletes the files it reads
          .transform(Reliable.checkpoint)
        Scale.overwriteTouchedDates(merged, path, dateCol, keyCol, filesPerPartition)
      }
    }
  }

  def read(): DataFrame = spark.read.parquet(path)
}

/** [[MergeSink]] over a live JDBC warehouse: the batch streams straight
  * to the database as dialect-specific keyed upserts
  * ([[graft.sources.JdbcSource.upsertWrite]]) — no read-modify-write
  * cycle at all; the database's own key constraint does the matching.
  * Derby's MERGE dialect makes this sink fully testable offline
  * (IntegrationSpec); against the reference's MySQL, pass the default
  * MySQL dialect. */
final class JdbcMergeSink(spark: SparkSession, url: String, table: String,
                          props: java.util.Properties,
                          dialect: graft.sources.JdbcSource.UpsertDialect =
                            graft.sources.JdbcSource.MySqlUpsertDialect,
                          batchSize: Int = 1000) extends MergeSink {

  def merge(incoming: DataFrame, keys: Seq[String], updateCols: Seq[String]): Unit =
    graft.sources.JdbcSource.upsertWrite(
      incoming, url, table, keys, updateCols, props, batchSize, dialect)

  def read(): DataFrame = graft.sources.JdbcSource.dimension(spark, url, table, props)
}
