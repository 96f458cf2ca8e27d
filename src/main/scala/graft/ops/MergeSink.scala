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
  *  - Delta/Iceberg ([[SqlMergeSink]]): `merge(incoming, keys,
  *    updateCols)` maps 1:1 onto the transactional statement
  *    {{{
  *    MERGE INTO target t USING incoming s
  *      ON  t.k1 = s.k1 AND … -- one conjunct per key
  *      WHEN MATCHED THEN UPDATE SET c = s.c, … -- one per updateCol
  *      WHEN NOT MATCHED THEN INSERT *
  *    }}}
  *    issued through `spark.sql` — no compile-time table-format
  *    dependency at all; Spark's parser owns MERGE INTO and the
  *    session's catalog (Delta, Iceberg, any row-level-operation v2
  *    source) executes it transactionally. This is what a 100 TB
  *    deployment with concurrent readers should use: the parquet
  *    sink's dynamic overwrite is atomic per partition directory only,
  *    not across the whole commit.
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

/** [[MergeSink]] over a transactional catalog table (Delta Lake,
  * Iceberg, or any v2 source with row-level-operation support) via
  * ANSI `MERGE INTO` — the sink a 100 TB deployment with concurrent
  * readers should run.
  *
  * Deliberately ZERO compile-time table-format dependency: Spark's own
  * parser owns the MERGE INTO syntax (it analyzes to
  * `MergeIntoTable`), and the format jars on the DEPLOYMENT classpath
  * (`delta-spark` + `spark.sql.extensions=io.delta.sql.
  * DeltaSparkSessionExtension`, or Iceberg's runtime jar + catalog)
  * execute it as one atomic commit. The sandbox build intentionally
  * carries no such jar (zero-egress resolver — the delta-spark
  * resolution attempt fails offline, recorded in build.sbt), so the
  * statement-construction contract is what's verified here:
  * MergeSinkSqlSpec parses the generated SQL with Spark's parser and
  * asserts the resulting `MergeIntoTable` plan matches key-conjunct /
  * update-assignment / insert-star semantics exactly; the live
  * lifecycle test self-gates on a merge-capable catalog being present.
  *
  * First batch: if `table` does not exist it is created through the
  * DataFrameWriterV2 (`writeTo(table).create()`), picking up the
  * catalog's native format (a Delta catalog creates a Delta table).
  * Idempotency: same contract as [[Merge.upsert]] — re-applying a
  * batch re-asserts the same column values, a no-op. */
final class SqlMergeSink(spark: SparkSession, table: String) extends MergeSink {

  def merge(incoming: DataFrame, keys: Seq[String], updateCols: Seq[String]): Unit = {
    require(keys.nonEmpty, "at least one merge key required")
    require(updateCols.nonEmpty, "at least one update column required")
    if (!spark.catalog.tableExists(table)) {
      incoming.writeTo(table).create()
    } else {
      val view = s"__graft_merge_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      incoming.createOrReplaceTempView(view)
      try spark.sql(SqlMergeSink.mergeSql(table, view, keys, updateCols))
      finally spark.catalog.dropTempView(view)
    }
  }

  def read(): DataFrame = spark.table(table)
}

object SqlMergeSink {
  /** The exact statement [[SqlMergeSink.merge]] issues — factored out
    * so the spec can parse and structurally assert it. Column names are
    * backtick-quoted (caller-supplied identifiers); `target` is passed
    * through verbatim so multi-part catalog names work. */
  def mergeSql(target: String, sourceView: String,
               keys: Seq[String], updateCols: Seq[String]): String = {
    def q(c: String) = "`" + c.replace("`", "``") + "`"
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val sets = updateCols.map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")
    s"""MERGE INTO $target t USING $sourceView s
       |ON $on
       |WHEN MATCHED THEN UPDATE SET $sets
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin
  }
}
