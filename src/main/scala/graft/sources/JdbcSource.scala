package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source shape for the reference's remote-MySQL tables (SURVEY
  * §2.1 S1/S2). The fixture harness reads parquet; against a live
  * warehouse these helpers produce the partitioned-parallel reads the
  * reference's single-connection `cursor.fetchall()` could not
  * (SqlDbEtl.py:49-70 pulls entire result sets into driver memory —
  * the S5 anti-pattern this module exists to eliminate).
  *
  * Untested here (zero-egress environment, no database); the surface is
  * exercised indirectly through the parquet-backed pipelines, which
  * consume the identical schemas (graft.schema.Schemas).
  */
object JdbcSource {

  /** Partitioned incremental slice read: the half-open (lo, hi]
    * watermark predicate is pushed into the database as a derived-table
    * subquery, so each of `numPartitions` tasks streams a disjoint
    * created_at range directly from the server — no driver
    * materialization, no full-table scan.
    *
    * The subquery is passed AS the `table` argument of `jdbc()`: Spark's
    * `DataFrameReader.jdbc` sets the dbtable option from that argument
    * AFTER user options, so an `option("dbtable", …)` set beforehand is
    * silently overwritten (VERDICT r2 item 2 — the previous shape read
    * the entire table; partitionColumn bounds only set stride, they do
    * not filter). The interpolated bounds come from `Timestamp.toString`,
    * whose output is structurally `yyyy-mm-dd hh:mm:ss[.f…]` — digits,
    * `-`, `:`, `.`, space only — so the literal cannot break out of its
    * quotes (no user-controlled strings reach this SQL). */
  def incrementalSlice(spark: SparkSession, url: String, table: String,
                       tsCol: String, lo: Timestamp, hi: Timestamp,
                       numPartitions: Int,
                       props: java.util.Properties): DataFrame = {
    val slice =
      s"(SELECT * FROM $table WHERE $tsCol > '$lo' AND $tsCol <= '$hi') AS t"
    spark.read
      .option("partitionColumn", tsCol)
      .option("lowerBound", lo.toString)
      .option("upperBound", hi.toString)
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, slice, props)
  }

  /** Keyed dimension read (small; single partition, broadcast by the
    * consumer). */
  def dimension(spark: SparkSession, url: String, table: String,
                props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  // ---- write side (S2 symmetry — SqlDbEtl.py:49-70 replacement) ----

  /** Plain append: Spark's batched multi-row INSERT per partition.
    * For insert-only facts (new date partitions) this is the whole
    * story — `numPartitions` concurrent connections, `batchsize` rows
    * per round trip. */
  def append(df: DataFrame, url: String, table: String,
             props: java.util.Properties, batchSize: Int = 1000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)

  /** Upsert-statement dialect: SQL has no standardized single-row
    * upsert (MySQL `ON DUPLICATE KEY UPDATE`, PostgreSQL `ON CONFLICT`,
    * Derby/DB2 one-row `MERGE`), so the statement text and its
    * parameter-marker order are a pluggable pair. Serializable: the
    * chosen dialect ships inside the per-partition write closure. */
  trait UpsertDialect extends Serializable {
    /** Single-row upsert statement with `?` markers. */
    def statement(table: String, cols: Seq[String], keys: Seq[String],
                  upd: Seq[String]): String
    /** Column names in parameter-position order for one row (a column
      * may repeat — e.g. key columns appear in both ON and INSERT). */
    def bindOrder(cols: Seq[String], keys: Seq[String], upd: Seq[String]): Seq[String]
  }

  /** MySQL — the reference warehouse's dialect (SqlDbEtl.py:58-70).
    * Compile-only in the sandbox (no live MySQL; see
    * tools/mysql_upsert_check.sh for the gated integration check). */
  object MySqlUpsertDialect extends UpsertDialect {
    def statement(table: String, cols: Seq[String], keys: Seq[String],
                  upd: Seq[String]): String =
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON DUPLICATE KEY UPDATE ${upd.map(c => s"$c = VALUES($c)").mkString(", ")}"
    def bindOrder(cols: Seq[String], keys: Seq[String], upd: Seq[String]): Seq[String] =
      cols
  }

  /** Derby/DB2 one-row MERGE via the 1-row dummy table (Derby's MERGE
    * source must be a base table, so the incoming row rides in the ON /
    * SET / VALUES parameter markers). Exercised end-to-end offline by
    * JdbcSourceSpec against embedded Derby — the proof that the whole
    * batched-upsert write path (connection-per-partition, batching,
    * commit cadence, bind order) works against a real database. */
  object DerbyMergeDialect extends UpsertDialect {
    def statement(table: String, cols: Seq[String], keys: Seq[String],
                  upd: Seq[String]): String =
      s"MERGE INTO $table USING SYSIBM.SYSDUMMY1 " +
        s"ON ${keys.map(k => s"$table.$k = ?").mkString(" AND ")} " +
        s"WHEN MATCHED THEN UPDATE SET ${upd.map(c => s"$c = ?").mkString(", ")} " +
        s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    def bindOrder(cols: Seq[String], keys: Seq[String], upd: Seq[String]): Seq[String] =
      keys ++ upd ++ cols
  }

  /** Keyed upsert write — the set-oriented replacement for the
    * reference's per-row `INSERT … ON DUPLICATE KEY UPDATE` round trips
    * (SqlDbEtl.py:58-70 via Bifrost.py:116-130 etc.): each PARTITION
    * opens one connection and streams the dialect's upsert statement as
    * a batched prepared statement, committing every `batchSize` rows.
    * N rows cost N/batchSize round trips across
    * `df.rdd.getNumPartitions` parallel connections, not N round trips
    * on one connection.
    *
    * `updateCols` empty ⇒ update all non-key columns (full-row upsert).
    * Row-level upserts are idempotent, so task retries are safe; a
    * mid-partition failure leaves earlier committed batches applied
    * (same at-least-once posture as the reference's per-row commits).
    *
    * The default dialect is MySQL (the reference's warehouse) — live-
    * untestable in the zero-egress sandbox; the [[DerbyMergeDialect]]
    * path proves the surrounding machinery against embedded Derby, and
    * the merge SEMANTICS are oracle-tested via ops.Merge.upsert. */
  def upsertWrite(df: DataFrame, url: String, table: String,
                  keys: Seq[String], updateCols: Seq[String],
                  props: java.util.Properties, batchSize: Int = 1000,
                  dialect: UpsertDialect = MySqlUpsertDialect): Unit = {
    val cols = df.columns.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains), s"bad keys $keys for $cols")
    val upd = if (updateCols.isEmpty) cols.filterNot(keys.contains) else updateCols
    require(upd.forall(cols.contains), s"bad updateCols $upd for $cols")
    require(upd.nonEmpty,
      s"every column of $table is a key — both dialects would render a " +
        "malformed UPDATE clause ('ON DUPLICATE KEY UPDATE' with no " +
        "assignments) that fails at the first executeBatch on every " +
        "partition; for a pure-key presence table use a plain " +
        "insert-ignore path instead")
    val sql = dialect.statement(table, cols, keys, upd)
    // pre-resolve marker position -> row ordinal once on the driver
    val bindIdx = dialect.bindOrder(cols, keys, upd).map(cols.indexOf).toArray
    require(bindIdx.forall(_ >= 0), "dialect bindOrder names unknown columns")
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { r =>
              var i = 0
              while (i < bindIdx.length) { st.setObject(i + 1, r.get(bindIdx(i))); i += 1 }
              st.addBatch()
              n += 1
              if (n % batchSize == 0) { st.executeBatch(); conn.commit() }
            }
            st.executeBatch(); conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
  }
}
