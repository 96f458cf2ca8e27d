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
    * watermark predicate is pushed into the generated per-partition
    * WHERE clauses, so each of `numPartitions` tasks streams a disjoint
    * created_at range directly from the database — no driver
    * materialization, no full-table scan. */
  def incrementalSlice(spark: SparkSession, url: String, table: String,
                       tsCol: String, lo: Timestamp, hi: Timestamp,
                       numPartitions: Int,
                       props: java.util.Properties): DataFrame =
    spark.read
      .option("partitionColumn", tsCol)
      .option("lowerBound", lo.toString)
      .option("upperBound", hi.toString)
      .option("numPartitions", numPartitions.toString)
      // dbtable pushdown: predicate evaluated server-side per partition
      .option("dbtable",
        s"(SELECT * FROM $table WHERE $tsCol > '$lo' AND $tsCol <= '$hi') AS t")
      .jdbc(url, table, props)

  /** Keyed dimension read (small; single partition, broadcast by the
    * consumer). */
  def dimension(spark: SparkSession, url: String, table: String,
                props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)
}
