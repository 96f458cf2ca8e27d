package graft

import java.util.Properties

import graft.sources.JdbcSource

/** Gated integration check for the one codepath the sandbox cannot
  * prove: [[JdbcSource.MySqlUpsertDialect]]'s `INSERT … ON DUPLICATE
  * KEY UPDATE` statement against a live MySQL. The surrounding
  * machinery (connection-per-partition, batching, commit cadence, bind
  * order) is Derby-proven offline (JdbcSourceSpec, IntegrationSpec);
  * this main replays the same scenario through the MySQL dialect when a
  * database exists.
  *
  * Run via `tools/mysql_upsert_check.sh` with:
  *   GRAFT_MYSQL_URL      jdbc:mysql://host:3306/db
  *   GRAFT_MYSQL_USER / GRAFT_MYSQL_PASSWORD
  * Creates and drops its own scratch table `graft_upsert_check`.
  * Exits 0 and prints PASS on success; throws otherwise. */
object MySqlUpsertCheck {
  def main(args: Array[String]): Unit = {
    val url = sys.env.getOrElse("GRAFT_MYSQL_URL",
      sys.error("GRAFT_MYSQL_URL not set — this check needs a live MySQL"))
    val props = new Properties()
    sys.env.get("GRAFT_MYSQL_USER").foreach(props.setProperty("user", _))
    sys.env.get("GRAFT_MYSQL_PASSWORD").foreach(props.setProperty("password", _))

    val spark = GraftSession.builder("graft-mysql-check").getOrCreate()
    import spark.implicits._
    val table = "graft_upsert_check"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"DROP TABLE IF EXISTS $table")
      st.execute(s"CREATE TABLE $table (k BIGINT, dt VARCHAR(10), v DOUBLE, " +
        "w VARCHAR(16), PRIMARY KEY (k, dt))")
      st.execute(s"INSERT INTO $table VALUES (1, 'd1', 1.0, 'keepme')")
      st.close()

      // same scenario as the Derby spec: 1 matches (V updates, W kept),
      // 2 and 3 insert; batchSize=2 exercises a mid-stream executeBatch;
      // a replay must be a no-op
      val batch = Seq((1L, "d1", 9.5, "ignored"), (2L, "d1", 2.0, "b"),
        (3L, "d2", 3.0, "c")).toDF("k", "dt", "v", "w")
      def apply(): Unit = JdbcSource.upsertWrite(batch, url, table,
        keys = Seq("k", "dt"), updateCols = Seq("v"), props = props,
        batchSize = 2, dialect = JdbcSource.MySqlUpsertDialect)
      apply(); apply()

      val got = JdbcSource.dimension(spark, url, table, props)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3))).sorted.toSeq
      val want = Seq((1L, "d1", 9.5, "keepme"), (2L, "d1", 2.0, "b"),
        (3L, "d2", 3.0, "c"))
      require(got == want, s"MySQL upsert mismatch: got $got want $want")
      conn.createStatement().execute(s"DROP TABLE $table")
      println("PASS mysql ON DUPLICATE KEY UPDATE upsert (update + insert + idempotent replay)")
    } finally {
      conn.close()
      spark.stop()
    }
  }
}
