package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run named queries against a fixture dir and print rows.
  * `SPARK_GRAFT_SF_DIR=… tools/run.sh graft.DevQuery q_simhash_precision` */
object DevQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      println(s"===== $q @ $dir =====")
      SparkEntry.queries(q)(spark, dir).show(50, truncate = false)
    }
    spark.stop()
  }
}
