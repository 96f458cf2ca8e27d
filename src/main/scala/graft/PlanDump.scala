package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of named queries (all
  * when no args) — the `.explain` audit loop for shuffle/broadcast/
  * pushdown review. `tools/run.sh graft.PlanDump q_hash_split …` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
