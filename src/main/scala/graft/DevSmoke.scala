package graft
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"ENTRY_ROWS=${SparkEntry.entry(spark).count()}")
    for (q <- Seq("q_blocklist_filter", "q_merge_upsert"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"$q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
