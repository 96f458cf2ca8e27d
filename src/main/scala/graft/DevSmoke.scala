package graft

import org.apache.spark.sql.SparkSession

/** Dev t1 smoke (mirrors the driver's check): entry(spark) must return
  * rows > 0 on sf0.001, and every declared query must at least execute
  * there. Not part of the driver contract. */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"ENTRY_ROWS=${SparkEntry.entry(spark).count()}")

    val dir = "/root/testdata/sf0.001"
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        println(f"$name%-24s rows=$n")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"$name FAILED: ${e.getMessage}")
      }
    }
    println(s"FAILED_QUERIES=$failed")
    spark.stop()
  }
}
