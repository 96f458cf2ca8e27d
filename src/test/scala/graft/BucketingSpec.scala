package graft

import org.apache.spark.sql.functions._

/** Storage-bucketed co-located joins (SURVEY §7.6): two tables bucketed
  * on the join key must join WITHOUT a shuffle exchange — at 100 TB this
  * is the difference between re-shuffling both fact tables per join and
  * reading co-partitioned buckets in place. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle") {
    // tables carry explicit external paths (warehouse dir is a static
    // conf and cannot change post-session)
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString

    val orders = schema.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = schema.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
      col("o_orderkey") === col("l_orderkey"))
    joined.count() // force AQE final plan
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not re-shuffle either side:\n" + plan)
    // correctness unchanged vs plain join
    assert(joined.count() ===
      orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count())
  }
}
