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

  test("snapshotDiff of two key-bucketed snapshots plans no shuffle") {
    // the snapshotDiff scaladoc's bucketed posture made real: daily
    // snapshots stored bucketed on the diff key full-outer join with
    // zero exchanges — the diff of two 100 TB snapshots reads
    // co-partitioned buckets in place
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc-wh").toString
    val o = schema.Tables.load(spark, sfDir, "orders")
    val oldSnap = o.filter(col("o_orderkey") % 3 =!= 0)
      .select("o_orderkey", "o_orderstatus")
    val newSnap = o.filter(col("o_orderkey") % 3 =!= 1)
      .select("o_orderkey", "o_orderstatus")

    spark.sql("DROP TABLE IF EXISTS snap_old")
    spark.sql("DROP TABLE IF EXISTS snap_new")
    oldSnap.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/snap_old").saveAsTable("snap_old")
    newSnap.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/snap_new").saveAsTable("snap_new")

    val diff = graft.ops.Merge.snapshotDiff(
      spark.table("snap_old"), spark.table("snap_new"), Seq("o_orderkey"))
    diff.count() // force AQE final plan
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed snapshot diff must not re-shuffle either side:\n" + plan)
    // classification identical to the unbucketed path
    val unbucketed = graft.ops.Merge.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
    assert(diff.groupBy("change_op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      unbucketed.groupBy("change_op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("persisted band index round trip: stored bucketed, probe answers unchanged") {
    // the Dedup.bandIndex docstring's storage posture made real: the
    // corpus's band rows persist ONCE, bucketed on the probe key, and
    // a later batch dedups against the stored rows — answers identical
    // to probing the freshly-computed index
    import graft.ops.Dedup
    val wh = java.nio.file.Files.createTempDirectory("graft-band-wh").toString
    val d = schema.Tables.load(spark, sfDir, "documents")
    val batch = d.filter(col("doc_id") % 5 === 0)
    val corpus = d.filter(col("doc_id") % 5 =!= 0)

    spark.sql("DROP TABLE IF EXISTS band_idx")
    Dedup.bandIndex(corpus, "doc_id", "text")
      .write.bucketBy(4, "band_key").sortBy("band_key")
      .option("path", s"$wh/band_idx").saveAsTable("band_idx")

    val fresh = Dedup.incrementalCandidates(
        Dedup.bandIndex(batch, "doc_id", "text"),
        Dedup.bandIndex(corpus, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val stored = Dedup.incrementalCandidates(
        Dedup.bandIndex(batch, "doc_id", "text"),
        spark.table("band_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(stored === fresh && fresh.nonEmpty)
  }
}
