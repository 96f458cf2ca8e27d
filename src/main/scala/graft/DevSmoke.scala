package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — not part of the driver contract. */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = "/root/testdata/sf0.1"
    val docs = schema.Tables.load(spark, dir, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    import ops.Dedup._
    time("shingles only") {
      docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).first(); 1L
    }
    time("sig k=12") {
      docs.select(col("doc_id"),
        minhashSignature(col("text"), 3, 12).as("sig"))
        .select(sum(size(col("sig")))).first(); 1L
    }
    val sig = docs.select(col("doc_id").as("id"),
      minhashSignature(col("text"), 3, 12).as("sig"))
    time("banded explode") {
      sig.select(col("id"), explode(lshBands(col("sig"), 2, 6)).as("band"))
        .count()
    }
    time("full pairs") {
      minhashLshPairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
