package graft

import org.apache.spark.sql.functions._

import graft.ops.Export

/** Sharded export + fixity manifest: validation must pass on an intact
  * export and flag exactly the tampered shard after corruption. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = (0L until 60L)
    .map(i => (i, s"doc $i body with ${"word " * (i % 5).toInt}tail"))
    .toDF("doc_id", "text")

  test("export shards deterministically; validation passes; totals conserved") {
    val p = java.nio.file.Files.createTempDirectory("graft-exp").toString
    Export.writeShards(corpus(), "doc_id", "text", p, nShards = 4)
    val v = Export.validateShards(spark, p, "text").collect()
    assert(v.nonEmpty && v.forall(_.getAs[Boolean]("ok")),
      "intact export must validate clean")
    // totals conserve the corpus
    val m = Export.readManifest(spark, p)
      .agg(sum(col("n_docs")), sum(col("n_chars"))).first()
    assert(m.getLong(0) === 60L)
    assert(m.getLong(1) === corpus().agg(sum(length(col("text"))))
      .first().getLong(0))
    // re-export is byte-deterministic: manifests identical
    val p2 = java.nio.file.Files.createTempDirectory("graft-exp2").toString
    Export.writeShards(corpus(), "doc_id", "text", p2, nShards = 4)
    val snap = (q: String) => Export.readManifest(spark, q).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDecimal(4))).toSet
    assert(snap(p) === snap(p2))
  }

  test("validation flags exactly the tampered shard") {
    val p = java.nio.file.Files.createTempDirectory("graft-expt").toString
    Export.writeShards(corpus(), "doc_id", "text", p, nShards = 4)
    // tamper: drop one document from one shard's files (materialize
    // before overwriting — can't stream-read the dir being replaced)
    val sh = spark.read.parquet(s"$p/shards").filter(col("shard") === 2)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    sh.drop(1).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$p/shards/shard=2")
    val v = Export.validateShards(spark, p, "text")
      .select("shard", "ok").collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).toMap
    assert(v(2) === false, "the tampered shard must flag")
    assert(v.filter(_._1 != 2).values.forall(identity),
      "untampered shards must stay clean")
  }
}
