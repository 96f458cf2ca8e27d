package graft

import org.apache.spark.sql.functions._

import graft.sources.FileSource

/** CSV / JSON-lines sources: schema-enforced round trip equals the
  * parquet fixture content; FAILFAST rejects corrupt rows. */
class FileSourceSpec extends SparkSpec {

  private lazy val nation = schema.Tables.load(spark, sfDir, "nation")

  test("csv round trip: schema-enforced read equals source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    nation.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(dir)
    val back = FileSource.readCsv(spark, dir, nation.schema)
    assert(back.schema === nation.schema)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("json-lines round trip: schema-enforced read equals source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    nation.coalesce(1).write.mode("overwrite").json(dir)
    val back = FileSource.readJsonLines(spark, dir, nation.schema)
    assert(back.schema === nation.schema)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("quarantine read: good rows keep schema, corrupt lines side-output") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quar").toString
    nation.coalesce(1).write.mode("overwrite").json(dir)
    // plant a corrupt line alongside the good part-files
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-corrupt.json"),
      "this is not json\n{\"n_nationkey\": \"NaNkey\"}\n")
    val q = FileSource.readJsonLinesQuarantine(spark, dir, nation.schema)
    try {
      assert(q.good.schema === nation.schema)
      assert(q.good.count() === nation.count())
      assert(q.quarantined.count() === 2)
      assert(q.quarantined.collect().map(_.getString(0)).exists(_.contains("not json")))
    } finally q.unpersist()
  }

  test("FAILFAST surfaces corrupt rows instead of nulling them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.json"), "{\"n_nationkey\": \"notanumber\"}\n")
    val ex = intercept[Exception] {
      FileSource.readJsonLines(spark, dir, nation.schema).collect()
    }
    assert(ex.toString.toLowerCase.contains("malformed")
      || ex.getCause != null)
  }
}
