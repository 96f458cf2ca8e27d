package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (dev loop)
    val selected =
      if (args.length > 2) SparkEntry.queries.filter(kv => args(2).split(",").contains(kv._1))
      else SparkEntry.queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(appName = "graft-verify",
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any previous/partial dump: a failed query must read as
        // MISSING to the checker, not silently pass on stale output
        // from an earlier run into the same outDir
        Scratch.deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
      finally {
        // same steady-state hygiene as Bench: drop blocks a query
        // persisted for its own multi-job structure
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // subset runs dump a subset oracle file too — otherwise the checker
    // FAILs every unselected query on its missing parquet dir. BUT a
    // subset re-dump into a FULL dump directory (the refresh-one-query
    // flow after a fix) must not clobber the full oracle map down to
    // the subset — the next full check_oracle would then silently
    // check 1 query and write a 1-entry artifact. Emit the oracle for
    // every query whose dump parquet exists in outDir, plus the
    // selected ones.
    val dumped = SparkEntry.oracleSql.keySet.filter { name =>
      selected.contains(name) ||
        Paths.get(s"$outDir/$name.parquet").toFile.isDirectory
    }
    val json = SparkEntry.oracleSql
      .filter(kv => dumped.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
