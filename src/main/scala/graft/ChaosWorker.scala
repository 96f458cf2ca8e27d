package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-process chaos worker for the manifest/lock seams
  * (VERDICT r14 item 3): every lock-collision / torn-write / zombie
  * spec runs inside ONE JVM, where the "concurrent writer" shares the
  * process. This main is the building block `tools/chaos_gate.py`
  * launches as SEPARATE JVMs — real processes, real kill -9 — doing
  * concurrent append / probe / vacuum against one BM25 layout, so
  * reader isolation, loud lock collision, and blind-retry recovery are
  * demonstrated across process boundaries (artifact:
  * CONCURRENCY_r15.json).
  *
  * Batch `i` appends `batchSize` docs, every doc containing the term
  * `common` plus the batch-unique term `b<i>` — so the orchestrator
  * can decide, from probes alone, whether any batch applied PARTIALLY
  * (a `b<i>` count other than 0 or batchSize) and whether a reader
  * ever observed a torn state (a `common` count not divisible by
  * batchSize).
  *
  * Roles (all print machine-parseable lines on stdout):
  *  - `build <path> <batchSize>`: fresh layout with batch 0.
  *  - `append <path> <batchSize> <from> <n> [sleepMs]`: append batches
  *    from..from+n-1; per batch prints `BATCH <i> OK`,
  *    `BATCH <i> LOCKED` (loud writer collision), or
  *    `BATCH <i> ERR <class>`.
  *  - `probe <path> <batchSize> <iters> [sleepMs]`: repeatedly pin +
  *    probe `common`; prints `PROBE <count>` per iteration, or
  *    `PROBE_ERR <class>: <msg>`.
  *  - `maint <path> <batchSize> <from> <n>`: append interleaved with
  *    `vacuumBm25Index(keepVersions=3)` after every batch; prints
  *    BATCH lines plus `VACUUM OK <reclaimed>` / `VACUUM ERR <class>`.
  *  - `count <path> <term>`: one probe; prints `COUNT <term> <n>`.
  */
object ChaosWorker {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def batchDf(spark: SparkSession, i: Int, batchSize: Int): DataFrame = {
    import spark.implicits._
    (0 until batchSize)
      .map(j => (i.toLong * batchSize + j, s"common b$i filler$j"))
      .toDF("doc_id", "text")
  }

  private def probeCount(spark: SparkSession, path: String, term: String): Long =
    graft.ops.TextIndex.probeBm25Index(spark, path, Seq(term)).count()

  def main(args: Array[String]): Unit = {
    val role = args(0)
    val path = args(1)
    val spark = session()
    role match {
      case "build" =>
        val b = args(2).toInt
        graft.ops.TextIndex.writeBm25Index(
          batchDf(spark, 0, b), "doc_id", "text", path, nBuckets = 4)
        println("BUILD OK")

      case "append" =>
        val b = args(2).toInt
        val from = args(3).toInt
        val n = args(4).toInt
        val sleepMs = if (args.length > 5) args(5).toLong else 0L
        for (i <- from until from + n) {
          try {
            graft.ops.TextIndex.appendToBm25Index(
              batchDf(spark, i, b), "doc_id", "text", path)
            println(s"BATCH $i OK")
          } catch {
            case e: IllegalStateException
                if e.getMessage != null && e.getMessage.contains("locked by") =>
              println(s"BATCH $i LOCKED")
            case e: Throwable =>
              println(s"BATCH $i ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          System.out.flush()
          if (sleepMs > 0) Thread.sleep(sleepMs)
        }
        println("APPEND DONE")

      case "probe" =>
        val b = args(2).toInt
        val iters = args(3).toInt
        val sleepMs = if (args.length > 4) args(4).toLong else 0L
        var i = 0
        while (i < iters) {
          try {
            val c = probeCount(spark, path, "common")
            println(s"PROBE $c" + (if (c % b == 0) "" else " TORN"))
          } catch {
            case e: Throwable =>
              println(s"PROBE_ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          System.out.flush()
          if (sleepMs > 0) Thread.sleep(sleepMs)
          i += 1
        }
        println("PROBE_DONE")

      case "maint" =>
        val b = args(2).toInt
        val from = args(3).toInt
        val n = args(4).toInt
        for (i <- from until from + n) {
          try {
            graft.ops.TextIndex.appendToBm25Index(
              batchDf(spark, i, b), "doc_id", "text", path)
            println(s"BATCH $i OK")
          } catch {
            case e: Throwable =>
              println(s"BATCH $i ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          try {
            val dropped = graft.ops.TextIndex.vacuumBm25Index(spark, path,
              keepVersions = 3)
            println(s"VACUUM OK ${dropped.size}")
          } catch {
            case e: Throwable =>
              println(s"VACUUM ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          System.out.flush()
        }
        println("MAINT DONE")

      case "count" =>
        // one JVM, many terms — the orchestrator's post-hoc audit would
        // otherwise pay a Spark startup per term
        args.drop(2).foreach { term =>
          println(s"COUNT $term ${probeCount(spark, path, term)}")
        }

      case other =>
        System.err.println(s"unknown role $other")
        sys.exit(2)
    }
    // no spark.stop(): the gate's worker JVMs exit right after (stop
    // would only slow the chaos loop), and the in-process smoke spec
    // shares its suite's session (getOrCreate) — stopping it here
    // would kill every later spec in the JVM
  }
}
