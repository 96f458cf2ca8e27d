package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool (optimization rounds): run named queries at the bench's
  * sizing and print a per-JOB and per-STAGE time breakdown, so the cost
  * inside a multi-job lifecycle query (index build → maintenance →
  * probe) is attributable instead of one opaque wall number.
  *
  * Usage: `tools/run.sh graft.ProfileQuery q_bm25_delete [q_b …]`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  * Each query runs twice: a discarded warm pass (codegen/JIT), then the
  * measured pass through the bench's noop sink.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <query>…")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(appName = "graft-profile",
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, desc: String, start: Long, var end: Long = -1L,
                      var stages: List[(Int, String, Long, Int)] = Nil)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, JobRec]
    // stageId → owning jobId, from the job's declared stage set (r16
    // ADVICE): attributing a completed stage to the most recently
    // STARTED job misassigns stages whenever jobs overlap — exactly the
    // Par.run lifecycle ops this tool profiles
    val stageOwner = new scala.collection.mutable.HashMap[Int, Int]
    val active = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (active.get) {
        val d = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, d, e.time)
          e.stageIds.foreach(sid => stageOwner(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (active.get) {
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (active.get) {
        val si = e.stageInfo
        val dur = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(-1L)
        jobs.synchronized {
          stageOwner.get(si.stageId).flatMap(jobs.get)
            .orElse(jobs.values.lastOption).foreach { j =>
              j.stages = (si.stageId, si.name.takeWhile(_ != '\n').take(60), dur,
                si.numTasks) :: j.stages
            }
        }
      }
    })

    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    args.foreach { name =>
      // warm pass (codegen/JIT), discarded
      runOne(name)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      jobs.synchronized { jobs.clear(); stageOwner.clear() }
      active.set(true)
      val wall = runOne(name)
      active.set(false)
      println(f"===== $name: $wall%.3f s (${jobs.size} jobs) @ $sfDir =====")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
          println(f"  job ${j.id}%3d ${dur}%8.3f s  ${j.desc.take(90)}")
          j.stages.reverse.foreach { case (sid, nm, d, nt) =>
            println(f"    stage $sid%4d ${d / 1e3}%8.3f s  tasks=$nt%3d  $nm")
          }
        }
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
