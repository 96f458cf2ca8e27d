package graft

/** In-process smoke of the ChaosWorker roles tools/chaos_gate.py
  * launches as separate JVMs — keeps the gate's building blocks from
  * bit-rotting between gate runs (the multi-process assertions
  * themselves live in the scripted gate; artifact CONCURRENCY_r15). */
class ChaosWorkerSpec extends SparkSpec {

  test("build/append/count roles compose against one layout") {
    val p = java.nio.file.Files.createTempDirectory("graft-chaosworker").toString
    val dir = new java.io.File(p)
    dir.delete()
    ChaosWorker.main(Array("build", p, "10"))
    ChaosWorker.main(Array("append", p, "10", "1", "2"))
    val common = graft.ops.TextIndex.probeBm25Index(spark, p, Seq("common")).count()
    assert(common === 30, "batch 0 (build) + batches 1,2 = 3 * 10 docs")
    val b1 = graft.ops.TextIndex.probeBm25Index(spark, p, Seq("b1")).count()
    assert(b1 === 10, "batch-unique term b1 fully present")
    // probe role runs without error against the live layout
    ChaosWorker.main(Array("probe", p, "10", "2"))
    // maint role appends + vacuums with retention
    ChaosWorker.main(Array("maint", p, "10", "3", "1"))
    assert(graft.ops.TextIndex.probeBm25Index(spark, p, Seq("common")).count() === 40)
  }
}
