package graft

import org.apache.spark.sql.functions._

/** The fault-tolerance seam (ops.Reliable): with a SparkContext
  * checkpoint dir configured, the iterative operators switch from
  * executor-local checkpoints to reliable on-disk checkpoints — same
  * results, survivable executor loss. These tests run both paths in one
  * JVM and assert the outputs are identical, and that the reliable path
  * actually wrote checkpoint files (proof it was taken). */
class ReliableSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated planted clusters: assignment and component
    * results are exactly stable across runs (no borderline points). */
  private def plantedVecs() = {
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("id", "vec")
  }

  test("reliable checkpoint: identical components and centroids; files land in the dir") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "precondition: no checkpoint dir configured")

    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("id_a", "id_b")
    val vecs = plantedVecs()

    def components() = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    def centroids() = graft.ops.Ann.trainCentroids(vecs, nLists = 3, iters = 2)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => math.round(f * 1e4f)).toSeq)).sortBy(_._1).toSeq

    val localCC = components()
    val localCents = centroids()
    assert(localCC.map(_._2).distinct.size === 3, "fixture sanity: 3 components")

    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(ckptDir)
    try {
      assert(sc.getCheckpointDir.isDefined)
      assert(components() === localCC)
      assert(centroids() === localCents)
      // the reliable path really ran: checkpoint RDD files exist on disk
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
        else Seq(f)
      assert(walk(new java.io.File(ckptDir)).nonEmpty,
        "no checkpoint files written — reliable path not taken")
    } finally {
      sc.setCheckpointDir(null)
      Scratch.deleteRecursively(new java.io.File(ckptDir))
    }
    assert(sc.getCheckpointDir.isEmpty)
  }
}
