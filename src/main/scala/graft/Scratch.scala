package graft

/** Shared scratch-directory scheme for disk-mutating queries
  * (index-building ANN queries, the warehouse-maintenance lifecycle):
  *
  *  - per-JVM-unique token: concurrent Verify/Bench processes cannot
  *    overwrite each other's scratch mid-read (the race a fixed path
  *    keyed only on the fixture dir would allow);
  *  - constant within a process: mode=overwrite reuses the same path,
  *    so best-of-2 bench passes don't leak a copy per call;
  *  - registered for deletion at JVM exit, so repeated process runs
  *    don't grow the temp dir without bound.
  */
private[graft] object Scratch {
  private lazy val token = java.util.UUID.randomUUID().toString.take(8)
  private val created = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.keySet().forEach(p => deleteRecursively(new java.io.File(p)))))
  }

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }

  /** Scratch path for (prefix, fixture dir) — see object doc. */
  def dir(prefix: String, fixtureDir: String): String = {
    hookInstalled
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      s"$prefix-$token-${java.lang.Integer.toHexString(fixtureDir.hashCode)}")
      .getAbsolutePath
    created.put(p, true)
    p
  }
}
