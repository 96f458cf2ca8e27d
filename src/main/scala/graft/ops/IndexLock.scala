package graft.ops

import org.apache.spark.sql.SparkSession

/** Exclusive-writer sentinel for the persisted index layouts (IVF
  * vector lists, BM25 postings): append / delete / purge are multi-step
  * directory rewrites with no cross-directory transaction, so two of
  * them interleaved corrupt df / stats / tombstones SILENTLY (e.g. a
  * delete appended between a purge's tombstone read and its clear is
  * simply lost). The scaladocs have always stated the ops are not safe
  * to interleave; this marker turns that prose contract into a loud
  * runtime failure.
  *
  * Protocol: a `.graft.index.lock` marker file is created atomically
  * under the layout root (`FileSystem.create(overwrite = false)` — the
  * same primitive Hadoop's own output committers rely on, atomic on
  * HDFS and POSIX; on S3-style stores it is best-effort, like every
  * rename in this layer). Create-fail means a concurrent op holds the
  * layout → [[IllegalStateException]] naming the holder. The lock is
  * always released on completion OR exception; only a JVM crash can
  * leave it behind, and the remediation path is the one the crash
  * contracts already prescribe: a full `write*Index` rebuild, which
  * clears any stale lock before re-locking for itself.
  */
private[ops] object IndexLock {

  private def lockPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/.graft.index.lock")

  /** Run `body` holding the layout's writer lock; loud failure if a
    * concurrent maintenance op already holds it. The lock carries a
    * unique token and release verifies OWNERSHIP: if a rebuild's
    * [[clearStale]] replaced this op's lock mid-flight, the finally
    * must not delete the REBUILD's lock (that would reopen the layout
    * to a third op interleaving with the rebuild's multi-step
    * overwrite). The verify-then-delete window is best-effort, like
    * every rename in this storage layer — the guarantee is loud
    * refusal of the common interleaves, not a distributed lease. */
  def withLock[T](spark: SparkSession, path: String, op: String)(body: => T): T = {
    val lock = lockPath(path)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token =
      s"$op@${System.currentTimeMillis()}@${java.util.UUID.randomUUID()}"
    // held-vs-broken discrimination (r12 ADVICE): a create(overwrite =
    // false) failure is "locked by a concurrent op" only when the lock
    // file actually EXISTS — a transient or permission IO error must
    // surface as itself, not as remediation advice telling the operator
    // to delete a lock that isn't there. Hadoop signals the held case
    // as FileAlreadyExistsException on most stores; for a plain
    // IOException the existence check decides.
    val out =
      try fs.create(lock, false)
      catch {
        case e: java.io.IOException
            if !e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] &&
              !(try fs.exists(lock) catch { case _: Exception => false }) =>
          throw e
        case _: java.io.IOException =>
          val holder =
            try {
              val in = fs.open(lock)
              try scala.io.Source.fromInputStream(in).mkString finally in.close()
            } catch { case _: Exception => "unknown" }
          throw new IllegalStateException(
            s"index layout at $path is locked by concurrent maintenance op [$holder] — " +
              "append/delete/purge are exclusive-writer by contract (interleaving " +
              s"corrupts df/stats silently). If the holder crashed, remove $lock " +
              "after confirming nothing is running, or rebuild the layout " +
              "(writeBm25Index/writeIvfIndex clear stale locks).")
      }
    def readLock(): Option[String] =
      try {
        val in = fs.open(lock)
        try Some(scala.io.Source.fromInputStream(in).mkString)
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    try {
      out.write(token.getBytes("UTF-8"))
      out.close()
    } catch {
      case e: Exception =>
        // we created the lock but could not stamp it: remove it rather
        // than leak a permanent orphan — but only while it is still
        // the UNSTAMPED file we created (empty/partial, never a full
        // token): if a rebuild's clearStale already replaced it, its
        // stamped lock must survive. A read failure here leaves the
        // file (tiny leak window, removable via the documented
        // remediation) instead of risking the rebuild's lock.
        try out.close() catch { case _: Exception => () }
        try {
          val stillOurs = readLock() match {
            case None => false
            case Some(content) => !content.contains("@") // unstamped
          }
          if (stillOurs) fs.delete(lock, false)
        } catch { case _: Exception => () }
        throw e
    }
    try body
    finally {
      // delete ONLY if the lock is still OURS: a MISSING lock (the
      // all-deleted purge removes the layout root, lock included) or
      // one REPLACED by a rebuild's clearStale is left alone. A read
      // that fails with anything other than not-found defaults to
      // "ours" — we stamped this file, and a transient read error must
      // not leak our own lock and wedge the layout (the replaced-lock
      // case additionally needs the clearStale race, which is already
      // operator error).
      try {
        val mine =
          try readLock() match {
            case None => false
            case Some(content) => content == token
          } catch { case _: Exception => true }
        if (mine) fs.delete(lock, false)
      } catch { case _: Exception => () }
    }
  }

  /** Remove a stale lock left by a CRASHED op — called ONLY by the full
    * `write*Index` builders, whose mode=overwrite rewrites invalidate
    * every prior state anyway (the documented crash remediation).
    * Starting a rebuild while a maintenance op is genuinely RUNNING is
    * operator error this layer cannot distinguish from a crash; the
    * ownership check in [[withLock]]'s release bounds the blast radius
    * (the superseded op can no longer delete the rebuild's lock). */
  def clearStale(spark: SparkSession, path: String): Unit = {
    val lock = lockPath(path)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(lock)) fs.delete(lock, false)
  }
}
