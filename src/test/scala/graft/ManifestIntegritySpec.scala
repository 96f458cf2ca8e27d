package graft

import org.apache.spark.sql.SparkSession

import graft.ops.IndexManifest

/** The r14-ADVICE integrity seams of the manifest store, exercised
  * directly against on-disk layouts:
  *
  *  1. a CORRUPT committed manifest (end marker present, body
  *     unparseable) fails LOUDLY on the read path instead of silently
  *     serving the previous version as current (which could resurface
  *     tombstoned/purged rows);
  *  2. a LEGACY footerless-but-parseable store raises the migration
  *     remedy from pin()/exists(), not just from commit's slot check;
  *  3. vacuum REFUSES while a started-without-committed stream marker
  *     exists (the tag inside a superseded manifest is the retry's only
  *     double-apply defense);
  *  4. hasCommittedTag finds a commit's tag (newest-first scan) and
  *     its per-JVM cache never serves stale content across a layout
  *     rebuilt at the same root.
  */
class ManifestIntegritySpec extends SparkSpec {
  import spark.implicits._

  private def freshLayout(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    graft.ops.TextIndex.writeBm25Index(
      Seq((1L, "aaa bbb"), (2L, "aaa ccc")).toDF("doc_id", "text"),
      "doc_id", "text", p, nBuckets = 4)
    p
  }

  private def slot(p: String, v: Long) = new java.io.File(f"$p/_manifests/v$v%012d")

  test("a corrupt committed manifest (footer present, body unparseable) fails loudly on pin — never a silent fallback to the previous version") {
    val p = freshLayout("graft-mi-corrupt")
    val v1 = IndexManifest.pin(spark, p).version
    // a rotted COMMITTED manifest in the newest slot: footer intact,
    // body garbled — unlike a torn write, the write completed
    java.nio.file.Files.write(slot(p, v1 + 1).toPath,
      "graft-index-manifest 1\na line without a component separator\ngraft-index-manifest end\n"
        .getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] { IndexManifest.pin(spark, p) }
    assert(ex.getMessage.contains("CORRUPT"), ex.getMessage)
    assert(ex.getMessage.contains("end marker is present"), ex.getMessage)
    // versions() refuses too — vacuum and time-travel listings must not
    // quietly pretend the rotted snapshot never existed
    val ex2 = intercept[IllegalStateException] { IndexManifest.versions(spark, p) }
    assert(ex2.getMessage.contains("CORRUPT"), ex2.getMessage)
    // a garbled HEADER under an intact footer is the same class
    java.nio.file.Files.write(slot(p, v1 + 1).toPath,
      "not-a-graft-manifest\npostings=\ngraft-index-manifest end\n"
        .getBytes("UTF-8"))
    val ex3 = intercept[IllegalStateException] { IndexManifest.pin(spark, p) }
    assert(ex3.getMessage.contains("CORRUPT"), ex3.getMessage)
    // after the documented remedy (operator moves the file aside), the
    // layout serves v1 again
    assert(slot(p, v1 + 1).delete())
    assert(IndexManifest.pin(spark, p).version === v1)
  }

  test("junk appended AFTER the end marker is CORRUPT, not torn — never a silent fallback to the previous version") {
    val p = freshLayout("graft-mi-trailing")
    val v1 = IndexManifest.pin(spark, p).version
    // the write completed (footer present) and something appended after
    // it — classifying this torn would silently skip the version and
    // resurrect rows its tombstones erased (r15 ADVICE)
    val text = new String(
      java.nio.file.Files.readAllBytes(slot(p, v1).toPath), "UTF-8")
    java.nio.file.Files.write(slot(p, v1).toPath,
      (text + "trailing junk line\n").getBytes("UTF-8"))
    new java.io.File(f"$p/_manifests/.v$v1%012d.crc").delete()
    val ex = intercept[IllegalStateException] { IndexManifest.pin(spark, p) }
    assert(ex.getMessage.contains("CORRUPT"), ex.getMessage)
    // the cause names the specific defect (content after the marker) —
    // before r16 this parsed as TORN and fell back silently
    assert(ex.getCause != null &&
      ex.getCause.getMessage.contains("after its end marker"),
      String.valueOf(ex.getCause))
  }

  test("hasCommittedTag: a stale NEGATIVE cache entry under a (mtime,length) collision is confirm-read, not trusted") {
    val p = freshLayout("graft-mi-stale-neg")
    val v1 = IndexManifest.pin(spark, p).version
    val body = new String(
      java.nio.file.Files.readAllBytes(slot(p, v1).toPath), "UTF-8")
      .linesIterator.toSeq
    val (header, rest) = (body.head, body.tail)
    def writeV2(metaLine: String, mtime: Long): Unit = {
      val f = slot(p, v1 + 1)
      java.nio.file.Files.write(f.toPath,
        ((header +: metaLine +: rest).mkString("", "\n", "\n")).getBytes("UTF-8"))
      new java.io.File(f"$p/_manifests/.v${v1 + 1}%012d.crc").delete()
      assert(f.setLastModified(mtime))
    }
    // v2 committed WITHOUT the tag: the scan caches the negative
    val m = 1700000000000L
    writeV2("#pad=abc", m) // same byte length as "#tag=t-x"
    assert(!IndexManifest.hasCommittedTag(spark, p, "t-x"))
    // the layout is "rebuilt" at the same root with IDENTICAL
    // (path, mtime, length) — a coarse-mtime FS collision — but now
    // carries the tag; trusting the stale negative would let a retried
    // stream batch double-apply
    writeV2("#tag=t-x", m)
    assert(IndexManifest.hasCommittedTag(spark, p, "t-x"),
      "stale negative tag-cache entry was trusted across a key collision")
  }

  test("a legacy footerless-but-parseable manifest store raises the migration remedy from pin and exists, not 'no index manifest'") {
    val p = freshLayout("graft-mi-legacy")
    val v1 = IndexManifest.pin(spark, p).version
    // rewrite the ONLY committed version as a pre-r14 legacy manifest:
    // same body, no end-marker line
    val text = new String(
      java.nio.file.Files.readAllBytes(slot(p, v1).toPath), "UTF-8")
    val legacy = text.linesIterator
      .filterNot(_ == "graft-index-manifest end").mkString("", "\n", "\n")
    java.nio.file.Files.write(slot(p, v1).toPath, legacy.getBytes("UTF-8"))
    // drop the local-FS checksum sidecar the out-of-band rewrite stales
    new java.io.File(f"$p/_manifests/.v$v1%012d.crc").delete()
    val exPin = intercept[IllegalStateException] { IndexManifest.pin(spark, p) }
    assert(exPin.getMessage.contains("pre-r14 legacy"), exPin.getMessage)
    assert(exPin.getMessage.contains("migrate"), exPin.getMessage)
    val exExists = intercept[IllegalStateException] { IndexManifest.exists(spark, p) }
    assert(exExists.getMessage.contains("pre-r14 legacy"), exExists.getMessage)
    // the documented migration: append the end marker after verifying —
    // the layout serves again with its segments intact
    java.nio.file.Files.write(slot(p, v1).toPath,
      (legacy + "graft-index-manifest end\n").getBytes("UTF-8"))
    assert(IndexManifest.exists(spark, p))
    val docs = graft.ops.TextIndex.probeBm25Index(spark, p, Seq("aaa"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docs === Set(1L, 2L))
  }

  test("migrateLegacy footers a synthesized legacy store end-to-end, idempotently, and refuses garbled bodies") {
    val p = freshLayout("graft-mi-migrate")
    // advance so the store holds TWO versions, then rewrite BOTH as
    // pre-r14 legacy manifests (strip the end markers)
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "aaa ddd")).toDF("doc_id", "text"), "doc_id", "text", p)
    for (v <- 1L to 2L) {
      val text = new String(
        java.nio.file.Files.readAllBytes(slot(p, v).toPath), "UTF-8")
      java.nio.file.Files.write(slot(p, v).toPath,
        text.linesIterator.filterNot(_ == "graft-index-manifest end")
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      new java.io.File(f"$p/_manifests/.v$v%012d.crc").delete()
    }
    // diagnosis names the operator
    val ex = intercept[IllegalStateException] { IndexManifest.pin(spark, p) }
    assert(ex.getMessage.contains("migrateLegacy"), ex.getMessage)
    // the remedy as code: verifies each body, appends footers atomically
    assert(IndexManifest.migrateLegacy(spark, p) === Seq(1L, 2L))
    assert(IndexManifest.pin(spark, p).version === 2L)
    val docs = graft.ops.TextIndex.probeBm25Index(spark, p, Seq("aaa"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docs === Set(1L, 2L, 3L))
    // idempotent: a re-run touches nothing
    assert(IndexManifest.migrateLegacy(spark, p) === Seq.empty)
    // a footerless file in a store that HOLDS COMMITTED versions is
    // torn debris of a crashed post-r14 commit, not legacy — footering
    // it would publish a partial write as a committed snapshot, so the
    // whole store refuses (the commit() quarantine-ambiguity, honored)
    java.nio.file.Files.write(slot(p, 3L).toPath,
      "graft-index-manifest 1\npostings=seg-abc\n".getBytes("UTF-8"))
    val ex2 = intercept[IllegalStateException] {
      IndexManifest.migrateLegacy(spark, p)
    }
    assert(ex2.getMessage.contains("migrateLegacy refuses"), ex2.getMessage)
    assert(ex2.getMessage.contains("holds committed"), ex2.getMessage)
    // the torn file was not footered behind the refusal
    val leftover = new String(
      java.nio.file.Files.readAllBytes(slot(p, 3L).toPath), "UTF-8")
    assert(!leftover.contains("graft-index-manifest end"))
  }

  test("migrateLegacy refuses a pure-legacy store containing an unparseable body, footering NOTHING") {
    val p = freshLayout("graft-mi-migrate-bad")
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "aaa ddd")).toDF("doc_id", "text"), "doc_id", "text", p)
    // v1 becomes a clean legacy manifest; v2 a garbled footerless body —
    // torn-vs-legacy needs the operator's judgment, and the verify-all-
    // before-footering-any rule must leave v1 untouched too
    val v1Text = new String(
      java.nio.file.Files.readAllBytes(slot(p, 1L).toPath), "UTF-8")
    java.nio.file.Files.write(slot(p, 1L).toPath,
      v1Text.linesIterator.filterNot(_ == "graft-index-manifest end")
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(slot(p, 2L).toPath,
      "graft-index-manifest 1\nhalf a line with no separa"
        .getBytes("UTF-8"))
    for (v <- 1L to 2L) new java.io.File(f"$p/_manifests/.v$v%012d.crc").delete()
    val ex = intercept[IllegalStateException] {
      IndexManifest.migrateLegacy(spark, p)
    }
    assert(ex.getMessage.contains("migrateLegacy refuses"), ex.getMessage)
    assert(ex.getMessage.contains("v000000000002"), ex.getMessage)
    // no state was changed: v1 is still footerless
    val v1After = new String(
      java.nio.file.Files.readAllBytes(slot(p, 1L).toPath), "UTF-8")
    assert(!v1After.contains("graft-index-manifest end"))
  }

  test("vacuum refuses while a started-without-committed stream marker exists, and proceeds once the batch settles") {
    val p = freshLayout("graft-mi-vacuumguard")
    // advance the layout so there IS something to vacuum
    graft.ops.TextIndex.appendToBm25Index(
      Seq((3L, "aaa ddd")).toDF("doc_id", "text"), "doc_id", "text", p)
    val sb = new java.io.File(s"$p/_stream_batches")
    assert(sb.mkdirs())
    // a crashed attempt: started, never committed — its tagged manifest
    // may be among the superseded versions vacuum would reclaim
    new java.io.File(sb, "batch_id=7.started").createNewFile()
    val ex = intercept[IllegalStateException] {
      graft.ops.TextIndex.vacuumBm25Index(spark, p)
    }
    assert(ex.getMessage.contains("vacuum refused"), ex.getMessage)
    assert(ex.getMessage.contains("batch_id=7.started"), ex.getMessage)
    assert(IndexManifest.versions(spark, p).size === 2,
      "the refused vacuum must not have reclaimed anything")
    // the batch settles (retry completed → committed marker lands):
    // vacuum proceeds and reclaims the superseded version
    new java.io.File(sb, "batch_id=7.committed").createNewFile()
    graft.ops.TextIndex.vacuumBm25Index(spark, p)
    assert(IndexManifest.versions(spark, p).size === 1)
    // the markers themselves survive vacuum (protected entries)
    assert(new java.io.File(sb, "batch_id=7.committed").exists())
  }

  test("hasCommittedTag finds a commit's tag, stays correct as versions advance, and never serves stale cache across a rebuilt layout") {
    val p = freshLayout("graft-mi-tags")
    val snap = IndexManifest.pin(spark, p)
    IndexManifest.commit(spark, p, Some(snap), snap.components,
      tag = Some("stream-batch-42"))
    assert(IndexManifest.hasCommittedTag(spark, p, "stream-batch-42"))
    assert(!IndexManifest.hasCommittedTag(spark, p, "stream-batch-43"))
    // later untagged commits do not hide an older tag
    val snap2 = IndexManifest.pin(spark, p)
    IndexManifest.commit(spark, p, Some(snap2), snap2.components)
    assert(IndexManifest.hasCommittedTag(spark, p, "stream-batch-42"))
    // rebuild the layout at the SAME root: the per-JVM tag cache keys on
    // (path, mtime, length), so the old tag must not leak into the new
    // layout's lookups (a stale positive would silently skip an absorb)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(p))
    graft.ops.TextIndex.writeBm25Index(
      Seq((9L, "zzz yyy")).toDF("doc_id", "text"),
      "doc_id", "text", p, nBuckets = 4)
    assert(!IndexManifest.hasCommittedTag(spark, p, "stream-batch-42"),
      "tag cache leaked across a layout rebuilt at the same root")
  }
}
