package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
  * over a Rabin–Karp polynomial rolling hash — the classic
  * shared-substring detector: any match of length ≥ k+w−1 between two
  * documents is GUARANTEED to share at least one selected fingerprint,
  * so fingerprint-equality buckets are a complete candidate generator
  * for substring-level overlap (quote/boilerplate detection — a
  * different axis than MinHash's bag-of-shingles set similarity in
  * ops.Dedup).
  *
  * The hash is plain ANSI-SQL arithmetic (ascii + substring + modular
  * Horner evaluation, B=257 mod M=2^31−1: every intermediate ≤ M·B+255
  * < 2^40, BIGINT-safe) — deliberately engine-portable, so the DuckDB
  * oracle runs the IDENTICAL expansion and the driver hash-compares
  * the fingerprints themselves, not a summary.
  *
  * Scale shape: positions explode to O(chars) fixed-width rows
  * (id, pos, hash — the text never shuffles); winnow selection is ONE
  * window shuffle on the doc id; output is the per-doc fingerprint set
  * (≈ 2·chars/(w+1) rows). At 100 TB the explode is embarrassingly
  * parallel and the window partitions by document — no cross-doc state.
  */
object Fingerprint {

  val B = 257L
  val M = 2147483647L // 2^31 − 1

  /** Rolling k-gram hash at 1-based position `pos`:
    * h = ((…(c₀·B + c₁) mod M)·B + c₂) mod M … — Horner form. */
  def gramHash(text: Column, pos: Column, k: Int): Column = {
    require(k >= 1, "k must be positive")
    (0 until k).foldLeft(lit(0L)) { (acc, j) =>
      (acc * lit(B) + ascii(text.substr(pos + lit(j), lit(1))).cast("long")) % M
    }
  }

  /** The same hash as ANSI SQL text (for an external oracle engine):
    * `textExpr`/`posExpr` are SQL fragments naming the text column and
    * the 1-based gram position. Generated from the same constants as
    * [[gramHash]] so the two can never drift. */
  def gramHashSql(textExpr: String, posExpr: String, k: Int): String = {
    require(k >= 1, "k must be positive")
    // BIGINT-typed seed keeps the whole chain 64-bit (engines that
    // default small literals to INT32 would overflow at acc·B otherwise)
    (0 until k).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
      s"(($acc * $B + ascii(substring($textExpr, $posExpr + $j, 1))) % $M)"
    }
  }

  /** Substring-overlap candidate pairs from winnowed fingerprints:
    * documents sharing ≥ `minShared` selected fingerprints, with the
    * shared count — the complete candidate generator for copied
    * passages of length ≥ k+w−1 (every such passage shares a
    * fingerprint, so requiring minShared=1 misses nothing; higher
    * thresholds trade recall for precision on longer overlaps).
    *
    * Same bucket-groupBy shape as Dedup.minhashLshCandidates — pairs
    * come from sorted-id combinatorics inside each fingerprint bucket,
    * never a self-join of the corpus. `maxBucket` caps the quadratic
    * risk: a fingerprint shared by more than `maxBucket` docs (site
    * boilerplate) produces no pairs. Its docs still pair through their
    * OTHER shared fingerprints; shared counts are over surviving
    * buckets only.
    */
  def overlapCandidates(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, w: Int, minShared: Int = 1,
                        maxBucket: Int = 1000): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    val fps = winnow(docs, idCol, textCol, k, w)
    fps.groupBy(col("fp"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(Dedup.pairsFromSortedIds(col("ids"))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Winnowed fingerprint set per document: (idCol, fp) — DISTINCT
    * selected hashes. Selection: the minimum hash of each w-window of
    * consecutive gram hashes (robust-winnowing simplification: windows
    * sharing their minimum contribute one fingerprint via DISTINCT).
    * Documents shorter than k+w−1 chars have no full window and emit
    * nothing.
    *
    * Runs the fused O(len)-per-doc kernel
    * (expr.catalyst.WinnowFingerprints): fingerprints are computed and
    * deduped inside the row they came from — no per-character explode,
    * no window shuffle. [[winnowDeclarative]] is the slow declarative
    * statement of the same semantics, kept as the parity reference.
    */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    docs.select(col(idCol),
      explode(column(graft.expr.catalyst.WinnowFingerprints(
        expression(col(textCol)), k, w))).as("fp"))
  }

  /** The kernel's semantics as declarative Spark (positions exploded →
    * gram hash → per-doc window min → distinct) — O(len²·k) per doc
    * because substr walks to each char boundary, plus one
    * (id, pos, hash)-per-CHARACTER window shuffle; parity-tested
    * against the kernel, never used on the hot path. */
  def winnowDeclarative(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, w: Int): DataFrame = {
    require(k >= 2, "gram size k must be >= 2")
    require(w >= 1, "window size w must be >= 1")
    // maxPos = #grams; windows start at 1 .. maxPos-w+1
    val grams = docs
      .filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol), col(textCol).as("__t"),
        (length(col(textCol)) - (k - 1)).as("__maxpos"))
      .select(col(idCol), col("__t"), col("__maxpos"),
        explode(sequence(lit(1), col("__maxpos"))).as("__pos"))
      .select(col(idCol), col("__maxpos"), col("__pos"),
        gramHash(col("__t"), col("__pos"), k).as("__h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(0, w - 1)
    grams
      .select(col(idCol), col("__maxpos"), col("__pos"),
        min(col("__h")).over(win).as("fp"))
      .filter(col("__pos") <= col("__maxpos") - (w - 1))
      .select(col(idCol), col("fp"))
      .distinct()
  }
}
