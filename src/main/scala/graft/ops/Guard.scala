package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loud pre-checks for operators whose PLAN SHAPE assumes one side is
  * small (VERDICT r5 item 5): brute-force query batches, benchmark gram
  * sets, TF-IDF vocabularies. Spark's autoBroadcastJoinThreshold does
  * NOT protect an explicit `broadcast()` hint — an oversized hinted
  * side materializes on the driver and dies as an opaque OOM (or a
  * 8GB-broadcast task storm) deep inside the job. These guards turn
  * that into a bounded, named failure at the operator boundary.
  */
object Guard {

  /** Default cap for frames an operator must broadcast. 4M rows of a
    * (key, count)-shaped frame is O(100 MB) broadcast — near the upper
    * end of what executors comfortably replicate; genuinely small
    * contract sides (query batches, benchmark grams) sit far below. */
  val DefaultMaxBroadcastRows: Int = 1 << 22

  /** Default cap on the ESTIMATED bytes of a frame an operator must
    * broadcast (VERDICT r14 item 5): a row count alone admits multi-GB
    * broadcasts when rows are wide — 4M rows × a 768-dim float
    * embedding is ~12 GB, comfortably under the row cap and fatally
    * over any replication budget. 256 MB estimated data is the
    * defensible ceiling: the deserialized executor copy lands well
    * under a 1-2 GB slice of task memory even with 2-3× object
    * overhead on the estimate. */
  val DefaultMaxBroadcastBytes: Long = 256L << 20

  /** Assert `df` is small enough to broadcast on BOTH axes — row count
    * and estimated bytes — and fail with the operator's contract
    * message when either is exceeded. One bounded job: at most
    * `maxRows + 1` rows are counted/sized (a limit+aggregate — never a
    * full scan of a runaway side). Returns `df` unchanged, so plan
    * shapes (and the PlanSpec gates pinning them) are untouched.
    *
    * The byte figure is a DATA estimate from the schema (fixed widths
    * for primitives, measured lengths for strings/binaries, measured
    * element counts × element width for arrays) — deliberately not an
    * attempt at JVM object sizing, whose 2-3× overhead the default cap
    * already budgets for. Deeply nested types fall back to a flat
    * constant; the rail is a magnitude check, not an accountant.
    *
    * The check executes the frame's lineage once; callers guarding an
    * EXPENSIVE lineage should materialize first
    * (`Reliable.checkpoint`) so the guard and the broadcast read one
    * computed copy. */
  def broadcastSmall(df: DataFrame, what: String,
                     maxRows: Int = DefaultMaxBroadcastRows,
                     maxBytes: Long = DefaultMaxBroadcastBytes): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    require(maxBytes > 0, "maxBytes must be positive")
    // resolve fields POSITIONALLY (r15 ADVICE): a post-join frame may
    // legally carry duplicate column names, and col(name) over one
    // fails with an ambiguous-reference AnalysisException where the
    // old count-only rail worked. toDF renames by position, so the
    // size expression binds each physical column exactly once.
    val flat = df.toDF(df.columns.indices.map(i => s"__guard_c$i"): _*)
    val rowBytes = flat.schema.fields.map(approxFieldBytes).reduceOption(_ + _)
      .getOrElse(lit(0L))
    val head = flat.limit(maxRows + 1)
      .agg(count(lit(1)).as("n"), coalesce(sum(rowBytes), lit(0L)).as("b"))
      .head()
    val n = head.getLong(0)
    val bytes = head.getLong(1)
    require(n <= maxRows,
      s"$what must be broadcast-small but has > $maxRows rows — this " +
        "operator replicates it to every task; shrink the input, raise " +
        "the cap explicitly, or use a shuffle-based alternative")
    require(bytes <= maxBytes,
      s"$what must be broadcast-small but its $n rows are ~$bytes bytes " +
        s"of data (cap $maxBytes) — wide rows defeat the row cap; this " +
        "operator replicates the frame to every task; project away wide " +
        "columns, shrink the input, raise the cap explicitly, or use a " +
        "shuffle-based alternative")
    df
  }

  /** Rail a broadcast from PRECOMPUTED figures (r15 ADVICE: the
    * autoDepth rerank shortlists). Operators whose candidate frames
    * carry an exact arithmetic bound — a bounded argmax-k emits at most
    * |queries|·k·factor rows of known width — rail the BOUND instead of
    * executing the lineage: zero extra scans, no plan change (the
    * codes-only candidate scans stay plan-gated in PqSpec), same loud
    * contract as [[broadcastSmall]]. */
  def broadcastBudget(rows: Long, bytesPerRow: Long, what: String,
                      maxRows: Int = DefaultMaxBroadcastRows,
                      maxBytes: Long = DefaultMaxBroadcastBytes): Unit = {
    require(rows <= maxRows,
      s"$what must be broadcast-small but would hold up to $rows rows " +
        s"(cap $maxRows) — this operator replicates it to every task; " +
        "shrink the query batch, lower k or the rerank factor, or use a " +
        "shuffle-based alternative")
    val bytes = rows * bytesPerRow
    require(bytes <= maxBytes,
      s"$what must be broadcast-small but its $rows rows are ~$bytes bytes " +
        s"of data (cap $maxBytes) — wide rows defeat the row cap; this " +
        "operator replicates the frame to every task; shrink the query " +
        "batch, lower k or the rerank factor, raise the cap explicitly, " +
        "or use a shuffle-based alternative")
  }

  /** Estimated data bytes of one field as a Column (long). Null-safe:
    * a null value costs only its fixed slot. The reference is
    * backtick-quoted so a field literally named `a.b` is read as that
    * field, not parsed as nested-struct access (embedded backticks
    * escape by doubling, the SQL-identifier rule). */
  private def approxFieldBytes(f: StructField): Column =
    approxBytes(col(s"`${f.name.replace("`", "``")}`"), f.dataType)

  private def approxBytes(c: Column, dt: DataType, depth: Int = 0): Column = dt match {
    case StringType | BinaryType =>
      // octet_length: bytes for both types (length() is chars for strings)
      coalesce(octet_length(c).cast("long"), lit(0L)) + lit(16L)
    case ArrayType(et, _) =>
      // greatest(…, 0): with spark.sql.legacy.sizeOfNull (the non-ANSI
      // default) size(null) is -1, which would SUBTRACT elemWidth per
      // null row instead of costing the fixed slot
      greatest(coalesce(size(c).cast("long"), lit(0L)), lit(0L)) *
        lit(elemWidth(et)) + lit(16L)
    case st: StructType
        if depth == 0 && st.fieldNames.distinct.length == st.size =>
      // recurse ONE level (r15 ADVICE): a wide array/string wrapped in
      // a struct is exactly the wide-row class the rail exists for and
      // a flat 64 bytes let it through. Deeper nesting (and the rare
      // duplicate-field-name struct getField cannot address) keeps the
      // flat fallback — the rail is a magnitude check.
      st.fields.map(f => approxBytes(c.getField(f.name), f.dataType, depth + 1))
        .reduceOption(_ + _).getOrElse(lit(0L)) + lit(8L)
    case other => lit(fixedWidth(other))
  }

  /** Per-element width for array payloads: primitives by size; nested
    * strings/arrays fall back to a flat constant (measuring them would
    * need a per-element explode — not worth it for a magnitude rail). */
  private def elemWidth(dt: DataType): Long = dt match {
    case BooleanType | ByteType => 1L
    case ShortType => 2L
    case IntegerType | FloatType | DateType => 4L
    case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
    case _: DecimalType => 16L
    case _ => 32L
  }

  private def fixedWidth(dt: DataType): Long = dt match {
    case BooleanType | ByteType => 1L
    case ShortType => 2L
    case IntegerType | FloatType | DateType => 4L
    case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
    case _: DecimalType => 16L
    case _ => 64L // struct/map/nested: flat fallback
  }
}
