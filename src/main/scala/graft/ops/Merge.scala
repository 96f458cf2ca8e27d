package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed upsert / merge — the reference's signature operator
  * (`INSERT … ON DUPLICATE KEY UPDATE`, 13 occurrences; SURVEY §2.6).
  *
  * Expressed as a set-oriented full-outer join + per-column coalesce, so it
  * is one shuffle on the key (AQE-skew-safe) instead of N round-trips.
  * On a MERGE-capable sink (Delta/Iceberg) the same semantics map to
  * `MERGE INTO`; on plain parquet the returned frame is the new table
  * state to rewrite (dims are small; facts partition by date so only
  * touched date partitions rewrite — SURVEY §7.6).
  */
object Merge {

  /** Schema-evolving wrapper over [[upsert]]: aligns both sides to the
    * UNION of their schemas before merging, so a pipeline that starts
    * emitting a new column (or replays history missing a since-added
    * one) keeps merging instead of failing the strict schema check —
    * the additive half of real warehouse schema evolution. Columns
    * absent on a side fill with typed nulls; a column present on both
    * sides with DIFFERENT types is a genuine contract break and still
    * fails. New columns land in existing-side column order first, then
    * incoming-only columns in incoming order; incoming-only columns are
    * implicitly update columns (existing rows hold null there). */
  def upsertEvolving(existing: DataFrame, incoming: DataFrame,
                     keys: Seq[String], updateCols: Seq[String]): DataFrame = {
    val exTypes = existing.schema.map(f => f.name -> f.dataType).toMap
    val inTypes = incoming.schema.map(f => f.name -> f.dataType).toMap
    val clash = exTypes.keySet.intersect(inTypes.keySet)
      .filter(c => exTypes(c) != inTypes(c))
    require(clash.isEmpty,
      s"columns ${clash.toSeq.sorted} change type between existing and incoming")
    require(keys.forall(k => exTypes.contains(k) && inTypes.contains(k)),
      "merge keys must exist on both sides")
    val ordered = existing.columns.toSeq ++
      incoming.columns.filterNot(exTypes.contains)
    def align(df: DataFrame, types: Map[String, org.apache.spark.sql.types.DataType]) =
      df.select(ordered.map(c =>
        if (types.contains(c)) col(c)
        else lit(null).cast(exTypes.getOrElse(c, inTypes(c))).as(c)): _*)
    upsert(align(existing, exTypes), align(incoming, inTypes),
      keys, (updateCols ++ incoming.columns.filterNot(exTypes.contains)).distinct)
  }

  /** SCD-1 partial-column upsert of `incoming` into `existing` on `keys`.
    *
    * Semantics (matches `ON DUPLICATE KEY UPDATE c = VALUES(c)`):
    *  - key present in both: take `updateCols` from incoming, all other
    *    columns keep their existing values (U2's partial-column update —
    *    the per-task update sets differ, e.g. Bifrost.py:159 updates only
    *    created_at, Stellar.py:143-145 the full metric set);
    *  - key only in incoming: insert the whole incoming row;
    *  - key only in existing: keep the row unchanged.
    *
    * `incoming` must be unique per key (apply Dedup.firstSeen first — the
    * reference enforces this with its `processed` sets, SqlDbEtl.py:192-229).
    * Idempotent: applying the same batch twice ≡ once (property-tested).
    */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String], updateCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge keys required")
    val cols = existing.columns.toSeq
    require(incoming.columns.toSet == cols.toSet,
      s"incoming schema ${incoming.columns.toSeq} != existing schema $cols")
    require(!cols.contains("__ex_present"),
      "column __ex_present is reserved by upsert")
    val upd = updateCols.toSet
    // row presence is an explicit flag, NOT key/value nullability: a
    // matched row whose existing non-update column is null must KEEP
    // that null (ON DUPLICATE KEY UPDATE touches only the named
    // columns) — coalesce(ex, nw) would silently let the incoming
    // value leak into a column the update set never named
    val exF = existing.withColumn("__ex_present", lit(true))
    val in = incoming.select(cols.map(c => col(c).as(s"__in_$c")) :+
      lit(true).as("__in_present"): _*)
    val joinCond = keys.map(k => exF(k) <=> in(s"__in_$k")).reduce(_ && _)
    val exPresent = coalesce(exF("__ex_present"), lit(false))
    val inPresent = coalesce(in("__in_present"), lit(false))

    val out = exF.join(in, joinCond, "full_outer").select(cols.map { c =>
      val ex = exF(c); val nw = in(s"__in_$c")
      val v =
        if (keys.contains(c)) when(exPresent, ex).otherwise(nw)
        else if (upd.contains(c)) when(inPresent, nw).otherwise(ex)
        else when(exPresent, ex).otherwise(nw)
      v.as(c)
    }: _*)
    out
  }

  /** Full-row upsert (REPLACE INTO semantics — etl_control, SqlDbEtl.py:84-88):
    * incoming replaces the whole row on key match. */
  def replace(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    upsert(existing, incoming, keys, existing.columns.toSeq.filterNot(keys.contains))

  /** Snapshot CDC diff — compare two keyed snapshots of a table and
    * emit the change set: one row per key whose state changed, with
    * `change_op` ∈ insert | update | delete, `changed_cols` (sorted,
    * update-only; empty for insert/delete), and the full before/after
    * image per non-key column (`<col>_old` / `<col>_new`). Unchanged
    * keys are absent, so the output is exactly the delta a downstream
    * incremental refresh (or a MERGE INTO statement) needs — the
    * standard way to retrofit CDC onto sources that only publish full
    * snapshots.
    *
    * VALUE comparisons are null-safe (`IS DISTINCT FROM`): null→value
    * and value→null are updates, null==null is unchanged. KEY matching
    * defaults to plain equality — CDC keys are primary keys, and the
    * equi-join is what lets two key-bucketed snapshots diff with ZERO
    * exchanges (BucketingSpec pins the plan; Catalyst rewrites a
    * null-safe join key to `coalesce(k, 0), isnull(k)`, which disables
    * bucketed co-location and re-shuffles both 100 TB sides). A
    * null-valued key under the default therefore classifies as a
    * delete + insert pair — still byte-exact under [[applyDiff]]
    * reconstruction; pass `nullSafeKeys = true` to match null keys to
    * each other instead, at the cost of the bucket-local plan.
    *
    * Scale shape: ONE shuffle at most — a single full-outer join on
    * the key (AQE skew-safe); per-column compares are codegen'd
    * projections. With both snapshots date-partitioned the join prunes
    * to changed partitions; with both bucketed on the key, none. Diff
    * output is change-sized, not snapshot-sized. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   nullSafeKeys: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "diff keys required")
    val cols = oldDf.columns.toSeq
    require(newDf.columns.toSet == cols.toSet,
      s"new snapshot schema ${newDf.columns.toSeq} != old snapshot schema $cols")
    require(keys.forall(cols.contains), s"keys $keys must exist in the schema")
    require(!cols.contains("change_op") && !cols.contains("changed_cols"),
      "columns change_op / changed_cols are reserved by snapshotDiff")
    val nonKey = cols.filterNot(keys.contains)
    val imageClash = nonKey.flatMap(c => Seq(s"${c}_old", s"${c}_new"))
      .filter(cols.contains)
    require(imageClash.isEmpty,
      s"columns $imageClash collide with snapshotDiff's before/after image names")
    val o = oldDf.select(cols.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__o_present", lit(true))
    val n = newDf.select(cols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__n_present", lit(true))
    val cond = keys.map(k =>
      if (nullSafeKeys) o(s"__o_$k") <=> n(s"__n_$k")
      else o(s"__o_$k") === n(s"__n_$k")).reduce(_ && _)
    val j = o.join(n, cond, "full_outer")
    val changed = filter(
      array(nonKey.map(c =>
        when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*),
      x => x.isNotNull)
    val op = when(col("__o_present").isNull, lit("insert"))
      .when(col("__n_present").isNull, lit("delete"))
      .when(size(changed) > 0, lit("update"))
    j.withColumn("change_op", op)
      .filter(col("change_op").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) ++
          Seq(col("change_op"),
            when(col("change_op") === "update", array_sort(changed))
              .otherwise(array().cast("array<string>")).as("changed_cols")) ++
          nonKey.flatMap(c => Seq(col(s"__o_$c").as(s"${c}_old"),
            col(s"__n_$c").as(s"${c}_new"))): _*)
  }

  /** Apply a [[snapshotDiff]] change set to the old snapshot,
    * reconstructing the new one — the CDC consumer: deletes drop via a
    * null-safe anti join (change-sized right side, broadcast-friendly),
    * inserts/updates apply their `<col>_new` images through the keyed
    * [[replace]] merge. `applyDiff(old, snapshotDiff(old, new)) == new`
    * is the operator pair's defining theorem (spec-pinned), which is
    * what lets a pipeline ship deltas instead of snapshots and trust
    * the replica state. */
  def applyDiff(oldDf: DataFrame, diff: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = oldDf.columns.toSeq
    val nonKey = cols.filterNot(keys.contains)
    val upserts = diff.filter(col("change_op") =!= "delete")
      .select(cols.map(c =>
        (if (keys.contains(c)) col(c) else col(s"${c}_new")).as(c)): _*)
    val deletes = diff.filter(col("change_op") === "delete")
      .select(keys.map(k => col(k).as(s"__d_$k")): _*)
    val delCond = keys.map(k => oldDf(k) <=> deletes(s"__d_$k")).reduce(_ && _)
    replace(oldDf.join(deletes, delCond, "left_anti"), upserts, keys)
  }

  /** Last-writer-wins dedup used to build an SCD-1 dim from a stream of
    * upserts in one pass (U1 applied set-at-a-time): keep, per key, the row
    * with the greatest `order` tuple. Deterministic: pass a total order
    * (e.g. batch time then a unique id) — SURVEY §7.7 #4. */
  def lastWriterWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** SCD Type-2 history upsert — the dimension-history counterpart of
    * the SCD-1 [[upsert]]: instead of overwriting changed attributes,
    * the current version CLOSES (`valid_to` = batchTs) and a new
    * version opens (`valid_from` = batchTs, `valid_to` null), so every
    * fact can join the dimension AS IT WAS at the fact's own time
    * ([[scd2AsOf]] is that read).
    *
    * `history` carries keys + attributes + (`valid_from`,
    * `valid_to` timestamp, null = current); `incoming` carries keys +
    * attributes, unique per key (Dedup.firstSeen upstream — the
    * [[upsert]] contract). Per incoming key: no current version →
    * insert; attribute-equal current version (null-safe, the
    * [[snapshotDiff]] compare) → no-op; differing → close + insert.
    * `closeMissing` = true additionally closes current versions whose
    * key is ABSENT from incoming — the full-snapshot-feed semantics
    * where disappearance means deletion; the default (delta feeds)
    * leaves them open. Closed history is UNTOUCHED and unioned back —
    * with the table partitioned on `valid_to IS NULL`, a materialized
    * upsert rewrites only the current partition and appends closures.
    *
    * Idempotent at the same batchTs: re-applying the same batch finds
    * attribute-equal current versions and no-ops (property-specced).
    * Scale shape: ONE full-outer join of the CURRENT slice against the
    * batch; history never joins. */
  def scd2Upsert(history: DataFrame, incoming: DataFrame, keys: Seq[String],
                 batchTs: Column, closeMissing: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "scd2 keys required")
    val metaCols = Seq("valid_from", "valid_to")
    val cols = history.columns.toSeq
    require(metaCols.forall(cols.contains),
      s"history must carry $metaCols, got $cols")
    val attrs = cols.filterNot(keys.contains).filterNot(metaCols.contains)
    require(incoming.columns.toSet == (keys ++ attrs).toSet,
      s"incoming schema ${incoming.columns.toSeq} != keys+attrs ${keys ++ attrs}")

    require(!cols.contains("__cur") && !cols.contains("__in"),
      "columns __cur/__in are reserved")
    val current = history.filter(col("valid_to").isNull)
      .withColumn("__cur", lit(true))
    val closed = history.filter(col("valid_to").isNotNull)
    val in = incoming.select((keys ++ attrs).map(c => col(c).as(s"__in_$c")): _*)
      .withColumn("__in", lit(true))
    val joinCond = keys.map(k => current(k) === in(s"__in_$k")).reduce(_ && _)
    val j = current.join(in, joinCond, "full_outer")
    // side-presence via literal tags, not key-null tests — a (broken
    // but survivable) null-keyed current row must keep flowing instead
    // of silently vanishing from both branches
    val inPresent = in("__in").isNotNull
    val curPresent = current("__cur").isNotNull
    val attrsEqual =
      if (attrs.isEmpty) lit(true)
      else attrs.map(a => current(a) <=> in(s"__in_$a")).reduce(_ && _)

    // classify ONCE and emit 1–2 output rows per joined row through a
    // single explode — three filtered union branches would each replan
    // (and re-execute) the join; this keeps the statement at genuinely
    // ONE current-vs-batch join (PlanSpec pins it)
    def rowFrom(validFrom: Column, validTo: Column, incomingSide: Boolean) =
      struct(cols.map {
        case "valid_from" => validFrom.as("valid_from")
        case "valid_to" => validTo.as("valid_to")
        case c => (if (incomingSide) in(s"__in_$c") else current(c)).as(c)
      }: _*)
    val curRow = rowFrom(current("valid_from"), current("valid_to"), incomingSide = false)
    val curClosed = rowFrom(current("valid_from"), batchTs, incomingSide = false)
    val newRow = rowFrom(batchTs, lit(null).cast("timestamp"), incomingSide = true)
    val emitted =
      when(curPresent && inPresent && attrsEqual, array(curRow))       // no-op
        .when(curPresent && inPresent && !attrsEqual,
          array(curClosed, newRow))                                    // version
        .when(curPresent && !inPresent,
          if (closeMissing) array(curClosed) else array(curRow))       // absent
        .otherwise(array(newRow))                                      // fresh
    closed.unionByName(
      j.select(explode(emitted).as("__r")).select(col("__r.*")))
  }

  /** Point-in-time read of an SCD-2 history: the version of each key
    * valid AT `ts` (valid_from <= ts < valid_to, open-ended current).
    * Partition-prunable per the [[scd2Upsert]] layout note. */
  def scd2AsOf(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
}
