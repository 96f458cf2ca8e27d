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
    val upd = updateCols.toSet
    val in = incoming.select(cols.map(c => col(c).as(s"__in_$c")): _*)
    val joinCond = keys.map(k => existing(k) <=> in(s"__in_$k")).reduce(_ && _)
    val matched = keys.map(k => in(s"__in_$k").isNotNull).reduce(_ && _) &&
      keys.map(k => existing(k).isNotNull).reduce(_ && _)

    val out = existing.join(in, joinCond, "full_outer").select(cols.map { c =>
      val ex = existing(c); val nw = in(s"__in_$c")
      val v =
        if (keys.contains(c)) coalesce(ex, nw)
        else if (upd.contains(c)) when(matched || ex.isNull, nw).otherwise(ex)
        else coalesce(ex, nw)
      v.as(c)
    }: _*)
    out
  }

  /** Full-row upsert (REPLACE INTO semantics — etl_control, SqlDbEtl.py:84-88):
    * incoming replaces the whole row on key match. */
  def replace(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    upsert(existing, incoming, keys, existing.columns.toSeq.filterNot(keys.contains))

  /** Last-writer-wins dedup used to build an SCD-1 dim from a stream of
    * upserts in one pass (U1 applied set-at-a-time): keep, per key, the row
    * with the greatest `order` tuple. Deterministic: pass a total order
    * (e.g. batch time then a unique id) — SURVEY §7.7 #4. */
  def lastWriterWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
