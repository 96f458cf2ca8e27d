package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` per key (SURVEY §2.3: absent in the reference,
  * a first-class operator here; the canonical "state at event time"
  * lookup for prices/rates). `direction = "forward"` flips the
  * predicate to the EARLIEST right row with `right.ts >= left.ts` —
  * the "next quote/fill after the order" lookup.
  *
  * Spark-first formulation (no custom physical operator needed): tag
  * and union both sides, then one window per key ordered by
  * (ts, side, tiebreak) carries the last right payload forward
  * (`last(..., ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT).
  * Right rows sort BEFORE left rows at equal ts, giving inclusive
  * `<=` semantics. The payload travels as ONE struct, so the match is
  * ROW-atomic: a right row whose latest quote has a null column still
  * supplies that null, never a blend of columns from different right
  * rows (per-column carry would silently mix two quotes). Right rows
  * with a null timestamp are dropped up front — `right.ts <= left.ts`
  * is NULL for them (no match), but NULLS FIRST ordering would
  * otherwise hand their payload to every pre-first-quote left row.
  * Cost: ONE shuffle + sort on the key — no range explosion, no
  * per-row probes; at 100 TB this is the same shape as a sort-merge
  * join and AQE-skew-splittable.
  */
object AsofJoin {

  /** @param rightCols right payload columns to carry (renamed as given)
    * @param tiebreak  extra right-side order column for determinism when
    *                  a key has several right rows at one timestamp
    * @param direction "backward" (latest right.ts <= left.ts, default)
    *                  or "forward" (earliest right.ts >= left.ts) */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Seq[String], tiebreak: Column = lit(0),
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"right payload columns $rightCols collide with left schema")
    val reserved = Seq("__ts", "__side", "__tb", "__pay")
    require(reserved.forall(r => !leftCols.contains(r) && !rightCols.contains(r)),
      s"column names $reserved are reserved by asof")

    val payType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val shape = keys ++ Seq("__ts", "__side", "__tb", "__pay") ++
      leftCols.filterNot(keys.contains)

    // at equal ts the right row must sort on the INCLUSIVE side of the
    // left row: before it for backward (last() sees it), after it for
    // forward (first() sees it)
    val lAll = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(if (backward) 1 else 0))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__pay", lit(null).cast(payType))
      .select(shape.map(col): _*)

    val r0 = right
      .filter(col(rightTs).isNotNull) // null ts = no match, see above
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(if (backward) 0 else 1))
      .withColumn("__tb", tiebreak.cast("long"))
      .withColumn("__pay", struct(rightCols.map(col): _*))
    val rAll = leftCols.filterNot(keys.contains).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(shape.map(col): _*)

    val unioned = lAll.unionByName(rAll)

    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
    val carried =
      if (backward) {
        val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__pay",
          last(col("__pay"), ignoreNulls = true).over(w))
      } else {
        val w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        unioned.withColumn("__pay",
          first(col("__pay"), ignoreNulls = true).over(w))
      }

    carried.filter(col("__side") === lit(if (backward) 1 else 0))
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__pay").getField(c).as(c)): _*)
  }
}
