package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` per key (SURVEY §2.3: absent in the reference,
  * a first-class operator here; the canonical "state at event time"
  * lookup for prices/rates).
  *
  * Spark-first formulation (no custom physical operator needed): tag
  * and union both sides, then one window per key ordered by
  * (ts, side, tiebreak) carries the last non-null right payload forward
  * (`last(..., ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT).
  * Right rows sort BEFORE left rows at equal ts, giving inclusive
  * `<=` semantics. Cost: ONE shuffle + sort on the key — no range
  * explosion, no per-row probes; at 100 TB this is the same shape as a
  * sort-merge join and AQE-skew-splittable.
  */
object AsofJoin {

  /** @param rightCols right payload columns to carry (renamed as given)
    * @param tiebreak  extra right-side order column for determinism when
    *                  a key has several right rows at one timestamp */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Seq[String], tiebreak: Column = lit(0)): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"right payload columns $rightCols collide with left schema")
    val reserved = Seq("__ts", "__side", "__tb")
    require(reserved.forall(r => !leftCols.contains(r) && !rightCols.contains(r)),
      s"column names $reserved are reserved by asof")

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
    val lAll = rightCols.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val r0 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tb", tiebreak.cast("long"))
    val rAll = leftCols.filterNot(keys.contains).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((keys ++ Seq("__ts", "__side", "__tb") ++
        leftCols.filterNot(keys.contains) ++ rightCols).map(col): _*)

    val unioned = lAll
      .select((keys ++ Seq("__ts", "__side", "__tb") ++
        leftCols.filterNot(keys.contains) ++ rightCols).map(col): _*)
      .unionByName(rAll)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    carried.filter(col("__side") === 1)
      .select((leftCols ++ rightCols).map(col): _*)
  }
}
