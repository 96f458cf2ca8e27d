package graft.ops

import org.apache.spark.sql.DataFrame

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

  /** Assert `df` is small enough to broadcast: count at most
    * `maxRows + 1` rows (a limit+count — never a full count of a
    * runaway side) and fail with the operator's contract message when
    * exceeded. Returns `df` unchanged, so plan shapes (and the PlanSpec
    * gates pinning them) are untouched.
    *
    * The check executes the frame's lineage once; callers guarding an
    * EXPENSIVE lineage should materialize first
    * (`Reliable.checkpoint`) so the guard and the broadcast read one
    * computed copy. */
  def broadcastSmall(df: DataFrame, what: String,
                     maxRows: Int = DefaultMaxBroadcastRows): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"$what must be broadcast-small but has > $maxRows rows — this " +
        "operator replicates it to every task; shrink the input, raise " +
        "the cap explicitly, or use a shuffle-based alternative")
    df
  }
}
