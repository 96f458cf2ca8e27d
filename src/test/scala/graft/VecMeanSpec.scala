package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/** VecMean (the one-exchange k-means update kernel, r17) must
  * reproduce the declarative posexplode → groupBy(cid, pos) → avg →
  * re-pack form it replaced: per-position means over float arrays,
  * null elements skipped per position, ragged lengths padded to the
  * group's max observed length, never-observed positions null. */
class VecMeanSpec extends SparkSpec {
  import spark.implicits._

  private def vecMean(c: org.apache.spark.sql.Column) =
    column(graft.expr.catalyst.VecMean(expression(c)).toAggregateExpression())

  private def declarativeMeans(df: org.apache.spark.sql.DataFrame) =
    df.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m").cast("float")).as("mv"))

  test("VecMean == posexplode/avg re-pack on dense float vectors") {
    val df = Seq(
      (1, Array(1.0f, 2.0f, 3.0f)),
      (1, Array(3.0f, 4.0f, 5.0f)),
      (2, Array(10.0f, 20.0f, 30.0f))
    ).toDF("cid", "v")
    val fused = df.groupBy(col("cid"))
      .agg(transform(vecMean(col("v")), x => x.cast("float")).as("mv"))
    val decl = declarativeMeans(df)
    assert(fused.join(decl.withColumnRenamed("mv", "mv2"), Seq("cid"))
      .filter(col("mv") =!= col("mv2")).isEmpty)
    val r = fused.filter(col("cid") === 1).select(col("mv")).head()
      .getSeq[Float](0)
    assert(r === Seq(2.0f, 3.0f, 4.0f))
  }

  test("VecMean skips null elements per position and pads ragged rows") {
    val df = Seq(
      (1, Seq[Option[Float]](Some(2.0f), None, Some(6.0f))),
      (1, Seq[Option[Float]](Some(4.0f), Some(8.0f))),
      (2, Seq[Option[Float]](None, None))
    ).toDF("cid", "v")
    val fused = df.groupBy(col("cid")).agg(vecMean(col("v")).as("mv"))
    // cid 1: pos 0 avg(2,4)=3; pos 1 avg(8) (null skipped); pos 2 avg(6)
    val r1 = fused.filter(col("cid") === 1).select(col("mv")).head()
      .getSeq[java.lang.Double](0)
    assert(r1 === Seq(3.0d, 8.0d, 6.0d))
    // cid 2: both positions all-null -> null elements, length preserved
    val r2 = fused.filter(col("cid") === 2).select(col("mv")).head()
      .getSeq[java.lang.Double](0)
    assert(r2 === Seq(null, null))
  }

  test("VecMean ignores null input arrays and matches declarative form on doubles") {
    val df = Seq(
      (1, Some(Array(1.0d, 2.0d))),
      (1, None),
      (1, Some(Array(5.0d, 6.0d)))
    ).toDF("cid", "v")
    val fused = df.groupBy(col("cid")).agg(vecMean(col("v")).as("mv"))
    val r = fused.select(col("mv")).head().getSeq[Double](0)
    assert(r === Seq(3.0d, 4.0d))
  }

  test("trainCentroids with VecMean keeps the eager nLists-row contract") {
    val e = schema.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = graft.ops.Ann.trainCentroids(e, nLists = 4, iters = 2)
    assert(cents.count() === 4)
    // every centroid has the corpus dim and no null elements
    val dim = e.select(size(col("vec"))).head().getInt(0)
    assert(cents.filter(size(col("cv")) =!= dim ||
      exists(col("cv"), _.isNull)).isEmpty)
  }
}
