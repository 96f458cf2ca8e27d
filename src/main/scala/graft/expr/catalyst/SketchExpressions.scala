package graft.expr.catalyst

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the binary produced by Spark's
  * `count_min_sketch` aggregate) for a key's estimated count — the
  * piece that lets a sketch built in one aggregation be consumed
  * INSIDE the plan (broadcast to the probe rows) instead of forcing a
  * driver-side collect at DataFrame-construction time.
  *
  * The deserialized sketch is cached by CONTENT (length + byte
  * equality), not by reference: the usual probe path reads the sketch
  * column out of an UnsafeRow (broadcast join output), and
  * UnsafeRow.getBinary allocates a FRESH array per access, so a
  * reference cache would miss on every row and re-deserialize the
  * whole depth×width sketch per probe. The memcmp costs O(sketch
  * bytes) with zero allocation — far cheaper than readFrom.
  * CodegenFallback: probe frames are candidate-sized (≤ 1/support
  * rows for heavy hitters) — never a hot path.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | ByteType | ShortType | IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary sketch, string-or-integral key), got (${l.sql}, ${r.sql})")
    }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedCms: CountMinSketch = _

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    if (cachedBytes == null || !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedCms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes.clone()
    }
    key match {
      // the aggregate adds strings as their UTF-8 bytes; estimateCount
      // hashes a String the same way (assertion-oracle-proven in
      // q_heavy_hitters)
      case u: UTF8String => cachedCms.estimateCount(u.toString)
      case n: java.lang.Number => cachedCms.estimateCount(n.longValue())
      case other => throw new IllegalArgumentException(
        s"unsupported CMS key ${other.getClass}")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
