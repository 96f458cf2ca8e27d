package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused int8 scalar-quantization kernel.
  *
  * The declarative formulation (`transform(v, x => … array_max(
  * transform(v, abs)) …)`) is an O(dim²) trap: higher-order-function
  * lambdas are interpreted with no common-subexpression elimination
  * across the lambda boundary, so the captured max-abs subtree
  * re-evaluates PER ELEMENT (the same failure mode documented at
  * Curation.wordNgrams). This kernel is two tight O(dim) passes —
  * max-abs, then quantize — and the corpus-scan stage of
  * Ann.quantizedTopK runs it once per vector.
  *
  * Semantics are bit-compatible with the declarative formulation for
  * FINITE and null inputs (parity-tested in KernelParitySpec, incl.
  * null elements and all-null/empty/zero vectors): per-element
  * round-HALF_UP(x·127 / max|v|) narrowed to tinyint, scale =
  * max|v|/127 as float; when max|v| > 0 null elements stay null,
  * otherwise (zero/empty/all-null max) every element — nulls included
  * — quantizes to 0 (the `otherwise(0.0)` branch). NON-finite inputs
  * are where the kernel deliberately diverges: the ANSI declarative
  * form THROWS on cast(NaN as tinyint) when a NaN/±Inf element reaches
  * the ratio, so one corrupt embedding would kill a corpus-wide scan —
  * the kernel quantizes such vectors to zeros and carries the
  * non-finite magnitude through the scale (kernel-only spec).
  */
object QuantizeKernel {
  def quantize(vec: ArrayData, elemIsFloat: Boolean): InternalRow = {
    val n = vec.numElements()
    var maxabs = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val x = math.abs(
          if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i))
        // array_max ordering: NaN sorts greatest and sticks
        if (!seen || x.isNaN || (!maxabs.isNaN && x > maxabs)) { maxabs = x }
        seen = true
      }
      i += 1
    }
    val active = seen && maxabs > 0 // false for NaN/zero max
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!active) q(i) = 0.toByte // declarative otherwise(0.0), nulls included
      else if (vec.isNullAt(i)) q(i) = null
      else {
        val x = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val scaled = x * 127.0 / maxabs
        // Spark round(double) = BigDecimal HALF_UP (away from zero at
        // .5) — Math.round would differ on negative halves. Non-finite
        // ratios only arise from ±Inf inputs (|x| ≤ max|v| otherwise);
        // Spark's round passes NaN through and the tinyint cast makes
        // it 0.
        q(i) =
          if (java.lang.Double.isFinite(scaled))
            java.math.BigDecimal.valueOf(scaled)
              .setScale(0, java.math.RoundingMode.HALF_UP).byteValue()
          else 0.toByte
      }
      i += 1
    }
    val scale: Any = if (seen) (maxabs / 127.0).toFloat else null
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(q)))
  }
}

/** struct<scale: float, q: array<tinyint>> — see QuantizeKernel. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_quantize_int8"
  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = true),
    StructField("q", ArrayType(ByteType, containsNull = true), nullable = false)))

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    QuantizeKernel.quantize(v.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.QuantizeKernel.quantize($c, $elemIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
