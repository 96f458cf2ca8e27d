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
  * Semantics are bit-compatible with the declarative formulation
  * (parity-tested in KernelParitySpec): per-element
  * round-HALF_UP(x·127 / max|v|) narrowed to tinyint, scale =
  * max|v|/127 as float; null elements stay null and are skipped in the
  * max; zero or absent max (zero/empty/all-null vector) quantizes
  * elements to 0, with scale 0 (or null when max|v| is null).
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
        if (!seen || x > maxabs) { maxabs = x; seen = true }
      }
      i += 1
    }
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      if (vec.isNullAt(i)) q(i) = null
      else if (seen && maxabs > 0) {
        val x = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        // Spark round(double) = BigDecimal HALF_UP (away from zero at
        // .5) — Math.round would differ on negative halves
        q(i) = java.math.BigDecimal.valueOf(x * 127.0 / maxabs)
          .setScale(0, java.math.RoundingMode.HALF_UP).byteValue()
      } else q(i) = 0.toByte
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
