package graft.expr.catalyst

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType}
import org.apache.spark.sql.types.Decimal

/** Q64.96 fixed-point price ratio: (sqrtPriceX96 / 2^96)² at 50-digit
  * precision, HALF_UP-quantized to 18 dp — the reference's exact
  * semantics (utils.py:130-148 under the 50-digit context of utils.py:9).
  *
  * Why native: sqrtPriceX96 reaches 2^160, and staging the division
  * through Decimal(38,·) intermediates loses relative precision to
  * Spark's precision-38 cap (observed ~1e-8 relative error on large
  * ticks — SURVEY §7.7 #1). A per-row java.math.BigDecimal computation
  * with MathContext(50) reproduces the reference bit-for-bit and stays
  * inside whole-stage codegen via a static kernel call.
  *
  * Out-of-range results (ratio needing > 20 integer digits) yield 0,
  * matching the reference's InvalidOperation → 0 policy (utils.py:160-169).
  */
object Q96Kernel {
  private val Q96: JBD = new JBD(java.math.BigInteger.ONE.shiftLeft(96))
  private val MC50 = new MathContext(50)

  def ratio(sp: Decimal): Decimal = {
    val half = sp.toJavaBigDecimal.divide(Q96, MC50)
    val r = half.multiply(half, MC50).setScale(18, RoundingMode.HALF_UP)
    if (r.precision - r.scale > DecimalType.MAX_PRECISION - 18) Decimal(0, 38, 18)
    else Decimal(r, 38, 18)
  }
}

case class Q96Ratio(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_q96_ratio"
  override def dataType: DataType = DecimalType(38, 18)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a decimal input, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    Q96Kernel.ratio(v.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.Q96Kernel.ratio($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
