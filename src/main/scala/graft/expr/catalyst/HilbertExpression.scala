package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve distance of a 2-D cell — the space-filling-curve
  * layout key with strictly better locality than Z-order: CONSECUTIVE
  * curve positions are always Manhattan-adjacent cells (Z-order jumps
  * across the plane at every power-of-two boundary), so a file holding
  * a contiguous d-range covers one connected region and its min/max
  * stats on both dimensions are at least as tight. The classic
  * iterative xy→d walk (Wikipedia's public formulation): per level s,
  * fold the quadrant into d and rotate the frame. Pure integer
  * arithmetic — the oracle restates the identical per-step columns.
  */
object HilbertKernel {
  /** d in [0, 4^bits) for (x, y) each in [0, 2^bits). Loud on
    * out-of-range input (the zValue posture: a silently wrapped
    * coordinate would quietly destroy the clustering invariant). */
  def d(x0: Long, y0: Long, bits: Int): Long = {
    val bound = 1L << bits
    if (x0 < 0 || x0 >= bound || y0 < 0 || y0 >= bound)
      throw new IllegalArgumentException(
        s"hilbert input ($x0, $y0) out of [0, $bound) — bucket or rank wider domains first")
    var x = x0; var y = y0
    var d = 0L
    var s = bound >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** bigint Hilbert distance of two bigint cell coordinates — codegen
  * compatible (one static kernel call per row). */
case class HilbertD(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62, s"need 1 <= bits <= 31, got $bits")

  override def prettyName: String = "graft_hilbert_d"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.catalyst.HilbertKernel.d($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
