package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

  /** n-D Hilbert index via Skilling's transpose algorithm (John
    * Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707,
    * 2004 — public): axes → transposed Hilbert coordinates (inverse
    * undo + Gray encode), then bit-interleave the transposed words
    * into one scalar in [0, 2^(n·bits)). Consecutive indices are
    * Manhattan-adjacent cells in n-D (exhaustively spec-pinned for
    * n = 3), the locality property zValueN lacks. The 2-D [[d]] walk
    * is kept separate — it predates this and its oracle restatement
    * is already committed; the two curves are both Hilbert curves but
    * not the same orientation. */
  def dN(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val bound = 1L << bits
    var i = 0
    while (i < n) {
      if (coords(i) < 0 || coords(i) >= bound)
        throw new IllegalArgumentException(
          s"hilbert input ${coords(i)} out of [0, $bound) — bucket or " +
            "rank wider domains first")
      i += 1
    }
    val x = coords.clone()
    // inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var j = 0
      while (j < n) {
        if ((x(j) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(j)) & p; x(0) ^= t; x(j) ^= t }
        j += 1
      }
      q >>= 1
    }
    // Gray encode
    var g = 1
    while (g < n) { x(g) ^= x(g - 1); g += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    var f = 0
    while (f < n) { x(f) ^= t; f += 1 }
    // interleave: per bit level, x(0)'s bit is the most significant
    var h = 0L
    var lvl = bits - 1
    while (lvl >= 0) {
      var c = 0
      while (c < n) { h = (h << 1) | ((x(c) >> lvl) & 1L); c += 1 }
      lvl -= 1
    }
    h
  }
}

/** bigint n-D Hilbert index of n bigint cell coordinates
  * ([[HilbertKernel.dN]]) — codegen compatible (one static kernel call
  * per row over a stack-local coordinate array). */
case class HilbertDN(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.size >= 2,
    s"HilbertDN needs at least 2 coordinates, got ${children.size}")
  require(bits >= 1 && children.size * bits <= 62,
    s"need bits >= 1 and n*bits <= 62, got n=${children.size} bits=$bits")

  override def prettyName: String = "graft_hilbert_dn"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires all-bigint coordinates, got " +
          children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def eval(input: InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertKernel.dN(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hcoords")
    val fill = evs.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code =
      code"""
        ${evs.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = ${evs.map(_.isNull).mkString(" || ")};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          long[] $arr = new long[${children.size}];
          $fill
          ${ev.value} = graft.expr.catalyst.HilbertKernel.dN($arr, $bits);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
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
