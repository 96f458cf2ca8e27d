package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path (SURVEY §2.11).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is correct but interpreted: every evaluation allocates a zipped array
  * and walks it with per-element lambda dispatch. For top-k similarity
  * the dot product is evaluated once per (query × candidate) pair, which
  * makes it the single hottest expression in the engine — so it gets a
  * fused, allocation-free implementation with whole-stage codegen.
  *
  * Semantics match the HOF formulation bit-for-bit (and the DuckDB
  * oracle): elements cast to double, products accumulated sequentially
  * left-to-right; null array, length mismatch, or null element → null.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Scala accessor for an array element as double. */
  protected def getD(dt: DataType, a: ArrayData, i: Int): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case ByteType => a.getByte(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Codegen accessor for an array element as double. */
  protected def getDCode(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|tinyint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** acc ⊕ (x, y) combine step, interpreted. */
  protected def combine(acc: Double, x: Double, y: Double): Double

  /** acc ⊕ (x, y) combine step, codegen ('$acc', '$x', '$y' are vars). */
  protected def combineCode(acc: String, x: String, y: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = combine(acc, getD(ta, a, i), getD(tb, b, i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${combineCode(acc, getDCode(ta, a, i), getDCode(tb, b, i))}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }
}

/** Σ aᵢ·bᵢ — sequential double accumulation. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"
  override protected def combine(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc += ($x) * ($y);"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² — squared euclidean distance, same accumulation contract. */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_l2sq"
  override protected def combine(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def combineCode(acc: String, x: String, y: String): String =
    s"{ final double __d = ($x) - ($y); $acc += __d * __d; }"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
