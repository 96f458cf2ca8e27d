package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Multi-table hyperplane-LSH bucket kernel.
  *
  * nTables independent tables of nBits pseudo-random ±1 hyperplanes;
  * output element t encodes (table, bucket) as t·2^nBits + bucket so a
  * plain explode+equi-join probes all tables at once. Hyperplane weight
  * for (plane p, element i) is the parity of xxhash64 over (p, i) —
  * reproducible everywhere with no RNG state, identical to the
  * declarative `hyperplaneSign` formulation (parity-tested).
  *
  * Single-probe LSH recall collapses when neighbor similarity is modest
  * (P[same bucket] = (1 − θ/π)^nBits per table); multi-table probing
  * bounds the miss probability at (1 − p^b)^T — the knob that actually
  * scales. At 100 TB: bucket ids shuffle (8 bytes × T per vector), the
  * vectors themselves stay put.
  */
object LshKernel {

  /** Parity-of-xxhash64 ±1 weight — must match
    * Vectors.hyperplaneSign: pmod(xxhash64(lit(seed), elemIndex), 2)
    * where both inputs are IntegerType. Spark's xxhash64(a, b) chains:
    * h = hashInt(a, 42); h = hashInt(b, h). */
  def weight(planeSeed: Int, i: Int): Double = {
    val h1 = XXH64.hashInt(planeSeed, 42L)
    val h = XXH64.hashInt(i, h1)
    // pmod(h, 2) == 0 -> +1 else -1
    if ((h % 2 + 2) % 2 == 0) 1.0 else -1.0
  }

  def buckets(vec: ArrayData, elemIsFloat: Boolean, nBits: Int, nTables: Int): ArrayData = {
    val n = vec.numElements()
    // declarative parity (hyperplaneSign): a null element nulls the
    // whole projection and an empty vector has a null fold seed — both
    // fall through `when(proj >= 0, 1).otherwise(0)` to bit 0, so
    // every table buckets to (t << nBits) | 0. Reading null slots as
    // 0.0 here would instead produce hash-dependent buckets (empty:
    // all-ones) and silently split such rows from declaratively
    // bucketed probes.
    var degenerate = n == 0
    var j = 0
    while (!degenerate && j < n) {
      if (vec.isNullAt(j)) degenerate = true
      j += 1
    }
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var b = 0
      if (!degenerate) while (b < nBits) {
        val plane = t * nBits + b
        var proj = 0.0
        var i = 0
        while (i < n) {
          val x = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          proj += x * weight(plane, i)
          i += 1
        }
        if (proj >= 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = (t << nBits) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** array<int> of (table << nBits | bucket) ids for multi-table LSH. */
case class LshBuckets(child: Expression, nBits: Int, nTables: Int)
    extends UnaryExpression {
  require(nBits > 0 && nBits < 30 && nTables > 0, "invalid LSH shape")

  override def prettyName: String = "graft_lsh_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

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
    LshKernel.buckets(v.asInstanceOf[ArrayData], elemIsFloat, nBits, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.LshKernel.buckets($c, $elemIsFloat, $nBits, $nTables);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
