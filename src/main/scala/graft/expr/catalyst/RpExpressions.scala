package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign matrix + projection kernel for Johnson–Lindenstrauss random
  * projection (Achlioptas 2003's ±1 database-friendly variant). The
  * matrix is NEVER materialized as data: entry (j, k) is the low bit of
  * `xxhash64((j << 20) | k, seed)`, scaled by 1/√outDim — every
  * executor derives the identical matrix from two scalars, so
  * projecting 100 TB of vectors ships zero matrix bytes and the
  * operator stays a pure per-row kernel. Rows×outDim signs are computed
  * once per (inDim) and cached per JVM. */
final class RpTable(val outDim: Int, val seed: Long) extends Serializable {
  require(outDim > 0 && outDim < (1 << 20), s"outDim must be in (0, 2^20), got $outDim")
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Float]]()

  private[catalyst] def signs(inDim: Int): Array[Float] =
    cache.computeIfAbsent(inDim, _ => {
      val s = new Array[Float](inDim * outDim)
      val norm = (1.0 / math.sqrt(outDim.toDouble)).toFloat
      var j = 0
      var idx = 0
      while (j < inDim) {
        var k = 0
        while (k < outDim) {
          val h = XxHash64Function.hash(
            java.lang.Long.valueOf((j.toLong << 20) | k.toLong), LongType, seed)
          s(idx) = if ((h & 1L) == 0L) norm else -norm
          idx += 1
          k += 1
        }
        j += 1
      }
      s
    })

  /** Project one vector; null elements read as 0. */
  def project(arr: ArrayData, elemIsFloat: Boolean): GenericArrayData = {
    val inDim = arr.numElements()
    val m = signs(inDim)
    val acc = new Array[Double](outDim)
    var j = 0
    while (j < inDim) {
      val v =
        if (arr.isNullAt(j)) 0.0
        else if (elemIsFloat) arr.getFloat(j).toDouble
        else arr.getDouble(j)
      if (v != 0.0) {
        val base = j * outDim
        var k = 0
        while (k < outDim) { acc(k) += v * m(base + k); k += 1 }
      }
      j += 1
    }
    val out = new Array[Any](outDim)
    var k = 0
    while (k < outDim) { out(k) = acc(k); k += 1 }
    new GenericArrayData(out)
  }
}

/** array<float|double> → array<double> JL random projection (fused,
  * codegen'd). Deterministic in (outDim, seed) only — queries and
  * corpus projected anywhere agree bit-for-bit. */
case class RandomProject(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {
  @transient private lazy val table = new RpTable(outDim, seed)
  @transient private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def prettyName: String = "graft_random_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    table.project(a.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("rpTable", table, classOf[RpTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $tableRef.project($c, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
