package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}

/** Token-span arithmetic for exact substring dedup (ops.Dedup
  * .substringDedup): merge sorted duplicated-window START positions
  * into maximal disjoint [start, end) token intervals, where each
  * position p covers [p, p+w). O(|positions|) single pass; the
  * gaps-and-islands window-function formulation computes the same
  * spans (oracle-restated), but needs two window passes over the
  * position rows — here the positions are already doc-local (one
  * collect_list per doc), so a per-row kernel is the natural shape.
  */
object SpanKernel {

  /** `ps` must be sorted ascending and duplicate-free (one row per
    * window position). Overlapping OR adjacent covers merge: a new
    * span starts only when p > current end. */
  def merge(ps: ArrayData, w: Int): ArrayData = {
    val n = ps.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val p = ps.getInt(i)
      if (m > 0 && p <= ends(m - 1)) {
        val e = p + w
        if (e > ends(m - 1)) ends(m - 1) = e
      } else {
        starts(m) = p
        ends(m) = p + w
        m += 1
      }
      i += 1
    }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      out(j) = InternalRow(starts(j), ends(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** array<int> sorted window positions -> array<struct<start:int,end:int>>
  * maximal disjoint covered intervals, each position covering w tokens. */
case class MergeSpans(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window width must be >= 1")

  override def prettyName: String = "graft_merge_spans"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("start", IntegerType, nullable = false),
      StructField("end", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    SpanKernel.merge(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.SpanKernel.merge($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
