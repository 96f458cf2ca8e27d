package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI'11): encode a
  * vector as m sub-space code indices against per-subspace codebooks,
  * and rank candidates by Asymmetric Distance Computation — the query
  * precomputes an (m × nCodes) table of exact subvector distances, and
  * each candidate's approximate distance is m table lookups summed.
  *
  * The compression argument at 100 TB: a 64-float (256 B) embedding
  * becomes m=8 byte codes — 32× less scan I/O in the candidate stage,
  * with the exact rerank reading only candidate-sized float vectors
  * (same two-stage contract as the int8 path in `Ann.quantizedTopK`).
  *
  * Codebooks ride along as a reference object inside the generated
  * code (bounded: m·nCodes·subDim floats, e.g. 8·16·8 = 1 KiB), so all
  * three kernels stay inside whole-stage codegen.
  */
object PqKernel {

  /** code[s] = argmin_c ‖vec_sub(s) − codebook(s)(c)‖² (ties → lowest
    * code id, deterministic). Null on dimension mismatch — the same
    * contract as the sibling vector kernels (a silent out-of-bounds
    * getFloat on UnsafeArrayData reads adjacent buffer memory). */
  def encode(vec: ArrayData, cbs: Array[Array[Array[Float]]]): ArrayData = {
    val m = cbs.length
    val sub = cbs(0)(0).length
    if (vec.numElements() != m * sub) return null
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val base = s * sub
      val codes = cbs(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codes.length) {
        val cv = codes(c)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = vec.getFloat(base + j) - cv(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Flattened (m × nCodes) ADC table: entry s·nCodes + c holds
    * ‖query_sub(s) − codebook(s)(c)‖². Null on dimension mismatch
    * (same contract as [[encode]]). */
  def adcTable(vec: ArrayData, cbs: Array[Array[Array[Float]]]): ArrayData = {
    val m = cbs.length
    val nCodes = cbs(0).length
    val sub = cbs(0)(0).length
    if (vec.numElements() != m * sub) return null
    val out = new Array[Any](m * nCodes)
    var s = 0
    while (s < m) {
      val base = s * sub
      val codes = cbs(s)
      var c = 0
      while (c < nCodes) {
        val cv = codes(c)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = vec.getFloat(base + j) - cv(j)
          d += diff * diff
          j += 1
        }
        out(s * nCodes + c) = d.toFloat
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate distance: Σ_s table[s·nCodes + code[s]]. Shape and
    * code-range are VALIDATED loudly: on UnsafeArrayData an
    * out-of-range getFloat reads adjacent buffer memory silently (the
    * hazard encode/adcTable guard with their null-on-mismatch
    * contract), so a table built under one codebook config probed with
    * codes from another would corrupt the candidate ranking with
    * garbage distances instead of failing. */
  def adcDistance(table: ArrayData, codes: ArrayData, nCodes: Int): Float = {
    val m = codes.numElements()
    if (m * nCodes != table.numElements())
      throw new IllegalArgumentException(
        s"PQ ADC shape mismatch: ${table.numElements()}-entry table vs " +
          s"$m codes × $nCodes codewords — table and codes were built " +
          "under different codebook configs")
    var d = 0.0f
    var s = 0
    while (s < m) {
      val code = codes.getByte(s)
      if (code < 0 || code >= nCodes)
        throw new IllegalArgumentException(
          s"PQ code $code at subspace $s outside [0, $nCodes) — codes " +
            "were encoded under a different codebook config")
      d += table.getFloat(s * nCodes + code)
      s += 1
    }
    d
  }
}

private[catalyst] trait PqCodebooked {
  def codebooks: Array[Array[Array[Float]]]

  protected def validateCodebooks(): Unit = {
    require(codebooks.nonEmpty, "codebooks must be non-empty")
    require(codebooks.forall(_.length == codebooks(0).length),
      "every subspace needs the same code count")
    require(codebooks(0).length <= 128,
      "codes are stored as tinyint — at most 128 codewords per subspace")
    require(codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
      "every code vector needs the same sub-dimension")
  }

  protected def requireFloatArray(dt: DataType, fn: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$fn requires array<float>, got ${other.sql}")
    }
}

/** array<tinyint> PQ codes of `child` against the embedded codebooks. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with PqCodebooked {
  validateCodebooks()

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true // null on dimension mismatch

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireFloatArray(child.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expr.catalyst.PqKernel.encode($c, $cb);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<float> flattened ADC lookup table for a query vector. */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with PqCodebooked {
  validateCodebooks()

  override def prettyName: String = "graft_pq_adc_table"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true // null on dimension mismatch

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireFloatArray(child.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    PqKernel.adcTable(v.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expr.catalyst.PqKernel.adcTable($c, $cb);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** float approximate distance: m lookups into the left ADC table
  * selected by the right code array. */
case class PqAdcDistance(left: Expression, right: Expression, nCodes: Int)
    extends BinaryExpression {
  require(nCodes > 0, "nCodes must be positive")

  override def prettyName: String = "graft_pq_adc_dist"
  override def dataType: DataType = FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ByteType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float> table, array<tinyint> codes), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(t: Any, c: Any): Any =
    PqKernel.adcDistance(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], nCodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.expr.catalyst.PqKernel.adcDistance($t, $c, $nCodes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
