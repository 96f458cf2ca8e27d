package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

/** Per-row nearest-centroids kernel — the centroid-ASSIGNMENT primitive
  * for the IVF/k-means/SemDeDup family.
  *
  * The declarative formulation (broadcast-join the k centroids onto
  * every row, rank with `row_number() over (partition by id order by
  * csim desc, cid)`) expands the corpus k-fold and then SHUFFLES the
  * expanded frame by id just to pick each row's top-n — an n·k-row
  * exchange that dominated assignment cost and ran once per Lloyd
  * iteration. This kernel folds the whole pick into one per-row O(k·dim)
  * scan: centroids arrive packed as a single broadcast array value, the
  * row never leaves its partition, and assignment becomes
  * embarrassingly parallel at any corpus size.
  *
  * Ordering semantics replicate the window formulation exactly
  * (kernel-parity-tested): similarity desc with NaN ranked ABOVE every
  * number (Spark's double ordering), invalid scores (zero/null centroid
  * norm under cosine, dimension mismatch, null elements) ranked last the
  * way `csim DESC NULLS LAST` places them, all ties broken by cid asc,
  * and -0.0 == 0.0. Cosine score is dot/(vn·cn) with only the CENTROID
  * norm gated (> 0, or NaN — Spark's `>` ranks NaN above every number).
  *
  * Under the L2 metric the reference ordering is raw distance ASC (the
  * PQ training window), where NaN sorts LAST — so a NaN distance
  * quarantines that centroid (invalid) rather than inheriting
  * negated-score NaN-first semantics, which would let one NaN-poisoned
  * centroid capture every row and collapse codebook training.
  *
  * Deliberate divergences from the declarative forms, all the
  * established degrade-don't-crash kernel posture: (1) under cosine, a
  * zero-norm VECTOR scores 0/0 = NaN against every valid centroid —
  * ties, lowest cid wins — where ANSI division in the window
  * formulation THROWS DIVIDE_BY_ZERO and kills the whole scan; (2) a
  * NULL vector returns NULL (row dropped by the consumer's explode)
  * instead of the window's accidental assigned-to-lowest-cid; (3) a
  * NULL slot in the packed cents array is skipped (no cid to rank)
  * instead of an NPE.
  */
object NearestCentsKernel {

  private def getD(isFloat: Boolean, a: ArrayData, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Strict total order: valid beats invalid; valid ties by
    * Double.compare (NaN greatest) then cid asc; invalid by cid asc. */
  private def better(aS: Double, aV: Boolean, aC: Long,
                     bS: Double, bV: Boolean, bC: Long): Boolean =
    if (aV != bV) aV
    else if (aV) {
      val cmp = java.lang.Double.compare(aS, bS)
      if (cmp != 0) cmp > 0 else aC < bC
    } else aC < bC

  /** cents: array of struct(cid: long, cv: array<float|double>,
    * cn: double). Returns the top-n cids, best first. */
  def pick(vec: ArrayData, vecIsFloat: Boolean, cents: ArrayData,
           cvIsFloat: Boolean, n: Int, cosine: Boolean): ArrayData = {
    val dim = vec.numElements()
    // one pass for the vector norm; a null element poisons the score of
    // EVERY centroid (dot -> null in the declarative form), so the whole
    // pick degrades to the invalid-ordering (cid asc) path
    var vecOk = true
    var sq = 0.0
    var i = 0
    while (i < dim && vecOk) {
      if (vec.isNullAt(i)) vecOk = false
      else { val x = getD(vecIsFloat, vec, i); sq += x * x }
      i += 1
    }
    val vn = Math.sqrt(sq)
    val k = cents.numElements()
    val m = if (n < k) n else k
    val bc = new Array[Long](m)
    val bs = new Array[Double](m)
    val bv = new Array[Boolean](m)
    var cnt = 0
    var c = 0
    // a NULL slot in the cents array has no cid to rank — skipped
    // outright (the type check permits containsNull; crashing here
    // would violate the degrade-don't-crash posture)
    while (c < k) if (cents.isNullAt(c)) c += 1 else {
      val row = cents.getStruct(c, 3)
      val cid = row.getLong(0)
      var s = 0.0
      var valid = false
      if (!row.isNullAt(1)) {
        val cv = row.getArray(1)
        if (cv.numElements() == dim && vecOk) {
          if (cosine) {
            // Spark's `cn > 0` gate is TRUE for NaN (NaN outranks every
            // number in Spark comparisons) — replicate, else a NaN-norm
            // centroid silently switches from rank-first to rank-last
            if (!row.isNullAt(2)) {
              val cn = row.getDouble(2)
              if (cn > 0 || java.lang.Double.isNaN(cn)) {
                var dot = 0.0
                var ok = true
                var j = 0
                while (j < dim && ok) {
                  if (cv.isNullAt(j)) ok = false
                  else {
                    dot += getD(vecIsFloat, vec, j) * getD(cvIsFloat, cv, j)
                    j += 1
                  }
                }
                if (ok) { s = dot / (vn * cn); valid = true }
              }
            }
          } else {
            var acc = 0.0
            var ok = true
            var j = 0
            while (j < dim && ok) {
              if (cv.isNullAt(j)) ok = false
              else {
                val d = getD(vecIsFloat, vec, j) - getD(cvIsFloat, cv, j)
                acc += d * d
                j += 1
              }
            }
            // a NaN distance QUARANTINES the centroid (invalid, ranks
            // last): the replaced PQ window ordered raw distance ASC,
            // where NaN sorts last — negating the score would flip a
            // NaN-poisoned centroid to rank FIRST and capture every
            // row, collapsing codebook training
            if (ok && !java.lang.Double.isNaN(acc)) { s = -acc; valid = true }
          }
        }
      }
      if (s == 0.0) s = 0.0 // normalize -0.0: Spark's ordering treats them equal
      if (cnt < m) {
        bc(cnt) = cid; bs(cnt) = s; bv(cnt) = valid
        cnt += 1
        var p = cnt - 1
        while (p > 0 && better(bs(p), bv(p), bc(p), bs(p - 1), bv(p - 1), bc(p - 1))) {
          val tc = bc(p); bc(p) = bc(p - 1); bc(p - 1) = tc
          val ts = bs(p); bs(p) = bs(p - 1); bs(p - 1) = ts
          val tv = bv(p); bv(p) = bv(p - 1); bv(p - 1) = tv
          p -= 1
        }
      } else if (m > 0 && better(s, valid, cid, bs(m - 1), bv(m - 1), bc(m - 1))) {
        bc(m - 1) = cid; bs(m - 1) = s; bv(m - 1) = valid
        var p = m - 1
        while (p > 0 && better(bs(p), bv(p), bc(p), bs(p - 1), bv(p - 1), bc(p - 1))) {
          val tc = bc(p); bc(p) = bc(p - 1); bc(p - 1) = tc
          val ts = bs(p); bs(p) = bs(p - 1); bs(p - 1) = ts
          val tv = bv(p); bv(p) = bv(p - 1); bv(p - 1) = tv
          p -= 1
        }
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bc, cnt))
  }
}

/** Top-n nearest centroid ids for a vector, against a packed broadcast
  * centroid array — array<long> cids, best first. `cosine` picks the
  * metric (cosine vs negated squared L2). */
case class NearestCents(left: Expression, right: Expression, n: Int,
                        cosine: Boolean) extends BinaryExpression {
  require(n >= 1, "need n >= 1 nearest centroids")

  override def prettyName: String = "graft_nearest_cents"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def cvIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 3 =>
        fields(0).dataType == LongType &&
          (fields(1).dataType match {
            case ArrayType(FloatType | DoubleType, _) => true
            case _ => false
          }) && fields(2).dataType == DoubleType
      case _ => false
    }
    if (vecOk && centsOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<struct<cid:bigint," +
        s"cv:array<float|double>,cn:double>>), got ${left.dataType.sql} and " +
        s"${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    NearestCentsKernel.pick(l.asInstanceOf[ArrayData], vecIsFloat,
      r.asInstanceOf[ArrayData], cvIsFloat, n, cosine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.catalyst.NearestCentsKernel.pick(" +
        s"$a, $vecIsFloat, $b, $cvIsFloat, $n, $cosine);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
