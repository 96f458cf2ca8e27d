package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing-fingerprint kernel.
  *
  * Semantically identical to the declarative formulation in
  * `ops.Fingerprint` (positions exploded → Horner gram hash of
  * `ascii(substr(text, pos+j, 1))` → per-doc window MIN → DISTINCT) and
  * to the DuckDB oracle running that exact arithmetic — but one O(len)
  * pass per row. The declarative version is O(len²·k): every
  * `substr(text, pos, 1)` walks the UTF8String from the start to find
  * the char boundary, which made winnowing the dominant cost of the
  * fingerprint queries (q_winnow_pairs 30 s at sf0.1; kernel ~1 s), and
  * its window shuffle (one (id, pos, hash) row PER CHARACTER) is
  * eliminated entirely — fingerprints never leave the row they were
  * computed in.
  *
  * Per row: decode code points once (code-point arithmetic = Spark
  * `ascii` = DuckDB `ascii`), rolling Rabin–Karp gram hashes
  * (h·B + c mod M Horner seed, then O(1) slide via subtract-leading ·
  * B + trailing with precomputed B^(k−1) mod M), sliding-window minima
  * via a monotonic deque, first-seen dedup. Returns the DISTINCT
  * selected hashes in first-selection order; empty array when the text
  * is shorter than k+w−1 code points.
  */
object WinnowKernel {

  val B = 257L
  val M = 2147483647L // 2^31 − 1

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val sLen = s.length
    // decode code points once (supplementary-plane safe)
    var n = 0
    var ci = 0
    val cps = new Array[Long](sLen)
    while (ci < sLen) {
      val cp = s.codePointAt(ci)
      cps(n) = cp.toLong
      n += 1
      ci += Character.charCount(cp)
    }
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])

    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // B^(k-1) mod M for the rolling subtract-leading step
    var bk1 = 1L
    var j = 0
    while (j < k - 1) { bk1 = bk1 * B % M; j += 1 }
    // seed gram: plain Horner (every intermediate < M·B + cp < 2^40)
    var h = 0L
    j = 0
    while (j < k) { h = (h * B + cps(j)) % M; j += 1 }
    hashes(0) = h
    var i = 1
    while (i < nGrams) {
      // (h − lead·B^(k−1))·B + trail, all mod M; +M keeps it non-negative
      h = ((h - cps(i - 1) * bk1 % M + M) % M * B + cps(i + k - 1)) % M
      hashes(i) = h
      i += 1
    }

    // sliding min over windows of w consecutive grams: monotonic deque
    // of candidate indices; dedup selected values first-seen
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[Any]()
    val deque = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < nGrams) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(p)) deque.pollLast()
      deque.addLast(p)
      if (deque.peekFirst() <= p - w) deque.pollFirst()
      if (p >= w - 1) {
        val m = hashes(deque.peekFirst())
        if (seen.add(m)) out.add(m)
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<long> of the DISTINCT winnowed fingerprints of `child` —
  * whole-stage-codegen compatible (one static kernel call per row). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2, "gram size k must be >= 2")
  require(w >= 1, "window size w must be >= 1")

  override def prettyName: String = "graft_winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    WinnowKernel.fingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.WinnowKernel.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
