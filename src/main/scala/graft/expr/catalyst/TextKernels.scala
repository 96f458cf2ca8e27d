package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text kernels for the remaining interpreted-HOF hot paths
  * (identified by honest noop-sink benchmarking — count() pruning had
  * hidden them). Each is bit-identical to its declarative formulation
  * (parity-tested in KernelParitySpec).
  */
object TextKernelFunctions {

  /** Unicode normalization (java.text.Normalizer). Fast path: an
    * already-normalized string (the overwhelming case on real corpora)
    * returns the INPUT UTF8String — no re-encode, no allocation. */
  def unicodeNormalize(t: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, form)) t
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }

  /** Distinct word n-gram shingles in first-occurrence order — matches
    * `array_distinct(transform(sequence(...), i => array_join(slice(
    * split(trim(lower(text)), "\\s+"), i, n), " ")))` exactly. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val all = MinHashKernel.shingleStrings(text, n)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < all.length) { seen.add(all(i)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash — matches the declarative formulation in
    * Dedup.simhash64: tokens = split(trim(lower(text)), "\\s+") (NO
    * empty-token filter), per-token xxhash64 (seed 42), per-bit majority
    * vote with strict `votes·2 > nTokens`. */
  def simhash64(text: UTF8String): Long = {
    val cleaned = text.toLowerCase.trim().toString
    val toks = cleaned.split("\\s+", -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > toks.length) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** array<string> distinct n-gram shingles (fused). */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    TextKernelFunctions.shingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.TextKernelFunctions.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization
  * step that belongs BEFORE any hash-based dedup/fingerprint: visually
  * identical strings with different combining-mark encodings otherwise
  * hash apart. No Spark built-in exists; this wraps
  * `java.text.Normalizer` with an already-normalized fast path (zero
  * allocation on ASCII/normalized inputs — the common case).
  * Oracle-compatible with DuckDB's `nfc_normalize` (both implement the
  * Unicode standard algorithm). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"form must be NFC|NFD|NFKC|NFKD, got $form")
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
  override def prettyName: String = "graft_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    TextKernelFunctions.unicodeNormalize(t.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", f, "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.TextKernelFunctions.unicodeNormalize($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash (fused). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    TextKernelFunctions.simhash64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.TextKernelFunctions.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
