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

  /** Named HTML entities decoded at a piece head by [[decodeEntities]]
    * — the canonical table (graft.ops.Curation re-exports it for the
    * declarative twin and the oracle generator). */
  val NamedEntities: Seq[(String, String)] = Seq(
    "amp;" -> "&", "lt;" -> "<", "gt;" -> ">", "quot;" -> "\"",
    "apos;" -> "'", "nbsp;" -> " ",
    "ndash;" -> "–", "mdash;" -> "—",
    "lsquo;" -> "‘", "rsquo;" -> "’",
    "ldquo;" -> "“", "rdquo;" -> "”", "hellip;" -> "…")

  /** Single-pass HTML entity decode — split on '&', decode each piece
    * HEAD (named entity or BMP numeric character reference, surrogates
    * and malformed refs stay literal), never rescan decoded output.
    * Bit-identical to the declarative split/transform twin in
    * graft.ops.Curation (parity-tested in KernelParitySpec); fused
    * because interpreted-HOF evaluation made the declarative form the
    * q_html_extract hot spot. Fast path: no '&' returns the input. */
  def decodeEntities(t: UTF8String): UTF8String = {
    val s = t.toString
    if (s.indexOf('&') < 0) return t
    val pieces = s.split("&", -1)
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(pieces(0))
    var i = 1
    while (i < pieces.length) {
      appendDecodedPiece(sb, pieces(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def appendDecodedPiece(sb: java.lang.StringBuilder, p: String): Unit = {
    // named head (table order; prefixes are mutually exclusive)
    val it = NamedEntities.iterator
    while (it.hasNext) {
      val (ent, repl) = it.next()
      if (p.startsWith(ent)) {
        sb.append(repl).append(p, ent.length, p.length)
        return
      }
    }
    // numeric head: '#' + 1..6 digits + ';'  |  '#' + [xX] + 1..5 hex + ';'
    // (the regex `{1,m}` + ';' anchor only matches when the MAXIMAL
    // run is <= m and immediately ';'-terminated — replicated here)
    if (p.startsWith("#")) {
      val isHex = p.length > 1 && (p.charAt(1) == 'x' || p.charAt(1) == 'X')
      val start = if (isHex) 2 else 1
      var end = start
      while (end < p.length && isDigitOf(p.charAt(end), isHex)) end += 1
      val runLen = end - start
      val maxLen = if (isHex) 5 else 6
      if (runLen >= 1 && runLen <= maxLen &&
          end < p.length && p.charAt(end) == ';') {
        val cp = java.lang.Integer.parseInt(p.substring(start, end),
          if (isHex) 16 else 10)
        if (cp >= 1 && cp <= 0xFFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
          sb.appendCodePoint(cp).append(p, end + 1, p.length)
          return
        }
      }
    }
    sb.append('&').append(p)
  }

  private def isDigitOf(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

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

/** Single-pass HTML entity decode (fused) — see
  * [[TextKernelFunctions.decodeEntities]]. */
case class DecodeEntities(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_decode_entities"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    TextKernelFunctions.decodeEntities(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.TextKernelFunctions.decodeEntities($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
