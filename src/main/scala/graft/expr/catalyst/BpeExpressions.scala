package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared immutable BPE merge table + per-thread word memo, held once
  * per encoder and shipped to executors as a codegen reference object.
  *
  * Encoding semantics are EXACTLY the trainer's application semantics
  * (`Curation.bpeMerges` / `mergeFold`): merges apply IN RANK ORDER,
  * each as one greedy left-to-right non-overlapping pass, and a pass
  * only runs. A rank's pass is skipped O(1) when either side of the
  * pair is absent from the word's live symbol set, so a 32k-rank table
  * costs 2·R set probes per UNCACHED word, not R array scans — and the
  * per-thread memo (Zipf: a handful of distinct words dominate any
  * corpus) makes the amortized cost per occurrence near zero. This
  * pass-per-rank formulation (rather than the min-rank-present
  * iteration some tokenizers use) is chosen because it is
  * provably identical to folding the trainer's own mergeFold passes,
  * including the duplicate-concat edge where the two diverge.
  */
final class BpeTable(val pairs: Array[(String, String)]) extends Serializable {
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]]()
    }

  /** Encode one already-lowercased word; memoized per thread. */
  def encodeWord(word: String): Array[String] = {
    val m = memo.get()
    val hit = m.get(word)
    if (hit != null) return hit
    val out = BpeKernel.encodeWordUncached(word, pairs)
    if (m.size >= 65536) m.clear() // bound worker memory; Zipf keeps hits hot
    m.put(word, out)
    out
  }
}

object BpeKernel {

  /** Split a word into code-point symbols (parity with the trainer's
    * `split(w, "")`, which splits between code points and drops the
    * empty trailing piece). */
  private def codePoints(word: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out.add(word.substring(i, i + n))
      i += n
    }
    out
  }

  /** Rank-ordered greedy passes over one word (uncached path). */
  def encodeWordUncached(word: String, pairs: Array[(String, String)]): Array[String] = {
    val syms = codePoints(word)
    if (syms.size < 2) return syms.toArray(new Array[String](syms.size))
    val present = new java.util.HashSet[String](syms.size * 2)
    var i = 0
    while (i < syms.size) { present.add(syms.get(i)); i += 1 }
    var r = 0
    while (r < pairs.length && syms.size >= 2) {
      val (s1, s2) = pairs(r)
      if (present.contains(s1) && present.contains(s2)) {
        // one greedy left-to-right non-overlapping pass (mergeFold)
        var read = 0
        var write = 0
        var merged = false
        while (read < syms.size) {
          if (read + 1 < syms.size && syms.get(read) == s1 && syms.get(read + 1) == s2) {
            syms.set(write, s1 + s2); read += 2; merged = true
          } else {
            syms.set(write, syms.get(read)); read += 1
          }
          write += 1
        }
        while (syms.size > write) syms.remove(syms.size - 1)
        if (merged) {
          // recompute presence (s1/s2 may be fully consumed; concat added)
          present.clear()
          var j = 0
          while (j < syms.size) { present.add(syms.get(j)); j += 1 }
        }
      }
      r += 1
    }
    syms.toArray(new Array[String](syms.size))
  }

  /** Whole-document encode: lower → trim → split `\s+` → drop empties
    * (exact parity with `Curation.tokensOf`), encode each word with the
    * memoized table, concatenate subword tokens in word order. */
  def encodeText(text: UTF8String, table: BpeTable): GenericArrayData = {
    val words = text.toLowerCase.trim().toString.split("\\s+")
    val out = new java.util.ArrayList[Any](words.length * 2)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val toks = table.encodeWord(w)
        var j = 0
        while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Document text → BPE subword tokens (array<string>), the APPLY half
  * of the tokenizer lifecycle (`Curation.bpeMerges` is the TRAIN half;
  * Sennrich et al. 2016). Per-row kernel: the merge table broadcasts
  * inside the serialized expression (vocab-sized — the same bounded
  * artifact a production tokenizer ships), the corpus never shuffles,
  * and the whole encode stays inside whole-stage codegen. */
case class BpeEncodeText(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val table = new BpeTable(merges.toArray)
  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    BpeKernel.encodeText(t.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.BpeKernel.encodeText($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
