package graft.expr.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared immutable unigram-LM vocabulary (piece → log-probability) +
  * per-thread word memo, held once per encoder and shipped to
  * executors as a codegen reference object — the unigram twin of
  * [[BpeTable]].
  *
  * Segmentation is VITERBI under the independence model (Kudo 2018,
  * "Subword Regularization", the SentencePiece unigram trainer): the
  * best tokenization of a word maximizes the sum of its pieces'
  * log-probs. Exact-score ties break toward the LONGER piece at the
  * boundary (deterministic — the tie only affects the backpointer,
  * never the score). A word with no in-vocab path (an unseen
  * character at apply time; never a corpus word — training keeps every
  * corpus character as a piece) encodes as the single `<unk>` token,
  * the standard SentencePiece fallback. */
final class UnigramVocab(val pieces: Array[(String, Double)]) extends Serializable {
  @transient lazy val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.foreach { case (p, lp) => m.put(p, lp) }
    m
  }
  @transient lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_._1.length).max

  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]]()
    }

  /** Segment one already-lowercased word; memoized per thread. */
  def segmentWord(word: String): Array[String] = {
    val m = memo.get()
    val hit = m.get(word)
    if (hit != null) return hit
    val out = UnigramKernel.viterbi(word, this)
    if (m.size >= 65536) m.clear() // bound worker memory; Zipf keeps hits hot
    m.put(word, out)
    out
  }
}

object UnigramKernel {

  val Unk = "<unk>"

  /** Viterbi over the word's character positions: best(i) = max over
    * in-vocab pieces ending at i of best(start) + logp(piece). The
    * candidate scan walks piece length 1..maxLen with a `>=`
    * comparison, so the LAST equal-score candidate wins — exact-score
    * ties break toward the longest piece at the boundary (documented
    * contract; the tie affects only the backpointer, never the
    * score). Cost O(len · maxLen) hash probes per uncached word. */
  def viterbi(word: String, vocab: UnigramVocab): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of the piece ending at i
    java.util.Arrays.fill(back, -1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      var l = 1
      val maxL = math.min(vocab.maxLen, i)
      while (l <= maxL) {
        val start = i - l
        if (back(start) != -1 || start == 0) {
          val lp = vocab.logp.get(word.substring(start, i))
          if (lp != null) {
            val s = (if (start == 0) 0.0 else best(start)) + lp
            if (s >= best(i)) { best(i) = s; back(i) = start }
          }
        }
        l += 1
      }
      i += 1
    }
    if (back(n) == -1) return Array(Unk)
    // walk backpointers, reverse in place
    val out = new java.util.ArrayList[String](8)
    var pos = n
    while (pos > 0) { out.add(word.substring(back(pos), pos)); pos = back(pos) }
    val arr = new Array[String](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(arr.length - 1 - j); j += 1 }
    arr
  }

  /** Whole-document encode: lower → trim → split `\s+` → drop empties
    * (exact parity with the BPE kernel and `Curation.tokensOf`),
    * segment each word, concatenate subword tokens in word order. */
  def encodeText(text: UTF8String, vocab: UnigramVocab): GenericArrayData = {
    val words = text.toLowerCase.trim().toString.split("\\s+")
    val out = new java.util.ArrayList[Any](words.length * 2)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val toks = vocab.segmentWord(w)
        var j = 0
        while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Document text → unigram-LM subword tokens (array<string>), the
  * APPLY half of the unigram tokenizer lifecycle
  * (`Curation.unigramTrain` is the TRAIN half; Kudo 2018). Per-row
  * kernel: the vocabulary broadcasts inside the serialized expression
  * (vocab-sized — the bounded artifact a production tokenizer ships),
  * the corpus never shuffles, and the encode stays inside whole-stage
  * codegen. */
case class UnigramEncodeText(child: Expression, pieces: Seq[(String, Double)])
    extends UnaryExpression {
  @transient private lazy val vocab = new UnigramVocab(pieces.toArray)
  override def prettyName: String = "graft_unigram_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    UnigramKernel.encodeText(t.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.catalyst.UnigramKernel.encodeText($c, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
