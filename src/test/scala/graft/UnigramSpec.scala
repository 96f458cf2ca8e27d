package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Unigram-LM tokenizer (Kudo 2018): trainer invariants (EM-monotone
  * likelihood, exact MLE probabilities, never-prune-characters
  * coverage), Viterbi encode semantics on hand-checkable inputs, and
  * the lossless corpus round-trip. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("trainer: MLE probs sum to 1 over used pieces, characters always survive, EM likelihood never decreases") {
    val df = docs("aaab aaab aaab ab", "aaab ab ab", "zq")
    val (pieces, lls) = Curation.unigramTrain(df, col("text"),
      vocabSize = 6, emIters = 3, maxPieceLen = 4)
    val rows = pieces.collect().map(r =>
      (r.getString(1), r.getLong(2), r.getDouble(3)))
    // every character of the corpus is a piece (coverage floor)
    val pieceSet = rows.map(_._1).toSet
    assert(Set("a", "b", "z", "q").subsetOf(pieceSet), pieceSet.toString)
    // probabilities over positive-count pieces sum to 1 (exact MLE)
    val psum = rows.filter(_._2 > 0).map(r => math.exp(r._3)).sum
    assert(math.abs(psum - 1.0) < 1e-9, s"probs sum to $psum")
    // EM objective is monotone non-decreasing
    assert(lls.size === 3)
    lls.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9, s"EM likelihood fell: $lls")
      case _ =>
    }
    // the dominant word "aaab" (5 occurrences) is a single piece after
    // EM — the unigram model's whole-word capture that BPE needs a
    // merge chain for
    assert(pieceSet.contains("aaab"), pieceSet.toString)
  }

  test("encode: Viterbi picks the max-likelihood segmentation; ties break toward the longer piece; unseen chars become <unk>") {
    // vocab: p(ab)=0.5, p(a)=0.25, p(b)=0.25 → "abab" best is [ab, ab]
    // (2 ln .5 = -1.386 beats any char path at -5.545)
    val vocab = Seq(("ab", math.log(0.5)), ("a", math.log(0.25)), ("b", math.log(0.25)))
    val enc = docs("abab").select(
      Curation.unigramEncodeCol(col("text"), vocab).as("t")).head().getSeq[String](0)
    assert(enc === Seq("ab", "ab"))
    // exact tie: p(aa)=p(a)^2 → one "aa" piece (score equal, fewer
    // tokens is the longer-piece tie-break)
    val v2 = Seq(("aa", math.log(0.25)), ("a", math.log(0.5)))
    val enc2 = docs("aa").select(
      Curation.unigramEncodeCol(col("text"), v2).as("t")).head().getSeq[String](0)
    assert(enc2 === Seq("aa"))
    // unseen character → the word degrades to one <unk>, neighbors fine
    val enc3 = docs("ab xy").select(
      Curation.unigramEncodeCol(col("text"), vocab).as("t")).head().getSeq[String](0)
    assert(enc3 === Seq("ab", "<unk>"))
  }

  test("round-trip: the training corpus re-encodes losslessly (zero <unk>) and token counts sit between words and chars") {
    val df = schema.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val (pieces, _) = Curation.unigramTrain(df, col("text"),
      vocabSize = 120, emIters = 2, maxPieceLen = 6)
    val words = Curation.tokensOf(col("text"))
    val enc = Curation.unigramEncode(df, col("text"), pieces)
    val bad = enc.select(
        (concat_ws("", col("unigram_tokens")) === concat_ws("", words)).as("rt"),
        (col("unigram_tokens_n") >= size(words) &&
          col("unigram_tokens_n") <= aggregate(transform(words, w => length(w).cast("long")),
            lit(0L), (a, x) => a + x)).as("bounded"))
      .filter(!col("rt") || !col("bounded")).count()
    assert(bad === 0)
  }
}
