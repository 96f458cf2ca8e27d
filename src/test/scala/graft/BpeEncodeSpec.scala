package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** BPE encode (apply) semantics: the classic Sennrich low/lower/newest
  * corpus end-to-end (train → encode reproduces the textbook subwords),
  * greedy-pass edge cases, kernel == declarative-fold parity, and the
  * lossless-concatenation invariant. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val classic =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("classic corpus: learned table encodes lowest as low|est") {
    val df = Seq(classic.mkString(" ")).toDF("text")
    val merges = Curation.bpeMerges(df, col("text"), nMerges = 4)
    val table = Curation.collectMerges(merges)
    // hand-computed greedy sequence (freq desc, s1/s2 tie-break):
    // (e,s) 9 -> (es,t) 9 -> (l,o) 7 -> (lo,w) 7
    assert(table === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))

    val enc = Seq("lowest", "newest", "wider", "low")
      .toDF("w")
      .select(col("w"), Curation.bpeEncodeCol(col("w"), table).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc("lowest") === List("low", "est"))
    assert(enc("newest") === List("n", "e", "w", "est"))
    assert(enc("wider") === List("w", "i", "d", "e", "r"))
    assert(enc("low") === List("low"))
  }

  test("greedy left-to-right non-overlap and rank-ordered chaining") {
    def enc(text: String, table: Seq[(String, String)]): List[String] =
      Seq(text).toDF("t")
        .select(Curation.bpeEncodeCol(col("t"), table))
        .collect().head.getSeq[String](0).toList
    assert(enc("aaaa", Seq(("a", "a"))) === List("aa", "aa"))
    assert(enc("aaa", Seq(("a", "a"))) === List("aa", "a"))
    assert(enc("aaaa", Seq(("a", "a"), ("aa", "aa"))) === List("aaaa"))
    assert(enc("aaaaaa", Seq(("a", "a"), ("aa", "aa"))) === List("aaaa", "aa"))
    // a completed merge cannot chain within its own pass
    assert(enc("abb", Seq(("a", "b"))) === List("ab", "b"))
    assert(enc("bab", Seq(("a", "b"))) === List("b", "ab"))
    // multi-word doc flattens in word order; whitespace runs collapse
    assert(enc("low  \t lowest", Seq(("l", "o"), ("lo", "w")))
      === List("low", "low", "e", "s", "t"))
    // case folding parity with tokensOf
    assert(enc("LOW", Seq(("l", "o"), ("lo", "w"))) === List("low"))
  }

  test("kernel == fold parity and lossless concatenation on a trained table") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the the the thethe theother"),
      (4L, "  spaced\t\tout   words  "),
      (5L, "aaaa aaab abab bbbb"),
      (6L, "")).toDF("doc_id", "text")
    val table = Curation.collectMerges(
      Curation.bpeMerges(docs.filter(length(col("text")) > 0),
        col("text"), nMerges = 12))
    assert(table.nonEmpty)
    val enc = Curation.bpeEncodeCol(col("text"), table)
    val fold = Curation.bpeEncodeFoldCol(col("text"), table)
    val words = graft.expr.Text.tokens(lower(col("text")))
    val rows = docs.select(
        (enc === fold).as("m"),
        (array_join(enc, "") === array_join(words, "")).as("lossless"))
      .collect()
    assert(rows.forall(_.getBoolean(0)), "kernel diverged from fold path")
    assert(rows.forall(_.getBoolean(1)), "encode lost or duplicated characters")
  }

  test("null text yields null; empty table is identity-to-chars") {
    val df = Seq((1L, "ab cd"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        Curation.bpeEncodeCol(col("text"), Seq.empty).as("t"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[String](1).toList === List("a", "b", "c", "d"))
    assert(got(1).isNullAt(1))
  }

  test("collectMerges bounds the collect and preserves rank order") {
    val m = Seq((2L, "b", "c", 5L), (1L, "a", "b", 9L))
      .toDF("rank", "s1", "s2", "freq")
    assert(Curation.collectMerges(m) === Seq(("a", "b"), ("b", "c")))
    val big = spark.range(10).select(col("id").as("rank"),
      lit("x").as("s1"), lit("y").as("s2"))
    intercept[IllegalArgumentException] {
      Curation.collectMerges(big, maxMerges = 5)
    }
  }
}
