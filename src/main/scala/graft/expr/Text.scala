package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis Column helpers for the LLM-data-pipeline surface
  * (north-star mandate — SURVEY §2.11): token counting, quality scoring,
  * language-ID heuristics, fingerprinting. All native expressions
  * (codegen-friendly, no UDFs), all embarrassingly parallel per-row.
  */
object Text {

  /** Whitespace tokens (empty string → empty array, not [""]). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Unicode normalization (fused kernel; NFC default) — canonicalize
    * BEFORE hash-based dedup/fingerprints so combining-mark encoding
    * variants of the same visible text hash together. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.UnicodeNormalize(expression(text), form))
  }

  /** BPE-ish subword count: words + digits + punctuation runs counted
    * separately — a cheap deterministic proxy for tokenizer counts. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation-character ratio over total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0))).cast("double") /
        length(text)).otherwise(lit(0.0))

  /** English stopword hit ratio over tokens — quality / language signal. */
  val EnStopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation
    * noise, presence of stopwords (natural prose marker). Deterministic,
    * expressible in ANSI SQL for the oracle. Unrounded — display rounding
    * is the caller's policy (engine-specific round() on doubles is not
    * bit-portable). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 5, lit(0.0))
    val stopScore = least(stopwordRatio(text) * 4, lit(1.0))
    (lenScore + punctScore + stopScore) / 3
  }

  /** Language-ID heuristic: argmax over per-language stopword hit counts.
    * N-gram/stopword profiles for the fixture languages; ties and
    * zero-evidence rows → "und". Pure expressions → whole-stage codegen. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "en", "que", "por", "con"),
  )

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = LangProfiles.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("hits"), lit(lang).as("lang"))
    }
    // a TIE is ambiguity, not evidence — two languages at the max hit
    // count must yield "und", not the lexicographically greatest lang
    // (which an array_max struct tie-break would silently pick). ONE
    // fold computes (best hits, best lang, count-at-best) so the
    // per-language stopword filters evaluate exactly once per row —
    // the array_max + tie-filter formulation re-evaluated the whole
    // interpreted scoring array per reference (3× slower, measured).
    aggregate(array(scored: _*),
      struct(lit(-1).as("h"), lit("").as("l"), lit(0).as("c")),
      (acc, s) =>
        when(s.getField("hits") > acc.getField("h"),
          struct(s.getField("hits").as("h"), s.getField("lang").as("l"),
            lit(1).as("c")))
          .when(s.getField("hits") === acc.getField("h"),
            struct(acc.getField("h").as("h"), acc.getField("l").as("l"),
              (acc.getField("c") + 1).as("c")))
          .otherwise(acc),
      acc => when(acc.getField("h") > 0 && acc.getField("c") === 1,
        acc.getField("l")).otherwise(lit("und")))
  }

  /** Document fingerprint: 64-bit rolling-style content hash, cheap exact
    * dedup key (content-defined; whitespace-normalized). */
  def fingerprint64(text: Column): Column =
    xxhash64(array_join(tokens(lower(text)), " "))

  /** zlib-compressed byte size of the text (fused per-row kernel,
    * [[graft.expr.catalyst.DeflateSize]]). */
  def deflateSize(text: Column, level: Int = 6): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.DeflateSize(expression(text), level))
  }

  /** Compression-ratio quality signal (Gopher/RefinedWeb's cheap
    * repetition + boilerplate detector): compressed/raw UTF-8 bytes.
    * LOW ratio = heavily repetitive or templated text, HIGH (→ ~1) =
    * high-entropy noise (base64 blobs, minified code); natural prose
    * sits in between, so both tails are cut candidates. NULL on empty
    * text. Embarrassingly parallel — a per-row kernel, no shuffle at
    * any scale; the exact byte count is zlib-build-specific, so gate
    * on BANDS (see q_compress_ratio), not exact values. */
  def compressionRatio(text: Column, level: Int = 6): Column = {
    val raw = octet_length(text)
    when(raw > 0, deflateSize(text, level).cast("double") / raw)
  }
}
