package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.Text
import graft.ops.Curation
import graft.schema.Tables

/** Training-data curation queries over the `documents` fixture — the
  * shard-preparation surface a training pipeline runs after dedup
  * (SURVEY §2.11 round-2 extension): content-hash splits, budgeted
  * sequence packing, benchmark contamination, repetition quality
  * signals, PII redaction. Every operator is deterministic and
  * engine-portable, so each query is value-exact against DuckDB.
  */
object CurationQueries {

  /** The documents fixture is ONE parquet row group, so every per-row
    * text kernel downstream would otherwise run in a single task
    * regardless of cores (measured: q_line_clean flat 4.3 s from sf0.1
    * to ×10 data — parallelism-starved, not data-bound; the map side of
    * shuffle-first queries is equally starved). Hash repartition by
    * doc_id: deterministic under task retries (unlike round-robin
    * repartition(n)) and a ~600 KB shuffle. At production scale the
    * source supplies splits and this spreads an oversized input split
    * instead of being a no-op tax. (r16 note: the PINNED-count rail
    * `Scale.spreadSplits` was tried here and measured 1.2–3.7×
    * REGRESSIONS across this file — these queries read `docs` from
    * several subtrees, and each paid the full-parallelism exchange;
    * the unpinned form below lets AQE coalesce it per stage, which is
    * the right trade for multi-subtree consumers.) */
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").repartition(col("doc_id"))

  /** Deterministic dirty-URL fixture shared by the q_url_* family:
    * mixed-case scheme and host, default ports, tracking params,
    * out-of-order params, fragments — every rule [[graft.ops.Curation
    * .normalizeUrl]] owns, derived from (source, doc_id) so the oracle
    * builds the byte-identical string. Path is doc_id % 100, so
    * canonical URLs COLLIDE within a source (real dups at every SF);
    * the host is a 3-label cdn.<source>.com so the two-label
    * registered-domain heuristic has a label to strip and yields one
    * domain PER SOURCE (20 of them — q_domain_cap actually caps). */
  private def urls(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"),
      concat(
        when(d % 3 === 0, lit("HTTPS"))
          .when(d % 3 === 1, lit("http")).otherwise(lit("https")),
        lit("://CdN."),
        when(d % 2 === 0, upper(col("source"))).otherwise(col("source")),
        // TLD varies so the multi-label public-suffix branch of
        // registeredDomain is exercised at every SF: without it, all
        // the .co.uk publishers would merge into one "co.uk" bucket
        when(d % 5 === 3, lit(".Co.Uk"))
          .when(d % 5 === 4, lit(".CoM.Au"))
          .otherwise(lit(".CoM")),
        when(d % 2 === 0,
          when(d % 3 === 1, lit(":80")).otherwise(lit(":443")))
          .otherwise(lit("")),
        lit("/Docs/"), (d % 100).cast("string"),
        lit("?utm_source=rss&b=2&a=1"),
        when(d % 4 === 0, lit("&fbclid=abc")).otherwise(lit("")),
        when(d % 4 === 2, lit("#frag")).otherwise(lit(""))).as("url"))
  }

  /** Unrailed twin for queries whose scan-side work is a fused codegen
    * kernel or an immediate aggregation (the BPE pair): there the
    * extra exchange is pure tax — measured +0.4 s on q_bpe_encode —
    * exactly the TextQueries.docs reasoning. */
  private def docsRaw(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Fixture text is single-line word soup, so the line-level operators
    * are exercised on a deterministically derived multi-line form:
    * 4-token lines, and (when `withPunct`) a terminal '.' on lines
    * where (line_no + doc_id) % 3 != 0 — giving the C4 punctuation
    * rule something to bind on. Both engines restate the derivation
    * token-for-token, so line-level results stay hash-exact. */
  private def linedDocs(s: SparkSession, dir: String,
                        withPunct: Boolean): DataFrame = {
    val d = docs(s, dir).withColumn("__toks", split(trim(col("text")), "\\s+"))
    val line = (g: Column) => {
      val base = array_join(slice(col("__toks"), g * 4 + 1, lit(4)), " ")
      if (withPunct)
        concat(base,
          when((g + col("doc_id")) % 3 =!= 0, lit(".")).otherwise(lit("")))
      else base
    }
    d.withColumn("lined_text",
        array_join(transform(
          sequence(lit(0), floor((size(col("__toks")) - 1) / 4).cast("int")),
          line), "\n"))
      .drop("__toks")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Content-hash train/val/test split (md5-based, so exact duplicates
    // land in the same split — no leakage through dup pairs). Per-row,
    // no shuffle at any scale.
    "q_hash_split" -> ((s, dir) => {
      val b = Curation.hashBucket(col("text"), 100)
      docsRaw(s, dir).select(col("doc_id"), b.as("bucket"),
        Curation.splitLabel(b, trainPct = 90, valPct = 5).as("split"))
        .orderBy(col("doc_id"))
    }),

    // Sharded corpus export + fixity manifest (ops.Export): documents
    // written as 8 deterministic content-hash shards with per-shard
    // doc/token/char counts and an order-independent md5-sum checksum,
    // then VALIDATED by recomputing every fact from the shard bytes.
    // The oracle restates the manifest arithmetic over the source table
    // — matching is only possible if the export wrote exactly the
    // corpus and the validator read exactly the export.
    "q_export_manifest" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      // Scratch.dir, not a fresh createTempDirectory: writeShards is
      // mode=overwrite, so repeated bench/verify runs REUSE one tracked
      // dir instead of leaking a corpus copy per invocation
      val path = graft.Scratch.dir("graft-export", dir)
      graft.ops.Export.writeShards(d, "doc_id", "text", path, nShards = 8)
      // the stored checksum is DECIMAL(38,0); the driver-visible column
      // folds it into BIGINT range (mod 2^62) because the oracle
      // comparator coerces DuckDB HUGEINT through float64
      graft.ops.Export.validateShards(s, path, "text")
        .select(col("shard").cast("long").as("shard"), col("n_docs"),
          col("n_tokens"), col("n_chars"),
          (col("checksum") % lit(4611686018427387904L)).cast("long")
            .as("checksum"), col("ok"))
        .orderBy(col("shard"))
    }),

    // Budgeted sequence packing: 256-token packs per source shard in
    // doc_id order — a windowed cumsum per shard (parallel across
    // shards), the floor-of-running-sum approximation of greedy packing.
    "q_seq_packing" -> ((s, dir) => {
      val withTok = docs(s, dir)
        .select(col("doc_id"), col("source"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.packBins(withTok, col("source"), Seq(col("doc_id")),
          col("n_tokens"), budget = 256)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("pack_id"))
        .orderBy(col("doc_id"))
    }),

    // Long-document chunking: 64-token windows with 8 tokens of carried
    // overlap (stride 56) — per-row explode, no shuffle; the splitter
    // that feeds packing when a document exceeds the sequence budget.
    "q_chunk_overlap" -> ((s, dir) => {
      Curation.chunkTokens(docs(s, dir), col("text"),
          maxTokens = 64, overlap = 8)
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          col("chunk_tokens").cast("long").as("chunk_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // PASSAGE retrieval — BM25 ranked over overlapping token-window
    // chunks instead of whole documents: the unit a RAG pipeline
    // actually retrieves. Composite pid = doc_id*1000 + chunk_id keys
    // the chunk table through the scorer; the top-10 passages come
    // back as (doc, chunk) coordinates. Chunking and BM25 are each
    // independently oracled (q_chunk_overlap, q_bm25); this pins their
    // composition end to end.
    "q_passage_bm25" -> ((s, dir) => {
      // the composite pid is collision-free ONLY while chunk_id < 1000
      // (a ~56k-token doc would overflow into the next doc's pid space
      // and merge BM25 stats across documents with the oracle agreeing
      // — the silent-collision class q_training_mix_e2e rails against
      // with maxWeight); enforce it loudly per row, assert_true-as-zero
      // so pruning cannot drop the check
      val chunks = Curation.chunkTokens(docs(s, dir), col("text"),
          maxTokens = 64, overlap = 8)
        .select((col("doc_id") * 1000 + col("chunk_id") + coalesce(
            assert_true(col("chunk_id") < 1000,
              lit("chunk_id >= 1000 would collide composite pids — widen the multiplier")),
            lit(0L))).as("pid"),
          col("chunk_text"))
      TextQueries.bm25RankHead(
          graft.ops.TextIndex.bm25Scores(chunks, "pid", "chunk_text",
              Seq("hash", "join", "stream"))
            .withColumnRenamed("doc_id", "pid"),
          "pid")
        .select(col("rank"),
          ((col("pid") - pmod(col("pid"), lit(1000))) / 1000).cast("long").as("doc_id"),
          pmod(col("pid"), lit(1000)).cast("long").as("chunk_id"),
          col("matched_terms"), col("matched_tf"), col("score_r9"))
    }),

    // Deterministic stratified sampling: per-source keep fractions via
    // content-hash buckets — reproducible across runs, no rand().
    "q_stratified_sample" -> ((s, dir) => {
      Curation.stratifiedSample(docs(s, dir), col("source"), col("text"),
          ratesPct = Map("src0" -> 80, "src1" -> 10), defaultPct = 30)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Source-mixing sampler (training-data mixing): per-source keep
    // rates chosen so the sample approaches 50/30/20 proportions over
    // three sources, capped by the scarcest source; selection by
    // content-hash bucket (reproducible, duplicate-consistent). One
    // source-cardinality aggregate + broadcast rates — the corpus is
    // filtered in place, never shuffled.
    "q_source_mix" -> ((s, dir) => {
      Curation.sourceMix(docs(s, dir), col("source"), col("text"),
          targetPct = Map("src0" -> 50, "src1" -> 30, "src2" -> 20))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Temperature-smoothed source mixing (alpha = 0.5): scarce sources
    // get lifted toward uniform without a target map. sqrt weights are
    // correctly rounded in both engines and the weight total folds in
    // sorted-source order on both sides, so the whole selection is
    // hash-exact.
    "q_temperature_mix" -> ((s, dir) => {
      Curation.temperatureMix(docs(s, dir), col("source"), col("text"),
          alpha = 0.5)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // C4-style line cleaning on the derived multi-line corpus: terminal
    // punctuation + >=3 words + phrase blocklist per line, page-level
    // drop phrases + minimum surviving lines per doc. Pure per-row
    // higher-order functions — zero shuffle beyond the final ORDER BY.
    "q_line_clean" -> ((s, dir) => {
      Curation.cleanLines(linedDocs(s, dir, withPunct = true), col("lined_text"),
          Curation.LineRules(minWords = 3, requireTerminalPunct = true,
            lineBlockPhrases = Seq("slow"), docBlockPhrases = Seq("merge batch"),
            minKeptLines = 5))
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-level duplicate-line removal (RefinedWeb/CCNet boilerplate
    // pass): lines occurring >= 3 times across the WHOLE corpus vanish
    // from every document. Only 32-byte line fingerprints shuffle; the
    // reconstruction is an indexed-lambda filter per row.
    "q_line_dedup" -> ((s, dir) => {
      Curation.dropGlobalDuplicateLines(
          linedDocs(s, dir, withPunct = false).select("doc_id", "lined_text"),
          "doc_id", "lined_text", minCount = 3)
        .select(col("doc_id"), col("n_dropped"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // Gopher document-quality rules: every ratio threshold evaluated as
    // an integer cross-multiplication, so the flags are hash-exact
    // cross-engine. Per-row expressions only.
    "q_gopher_rules" -> ((s, dir) => {
      Curation.gopherFlags(docs(s, dir), col("text"), minWords = 30)
        .select(col("doc_id"), col("n_words"), col("flag_word_count"),
          col("flag_mean_word_len"), col("flag_symbol_ratio"),
          col("flag_alpha_words"), col("flag_stopwords"),
          col("flag_bullet_lines"), col("flag_ellipsis_lines"),
          col("gopher_pass"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark contamination: corpus docs sharing any word-8-gram with
    // the (synthetic) benchmark set doc_id % 50 == 0. Benchmark grams
    // dedupe + broadcast; corpus text never shuffles.
    "q_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.contamination(
          d.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
          d.filter(col("doc_id") % 50 === 0), "text", n = 8)
        .orderBy(col("doc_id"))
    }),

    // Intra-doc repetition (Gopher-style quality signal): duplicate
    // word-5-gram ratio; repetition planted on doc_id % 9 == 0 so the
    // non-zero path is exercised.
    "q_repetition" -> ((s, dir) => {
      val t = when(col("doc_id") % 9 === 0,
        concat(col("text"), repeat(lit(" badger mushroom snake"), 8)))
        .otherwise(col("text"))
      Curation.withDupNgramRatio(docs(s, dir), t, 5, "dup5_ratio")
        .select(col("doc_id"), col("dup5_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Per-source adaptive quality cut: drop each source's bottom
    // quartile by the quality kernel, with the threshold learned FROM
    // that source's own score distribution (a fixed global cutoff
    // would gut the lowest-scoring source and keep everything from the
    // highest). One aggregation to a |sources|-row threshold frame,
    // broadcast back as a filter — the corpus never shuffles.
    "q_adaptive_quality" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        Text.qualityScore(col("text")).as("q"))
      // exact=true: DuckDB's quantile_cont interpolates like Spark's
      // exact percentile; the library DEFAULT is the percentile_approx
      // sketch (the memory-bounded 100 TB path — see the operator's
      // threshold-dial scaladoc)
      Curation.adaptiveQualityFilter(d, col("q"), col("source"), pct = 0.25,
        exact = true)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // BPE merge-table training (Sennrich et al. 2016): 8 merges learned
    // from the word-frequency table. The summary row carries anchors
    // the oracle can state exactly: the FIRST merge is the raw
    // char-pair argmax (pure SQL over the word table), and BPE's
    // max-pick guarantees learned frequencies never increase — so the
    // shape booleans are theorems, not tautologies (a greedy-merge or
    // tie-break bug flips them).
    "q_bpe" -> ((s, dir) => {
      val m = Curation.bpeMerges(docsRaw(s, dir), col("text"), nMerges = 8)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("rank"))
      val shape = m.withColumn("__prev", lag(col("freq"), 1).over(w))
        .agg(count(lit(1)).as("n_merges"),
          (sum(when(col("__prev").isNotNull && col("freq") > col("__prev"), 1)
            .otherwise(0)) === 0).as("freqs_nonincreasing"),
          (min(col("freq")) > 0).as("freqs_positive"))
      val first = m.filter(col("rank") === 1)
        .select(col("s1").as("first_s1"), col("s2").as("first_s2"),
          col("freq").as("first_freq"))
      shape.crossJoin(broadcast(first))
    }),

    // SPAN-LEVEL decontamination — q_contamination detects, this one
    // REMOVES: every 8-token window shared with the benchmark set is
    // merged into spans and stripped, keeping the rest of the doc
    // (eval hygiene without dropping whole documents). The benchmark
    // and one in seven corpus docs carry the same planted boilerplate
    // tail, so the strip path exercises at every SF; organic 8-gram
    // overlap strips too (both engines agree).
    "q_decontam" -> ((s, dir) => {
      val phrase =
        " all rights reserved contact support for help terms of service apply"
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 50 === 0)
        .select(concat(col("text"), lit(phrase)).as("btext"))
      val corpus = d.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(phrase)))
            .otherwise(col("text")).as("t"))
      Curation.decontaminateSpans(corpus, "doc_id", "t", bench, "btext", w = 8)
        .select(col("id").as("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("contam_tokens").cast("long").as("contam_tokens"),
          col("n_spans").cast("long").as("n_spans"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // Bigram-LM quality score (the CCNet/Gopher perplexity-filter
    // family): add-0.1-smoothed bigram model trained on the 80% split,
    // scoring the held-out 20% — unseen contexts exercise the smoothed
    // floor. Word-pair-sized shuffles only; text never moves.
    "q_lm_score" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.bigramLmScore(d.filter(col("doc_id") % 5 =!= 0),
          d.filter(col("doc_id") % 5 === 0), "doc_id", "text", alpha = 0.1)
        .orderBy(col("doc_id"))
    }),

    // END-TO-END curation chain — the full shard-prep pipeline a
    // training run consumes, composed from the individually-oracled
    // operators: (1) near-dup keep-list (MinHash-LSH pairs → connected
    // components → highest-quality doc per cluster), (2) quality
    // threshold, (3) benchmark-contamination drop (benchmark = doc_id %
    // 50 == 0, excluded from the corpus outright), (4) content-hash
    // train/val/test split, (5) budgeted sequence packing per split.
    // Every stage's shuffle payload is (id, fixed-width); text is read
    // for scoring/grams but never shuffled. Hash-checked END-TO-END
    // against a single DuckDB statement that restates the whole chain.
    // INCREMENTAL corpus refresh — the continuous-ingestion end
    // product: a new-arrivals batch (doc_id % 3 == 0) flows through the
    // cheap per-row gates FIRST (Gopher word-count rule + composite
    // quality; the full Gopher rule set is exercised in q_gopher_rules —
    // its stopword rule is tuned for natural English and rejects the
    // entire synthetic fixture), then ONLY the survivors are MinHash-
    // signed and probed against the curated corpus's STORED band index
    // (persisted to parquet and read back — the sign-once posture of
    // Dedup.bandIndex made literal), candidates confirm by exact 3-gram
    // Jaccard >= 0.8, and every batch doc gets a disposition:
    // low_quality | dup_corpus | dup_batch | accepted. dup_batch uses
    // the one-level rule "confirmed against a smaller-id survivor that
    // was not itself a corpus dup" — deterministic without label
    // propagation (longer chains resolve on the next refresh cycle,
    // exactly as they would had the docs arrived in separate batches).
    // Scale shape: gates are per-row; the corpus is probed via its
    // index (never re-signed, never re-paired); Jaccard runs on
    // candidate pairs only; text never shuffles — every shuffle payload
    // is (id, 16-byte band key) or (id, id).
    "q_incr_curation" -> ((s, dir) => {
      // spread-ONCE (r17): the scan feeds FOUR subtrees (batch gate,
      // corpus index build, disposition probe, token-count join). The
      // r16 LAZY rail re-paid its exchange per subtree (measured 6.4 s
      // railed vs 3.9 s raw) and was reverted; materializing the
      // railed scan pays the exchange once and un-serializes the
      // minhash/gopher kernel passes. Production no-op by the rail's
      // file-count gate.
      val d = graft.ops.Scale.spreadSplitsOnce(docsRaw(s, dir), col("doc_id"))
      val batch = d.filter(col("doc_id") % 3 === 0)
      val corpus = d.filter(col("doc_id") % 3 =!= 0)
      // checkpointed: gated feeds refreshDispositions (gate + signing)
      // AND the token-count join — lazy, each consumer re-ran the
      // gopher/quality kernel pass over the batch (guide §1.2);
      // n_tokens rides the same pass instead of a third evaluation
      val gated = graft.ops.Reliable.checkpoint(
        Curation.gopherFlags(batch, col("text"), minWords = 30)
          .withColumn("low_quality",
            !(col("flag_word_count") && Text.qualityScore(col("text")) >= 0.65))
          .select(col("doc_id"), col("text"), col("low_quality"),
            Text.tokenCount(col("text")).cast("long").as("n_tokens")))
      val idxPath = graft.Scratch.dir("graft-curidx", dir)
      graft.ops.Dedup.bandIndex(corpus, "doc_id", "text",
          shingleSize = 3, k = 12, bandRows = 2)
        .write.mode("overwrite").parquet(idxPath)
      Curation.refreshDispositions(gated, "doc_id", "text", "low_quality",
          corpus, s.read.parquet(idxPath))
        .join(gated.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
        .select(col("doc_id"), col("status"), col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q_curation_e2e" -> ((s, dir) => {
      // spread-ONCE (r17): this query reads the scan from five
      // subtrees (LSH pairing, quality join, dedup anti-join, bench
      // filter, split projection); the unpinned `docs` repartition
      // left every kernel pass on ONE task (AQE coalesces the sub-MB
      // input back — the 1.47 s single-task signing stage in
      // plans/r17/profile logs), and the pinned rail was reverted in
      // r16 because each subtree re-paid the exchange. Materializing
      // the railed scan pays it once; production no-op by the rail's
      // file-count gate.
      val d = graft.ops.Scale.spreadSplitsOnce(docsRaw(s, dir), col("doc_id"))
      val pairs = graft.ops.Dedup.minhashLshPairs(d, "doc_id", "text",
        shingleSize = 3, k = 12, bandRows = 2)
      val clusters = graft.ops.Dedup.connectedComponents(pairs)
      val scored = clusters.join(
        d.select(col("doc_id").as("id"),
          Text.qualityScore(col("text")).as("q")), Seq("id"))
      val keepers = graft.ops.Dedup.firstSeen(scored, Seq("rep"),
        Seq(col("q").desc, col("id"))).select(col("id"))
      val losers = clusters.select(col("id"))
        .join(keepers, Seq("id"), "left_anti")
        .withColumnRenamed("id", "doc_id")
      val deduped = d.join(losers, Seq("doc_id"), "left_anti")
      val corpus = deduped
        .filter(Text.qualityScore(col("text")) >= 0.65)
        .filter(col("doc_id") % 50 =!= 0)
      val bench = d.filter(col("doc_id") % 50 === 0)
      val contaminated = Curation.contamination(corpus, "doc_id", "text",
        bench, "text", n = 8).select(col("doc_id"))
      val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
      val b = Curation.hashBucket(col("text"), 100)
      val withSplit = clean.select(col("doc_id"), col("source"),
        Curation.splitLabel(b, trainPct = 90, valPct = 5).as("split"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.packBins(withSplit, col("split"), Seq(col("doc_id")),
          col("n_tokens"), budget = 256)
        .select(col("doc_id"), col("source"), col("split"),
          col("n_tokens"), col("pack_id"))
        .orderBy(col("doc_id"))
    }),

    // PII redaction: e-mail addresses (planted on doc_id % 7 == 0)
    // counted and replaced; output carries the redacted-text digest so
    // the oracle verifies the full replacement byte-for-byte.
    "q_pii_redact" -> ((s, dir) => {
      val pat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val t = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact: user"), col("doc_id"),
          lit("@example.com for details")))
        .otherwise(col("text"))
      docs(s, dir).select(col("doc_id"),
        size(regexp_extract_all(t, lit(pat), lit(0))).cast("long").as("n_emails"),
        md5(regexp_replace(t, pat, "<EMAIL>")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // BPE ENCODE — the apply half of the tokenizer lifecycle (q_bpe
    // trains). The fused per-row kernel encodes every doc with the
    // 8-merge table learned from this corpus; the driver-visible gates
    // are (a) kernel == declarative-fold equality over the DISTINCT
    // WORD VOCABULARY (two independent implementations of the
    // rank-ordered greedy-pass semantics; the kernel is word-wise by
    // construction, so vocab-level parity IS doc-level parity — and the
    // fold twin's chained interpreted HOF passes run over thousands of
    // words instead of the whole corpus) and (b) the per-doc
    // token-count sandwich n_words <= n_bpe <= n_chars. The oracle
    // states both as constants. Exact subword encodings are pinned in
    // BpeEncodeSpec (low/lower classic, overlap, doc-level parity).
    "q_bpe_encode" -> ((s, dir) => {
      val d = docsRaw(s, dir)
      val table = Curation.collectMerges(
        Curation.bpeMerges(d, col("text"), nMerges = 8))
      val enc = Curation.bpeEncodeCol(col("text"), table)
      val words = Text.tokens(lower(col("text")))
      val nChars = aggregate(words, lit(0), (a, x) => a + length(x))
      // the fold twin costs ~8 interpreted HOF passes per word — gate a
      // deterministic 1-in-20 xxhash sample of the vocabulary here (a
      // different effective subset at every SF); BpeEncodeSpec holds
      // the exhaustive kernel==fold theorem on fixtures
      val allMatch = d.select(explode(words).as("w"))
        .filter(xxhash64(col("w")) % 20 === 0).distinct()
        .select((Curation.bpeEncodeCol(col("w"), table) ===
          Curation.bpeEncodeFoldCol(col("w"), table)).as("m"))
        .agg(coalesce(min(col("m")), lit(true)).as("matches_fold"))
      d.select(col("doc_id"),
          (size(enc) >= size(words) && size(enc) <= nChars)
            .as("tokens_within_bounds"))
        .crossJoin(broadcast(allMatch))
        .select(col("doc_id"), col("matches_fold"), col("tokens_within_bounds"))
        .orderBy(col("doc_id"))
    }),

    // UNIGRAM-LM tokenizer training (Kudo 2018, the SentencePiece
    // trainer — q_bpe's family twin: BPE grows by merges, unigram
    // shrinks by likelihood). The summary row carries anchors the
    // oracle states exactly — the top multi-char SEED substring by
    // weighted frequency (pure SQL over the substring table, via the
    // SAME substringPiecesCol the trainer seeds from) and the distinct
    // character count — plus the trainer's theorems as booleans:
    // MLE probs sum to 1, the hard-EM corpus likelihood never
    // decreases, every corpus character survives pruning (the
    // SentencePiece coverage rule), and the vocab respects its cap.
    // Exact counts/probs on hand-sized corpora live in UnigramSpec.
    "q_unigram" -> ((s, dir) => {
      val d = docsRaw(s, dir)
      val (pieces, lls) = Curation.unigramTrain(d, col("text"),
        vocabSize = 200, emIters = 2, maxPieceLen = 6)
      val words = d.select(explode(Text.tokens(lower(col("text")))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      val subs = words.select(col("wc"),
          explode(Curation.substringPiecesCol(col("w"), 6)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("freq"))
      val first = subs.filter(length(col("piece")) > 1)
        .orderBy(col("freq").desc, col("piece")).limit(1)
        .select(col("piece").as("first_seed_piece"),
          col("freq").as("first_seed_freq"))
      val missingChars = subs.filter(length(col("piece")) === 1)
        .join(pieces, Seq("piece"), "left_anti").count()
      val llOk = lls.sliding(2).forall {
        case Seq(a, b) => b >= a - 1e-9
        case _ => true
      }
      val shape = pieces.agg(
          count(lit(1)).as("n_pieces"),
          sum(when(col("cnt") > 0, exp(col("logp"))).otherwise(lit(0.0)))
            .as("psum"),
          count(when(length(col("piece")) === 1, 1)).as("n_chars"))
        .select(
          (col("n_pieces") <= greatest(lit(200L), col("n_chars")))
            .as("n_pieces_le_vocab"),
          (abs(col("psum") - 1.0) < 1e-9).as("probs_sum_to_1"),
          col("n_chars"),
          lit(llOk).as("ll_nondecreasing"),
          lit(missingChars == 0L).as("has_all_chars"))
      shape.crossJoin(broadcast(first))
    }),

    // UNIGRAM ENCODE — the apply half (q_unigram trains): the Viterbi
    // kernel re-encodes every doc with the corpus-trained vocabulary.
    // Driver-visible gates per doc: the lossless round-trip (subword
    // concatenation rebuilds the whitespace-stripped text — zero <unk>
    // on the training corpus, the never-prune-characters theorem made
    // observable) and the token-count sandwich n_words ≤ n_tokens ≤
    // n_chars; n_words / n_chars are value-exact in the oracle. Exact
    // segmentations are pinned in UnigramSpec.
    "q_unigram_encode" -> ((s, dir) => {
      val d = docsRaw(s, dir)
      val (pieces, _) = Curation.unigramTrain(d, col("text"),
        vocabSize = 200, emIters = 2, maxPieceLen = 6)
      val enc = Curation.unigramEncode(d, col("text"), pieces)
      val words = Text.tokens(lower(col("text")))
      val nChars = aggregate(transform(words, w => length(w).cast("long")),
        lit(0L), (a, x) => a + x)
      enc.select(col("doc_id"),
          size(words).cast("long").as("n_words"),
          nChars.as("n_chars"),
          (concat_ws("", col("unigram_tokens")) === concat_ws("", words))
            .as("round_trip_ok"),
          (col("unigram_tokens_n") >= size(words) &&
            col("unigram_tokens_n") <= nChars).as("tokens_bounded"))
        .orderBy(col("doc_id"))
    }),

    // Reproducible epoch-3 shuffle into 8 shards: every row's
    // (shuffle_key, shard, pos_in_shard) is a pure function of
    // (doc_id, epoch) via xxhash64 — rerunnable, resumable, auditable
    // training order. One shard-hash shuffle + shard-local sort; the
    // oracle replays the XXH64 chain through XxhashSql and DuckDB's
    // own row_number, so the permutation is value-exact cross-engine.
    "q_epoch_shuffle" -> ((s, dir) => {
      graft.ops.Sampling.epochShuffle(
          docsRaw(s, dir).select(col("doc_id")), "doc_id",
          epoch = 3, nShards = 8)
        .orderBy(col("shard"), col("pos_in_shard"))
    }),

    // Deterministic weighted up/down-sampling: per-source weights
    // 0.25/1.0/1.75/2.5 (source index mod 4) exercise drop, identity,
    // and both fractional-replication arms; the fractional coin is an
    // INTEGER compare of the key's top 53 bits against
    // floor(frac(w)·2^53), so the oracle reproduces every boundary
    // decision bit-for-bit.
    "q_weighted_upsample" -> ((s, dir) => {
      val d = docsRaw(s, dir).select(col("doc_id"), col("source"))
        .withColumn("weight", lit(0.25) +
          (substring(col("source"), 4, 10).cast("int") % 4).cast("double")
            * lit(0.75))
      graft.ops.Sampling.weightedUpsample(d, "doc_id", col("weight"),
          salt = 7L)
        .select(col("doc_id"), col("rep"), col("weight"))
        .orderBy(col("doc_id"), col("rep"))
    }),

    // The full training-order chain COMPOSED: per-source temperature
    // upsample → composite sample id (doc_id·8 + rep — exact and
    // collision-free, rep < 8 ENFORCED by passing maxWeight = 7 to the
    // upsample rail, so the epoch shuffle's unique-id contract holds
    // for the replicated rows and a future weight-formula edit that
    // breaks the bound fails loudly instead of silently colliding) →
    // epoch-5 shuffle into 4 shards. Every stage deterministic, the
    // whole chain value-exact cross-engine.
    "q_training_mix_e2e" -> ((s, dir) => {
      val d = docsRaw(s, dir).select(col("doc_id"), col("source"))
        .withColumn("weight", lit(0.25) +
          (substring(col("source"), 4, 10).cast("int") % 4).cast("double")
            * lit(0.75))
      val up = graft.ops.Sampling
        .weightedUpsample(d, "doc_id", col("weight"), salt = 7L,
          maxWeight = 7.0)
        .withColumn("sample_id", col("doc_id") * 8 + col("rep"))
        .select(col("sample_id"), col("doc_id"), col("rep"))
      graft.ops.Sampling.epochShuffle(up, "sample_id",
          epoch = 5, nShards = 4)
        .select(col("sample_id"), col("doc_id"), col("rep"),
          col("shard"), col("pos_in_shard"))
        .orderBy(col("shard"), col("pos_in_shard"))
    }),

    // k-anonymity suppression over (lang, source, length-bucket) quasi
    // identifiers: groups smaller than k=5 are suppressed entirely;
    // survivors carry their group_size (the release's anonymity
    // floor). 'fr' maps to NULL so the null-quasi group — the common
    // missing-attribute case — is exercised CROSS-ENGINE at every SF:
    // Spark's null-safe count join must group it exactly like DuckDB's
    // window PARTITION BY, which an equality-join regression would
    // break visibly here instead of only in the in-memory spec.
    "q_k_anonymize" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(col("lang") === "fr", lit(null)).otherwise(col("lang"))
          .as("lang"),
        col("source"),
        (col("n_chars") / 200).cast("long").as("len_bucket"))
      Curation.kAnonymize(d, Seq("lang", "source", "len_bucket"), k = 5)
        .orderBy(col("doc_id"))
    }),

    // l-diversity (Curation.lDiversify) — k-anonymity's companion
    // check: quasi groups (source, len_bucket) must hold >= 3 DISTINCT
    // sensitive values (lang) or every row in them drops. The same
    // fr->null injection as the sibling exercises BOTH null contracts:
    // null quasi keys still group and suppress (null-safe join), null
    // sensitive values do not count toward diversity (countDistinct
    // skips them in both engines).
    "q_l_diversity" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(col("lang") === "fr", lit(null)).otherwise(col("lang"))
          .as("lang"),
        col("source"),
        (col("n_chars") / 200).cast("long").as("len_bucket"))
      Curation.lDiversify(d, Seq("source", "len_bucket"), "lang", l = 3)
        .orderBy(col("doc_id"))
    }),

    // t-closeness (Curation.tCloseness) — the third privacy rail: a
    // group can be k-large and l-diverse and still leak by SKEW (90%
    // one language in a uniform corpus). Total variation distance of
    // each (source, len_bucket) group's lang distribution vs the
    // global one, suppress above t = 0.15 (fixture-measured: splits
    // the 60 groups at every SF — sf0.01 keeps ~¼, sf0.1 keeps most
    // but drops the skewed tail). VALUE-EXACT: both engines fold
    // |p − q| over the sorted category list (sequential double — the
    // dot-product precedent) and round to 9 dp before the inclusive
    // boundary compare, so the kept row set is bit-stable.
    "q_t_closeness" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(col("lang") === "fr", lit(null)).otherwise(col("lang"))
          .as("lang"),
        col("source"),
        (col("n_chars") / 200).cast("long").as("len_bucket"))
      Curation.tCloseness(d, Seq("source", "len_bucket"), "lang", t = 0.15)
        .orderBy(col("doc_id"))
    }),

    // HTML → text extraction (Curation.extractHtmlText/htmlTitle): the
    // step before every text operator in a crawl pipeline. The HTML
    // derives deterministically from (doc_id, text) — script bodies
    // containing '<' and a stray '</div>' (non-greedy dotall removal
    // must eat them BEFORE block handling), comments, nav boilerplate,
    // block tags, named entities, numeric character references
    // (decimal, hex, an unpaired surrogate and a malformed ref that
    // must stay literal — r12 VERDICT item 3), an escaped entity the
    // single-pass decoder must not double-decode, a lone '&', and a
    // '</pre>' tag whose 'p'-prefixed name must NOT become a paragraph
    // break (r12 ADVICE anchoring) — both engines build the identical
    // string then run the identical chain, so title and extracted
    // text hash-match.
    "q_html_extract" -> ((s, dir) => {
      docsRaw(s, dir).select(col("doc_id"),
          Curation.htmlTitle(syntheticHtml).as("title"),
          Curation.extractHtmlText(syntheticHtml).as("text_clean"))
        .withColumn("n_chars_clean", length(col("text_clean")))
        .orderBy(col("doc_id"))
    }),

    // Per-block boilerplate scoring (Curation.boilerplateBlocks): the
    // readability-class link-density layer above the markup core —
    // navs and link rails are mostly anchor text, prose is mostly not.
    // Over the same synthetic page as q_html_extract: the nav block
    // (link-dense) and the short h1 must score non-content, the prose
    // paragraphs content; both engines segment on the identical
    // pattern and compute the identical integer ratio, so every
    // per-block row hash-matches.
    "q_boilerplate" -> ((s, dir) => {
      Curation.boilerplateBlocks(
          docsRaw(s, dir).select(col("doc_id"),
            syntheticHtml.as("html")),
          "doc_id", "html")
        .orderBy(col("doc_id"), col("block_idx"))
    }),

    // N-GRAM corpus drift (Profile.ngramDrift) — the text-level member
    // of the drift family: PSI + JSD over the shared top-400 bigram
    // vocabulary (combined doc frequency, deterministic ties) plus an
    // OOV mass cell, add-half smoothed, folds in explicit (combined
    // desc, gram) order with OOV last. Two labeled pairs prove the
    // metric discriminates: even/odd doc_id (same language →
    // near-zero) vs all-docs-against-a-rot13-half (a genuine
    // vocabulary replacement — the scraper-regression / wrong-language
    // shape, PSI orders of magnitude higher). VALUE-EXACT: both
    // engines restate the identical vocab pick, smoothing and ordered
    // folds.
    "q_ngram_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      def drift(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame, pair: String) =
        graft.ops.Profile.ngramDrift(a, b, "text", n = 2, k = 400)
          .withColumn("pair", lit(pair))
      val rot13 = d.select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
            "nopqrstuvwxyzabcdefghijklm"))
          .otherwise(col("text")).as("text"))
      drift(d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 =!= 0), "even_vs_odd")
        .unionByName(drift(d, rot13, "all_vs_rot13"))
        .select(col("pair"), col("n"), col("k"), col("n_vocab"),
          col("n_a"), col("n_b"), col("oov_a"), col("oov_b"),
          col("psi"), col("jsd"))
        .orderBy(col("pair"))
    }),

    // CRAWL-FRONT end-to-end (VERDICT r12 item 4) — the HTML-in analog
    // of q_curation_e2e, proving the round-12/13 front (extraction +
    // boilerplate pruning) composes with the established back: raw
    // pages (constant title/nav/footer rails, prose from the doc's
    // first 12 words) → extractContentText (rails pruned by link
    // density, entities decoded) → EXACT dedup by content hash
    // (first-seen; 23 first-12-word collisions exist at every SF) →
    // MinHash-LSH near-dup pairs over the survivors →
    // leakageSafeSplit (no pair straddles train/test) → packBins.
    // Every stage is the operator the standalone query gates; the
    // oracle replays the identical chain including the recursive-CTE
    // closure.
    "q_crawl_e2e" -> ((s, dir) => {
      val first12 = array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ")
      val html = concat(
        lit("<html><head><title>Crawl</title></head><body>" +
          "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav><p>"),
        first12,
        lit(".</p><footer><a href=\"/terms\">Terms</a> " +
          "<a href=\"/privacy\">Privacy</a></footer></body></html>"))
      // docs (spread rail), not docsRaw: the HTML extraction kernel is
      // per-row work that dominates the single-split fixture scan (r16;
      // the docsRaw exemption is for cheap fused kernels). r17 A/B'd
      // spreadSplitsOnce here too — measured NEUTRAL (3.29 → 3.13/3.29
      // same-composition; the wave-1 chain materialization already
      // bounds the extraction to one pass) and was not kept.
      val extracted = docs(s, dir).select(col("doc_id"), col("source"),
        Curation.extractContentText(html).as("text"))
      // materialize the extract→first-seen chain ONCE: three subtrees
      // consume it (pair generation, the split join, the token-count
      // projection) and unmaterialized each re-ran the extraction
      // kernel over the corpus (guide §1.2; measured 3× single-task
      // extraction stages in the r16 profile)
      val exact = graft.ops.Reliable.checkpoint(
        graft.ops.Dedup.firstSeen(
            extracted.withColumn("__h", md5(col("text"))),
            Seq("__h"), Seq(col("doc_id")))
          .drop("__h"))
      val pairs = graft.ops.Dedup.minhashLshPairs(exact, "doc_id", "text",
        shingleSize = 3, k = 12, bandRows = 2)
      val safe = Curation.leakageSafeSplit(exact, "doc_id", pairs,
        trainPct = 90, valPct = 5)
      val withTok = exact.join(safe, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("rep"), col("split"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      Curation.packBins(withTok, col("split"), Seq(col("doc_id")),
          col("n_tokens"), budget = 256)
        .select(col("doc_id"), col("source"), col("rep"), col("split"),
          col("n_tokens"), col("pack_id"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization (Curation.normalizeUrl + registeredDomain):
    // the dedup key a crawl corpus normalizes BEFORE content dedup.
    // The dirty URLs derive deterministically from (source, doc_id) —
    // mixed-case scheme/host, default ports, tracking params, unsorted
    // params, fragments — and both engines build the IDENTICAL string
    // then canonicalize it with the same regex/filter/sort rules, so
    // url_norm and the two-label registered domain hash-match.
    "q_url_normalize" -> ((s, dir) => {
      urls(s, dir).select(col("doc_id"), col("url"),
        Curation.normalizeUrl(col("url")).as("url_norm"))
        .withColumn("domain", Curation.registeredDomain(col("url_norm")))
        .orderBy(col("doc_id"))
    }),

    // URL-level dedup — kill the cheapest duplicate class (the same
    // page via tracking links / case / port variants) by canonical-URL
    // first-seen, BEFORE any text shuffles: the canonical key above
    // collides on (source, doc_id % 100, tld bucket), so every SF has
    // real dups (300 of 500 rows drop at sf0.01).
    "q_url_dedup" -> ((s, dir) => {
      val d = urls(s, dir)
        .withColumn("url_norm", Curation.normalizeUrl(col("url")))
      graft.ops.Dedup.firstSeen(d.select(col("doc_id"), col("url_norm")),
          Seq("url_norm"), Seq(col("doc_id")))
        .select(col("doc_id"), col("url_norm"))
        .orderBy(col("doc_id"))
    }),

    // Per-domain quota (Curation.quotaCap): keep at most 15 docs per
    // registered domain, preferring LONGER docs (n_chars), ties to the
    // smaller doc_id — the domain-ceiling step a crawl corpus runs so
    // one boilerplate-heavy site cannot dominate a training mix. The
    // argmax-k aggregate ships 15 (score, id) pairs per domain through
    // the shuffle; the oracle pays the row_number window sort to prove
    // identical survivors.
    "q_domain_cap" -> ((s, dir) => {
      val d = urls(s, dir)
        .withColumn("domain",
          Curation.registeredDomain(Curation.normalizeUrl(col("url"))))
      Curation.quotaCap(d, Seq("domain"), n = 15,
          scoreCol = col("n_chars"), idCol = col("doc_id"))
        .select(col("doc_id"), col("domain"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // The privacy rails COMPOSED on one release (VERDICT r10 item 7):
    // k-anonymity (groups of >= 5) -> l-diversity (>= 3 distinct
    // langs) -> t-closeness (TV <= 0.15 against the RELEASE's own
    // global distribution — each stage certifies the frame the
    // previous stage actually kept, which is what a release pipeline
    // publishes). Stage outputs rename their group_size so the next
    // rail's clash guards pass — the documented composition contract,
    // proven end-to-end here. The three per-stage sizes are emitted
    // side by side; whole-group filtering makes them EQUAL for
    // surviving groups, an invariant the oracle must reproduce.
    "q_privacy_e2e" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        when(col("lang") === "fr", lit(null)).otherwise(col("lang"))
          .as("lang"),
        col("source"),
        (col("n_chars") / 200).cast("long").as("len_bucket"))
      val quasi = Seq("source", "len_bucket")
      val ka = Curation.kAnonymize(d, quasi, k = 5)
        .withColumnRenamed("group_size", "k_size")
      val ld = Curation.lDiversify(ka, quasi, "lang", l = 3)
        .withColumnRenamed("group_size", "l_size")
        .withColumnRenamed("n_sensitive", "l_distinct")
      Curation.tCloseness(ld, quasi, "lang", t = 0.15)
        .withColumnRenamed("group_size", "t_size")
        .orderBy(col("doc_id"))
    }),

    // ordered t-closeness (Curation.tClosenessOrdered) — the paper's
    // EMD form for ORDINAL sensitive attributes: length buckets as the
    // sensitive column, (source, lang) as the quasi group; mass is
    // charged by how far it travels across the bucket ORDER (a group
    // skewed one bucket over leaks less than one skewed to the far
    // tail — TV distance cannot tell them apart; spec-pinned). Both
    // engines run the identical slice-prefix folds over the sorted
    // bucket list, so the distances and the t = 0.12 cut (fixture-
    // measured split at every SF) hash-match.
    "q_t_closeness_ord" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
        (col("n_chars") / 200).cast("long").as("len_bucket"))
      Curation.tClosenessOrdered(d, Seq("source", "lang"), "len_bucket",
          t = 0.12)
        .orderBy(col("doc_id"))
    }),
  )

  /** Shared dirty-URL + canonicalization CTEs for the q_url_* oracles:
    * the byte-identical URL derivation, then the SAME regex (the
    * spliced [[graft.ops.Curation.UrlPattern]]), tracking-param filter,
    * and lexicographic param sort `normalizeUrl` runs — DuckDB's RE2
    * and list_sort match Spark's Java regex and array_sort on these
    * ASCII inputs by construction (the pattern avoids lookaround). */
  private val urlCtes: String = {
    val pat = graft.ops.Curation.UrlPattern
    // NB: concat('||') sits at END of line — a leading '||' would lose
    // one pipe to stripMargin and bind as DuckDB's bitwise-or
    raw"""u AS (
         |  SELECT doc_id, n_chars,
         |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http' ELSE 'https' END) ||
         |    '://CdN.' ||
         |    (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END) ||
         |    (CASE doc_id % 5 WHEN 3 THEN '.Co.Uk' WHEN 4 THEN '.CoM.Au'
         |          ELSE '.CoM' END) ||
         |    (CASE WHEN doc_id % 2 = 0
         |       THEN (CASE WHEN doc_id % 3 = 1 THEN ':80' ELSE ':443' END)
         |       ELSE '' END) ||
         |    '/Docs/' || CAST(doc_id % 100 AS VARCHAR) ||
         |    '?utm_source=rss&b=2&a=1' ||
         |    (CASE WHEN doc_id % 4 = 0 THEN '&fbclid=abc' ELSE '' END) ||
         |    (CASE WHEN doc_id % 4 = 2 THEN '#frag' ELSE '' END) AS url
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, n_chars, url,
         |    lower(regexp_extract(url, '$pat', 1)) AS scheme,
         |    lower(regexp_extract(url, '$pat', 2)) AS auth,
         |    regexp_extract(url, '$pat', 3) AS path,
         |    regexp_extract(url, '$pat', 4) AS query
         |  FROM u),
         |n AS (
         |  SELECT doc_id, n_chars, url,
         |    CASE WHEN scheme = '' OR auth = '' THEN NULL ELSE
         |      scheme || '://' ||
         |      (CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
         |            WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
         |            ELSE auth END) ||
         |      (CASE WHEN path = '' THEN '/' ELSE path END) ||
         |      (CASE WHEN q = '' THEN '' ELSE '?' || q END)
         |    END AS url_norm
         |  FROM (SELECT *,
         |    array_to_string(list_sort(list_filter(string_split(query, '&'),
         |      x -> x <> '' AND NOT regexp_matches(x,
         |        '^(utm_[^=]*|fbclid|gclid|ref)(=|$$)'))), '&') AS q
         |    FROM p))""".stripMargin
  }

  /** Registered-domain restatement over `url_norm` — the
    * [[graft.ops.Curation.registeredDomain]] heuristic: last two host
    * labels, or three when the last two are a known multi-label public
    * suffix (the SAME spliced [[graft.ops.Curation.MultiLabelTlds]]
    * literal set, so the engines cannot drift). */
  private val domainSql: String = {
    val pat = graft.ops.Curation.UrlPattern
    val suffixes = graft.ops.Curation.MultiLabelTlds
      .map(s => s"'$s'").mkString(", ")
    raw"""(SELECT CASE
         |  WHEN regexp_extract(h, '([^.]+\.[^.]+)$$', 1) IN ($suffixes)
         |  THEN nullif(regexp_extract(h, '([^.]+\.[^.]+\.[^.]+)$$', 1), '')
         |  ELSE nullif(regexp_extract(h, '([^.]+\.[^.]+)$$', 1), '') END
         |FROM (SELECT regexp_replace(regexp_replace(
         |  regexp_extract(url_norm, '$pat', 2), '^[^@]*@', ''),
         |  ':[0-9]+$$', '') AS h))""".stripMargin
  }

  private val toks =
    raw"list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0)"
  // the ShingleArray kernel tokenizes WITHOUT the empty filter
  // (split(trim(lower(text)), '\s+', -1)) — oracle restatements of
  // kernel-backed grams must match it, same as q_ngram_jaccard's.
  private val toksLower =
    raw"regexp_split_to_array(trim(lower(text)), '\s+')"

  /** Word n-gram list (distinct) from a token-list expression —
    * matches the ShingleArray kernel semantics: short texts fall back
    * to one whole-text shingle. */
  private def grams(tokExpr: String, n: Int): String =
    s"""list_distinct(CASE WHEN len($tokExpr) >= $n
       |  THEN list_transform(range(1, len($tokExpr) - ${n - 2}),
       |         i -> array_to_string(($tokExpr)[i:i+${n - 1}], ' '))
       |  ELSE [array_to_string($tokExpr, ' ')] END)""".stripMargin

  /** The synthetic crawl page q_html_extract / q_boilerplate derive
    * deterministically from (doc_id, text): title with an entity,
    * style/script bodies (the script holds '<' and a stray '</div>'),
    * a comment, a link-dense nav, heading + prose paragraphs, named /
    * numeric / escaped / malformed entities, and a '<pre>' block whose
    * 'p'-prefixed name must not split paragraphs. The SQL twin below
    * builds the IDENTICAL string. */
  private def syntheticHtml: Column = {
    val first12 = array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ")
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit(" &amp; friends</title><style>body { color: red; }</style>"),
      lit("<script>var x = 1 < 2 && \"</div>\";</script></head><body>"),
      lit("<!-- boilerplate --><nav>Home | "),
      lit("<a href=\"/x?a=1&amp;b=2\">About</a></nav><h1>Doc "),
      col("doc_id").cast("string"), lit("</h1><p>"), first12,
      lit("</p><p>entities: &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      // ESCAPED entity — literal '&lt;i&gt;' shown to readers; the
      // single-pass decoder yields exactly that, never '<i>'
      lit(" esc: &amp;lt;i&amp;gt;</p>"),
      lit("<p>nums: it&#8217;s &#x2019;curly&#x2019; &mdash; gap &hellip;"),
      lit(" amp-ref: &#38;amp; bad: &#55296; &#xZZZZ; lone & end</p>"),
      lit("<pre>inline code block</pre></body></html>"))
  }

  private val syntheticHtmlSql: String =
    raw"""'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
         |    ' &amp; friends</title><style>body { color: red; }</style>' ||
         |    '<script>var x = 1 < 2 && "</div>";</script></head><body>' ||
         |    '<!-- boilerplate --><nav>Home | ' ||
         |    '<a href="/x?a=1&amp;b=2">About</a></nav><h1>Doc ' ||
         |    CAST(doc_id AS VARCHAR) || '</h1><p>' ||
         |    array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:12], ' ') ||
         |    '</p><p>entities: &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end' ||
         |    ' esc: &amp;lt;i&amp;gt;</p>' ||
         |    '<p>nums: it&#8217;s &#x2019;curly&#x2019; &mdash; gap &hellip;' ||
         |    ' amp-ref: &#38;amp; bad: &#55296; &#xZZZZ; lone & end</p>' ||
         |    '<pre>inline code block</pre></body></html>'""".stripMargin

  /** DuckDB restatement of [[graft.ops.Curation.decodeEntities]]'s
    * single-pass head decode, applied to a column named `p` inside a
    * list_transform lambda: the SAME named-entity order
    * ([[graft.ops.Curation.NamedEntities]]), then decimal/hex numeric
    * references (BMP, surrogates and malformed left literal via the
    * identical regexes), else the literal '&' piece. */
  private def decodePieceSql: String = {
    val named = graft.ops.Curation.NamedEntities.map { case (ent, repl) =>
      val r = repl.replace("'", "''")
      s"WHEN starts_with(p, '$ent') THEN '$r' || p[${ent.length + 1}:]"
    }.mkString("\n        ")
    val dec = raw"""regexp_extract(p, '^#([0-9]{1,6});', 1)"""
    val hex = raw"""regexp_extract(p, '^#[xX]([0-9a-fA-F]{1,5});', 1)"""
    raw"""CASE
        |        $named
        |        WHEN $dec <> '' THEN
        |          CASE WHEN CAST($dec AS BIGINT) BETWEEN 1 AND 65535
        |                AND CAST($dec AS BIGINT) NOT BETWEEN 55296 AND 57343
        |            THEN chr(CAST($dec AS INTEGER)) || p[len($dec) + 3:]
        |            ELSE '&' || p END
        |        WHEN $hex <> '' THEN
        |          CASE WHEN CAST('0x' || $hex AS BIGINT) BETWEEN 1 AND 65535
        |                AND CAST('0x' || $hex AS BIGINT) NOT BETWEEN 55296 AND 57343
        |            THEN chr(CAST(('0x' || $hex) AS INTEGER)) || p[len($hex) + 4:]
        |            ELSE '&' || p END
        |        ELSE '&' || p END""".stripMargin
  }

  /** The full decode over an expression: split on '&', pass piece 1
    * through, head-decode the rest, rejoin. */
  private def decodeEntitiesSql(e: String): String =
    // COALESCE: DuckDB's array_to_string of an EMPTY list is NULL,
    // Spark's array_join is '' — normalize to Spark's semantics
    s"""(string_split($e, '&'))[1] || COALESCE(array_to_string(
       |      list_transform((string_split($e, '&'))[2:],
       |        p -> $decodePieceSql), ''), '')""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // the identical derivation + regexp chain (all 'g' — DuckDB
    // replaces first-match-only by default, Spark replaces all);
    // the single-pass entity decode via decodeEntitiesSql, newlines
    // injected via chr(10)
    "q_html_extract" ->
      raw"""WITH h AS (
           |  SELECT doc_id,
           |    $syntheticHtmlSql AS html
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, html,
           |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
           |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
           |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
           |      '(?s)<!--.*?-->', ' ', 'g'),
           |      '(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/ul|/ol|/table|/blockquote)(?:[^a-zA-Z0-9>][^>]*)?>',
           |      chr(10), 'g') AS t1
           |  FROM h),
           |d0 AS (
           |  SELECT doc_id, html,
           |    regexp_replace(t1, '(?s)<[^>]*>', ' ', 'g') AS t15
           |  FROM c),
           |d AS (
           |  SELECT doc_id, html,
           |    ${decodeEntitiesSql("t15")} AS t2
           |  FROM d0),
           |e AS (
           |  SELECT doc_id, html,
           |    trim(regexp_replace(regexp_replace(regexp_replace(t2,
           |      '[ \t]+', ' ', 'g'), ' ?\n ?', chr(10), 'g'),
           |      '\n{2,}', chr(10), 'g'), ' ' || chr(10)) AS text_clean
           |  FROM d),
           |t0 AS (
           |  SELECT doc_id, text_clean,
           |    regexp_replace(
           |      regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
           |      '(?s)<[^>]*>', ' ', 'g') AS rawt
           |  FROM e)
           |SELECT doc_id,
           |  nullif(trim(regexp_replace(${decodeEntitiesSql("rawt")},
           |    '\s+', ' ', 'g')), '') AS title,
           |  text_clean, CAST(len(text_clean) AS INTEGER) AS n_chars_clean
           |FROM t0 ORDER BY doc_id""".stripMargin,

    // identical vocab pick (combined-df top-50, gram ties), add-half
    // smoothing over nv+1 cells, ordered folds with the OOV cell last
    "q_ngram_drift" -> {
      def block(sfx: String, pair: String): String =
        raw"""SELECT '$pair' AS pair, 2 AS n, 400 AS k,
             |  CAST(nv AS INTEGER) AS n_vocab,
             |  CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
             |  CAST(ta - va AS BIGINT) AS oov_a,
             |  CAST(tb - vb AS BIGINT) AS oov_b,
             |  ROUND((SELECT list_aggregate(list(psi_term ORDER BY negc, gram),
             |      'sum') FROM terms_$sfx)
             |    + (SELECT psi_term FROM oov_$sfx), 9) AS psi,
             |  ROUND((SELECT list_aggregate(list(jsd_term ORDER BY negc, gram),
             |      'sum') FROM terms_$sfx)
             |    + (SELECT jsd_term FROM oov_$sfx), 9) AS jsd
             |FROM tot_$sfx, vg_$sfx""".stripMargin
      def ctes(label: String, srcA: String, srcB: String): String =
        raw"""ga_$label AS (
             |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS df_a FROM (
             |    SELECT doc_id, unnest(${grams(toksLower, 2)}) AS gram
             |    FROM ($srcA)) GROUP BY 1),
             |gb_$label AS (
             |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS df_b FROM (
             |    SELECT doc_id, unnest(${grams(toksLower, 2)}) AS gram
             |    FROM ($srcB)) GROUP BY 1),
             |j_$label AS (
             |  SELECT COALESCE(ga_$label.gram, gb_$label.gram) AS gram,
             |    COALESCE(df_a, 0) AS df_a, COALESCE(df_b, 0) AS df_b
             |  FROM ga_$label FULL OUTER JOIN gb_$label
             |    ON ga_$label.gram = gb_$label.gram),
             |top_$label AS (
             |  SELECT * FROM j_$label ORDER BY (df_a + df_b) DESC, gram LIMIT 400),
             |tot_$label AS (
             |  SELECT CAST(SUM(df_a) AS BIGINT) AS ta,
             |    CAST(SUM(df_b) AS BIGINT) AS tb FROM j_$label),
             |vg_$label AS (
             |  SELECT CAST(SUM(df_a) AS BIGINT) AS va,
             |    CAST(SUM(df_b) AS BIGINT) AS vb, COUNT(*) AS nv FROM top_$label),
             |terms_$label AS (
             |  SELECT negc, gram,
             |    (pa - pb) * ln(pa / pb) AS psi_term,
             |    (pa * ln(pa / ((pa + pb) / 2))
             |      + pb * ln(pb / ((pa + pb) / 2))) / 2 AS jsd_term
             |  FROM (SELECT -(df_a + df_b) AS negc, gram,
             |      (CAST(df_a AS DOUBLE) + 0.5)
             |        / (CAST(ta AS DOUBLE) + 0.5 * (nv + 1)) AS pa,
             |      (CAST(df_b AS DOUBLE) + 0.5)
             |        / (CAST(tb AS DOUBLE) + 0.5 * (nv + 1)) AS pb
             |    FROM top_$label, tot_$label, vg_$label)),
             |oov_$label AS (
             |  SELECT (pa - pb) * ln(pa / pb) AS psi_term,
             |    (pa * ln(pa / ((pa + pb) / 2))
             |      + pb * ln(pb / ((pa + pb) / 2))) / 2 AS jsd_term
             |  FROM (SELECT
             |      (CAST(ta - va AS DOUBLE) + 0.5)
             |        / (CAST(ta AS DOUBLE) + 0.5 * (nv + 1)) AS pa,
             |      (CAST(tb - vb AS DOUBLE) + 0.5)
             |        / (CAST(tb AS DOUBLE) + 0.5 * (nv + 1)) AS pb
             |    FROM tot_$label, vg_$label))""".stripMargin
      val docsSel = "SELECT doc_id, text FROM documents"
      val rot13 = """SELECT doc_id,
        CASE WHEN doc_id % 2 = 0
          THEN translate(text, 'abcdefghijklmnopqrstuvwxyz',
                         'nopqrstuvwxyzabcdefghijklm')
          ELSE text END AS text FROM documents"""
      s"""WITH ${ctes("eo", s"$docsSel WHERE doc_id % 2 = 0",
                      s"$docsSel WHERE doc_id % 2 <> 0")},
         |${ctes("ar", docsSel, rot13)}
         |SELECT * FROM (
         |${block("eo", "even_vs_odd")}
         |UNION ALL
         |${block("ar", "all_vs_rot13")})
         |ORDER BY pair""".stripMargin
    },

    // the full crawl front replayed: identical page derivation,
    // identical content extraction (segmentation + density gate +
    // entity decode), exact dedup via ROW_NUMBER over md5(text),
    // the q_lsh_pairs signature CTEs, the recursive-CTE closure, the
    // rep-keyed split and the cumulative-sum pack arithmetic
    "q_crawl_e2e" -> {
      val bt = raw"""trim(regexp_replace(regexp_replace(b,
                    |        '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))""".stripMargin
      val anch = raw"""CAST(COALESCE(list_aggregate(list_transform(
                      |        regexp_extract_all(b, '${graft.ops.Curation.AnchorPattern}', 1),
                      |        a -> len(trim(regexp_replace(regexp_replace(a,
                      |          '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')))),
                      |        'sum'), 0) AS DOUBLE)""".stripMargin
      raw"""WITH RECURSIVE h AS (
           |  SELECT doc_id, source,
           |    '<html><head><title>Crawl</title></head><body>' ||
           |    '<nav><a href="/">Home</a> | <a href="/about">About</a></nav><p>' ||
           |    array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:12], ' ') ||
           |    '.</p><footer><a href="/terms">Terms</a> ' ||
           |    '<a href="/privacy">Privacy</a></footer></body></html>' AS html
           |  FROM documents),
           |pre AS (
           |  SELECT doc_id, source,
           |    regexp_replace(regexp_replace(regexp_replace(html,
           |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
           |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
           |      '(?s)<!--.*?-->', ' ', 'g') AS p
           |  FROM h),
           |joined AS (
           |  SELECT doc_id, source,
           |    COALESCE(array_to_string(list_transform(list_filter(
           |      regexp_split_to_array(p,
           |        '(?i)<(?:${graft.ops.Curation.SegmentTags})(?:[^a-zA-Z0-9>][^>]*)?>'),
           |      b -> len($bt) >= 15 AND round($anch / len($bt), 9) <= 0.33),
           |      b -> $bt), chr(10)), '') AS jt
           |  FROM pre),
           |cont AS (
           |  SELECT doc_id, source, ${decodeEntitiesSql("jt")} AS text
           |  FROM joined),
           |ex AS (
           |  SELECT doc_id, source, text FROM (
           |    SELECT doc_id, source, text,
           |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           |    FROM cont) WHERE rn = 1),
           |__tok AS (
           |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS __t
           |  FROM ex),
           |sig AS (
           |  SELECT doc_id, ${TextQueries.sig12} AS sig
           |  FROM (SELECT doc_id, ${TextQueries.shingles3} AS __sh FROM __tok)),
           |banded AS (
           |  SELECT doc_id, b,
           |    md5(array_to_string(sig[b*2+1:b*2+2], '|')) AS band_key
           |  FROM sig, unnest([0,1,2,3,4,5]) AS u(b)),
           |prs AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM banded a JOIN banded b
           |    ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM prs
           |  UNION SELECT id_b, id_a FROM prs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
           |lab AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
           |j AS (
           |  SELECT e.doc_id, e.source, e.text, COALESCE(lab.rep, e.doc_id) AS rep
           |  FROM ex e LEFT JOIN lab ON lab.id = e.doc_id),
           |spl AS (
           |  SELECT doc_id, source, rep,
           |    CASE WHEN sb < 90 THEN 'train'
           |         WHEN sb < 95 THEN 'val' ELSE 'test' END AS split,
           |    CAST(len($toks) AS BIGINT) AS n_tokens
           |  FROM (SELECT *,
           |    CAST(('0x' || substring(md5(CAST(rep AS VARCHAR)), 1, 8))
           |      AS BIGINT) % 100 AS sb
           |    FROM j)),
           |c AS (
           |  SELECT doc_id, source, rep, split, n_tokens,
           |    SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM spl)
           |SELECT doc_id, source, rep, split, n_tokens,
           |  CAST(FLOOR((cum - n_tokens) / 256) AS BIGINT) AS pack_id
           |FROM c ORDER BY doc_id""".stripMargin
    },

    // identical segmentation (regex split on the anchored container
    // pattern), identical per-block text/anchor-char arithmetic;
    // block_idx zips positionally via lockstep unnest
    "q_boilerplate" ->
      raw"""WITH h AS (
           |  SELECT doc_id,
           |    $syntheticHtmlSql AS html
           |  FROM documents),
           |pre AS (
           |  SELECT doc_id,
           |    regexp_replace(regexp_replace(regexp_replace(html,
           |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
           |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
           |      '(?s)<!--.*?-->', ' ', 'g') AS p
           |  FROM h),
           |bl AS (
           |  SELECT doc_id,
           |    regexp_split_to_array(p,
           |      '(?i)<(?:${graft.ops.Curation.SegmentTags})(?:[^a-zA-Z0-9>][^>]*)?>') AS b
           |  FROM pre),
           |x AS (
           |  SELECT doc_id,
           |    CAST(unnest(generate_series(1, len(b))) AS INTEGER) AS block_idx,
           |    unnest(b) AS raw
           |  FROM bl),
           |scored AS (
           |  SELECT doc_id, block_idx,
           |    trim(regexp_replace(regexp_replace(raw,
           |      '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS block_text,
           |    CAST(COALESCE(list_aggregate(list_transform(
           |      regexp_extract_all(raw, '${graft.ops.Curation.AnchorPattern}', 1),
           |      a -> len(trim(regexp_replace(regexp_replace(a,
           |        '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')))),
           |      'sum'), 0) AS INTEGER) AS n_anchor_chars
           |  FROM x),
           |m AS (
           |  SELECT doc_id, block_idx, block_text, n_anchor_chars,
           |    CAST(len(block_text) AS INTEGER) AS n_chars
           |  FROM scored WHERE len(block_text) > 0)
           |SELECT doc_id, block_idx, block_text, n_anchor_chars, n_chars,
           |  round(CAST(n_anchor_chars AS DOUBLE) / n_chars, 9) AS link_density,
           |  (n_chars >= 15 AND
           |   round(CAST(n_anchor_chars AS DOUBLE) / n_chars, 9) <= 0.33) AS content
           |FROM m ORDER BY doc_id, block_idx""".stripMargin,

    "q_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // the manifest arithmetic restated over the SOURCE table: same
    // md5 shard assignment, token/char sums, and md5-prefix checksum
    "q_export_manifest" ->
      raw"""SELECT
           |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
           |    AS BIGINT) % 8 AS shard,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
           |    t -> len(t) > 0))) AS BIGINT) AS n_tokens,
           |  CAST(sum(len(text)) AS BIGINT) AS n_chars,
           |  CAST(sum(CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT))
           |    % 4611686018427387904 AS BIGINT) AS checksum,
           |  TRUE AS ok
           |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,

    "q_seq_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT doc_id, source, n_tokens,
         |  CAST(FLOOR((cum - n_tokens) / 256) AS BIGINT) AS pack_id
         |FROM c ORDER BY doc_id""".stripMargin,

    // sqrt weights, sequential fold of the weight total in sorted-source
    // order (list_reduce == Spark's aggregate fold: (0+w1)+w2 == w1+w2
    // exactly), then the same floor/ppm chain as the operator
    "q_temperature_mix" ->
      """WITH c AS (
        |  SELECT source AS src, CAST(count(*) AS DOUBLE) AS n
        |  FROM documents GROUP BY source),
        |packed AS (
        |  SELECT list(struct_pack(src := src, n := n, w := sqrt(n))
        |    ORDER BY src) AS L FROM c),
        |tot AS (
        |  SELECT L, list_reduce(list_transform(L, x -> x.w),
        |    (a, b) -> a + b) AS W FROM packed),
        |r AS (
        |  SELECT u.src AS src, u.n AS n, u.w / t.W AS p
        |  FROM tot t, unnest(t.L) AS s(u)),
        |f AS (SELECT src, n, p, floor(n / p) AS feas FROM r),
        |nn AS (SELECT min(feas) AS N FROM f),
        |rates AS (
        |  SELECT f.src, floor(floor(nn.N * f.p) * 1000000.0 / f.n) AS ppm
        |  FROM f, nn)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN rates ON d.source = rates.src
        |WHERE CAST(('0x' || substring(md5(d.text), 1, 8)) AS BIGINT) % 1000000
        |  < rates.ppm
        |ORDER BY d.doc_id""".stripMargin,

    // the derived lines restated (generate_series spine, list slicing,
    // the same (g + doc_id) % 3 punctuation), then the C4 rules; the
    // kept lines reassemble with string_agg ORDER BY line_no, which is
    // byte-identical to Spark's order-preserving array filter + join
    "q_line_clean" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, g,
        |    array_to_string(toks[(g*4+1):(g*4+4)], ' ') ||
        |      CASE WHEN (g + doc_id) % 3 <> 0 THEN '.' ELSE '' END AS line
        |  FROM t, unnest(generate_series(0,
        |    CAST(floor((len(toks)-1)/4.0) AS BIGINT))) AS s(g)),
        |flags AS (
        |  SELECT doc_id, g, line,
        |    right(trim(line), 1) IN ('.', '!', '?', '"')
        |      AND len(string_split_regex(trim(line), '\s+')) >= 3
        |      AND NOT contains(lower(trim(line)), 'slow') AS keep
        |  FROM lines),
        |agg AS (
        |  SELECT doc_id,
        |    -- the doc-level blocklist applies to the LINED text (the
        |    -- operator's input), where a line break or inserted '.'
        |    -- can split a phrase the raw text contains
        |    lower(string_agg(line, chr(10) ORDER BY g)) AS lined_lower,
        |    CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY g) FILTER (keep) AS clean_text
        |  FROM flags GROUP BY doc_id)
        |SELECT doc_id, n_lines, n_kept, md5(clean_text) AS clean_md5
        |FROM agg
        |WHERE NOT contains(lined_lower, 'merge batch') AND n_kept >= 5
        |ORDER BY doc_id""".stripMargin,

    // global line frequency via a LEFT JOIN against the >=3 set; docs
    // with every line doomed reassemble to the empty string on both
    // engines (coalesce here, empty array_join in Spark)
    "q_line_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, g, array_to_string(toks[(g*4+1):(g*4+4)], ' ') AS line
        |  FROM t, unnest(generate_series(0,
        |    CAST(floor((len(toks)-1)/4.0) AS BIGINT))) AS s(g)),
        |freq AS (SELECT line FROM lines GROUP BY line HAVING count(*) >= 3),
        |marked AS (
        |  SELECT l.doc_id, l.g, l.line, (f.line IS NOT NULL) AS doomed
        |  FROM lines l LEFT JOIN freq f ON l.line = f.line),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(count(*) FILTER (doomed) AS BIGINT) AS n_dropped,
        |    coalesce(string_agg(line, chr(10) ORDER BY g) FILTER (NOT doomed),
        |      '') AS clean_text
        |  FROM marked GROUP BY doc_id)
        |SELECT doc_id, n_dropped, md5(clean_text) AS clean_md5
        |FROM agg ORDER BY doc_id""".stripMargin,

    // every Gopher threshold as integer cross-multiplication — no float
    // division anywhere, so the booleans are exact on both engines
    "q_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS toks,
        |    string_split(text, chr(10)) AS ls
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_reduce(list_transform(toks, x -> length(x)),
        |      (a, b) -> a + b) AS BIGINT) AS sumlen,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |      AS hashes,
        |    CAST(length(text) - length(replace(text, '...', '')) AS BIGINT)
        |      AS ellchars,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
        |      AS BIGINT) AS alpha,
        |    CAST((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
        |        + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS stops,
        |    CAST(len(ls) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(ls, l -> left(trim(l), 1) IN ('•', '-', '*')))
        |      AS BIGINT) AS bullets,
        |    CAST(len(list_filter(ls, l -> right(trim(l), 3) = '...'))
        |      AS BIGINT) AS ells
        |  FROM t)
        |SELECT doc_id, n_words,
        |  n_words >= 30 AND n_words <= 100000 AS flag_word_count,
        |  sumlen >= n_words * 3 AND sumlen <= n_words * 10 AS flag_mean_word_len,
        |  (hashes * 3 + ellchars) * 10 <= n_words * 3 AS flag_symbol_ratio,
        |  alpha * 5 >= n_words * 4 AS flag_alpha_words,
        |  stops >= 2 AS flag_stopwords,
        |  bullets * 10 <= n_lines * 9 AS flag_bullet_lines,
        |  ells * 10 <= n_lines * 3 AS flag_ellipsis_lines,
        |  (n_words >= 30 AND n_words <= 100000)
        |    AND sumlen >= n_words * 3 AND sumlen <= n_words * 10
        |    AND (hashes * 3 + ellchars) * 10 <= n_words * 3
        |    AND alpha * 5 >= n_words * 4 AND stops >= 2
        |    AND bullets * 10 <= n_lines * 9
        |    AND ells * 10 <= n_lines * 3 AS gopher_pass
        |FROM m ORDER BY doc_id""".stripMargin,

    // quality kernel restated + per-source continuous quantile; the
    // interpolated threshold sits strictly between two data points
    // whenever the rank position is fractional, so a last-ulp
    // interpolation difference between engines cannot flip membership
    // unless two adjacent scores are within one ulp
    "q_bpe" ->
      raw"""WITH words AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
           |    SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           |      x -> len(x) > 0)) AS w
           |    FROM documents) GROUP BY w),
           |pairs AS (
           |  SELECT w[u.i : u.i] AS s1, w[u.i+1 : u.i+1] AS s2, SUM(wc) AS freq
           |  FROM words, unnest(CASE WHEN len(w) >= 2
           |    THEN generate_series(1, len(w) - 1) ELSE [] END) AS u(i)
           |  GROUP BY 1, 2),
           |best AS (
           |  SELECT s1, s2, CAST(freq AS BIGINT) AS freq FROM pairs
           |  ORDER BY freq DESC, s1, s2 LIMIT 1)
           |SELECT CAST(8 AS BIGINT) AS n_merges, TRUE AS freqs_nonincreasing,
           |  TRUE AS freqs_positive, s1 AS first_s1, s2 AS first_s2,
           |  freq AS first_freq
           |FROM best""".stripMargin,

    // q_unigram: the seed-stage anchors are pure SQL (top weighted
    // multi-char substring, distinct character count — the exact
    // arithmetic of Curation.substringPiecesCol restated); the EM
    // invariants ride as theorem booleans the Spark side computes
    // honestly from the trained artifact (q_bpe precedent).
    "q_unigram" ->
      raw"""WITH words AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
           |    SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           |      x -> len(x) > 0)) AS w
           |    FROM documents) GROUP BY w),
           |subs AS (
           |  SELECT substr(w, u.s, v.l) AS piece, SUM(wc) AS freq
           |  FROM words,
           |    unnest(generate_series(1, len(w))) AS u(s),
           |    unnest(generate_series(1, least(6, len(w) - u.s + 1))) AS v(l)
           |  GROUP BY 1),
           |first AS (
           |  SELECT piece AS first_seed_piece, CAST(freq AS BIGINT) AS first_seed_freq
           |  FROM subs WHERE len(piece) > 1 ORDER BY freq DESC, piece LIMIT 1),
           |chars AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_chars FROM subs WHERE len(piece) = 1)
           |SELECT TRUE AS n_pieces_le_vocab, TRUE AS probs_sum_to_1,
           |  chars.n_chars, TRUE AS ll_nondecreasing, TRUE AS has_all_chars,
           |  first_seed_piece, first_seed_freq
           |FROM chars CROSS JOIN first""".stripMargin,

    // q_unigram_encode: n_words / n_chars are value-exact over the
    // shared tokenization; the round-trip and token-sandwich theorems
    // ride as booleans (they hold by the never-prune-characters rule —
    // a coverage regression flips them).
    "q_unigram_encode" ->
      raw"""SELECT doc_id,
           |  CAST(len(toks) AS BIGINT) AS n_words,
           |  CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT) AS n_chars,
           |  TRUE AS round_trip_ok, TRUE AS tokens_bounded
           |FROM (SELECT doc_id,
           |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           |      x -> len(x) > 0) AS toks
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin,

    "q_decontam" ->
      raw"""WITH bp AS (
           |  SELECT text ||
           |    ' all rights reserved contact support for help terms of service apply' AS t
           |  FROM documents WHERE doc_id % 50 = 0),
           |bb AS (
           |  SELECT list_filter(regexp_split_to_array(trim(t), '\s+'),
           |    x -> len(x) > 0) AS toks
           |  FROM bp),
           |bw AS (
           |  SELECT DISTINCT md5(array_to_string(toks[u.i+1 : u.i+8], ' ')) AS h
           |  FROM bb, unnest(CASE WHEN len(toks) >= 8
           |    THEN generate_series(0, len(toks) - 8) ELSE [] END) AS u(i)),
           |p AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN text ||
           |      ' all rights reserved contact support for help terms of service apply'
           |    ELSE text END AS t
           |  FROM documents WHERE doc_id % 50 <> 0),
           |b AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(trim(t), '\s+'), x -> len(x) > 0) AS toks
           |  FROM p),
           |w AS (
           |  SELECT doc_id, u.i AS pos,
           |    md5(array_to_string(toks[u.i+1 : u.i+8], ' ')) AS h
           |  FROM b, unnest(CASE WHEN len(toks) >= 8
           |    THEN generate_series(0, len(toks) - 8) ELSE [] END) AS u(i)),
           |dp AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM bw)),
           |isl AS (
           |  SELECT doc_id, pos,
           |    CASE WHEN pos <= max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |    THEN 0 ELSE 1 END AS brk
           |  FROM dp),
           |isl2 AS (
           |  SELECT doc_id, pos,
           |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS UNBOUNDED PRECEDING) AS g
           |  FROM isl),
           |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
           |  FROM isl2 GROUP BY doc_id, g),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |    CAST(sum(e - s) AS BIGINT) AS contam_tokens
           |  FROM sp GROUP BY doc_id),
           |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS cp
           |  FROM dp),
           |covl AS (SELECT doc_id, list(cp) AS cps FROM cov GROUP BY doc_id)
           |SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
           |  coalesce(a.contam_tokens, 0) AS contam_tokens,
           |  coalesce(a.n_spans, 0) AS n_spans,
           |  md5(coalesce(array_to_string(list_filter(b.toks,
           |    (x, i) -> NOT list_contains(coalesce(c.cps, []), i - 1)), ' '), '')) AS clean_md5
           |FROM b
           |LEFT JOIN agg a ON a.doc_id = b.doc_id
           |LEFT JOIN covl c ON c.doc_id = b.doc_id
           |ORDER BY b.doc_id""".stripMargin,

    "q_lm_score" ->
      raw"""WITH toks AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           |      x -> len(x) > 0) AS t
           |  FROM documents),
           |tb AS (
           |  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
           |  FROM toks, unnest(CASE WHEN len(t) >= 2
           |    THEN generate_series(1, len(t) - 1) ELSE [] END) AS u(i)),
           |trn AS (SELECT * FROM tb WHERE doc_id % 5 <> 0),
           |pc AS (SELECT w1, w2, count(*) AS c12 FROM trn GROUP BY 1, 2),
           |cc AS (SELECT w1, count(*) AS c1 FROM trn GROUP BY 1),
           |v AS (SELECT count(DISTINCT w2) AS v FROM trn),
           |sc AS (
           |  SELECT b.doc_id,
           |    ln((coalesce(pc.c12, 0) + 0.1) / (coalesce(cc.c1, 0) + 0.1 * v.v)) AS lp
           |  FROM tb b
           |  LEFT JOIN pc ON b.w1 = pc.w1 AND b.w2 = pc.w2
           |  LEFT JOIN cc ON b.w1 = cc.w1
           |  CROSS JOIN v
           |  WHERE b.doc_id % 5 = 0)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  round(sum(lp) / count(*), 9) AS avg_logp
           |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_adaptive_quality" ->
      raw"""WITH qc AS (
           |  SELECT doc_id, source,
           |    least(CAST(len(text) AS DOUBLE) / 200.0, 1.0) AS len_score,
           |    CASE WHEN len(text) > 0
           |      THEN CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) AS DOUBLE) / len(text)
           |      ELSE 0.0 END AS punct_ratio,
           |    CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) > 0
           |      THEN CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           |             t -> t IN ('the','and','of','to','a','in','is','it','that','for',
           |                        'on','with','as','was','at','by','an','be','this','are'))) AS DOUBLE)
           |           / len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0))
           |      ELSE 0.0 END AS stop_ratio
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, source,
           |    (len_score + greatest(1.0 - punct_ratio * 5, 0.0) + least(stop_ratio * 4, 1.0)) / 3 AS quality
           |  FROM qc),
           |thr AS (
           |  SELECT source, quantile_cont(quality, 0.25) AS t FROM q GROUP BY source)
           |SELECT q.doc_id, q.source
           |FROM q JOIN thr ON q.source = thr.source
           |WHERE q.quality >= thr.t
           |ORDER BY q.doc_id""".stripMargin,

    // the whole chain restated: components (recursive CTE) → keep-list
    // → quality cut → contamination drop → split → pack
    // mirrors the Spark decision tree stage for stage; the MinHash /
    // band arithmetic is the same restatement q_incr_dedup validates
    "q_incr_curation" ->
      raw"""${TextQueries.toksCte},
           |qc AS (
           |  SELECT doc_id,
           |    least(CAST(len(text) AS DOUBLE) / 200.0, 1.0) AS len_score,
           |    CASE WHEN len(text) > 0
           |      THEN CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) AS DOUBLE) / len(text)
           |      ELSE 0.0 END AS punct_ratio,
           |    CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) > 0
           |      THEN CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           |             t -> t IN ('the','and','of','to','a','in','is','it','that','for',
           |                        'on','with','as','was','at','by','an','be','this','are'))) AS DOUBLE)
           |           / len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0))
           |      ELSE 0.0 END AS stop_ratio
           |  FROM documents WHERE doc_id % 3 = 0),
           |q AS (
           |  SELECT doc_id,
           |    (len_score + greatest(1.0 - punct_ratio * 5, 0.0) + least(stop_ratio * 4, 1.0)) / 3 AS quality
           |  FROM qc),
           |nw AS (
           |  SELECT doc_id, CAST(len(list_filter(__t, x -> x <> '')) AS BIGINT) AS n_words
           |  FROM __tok WHERE doc_id % 3 = 0),
           |gated AS (
           |  SELECT q.doc_id,
           |    NOT (nw.n_words >= 30 AND nw.n_words <= 100000 AND q.quality >= 0.65)
           |      AS low_quality
           |  FROM q JOIN nw USING (doc_id)),
           |sig AS (
           |  SELECT doc_id, ${TextQueries.sig12} AS sig
           |  FROM (SELECT doc_id, ${TextQueries.shingles3} AS __sh FROM __tok)),
           |banded AS (
           |  SELECT doc_id, b,
           |    md5(array_to_string(sig[b*2+1:b*2+2], '|')) AS band_key
           |  FROM sig, unnest([0,1,2,3,4,5]) AS u(b)),
           |surv AS (SELECT doc_id FROM gated WHERE NOT low_quality),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_match,
           |    'corpus' AS src
           |  FROM banded a JOIN banded b
           |    ON a.b = b.b AND a.band_key = b.band_key
           |  WHERE a.doc_id IN (SELECT doc_id FROM surv) AND b.doc_id % 3 <> 0
           |  UNION ALL
           |  SELECT DISTINCT b.doc_id AS id_new, a.doc_id AS id_match,
           |    'batch' AS src
           |  FROM banded a JOIN banded b
           |    ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
           |  WHERE a.doc_id IN (SELECT doc_id FROM surv)
           |    AND b.doc_id IN (SELECT doc_id FROM surv)),
           |sh AS (SELECT doc_id, ${TextQueries.shingles3} AS sh FROM __tok),
           |conf AS (
           |  SELECT c.id_new, c.id_match, c.src,
           |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           |      / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
           |  FROM cand c
           |  JOIN sh x ON x.doc_id = c.id_new
           |  JOIN sh y ON y.doc_id = c.id_match),
           |dup_corpus AS (
           |  SELECT DISTINCT id_new AS doc_id FROM conf
           |  WHERE src = 'corpus' AND jaccard >= 0.8),
           |dup_batch AS (
           |  SELECT DISTINCT id_new AS doc_id FROM conf
           |  WHERE src = 'batch' AND jaccard >= 0.8
           |    AND id_match NOT IN (SELECT doc_id FROM dup_corpus)),
           |tok_n AS (
           |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
           |  FROM documents WHERE doc_id % 3 = 0)
           |SELECT g.doc_id,
           |  CASE WHEN g.low_quality THEN 'low_quality'
           |       WHEN g.doc_id IN (SELECT doc_id FROM dup_corpus) THEN 'dup_corpus'
           |       WHEN g.doc_id IN (SELECT doc_id FROM dup_batch) THEN 'dup_batch'
           |       ELSE 'accepted' END AS status,
           |  t.n_tokens
           |FROM gated g JOIN tok_n t USING (doc_id)
           |ORDER BY doc_id""".stripMargin,

    "q_curation_e2e" ->
      raw"""${TextQueries.toksCte.replaceFirst("WITH", "WITH RECURSIVE")},
           |sig AS (
           |  SELECT doc_id, ${TextQueries.sig12} AS sig
           |  FROM (SELECT doc_id, ${TextQueries.shingles3} AS __sh FROM __tok)),
           |banded AS (
           |  SELECT doc_id, b,
           |    md5(array_to_string(sig[b*2+1:b*2+2], '|')) AS band_key
           |  FROM sig, unnest([0,1,2,3,4,5]) AS u(b)),
           |pairs AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM banded a JOIN banded b
           |    ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
           |lab AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
           |qc AS (
           |  SELECT doc_id,
           |    least(CAST(len(text) AS DOUBLE) / 200.0, 1.0) AS len_score,
           |    CASE WHEN len(text) > 0
           |      THEN CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) AS DOUBLE) / len(text)
           |      ELSE 0.0 END AS punct_ratio,
           |    CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) > 0
           |      THEN CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           |             t -> t IN ('the','and','of','to','a','in','is','it','that','for',
           |                        'on','with','as','was','at','by','an','be','this','are'))) AS DOUBLE)
           |           / len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0))
           |      ELSE 0.0 END AS stop_ratio
           |  FROM documents),
           |q AS (
           |  SELECT doc_id,
           |    (len_score + greatest(1.0 - punct_ratio * 5, 0.0) + least(stop_ratio * 4, 1.0)) / 3 AS quality
           |  FROM qc),
           |keep AS (
           |  SELECT id FROM (
           |    SELECT lab.id, ROW_NUMBER() OVER (PARTITION BY lab.rep
           |      ORDER BY q.quality DESC, lab.id) AS rn
           |    FROM lab JOIN q ON q.doc_id = lab.id)
           |  WHERE rn = 1),
           |losers AS (SELECT id FROM lab WHERE id NOT IN (SELECT id FROM keep)),
           |corpus AS (
           |  SELECT d.doc_id, d.source, d.text
           |  FROM documents d JOIN q ON q.doc_id = d.doc_id
           |  WHERE d.doc_id NOT IN (SELECT id FROM losers)
           |    AND q.quality >= 0.65 AND d.doc_id % 50 <> 0),
           |bench AS (
           |  SELECT DISTINCT unnest(${grams(toksLower, 8)}) AS gram
           |  FROM documents WHERE doc_id % 50 = 0),
           |contam AS (
           |  SELECT DISTINCT cg.doc_id
           |  FROM (SELECT doc_id, unnest(${grams(toksLower, 8)}) AS gram FROM corpus) cg
           |  JOIN bench USING (gram)),
           |clean AS (
           |  SELECT doc_id, source, text FROM corpus
           |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
           |spl AS (
           |  SELECT doc_id, source,
           |    CASE WHEN bucket < 90 THEN 'train'
           |         WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
           |    CAST(len($toks) AS BIGINT) AS n_tokens
           |  FROM (SELECT *,
           |    CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket
           |    FROM clean)),
           |c AS (
           |  SELECT doc_id, source, split, n_tokens,
           |    SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM spl)
           |SELECT doc_id, source, split, n_tokens,
           |  CAST(FLOOR((cum - n_tokens) / 256) AS BIGINT) AS pack_id
           |FROM c ORDER BY doc_id""".stripMargin,

    // stride 56 = 64 − 8; chunk i covers tokens [i*56+1 .. i*56+64]
    "q_chunk_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |                x -> len(x) > 0) AS toks
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, toks, len(toks) AS n_toks,
         |    CAST(ceil(CAST(greatest(len(toks) - 8, 1) AS DOUBLE) / 56) AS INT) AS n_chunks
         |  FROM t),
         |c AS (
         |  SELECT doc_id, toks, CAST(u.i AS BIGINT) AS chunk_id
         |  FROM n, unnest(range(0, n_chunks)) AS u(i))
         |SELECT doc_id, chunk_id,
         |  CAST(len(toks[chunk_id*56+1:chunk_id*56+64]) AS BIGINT) AS chunk_tokens,
         |  md5(array_to_string(toks[chunk_id*56+1:chunk_id*56+64], ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_passage_bm25" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |                x -> len(x) > 0) AS toks
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, toks,
         |    CAST(ceil(CAST(greatest(len(toks) - 8, 1) AS DOUBLE) / 56) AS INT) AS n_chunks
         |  FROM t),
         |ch AS (
         |  SELECT doc_id * 1000 + CAST(u.i AS BIGINT) AS pid,
         |    toks[u.i*56+1 : u.i*56+64] AS ctoks
         |  FROM n, unnest(range(0, n_chunks)) AS u(i)),
         |tk AS (SELECT pid, unnest(ctoks) AS term FROM ch),
         |dl AS (SELECT pid, COUNT(*) AS dl FROM tk GROUP BY 1),
         |stats AS (SELECT COUNT(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |tf AS (
         |  SELECT pid, term, COUNT(*) AS tf FROM tk
         |  WHERE term IN ('hash', 'join', 'stream') GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(DISTINCT pid) AS df FROM tf GROUP BY 1),
         |parts AS (
         |  SELECT t.pid, t.term, t.tf,
         |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |      * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS part
         |  FROM tf t JOIN dfq d USING (term) JOIN dl l USING (pid)
         |  CROSS JOIN stats s),
         |scored AS (
         |  SELECT pid,
         |    coalesce(SUM(CASE WHEN term = 'hash' THEN part END), 0)
         |      + coalesce(SUM(CASE WHEN term = 'join' THEN part END), 0)
         |      + coalesce(SUM(CASE WHEN term = 'stream' THEN part END), 0) AS score,
         |    COUNT(*) AS matched_terms,
         |    CAST(SUM(tf) AS BIGINT) AS matched_tf
         |  FROM parts GROUP BY pid)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY round(score, 9) DESC, pid) AS BIGINT) AS rank,
         |  pid // 1000 AS doc_id, pid % 1000 AS chunk_id,
         |  matched_terms, matched_tf, round(score, 9) AS score_r9
         |FROM scored ORDER BY round(score, 9) DESC, pid LIMIT 10""".stripMargin,

    "q_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, source FROM b
        |WHERE bucket < CASE source WHEN 'src0' THEN 80
        |                           WHEN 'src1' THEN 10
        |                           ELSE 30 END
        |ORDER BY doc_id""".stripMargin,

    "q_source_mix" ->
      """WITH tgt(src, pct) AS (VALUES ('src0', 50), ('src1', 30), ('src2', 20)),
        |cnt AS (
        |  SELECT source, COUNT(*) AS c, pct
        |  FROM documents JOIN tgt ON source = src GROUP BY source, pct),
        |feas AS (SELECT min(floor(c * 100 / pct)) AS n FROM cnt),
        |rates AS (
        |  SELECT source, floor(floor(n * pct / 100) * 1000000 / c) AS ppm
        |  FROM cnt CROSS JOIN feas)
        |SELECT doc_id, source FROM documents JOIN rates USING (source)
        |WHERE CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 1000000 < ppm
        |ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      s"""WITH bench AS (
         |  SELECT DISTINCT unnest(${grams(toksLower, 8)}) AS gram
         |  FROM documents WHERE doc_id % 50 = 0),
         |corpus AS (
         |  SELECT doc_id, unnest(${grams(toksLower, 8)}) AS gram
         |  FROM documents WHERE doc_id % 50 <> 0)
         |SELECT c.doc_id, COUNT(DISTINCT c.gram) AS n_shared
         |FROM corpus c JOIN bench b ON b.gram = c.gram
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    "q_repetition" ->
      raw"""WITH src AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 9 = 0
         |      THEN text || repeat(' badger mushroom snake', 8) ELSE text END AS text
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(${toksLower}) >= 5
         |      THEN list_transform(range(1, len(${toksLower}) - 3),
         |             i -> array_to_string((${toksLower})[i:i+4], ' '))
         |      ELSE [] END AS gs
         |  FROM src)
         |SELECT doc_id,
         |  CASE WHEN len(gs) > 0
         |    THEN 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs)
         |    ELSE 0.0 END AS dup5_ratio
         |FROM g ORDER BY doc_id""".stripMargin,

    "q_pii_redact" ->
      raw"""WITH src AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0
         |      THEN text || ' contact: user' || doc_id || '@example.com for details'
         |      ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         |  md5(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')) AS redacted_md5
         |FROM src ORDER BY doc_id""".stripMargin,

    // kernel-vs-fold equality and the token-count sandwich are
    // theorems of a correct encoder over ANY corpus and merge table —
    // the oracle asserts them per doc; a kernel/fold divergence or a
    // lost/duplicated token flips a row red
    "q_bpe_encode" ->
      """SELECT doc_id, TRUE AS matches_fold, TRUE AS tokens_within_bounds
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_epoch_shuffle" -> SamplingSql.epochShuffleOracle(epoch = 3, nShards = 8),

    "q_weighted_upsample" -> SamplingSql.weightedUpsampleOracle(salt = 7L),

    "q_training_mix_e2e" ->
      SamplingSql.trainingMixOracle(salt = 7L, epoch = 5, nShards = 4),

    // Spark casts double→long by truncation, DuckDB // is floor — equal
    // for the non-negative n_chars. NULLIF mirrors the Spark side's
    // fr→NULL quasi derivation (the null-group parity pin).
    "q_k_anonymize" ->
      """WITH d AS (
        |  SELECT doc_id, NULLIF(lang, 'fr') AS lang, source,
        |    CAST(n_chars // 200 AS BIGINT) AS len_bucket
        |  FROM documents),
        |g AS (
        |  SELECT *, count(*) OVER
        |    (PARTITION BY lang, source, len_bucket) AS group_size
        |  FROM d)
        |SELECT doc_id, lang, source, len_bucket, group_size
        |FROM g WHERE group_size >= 5 ORDER BY doc_id""".stripMargin,

    // group-then-join (not a window): DuckDB can't window
    // COUNT(DISTINCT); IS NOT DISTINCT FROM mirrors the null-safe <=>
    "q_l_diversity" ->
      """WITH d AS (
        |  SELECT doc_id, NULLIF(lang, 'fr') AS lang, source,
        |    CAST(n_chars // 200 AS BIGINT) AS len_bucket
        |  FROM documents),
        |g AS (
        |  SELECT source AS gsource, len_bucket AS glen,
        |    COUNT(*) AS group_size, COUNT(DISTINCT lang) AS n_sensitive
        |  FROM d GROUP BY gsource, glen)
        |SELECT d.doc_id, d.lang, d.source, d.len_bucket,
        |  g.group_size, g.n_sensitive
        |FROM d JOIN g ON d.source IS NOT DISTINCT FROM g.gsource
        |  AND d.len_bucket IS NOT DISTINCT FROM g.glen
        |WHERE g.n_sensitive >= 3 ORDER BY doc_id""".stripMargin,

    // the TV fold runs over the cat-sorted term list in BOTH engines
    // (list(... ORDER BY cat) == Spark's sort_array + aggregate fold;
    // the sequential-double dot-product precedent), rounded to 9 dp
    // before the inclusive <= t compare
    "q_t_closeness" ->
      """WITH d AS (
        |  SELECT doc_id, NULLIF(lang, 'fr') AS lang, source,
        |    CAST(n_chars // 200 AS BIGINT) AS len_bucket
        |  FROM documents),
        |nn AS (SELECT * FROM d WHERE lang IS NOT NULL),
        |q AS (
        |  SELECT lang AS cat,
        |    CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM nn) AS qp
        |  FROM nn GROUP BY lang),
        |gn AS (
        |  SELECT source, len_bucket, COUNT(lang) AS n, COUNT(*) AS nt
        |  FROM d GROUP BY source, len_bucket
        |  HAVING COUNT(lang) > 0),
        |gc AS (
        |  SELECT source, len_bucket, lang AS cat, COUNT(*) AS c
        |  FROM nn GROUP BY source, len_bucket, lang),
        |terms AS (
        |  SELECT gn.source, gn.len_bucket, gn.nt, q.cat, q.qp,
        |    CAST(COALESCE(gc.c, 0) AS DOUBLE) / gn.n AS pp
        |  FROM gn CROSS JOIN q
        |  LEFT JOIN gc ON gc.source IS NOT DISTINCT FROM gn.source
        |    AND gc.len_bucket IS NOT DISTINCT FROM gn.len_bucket
        |    AND gc.cat = q.cat),
        |dist AS (
        |  SELECT source AS gsource, len_bucket AS glen,
        |    MIN(nt) AS group_size,
        |    round(list_sum(list(abs(pp - qp) ORDER BY cat)) / 2.0, 9) AS tv_dist
        |  FROM terms GROUP BY gsource, glen)
        |SELECT d.doc_id, d.lang, d.source, d.len_bucket,
        |  dist.group_size, dist.tv_dist
        |FROM d JOIN dist ON d.source IS NOT DISTINCT FROM dist.gsource
        |  AND d.len_bucket IS NOT DISTINCT FROM dist.glen
        |WHERE dist.tv_dist <= 0.15 ORDER BY doc_id""".stripMargin,

    "q_url_normalize" ->
      raw"""WITH $urlCtes
           |SELECT doc_id, url, url_norm, $domainSql AS domain
           |FROM n ORDER BY doc_id""".stripMargin,

    "q_url_dedup" ->
      raw"""WITH $urlCtes
           |SELECT doc_id, url_norm FROM n
           |QUALIFY ROW_NUMBER() OVER (PARTITION BY url_norm ORDER BY doc_id) = 1
           |ORDER BY doc_id""".stripMargin,

    // the oracle pays the full per-domain window sort the operator's
    // argmax-k aggregate avoids — identical survivors prove the
    // aggregate's (score DESC, id ASC) contract
    "q_domain_cap" ->
      raw"""WITH $urlCtes,
           |d AS (SELECT doc_id, n_chars, $domainSql AS domain FROM n)
           |SELECT doc_id, domain, n_chars FROM d
           |QUALIFY ROW_NUMBER() OVER (PARTITION BY domain
           |  ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) <= 15
           |ORDER BY doc_id""".stripMargin,

    // the three rails chained as CTEs: window k-filter, group-join
    // l-filter, then the q_t_closeness TV derivation over the
    // l-SURVIVING release (its own global distribution — the frame a
    // pipeline would publish)
    "q_privacy_e2e" ->
      """WITH d AS (
        |  SELECT doc_id, NULLIF(lang, 'fr') AS lang, source,
        |    CAST(n_chars // 200 AS BIGINT) AS len_bucket
        |  FROM documents),
        |ka AS (
        |  SELECT * FROM (
        |    SELECT *, count(*) OVER
        |      (PARTITION BY source, len_bucket) AS k_size
        |    FROM d) WHERE k_size >= 5),
        |ldg AS (
        |  SELECT source AS gs, len_bucket AS gl,
        |    COUNT(*) AS l_size, COUNT(DISTINCT lang) AS l_distinct
        |  FROM ka GROUP BY gs, gl),
        |ld AS (
        |  SELECT ka.*, g.l_size, g.l_distinct
        |  FROM ka JOIN ldg g ON ka.source IS NOT DISTINCT FROM g.gs
        |    AND ka.len_bucket IS NOT DISTINCT FROM g.gl
        |  WHERE g.l_distinct >= 3),
        |nn AS (SELECT * FROM ld WHERE lang IS NOT NULL),
        |q AS (
        |  SELECT lang AS cat,
        |    CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM nn) AS qp
        |  FROM nn GROUP BY lang),
        |gn AS (
        |  SELECT source, len_bucket, COUNT(lang) AS n, COUNT(*) AS nt
        |  FROM ld GROUP BY source, len_bucket
        |  HAVING COUNT(lang) > 0),
        |gc AS (
        |  SELECT source, len_bucket, lang AS cat, COUNT(*) AS c
        |  FROM nn GROUP BY source, len_bucket, lang),
        |terms AS (
        |  SELECT gn.source, gn.len_bucket, gn.nt, q.cat, q.qp,
        |    CAST(COALESCE(gc.c, 0) AS DOUBLE) / gn.n AS pp
        |  FROM gn CROSS JOIN q
        |  LEFT JOIN gc ON gc.source IS NOT DISTINCT FROM gn.source
        |    AND gc.len_bucket IS NOT DISTINCT FROM gn.len_bucket
        |    AND gc.cat = q.cat),
        |dist AS (
        |  SELECT source AS gsource, len_bucket AS glen,
        |    MIN(nt) AS t_size,
        |    round(list_sum(list(abs(pp - qp) ORDER BY cat)) / 2.0, 9) AS tv_dist
        |  FROM terms GROUP BY gsource, glen)
        |SELECT ld.doc_id, ld.lang, ld.source, ld.len_bucket, ld.k_size,
        |  ld.l_size, ld.l_distinct, dist.t_size, dist.tv_dist
        |FROM ld JOIN dist ON ld.source IS NOT DISTINCT FROM dist.gsource
        |  AND ld.len_bucket IS NOT DISTINCT FROM dist.glen
        |WHERE dist.tv_dist <= 0.15 ORDER BY doc_id""".stripMargin,

    // ordered EMD: prefix sums over the cat-sorted diff list as slice
    // folds (lst[1:i] is a sequential left fold — the same structure
    // Spark's aggregate-over-slice runs), |prefix| folded in list
    // order, /(m-1), round 9
    "q_t_closeness_ord" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    CAST(n_chars // 200 AS BIGINT) AS len_bucket
        |  FROM documents),
        |nn AS (SELECT * FROM d WHERE len_bucket IS NOT NULL),
        |q AS (
        |  SELECT len_bucket AS cat,
        |    CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM nn) AS qp
        |  FROM nn GROUP BY len_bucket),
        |gn AS (
        |  SELECT source, lang, COUNT(len_bucket) AS n, COUNT(*) AS nt
        |  FROM d GROUP BY source, lang
        |  HAVING COUNT(len_bucket) > 0),
        |gc AS (
        |  SELECT source, lang, len_bucket AS cat, COUNT(*) AS c
        |  FROM nn GROUP BY source, lang, len_bucket),
        |terms AS (
        |  SELECT gn.source, gn.lang, gn.nt, q.cat, q.qp,
        |    CAST(COALESCE(gc.c, 0) AS DOUBLE) / gn.n AS pp
        |  FROM gn CROSS JOIN q
        |  LEFT JOIN gc ON gc.source IS NOT DISTINCT FROM gn.source
        |    AND gc.lang IS NOT DISTINCT FROM gn.lang
        |    AND gc.cat = q.cat),
        |agg AS (
        |  SELECT source AS gsource, lang AS glang, MIN(nt) AS group_size,
        |    list(pp - qp ORDER BY cat) AS lst
        |  FROM terms GROUP BY gsource, glang),
        |dist AS (
        |  SELECT gsource, glang, group_size,
        |    CASE WHEN len(lst) = 1 THEN 0.0 ELSE
        |      round(list_sum(list_transform(
        |        list_transform(range(1, len(lst) + 1), i -> list_sum(lst[1:i])),
        |        c -> abs(c))) / CAST(len(lst) - 1 AS DOUBLE), 9) END AS emd_dist
        |  FROM agg)
        |SELECT d.doc_id, d.lang, d.source, d.len_bucket,
        |  dist.group_size, dist.emd_dist
        |FROM d JOIN dist ON d.source IS NOT DISTINCT FROM dist.gsource
        |  AND d.lang IS NOT DISTINCT FROM dist.glang
        |WHERE dist.emd_dist <= 0.12 ORDER BY doc_id""".stripMargin,
  )
}

/** Value-exact DuckDB restatements of the [[graft.ops.Sampling]]
  * operators: the shuffle/coin keys are xxhash64 chains over LongType
  * inputs, replayed step-for-step through [[XxhashSql.hashLong]]. Each
  * building block is a self-contained SELECT so the operators COMPOSE
  * — the training-mix oracle chains upsample → composite id → shuffle
  * exactly as the Spark query chains the ops. */
private object SamplingSql {
  import XxhashSql.{Prog, hashLong, signed, unsigned}

  /** (carry..., idCol, shuffle_key) — the xxhash64(id, lit) chain:
    * hashLong(lit, hashLong(id, 42)) over any row source. The literal
    * splices as its UNSIGNED decimal rendering — Spark hashes the
    * two's-complement bit pattern, and the XXH64 SQL arithmetic
    * assumes unsigned words, so a negative salt/epoch spliced signed
    * would silently diverge from Spark. */
  private def keyedChain(from: String, idCol: String, litArg: Long,
                         carry: Seq[String]): String = {
    val cols = (carry :+ idCol).distinct.mkString(", ")
    val p = new Prog(s"SELECT $cols, ${unsigned(idCol)} AS u FROM ($from)")
    val h1 = hashLong(p, "u", "42")
    val xx = hashLong(p, java.lang.Long.toUnsignedString(litArg), h1)
    p.render(s"$cols, ${signed(xx)} AS shuffle_key")
  }

  /** Epoch-shuffle block over any row source: adds shuffle_key, shard,
    * pos_in_shard (signed pmod + per-shard row_number — the exact
    * Sampling.epochShuffle arithmetic). */
  private def shuffled(from: String, idCol: String, epoch: Int,
                       nShards: Int, carry: Seq[String]): String = {
    val cols = (carry :+ idCol).distinct.mkString(", ")
    s"""SELECT $cols, shuffle_key, shard,
       |  ROW_NUMBER() OVER (PARTITION BY shard
       |    ORDER BY shuffle_key, $idCol) AS pos_in_shard
       |FROM (
       |  SELECT *,
       |    CAST(((shuffle_key % $nShards) + $nShards) % $nShards AS INTEGER) AS shard
       |  FROM (${keyedChain(from, idCol, epoch.toLong, carry)}))""".stripMargin
  }

  def epochShuffleOracle(epoch: Int, nShards: Int): String =
    s"""SELECT doc_id, shuffle_key, shard, pos_in_shard FROM (
       |${shuffled("SELECT doc_id FROM documents", "doc_id", epoch, nShards, Nil)})
       |ORDER BY shard, pos_in_shard""".stripMargin

  /** (doc_id, rep, weight) — same weight derivation as the Spark query
    * (exact binary doubles: 0.25 + (idx%4)·0.75), the same integer
    * coin (top 53 key bits vs floor(frac·2^53)), and
    * unnest(range(0, copies)) — which drops copies=0 rows exactly like
    * the Spark filter. */
  private def upsampleSql(salt: Long): String = {
    val keyed = keyedChain("SELECT doc_id FROM documents", "doc_id", salt, Nil)
    s"""SELECT doc_id, unnest(range(0, copies)) AS rep, weight FROM (
       |  SELECT doc_id, weight,
       |    CAST(floor(weight) AS BIGINT) +
       |      CASE WHEN u53 < CAST(floor((weight - floor(weight))
       |        * 9007199254740992e0) AS BIGINT) THEN 1 ELSE 0 END AS copies
       |  FROM (
       |    SELECT d.doc_id,
       |      CAST(0.25 + (CAST(substr(d.source, 4) AS INTEGER) % 4) * 0.75
       |        AS DOUBLE) AS weight,
       |      ${unsigned("k.shuffle_key")} // 2048 AS u53
       |    FROM documents d JOIN ($keyed) k USING (doc_id)))""".stripMargin
  }

  def weightedUpsampleOracle(salt: Long): String =
    s"""SELECT doc_id, rep, weight FROM (${upsampleSql(salt)})
       |ORDER BY doc_id, rep""".stripMargin

  /** Upsample → composite sample id (doc_id·8 + rep; rep < 8 is
    * ENFORCED on the Spark side by the maxWeight = 7 rail) → epoch
    * shuffle, mirroring the Spark chain. */
  def trainingMixOracle(salt: Long, epoch: Int, nShards: Int): String = {
    val samples =
      s"SELECT doc_id, rep, doc_id * 8 + rep AS sample_id FROM (${upsampleSql(salt)})"
    s"""SELECT sample_id, doc_id, rep, shard, pos_in_shard FROM (
       |${shuffled(samples, "sample_id", epoch, nShards, Seq("doc_id", "rep"))})
       |ORDER BY shard, pos_in_shard""".stripMargin
  }
}
