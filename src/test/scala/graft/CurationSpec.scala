package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Curation-operator semantics: split determinism + dup co-location,
  * packing budget arithmetic, contamination planting, repetition
  * closed form. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket: deterministic, content-based — exact dups share a split") {
    val df = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"))
      .toDF("id", "text")
    val got = df.select(col("id"), Curation.hashBucket(col("text"), 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === got(2L), "identical content must share a bucket")
    assert((0L until 100L).contains(got(3L)))
    // stable across evaluations
    val again = df.select(Curation.hashBucket(col("text"), 100))
      .collect().map(_.getLong(0))
    assert(again.toSeq === Seq(got(1L), got(2L), got(3L)))
  }

  test("packBins: budget boundaries, one cumsum per shard") {
    // tokens 100,100,100,100 with budget 250: cum-before = 0,100,200,300
    // -> packs 0,0,0,1
    val df = (1 to 4).map(i => (i.toLong, "s", 100L))
      .toDF("doc_id", "source", "n_tokens")
    val got = Curation.packBins(df, col("source"), Seq(col("doc_id")),
        col("n_tokens"), budget = 250)
      .orderBy("doc_id").select("pack_id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L, 0L, 0L, 1L))
  }

  test("contamination: planted overlap found, clean docs absent") {
    val bench = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx one two three four five six seven eight yy"), // shares 8-gram
      (2L, "totally unrelated words with no overlap at all here")
    ).toDF("doc_id", "text")
    val got = Curation.contamination(corpus, "doc_id", "text", bench, "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(1L) && got(1L) >= 1)
    assert(!got.contains(2L))
  }

  test("packBins property: every pack holds <= budget + one overshoot doc") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map(i =>
        (i.toLong, s"s${i % 5}", (rnd.nextInt(200) + 1).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val budget = 500
    val packs = Curation.packBins(df, col("source"), Seq(col("doc_id")),
        col("n_tokens"), budget)
      .groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("biggest"))
      .collect()
    packs.foreach { r =>
      assert(r.getAs[Long]("tok") <= budget + r.getAs[Long]("biggest"),
        s"pack over budget+overshoot: $r")
    }
    // packs are dense 0..max per source
    val perSource = Curation.packBins(df, col("source"), Seq(col("doc_id")),
        col("n_tokens"), budget)
      .groupBy("source").agg(countDistinct("pack_id").as("n"),
        max("pack_id").as("mx")).collect()
    perSource.foreach(r =>
      assert(r.getAs[Long]("n") === r.getAs[Long]("mx") + 1, s"gap in packs: $r"))
  }

  test("hashBucket property: buckets in range and roughly uniform") {
    val df = (1 to 2000).map(i => Tuple1(s"document number $i with content"))
      .toDF("text")
    val counts = df.select(Curation.hashBucket(col("text"), 10).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet.forall(b => b >= 0 && b < 10))
    // 2000 docs over 10 buckets: each bucket within a loose 3x band
    counts.values.foreach(c => assert(c > 60 && c < 600, counts.toString))
  }

  test("refreshDispositions: every branch binds; gates run first; one-level dup_batch rule") {
    // corpus: A (exact-dup target) and X (a 200-token doc with unique
    // tokens, so isolated single-token changes perturb exactly 3
    // shingles each and 3-gram Jaccards are exact closed forms)
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val xToks = (0 until 200).map(i => s"x$i")
    def repl(base: Seq[String], changes: Map[Int, String]) =
      base.zipWithIndex.map { case (t, i) => changes.getOrElse(i, t) }.mkString(" ")
    // a: 4 isolated changes vs X  -> jac(a,X) = 186/210 ≈ 0.886 >= 0.8
    // b: 4 more isolated changes  -> jac(b,a) ≈ 0.886, but
    //    jac(b,X) = 174/222 ≈ 0.784 < 0.8 — near its corpus-dup
    //    NEIGHBOR, not near the corpus itself
    val aT = repl(xToks, Map(20 -> "p0", 40 -> "p1", 80 -> "p2", 120 -> "p3"))
    val bT = repl(aT.split(" ").toSeq,
      Map(30 -> "q0", 60 -> "q1", 100 -> "q2", 160 -> "q3"))
    val D = "dog cat fish bird lion tiger bear wolf fox deer"
    val E = "one lone unique document with entirely fresh wording here"

    val corpus = Seq((100L, A), (102L, xToks.mkString(" "))).toDF("id", "text")
    val batch = Seq(
      (1L, A, true),   // low-quality gate fires FIRST — never reaches dedup
      (2L, A, false),  // exact corpus dup
      (4L, D, false),  // smaller id of a batch pair -> accepted
      (5L, D, false),  // larger id, match 4 is a clean survivor -> dup_batch
      (6L, E, false),  // unique -> accepted
      (7L, aT, false), // near-dup of corpus X -> dup_corpus
      (8L, bT, false)  // near-dup of 7 ONLY, and 7 is a corpus dup ->
                       // accepted (one-level rule: chain resolves next cycle)
    ).toDF("id", "text", "lq")
    val bands = graft.ops.Dedup.bandIndex(corpus, "id", "text")
    val got = Curation.refreshDispositions(batch, "id", "text", "lq",
        corpus, bands)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "low_quality", 2L -> "dup_corpus",
      4L -> "accepted", 5L -> "dup_batch", 6L -> "accepted",
      7L -> "dup_corpus", 8L -> "accepted"))
  }

  test("dupNgramRatio: closed form on constructed repetition") {
    // 6 tokens "a b a b a b": 5-grams = "a b a b a", "b a b a b" -> 2
    // distinct of 2 -> ratio 0; "a a a a a a": grams both "a a a a a"
    // -> 1 distinct of 2 -> ratio 0.5; short text -> 0
    val df = Seq((1L, "a b a b a b"), (2L, "a a a a a a"), (3L, "tiny"),
        (4L, "\ta b c d e"))  // leading tab: kernel keeps the empty token
      .toDF("id", "text")
    val got = Curation.withDupNgramRatio(df, col("text"), 5, "r")
      .select(col("id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === 0.5)
    assert(got(3L) === 0.0)
    // regression: denominator uses the kernel's tokenizer, so the ratio
    // stays in [0, 1] even when leading whitespace yields empty tokens
    assert(got(4L) >= 0.0 && got(4L) <= 1.0)
  }

  test("stratifiedSample: integer-percent cut, deterministic, per-stratum") {
    val df = (1 to 1000).map(i => (i.toLong, s"s${i % 2}", s"content $i"))
      .toDF("id", "stratum", "text")
    val kept = Curation.stratifiedSample(df, col("stratum"), col("text"),
      ratesPct = Map("s0" -> 100, "s1" -> 0), defaultPct = 50)
    val bySt = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySt("s0") === 500)        // 100% of stratum s0
    assert(!bySt.contains("s1"))      // 0% of stratum s1
    // deterministic across evaluations
    assert(kept.count() === Curation.stratifiedSample(df, col("stratum"),
      col("text"), Map("s0" -> 100, "s1" -> 0), 50).count())
  }

  test("chunkTokens: full coverage, exact overlap, reassembly == original") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 50).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(300))("t" + rnd.nextInt(1000)).mkString(" "))
    }.toDF("id", "text")
    val out = Curation.chunkTokens(df, col("text"), maxTokens = 64, overlap = 8)
      .select(col("id"), col("chunk_id"), col("chunk_text"))
      .collect().groupBy(_.getLong(0))
    df.collect().foreach { r =>
      val id = r.getLong(0)
      val orig = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val chunks = out(id).sortBy(_.getInt(1))
        .map(_.getString(2).split(" ").filter(_.nonEmpty).toSeq)
      // every doc yields >= 1 chunk; all but the last are exactly 64
      assert(chunks.nonEmpty)
      chunks.dropRight(1).foreach(c => assert(c.size === 64))
      // dropping the 8-token carried overlap from every later chunk
      // reassembles the original token stream exactly
      val reassembled = chunks.head ++ chunks.tail.flatMap(_.drop(8))
      assert(reassembled === orig, s"doc $id")
      // consecutive chunks agree on the carried context
      chunks.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b.take(8) === a.takeRight(8), s"doc $id overlap")
        case _ =>
      }
    }
  }

  test("sourceMix: proportions track targets, scarcest source caps the total") {
    // abundant a (4000), abundant b (3000), scarce c (300): targets
    // 50/30/20 make c the bottleneck — feasible N = 300·100/20 = 1500,
    // so c keeps ~all 300 while a and b are sampled DOWN to ~750/~450
    val df = ((1 to 4000).map(i => (i.toLong, "a", s"alpha doc $i")) ++
      (1 to 3000).map(i => ((10000 + i).toLong, "b", s"beta doc $i")) ++
      (1 to 300).map(i => ((20000 + i).toLong, "c", s"gamma doc $i")))
      .toDF("id", "source", "text")
    val kept = Curation.sourceMix(df, col("source"), col("text"),
      targetPct = Map("a" -> 50, "b" -> 30, "c" -> 20))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySrc.values.sum.toDouble
    // hash-uniformity tolerance: ±5 percentage points on each share
    assert(math.abs(bySrc("a") / total - 0.5) < 0.05, s"shares $bySrc")
    assert(math.abs(bySrc("b") / total - 0.3) < 0.05, s"shares $bySrc")
    assert(math.abs(bySrc("c") / total - 0.2) < 0.05, s"shares $bySrc")
    // the scarce source is taken essentially whole, never oversampled
    assert(bySrc("c") <= 300 && bySrc("c") >= 290, s"shares $bySrc")
    // unknown sources drop
    val withJunk = df.union(Seq((99999L, "z", "junk")).toDF("id", "source", "text"))
    assert(Curation.sourceMix(withJunk, col("source"), col("text"),
      Map("a" -> 50, "b" -> 30, "c" -> 20))
      .filter(col("source") === "z").count() === 0)
  }

  test("temperatureMix: alpha=0.5 lifts the scarce source toward uniform, never oversamples") {
    // raw shares 80/20; sqrt weights give p = 2/3 vs 1/3; feasible
    // N = min(4000/(2/3), 1000/(1/3)) = 3000 -> scarce source taken
    // ~whole, abundant sampled down to ~2000
    val df = ((1 to 4000).map(i => (i.toLong, "big", s"doc big $i")) ++
      (1 to 1000).map(i => ((10000 + i).toLong, "small", s"doc small $i")))
      .toDF("id", "source", "text")
    val kept = Curation.temperatureMix(df, col("source"), col("text"), alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    assert(math.abs(kept("small") / total - 1.0 / 3) < 0.05, s"shares $kept")
    assert(kept("small") <= 1000 && kept("small") >= 950, s"$kept")
    // alpha = 1 reproduces ~raw proportions
    val raw = Curation.temperatureMix(df, col("source"), col("text"), alpha = 1.0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rawTotal = raw.values.sum.toDouble
    assert(math.abs(raw("small") / rawTotal - 0.2) < 0.05, s"raw shares $raw")
    // deterministic: content-hash selection, no rand()
    val again = Curation.temperatureMix(df, col("source"), col("text"), alpha = 0.5)
      .count()
    assert(again === total.toLong)
  }

  test("cleanLines: C4 rules — punctuation, min words, blocklists, doc drop") {
    val df = Seq(
      (1L, "Good line one.\nshort.\nno punct here at all\nbad javascript line.\nGood line two!"),
      (2L, "This page mentions lorem ipsum somewhere.\nAnother perfectly fine line."),
      (3L, "Only line.")
    ).toDF("id", "text")
    val out = Curation.cleanLines(df, col("text"),
      Curation.LineRules(minWords = 3, requireTerminalPunct = true,
        lineBlockPhrases = Seq("javascript"), docBlockPhrases = Seq("lorem ipsum"),
        minKeptLines = 1))
    val m = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(!m.contains(2L), "doc-level phrase must drop the whole page")
    assert(!m.contains(3L), "2-word line fails minWords; 0 kept < minKeptLines")
    assert(m(1L).getAs[String]("clean_text") === "Good line one.\nGood line two!")
    assert(m(1L).getAs[Long]("n_lines") === 5L)
    assert(m(1L).getAs[Long]("n_kept") === 2L)
  }

  test("dropGlobalDuplicateLines: corpus-frequent lines vanish everywhere") {
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"unique a\n$boiler\nunique b"),
      (2L, s"$boiler\nunique c"),
      (3L, s"unique d\n$boiler"),
      (4L, "all unique here\nnothing shared")
    ).toDF("id", "text")
    val m = Curation.dropGlobalDuplicateLines(df, "id", "text", minCount = 3)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(m(1L).getAs[String]("clean_text") === "unique a\nunique b")
    assert(m(1L).getAs[Long]("n_dropped") === 1L)
    assert(m(4L).getAs[Long]("n_dropped") === 0L)
    assert(m(4L).getAs[String]("clean_text") === "all unique here\nnothing shared")
    // within-doc repeats count toward the corpus threshold, and a doc
    // whose every line is doomed reassembles to the empty string
    val m2 = Curation.dropGlobalDuplicateLines(
        Seq((1L, "x\nx"), (2L, "x\ny")).toDF("id", "text"), "id", "text",
        minCount = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("clean_text")).toMap
    assert(m2(1L) === "" && m2(2L) === "y")
  }

  test("gopherFlags: each rule binds on a crafted violator") {
    val prose = (1 to 55).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (1L, s"$prose the and of that"),                     // passes everything
      (2L, "the and of tiny"),                             // too few words
      (3L, (1 to 53).map(_ => "a").mkString(" ") + " the of"), // mean len < 3
      (4L, s"$prose the of " + (1 to 8).map(_ => "#").mkString(" ")), // symbols
      (5L, s"$prose the of " + (1 to 16).map(_ => "123").mkString(" ")), // alpha
      (6L, prose),                                         // no stopwords
      (7L, (1 to 12).map(i => s"- bullet line $i").mkString("\n") +
        s"\n$prose the and")                               // >90% bullet lines
    ).toDF("id", "text")
    val m = Curation.gopherFlags(df, col("text"), minWords = 50)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(m(1L).getAs[Boolean]("gopher_pass"), m(1L).toString)
    assert(!m(2L).getAs[Boolean]("flag_word_count"))
    assert(!m(3L).getAs[Boolean]("flag_mean_word_len"))
    assert(!m(4L).getAs[Boolean]("flag_symbol_ratio"))
    assert(!m(5L).getAs[Boolean]("flag_alpha_words"))
    assert(!m(6L).getAs[Boolean]("flag_stopwords"))
    assert(!m(7L).getAs[Boolean]("flag_bullet_lines"))
    (2L to 7L).foreach(i => assert(!m(i).getAs[Boolean]("gopher_pass"), s"doc $i"))
  }

  test("adaptiveQualityFilter: threshold is per-group, not global") {
    // group lo scores 0.0-0.9, group hi scores 10.0-10.9: a global 25%
    // cut would drop ALL of lo and NONE of hi; the adaptive cut drops
    // the bottom quartile of EACH
    val df = ((0 to 9).map(i => (i.toLong, "lo", i / 10.0)) ++
      (0 to 9).map(i => ((100 + i).toLong, "hi", 10.0 + i / 10.0)))
      .toDF("id", "grp", "score")
    val kept = Curation.adaptiveQualityFilter(df, col("score"), col("grp"),
        pct = 0.25, exact = true)
      .collect().map(_.getLong(0)).toSet
    // 10 values each: threshold = 25th percentile = value at position
    // 0.25*(10-1) = 2.25 -> between index 2 and 3; >= keeps ids 3..9
    assert(kept === ((3L to 9L) ++ (103L to 109L)).toSet, s"kept $kept")
  }

  test("adaptiveQualityFilter: NULL scores drop; sketch path agrees on clean data") {
    val df = ((1 to 40).map(i => (i.toLong, "a", Some(i.toDouble))) :+
      (999L, "a", Option.empty[Double]))
      .toDF("id", "grp", "score")
    val exact = Curation.adaptiveQualityFilter(df, col("score"), col("grp"),
      pct = 0.25, exact = true).collect().map(_.getLong(0)).toSet
    assert(!exact.contains(999L), "NULL score must not survive the cut")
    // the sketch path returns a DATA value as threshold (no
    // interpolation), so its cut may include one extra boundary row vs
    // exact — but it must still be a clean suffix of the score order
    // and land within one row of the exact cut
    val approx = Curation.adaptiveQualityFilter(df, col("score"), col("grp"),
      pct = 0.25, exact = false).collect().map(_.getLong(0)).toSet
    assert(!approx.contains(999L))
    assert(approx === (approx.min to 40L).toSet,
      s"approx kept set must be a suffix by score, got $approx")
    assert(math.abs(approx.size - exact.size) <= 1,
      s"approx ${approx.size} vs exact ${exact.size}")
  }

  test("bpeMerges: the classic low/lower corpus learns the known merge sequence") {
    // words: low x2, lower x1. char pairs: (l,o)=3, (o,w)=3, (w,e)=1,
    // (e,r)=1 -> tie at 3 broken by s1 asc: (l,o). Then (lo,w)=3,
    // then (low,e)=1 (tie with (e,r) broken by s1: 'e' < 'low'? NO —
    // 'e' sorts before 'low', so merge 3 is (e,r)), then (low,er)=1
    // ... verify the exact greedy sequence the operator must produce.
    val df = Seq(Tuple1("low low lower")).toDF("text")
    val got = Curation.bpeMerges(df, col("text"), nMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "l", "o", 3L),
      (2L, "lo", "w", 3L),
      (3L, "e", "r", 1L),
      (4L, "low", "er", 1L)))
    // greedy non-overlap: "aaa a" merges (a,a) once in the triple
    val df2 = Seq(Tuple1("aaa")).toDF("text")
    val g2 = Curation.bpeMerges(df2, col("text"), nMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(g2.toSeq === Seq(("a", "a", 2L)),
      "both adjacent (a,a) pairs count in statistics")
  }

  test("bpeMerges: batched rounds == sequential merge table (fixture + adversarial corpora)") {
    def table(df: org.apache.spark.sql.DataFrame, n: Int, r: Int) =
      Curation.bpeMerges(df, col("text"), nMerges = n, mergesPerRound = r)
        .orderBy("rank").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
        .toSeq

    // the real fixture corpus — 24 merges deep so several multi-merge
    // batches actually form (the q_bpe production shape)
    val docs = schema.Tables.load(spark, sfDir, "documents")
      .select(col("text"))
    assert(table(docs, 24, 16) === table(docs, 24, 1),
      "batched learning diverged from sequential on the fixture corpus")

    // adversarial: chained symbols where every merge conflicts with the
    // next (each concat's right symbol is the next pair's left), so
    // batches must degrade toward 1 and still match
    val chain = Seq(Tuple1("abcde abcde abcd abc ab")).toDF("text")
    assert(table(chain, 6, 16) === table(chain, 6, 1))

    // adversarial: flat tie plateau (every pair freq-tied) — the
    // strict-freq truncation must keep the argmax path
    val ties = Seq(Tuple1("ab cd ef gh ij kl")).toDF("text")
    assert(table(ties, 6, 16) === table(ties, 6, 1))

    // adversarial: concat collision — symbol "ab" is learned early,
    // then pair (a,b) re-forms count onto existing (x,ab) pairs; the
    // existence probe must keep batches exact
    val collide = Seq(Tuple1("xab xab xab aab aab zab zab ab ab ab ab")).toDF("text")
    assert(table(collide, 8, 16) === table(collide, 8, 1))
  }

  test("decontaminateSpans: planted benchmark span stripped, clean docs untouched") {
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("btext")
    val corpus = Seq(
      (1L, "start words here then alpha beta gamma delta epsilon zeta eta theta trailing bits"),
      (2L, "totally unrelated content that shares no benchmark window at all ok")
    ).toDF("doc_id", "text")
    val got = Curation.decontaminateSpans(corpus, "doc_id", "text",
        bench, "btext", w = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(5)))
    assert(got(0) === ((1L, 14, 8, 1, "start words here then trailing bits")),
      s"got ${got(0)}")
    assert(got(1) === ((2L, 11, 0, 0,
      "totally unrelated content that shares no benchmark window at all ok")))
  }

  test("bigramLmScore: hand-computed probabilities, smoothing floor, absent singletons") {
    // train "a b a c": pairs (a,b),(b,a),(a,c); contexts a=2,b=1; V=3
    val train = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b d"),   // (a,b) seen; (b,d) unseen pair, seen context
      (11L, "z q"),     // unseen context -> smoothed floor 1/V
      (12L, "x")        // no bigrams -> absent from output
    ).toDF("doc_id", "text")
    val got = Curation.bigramLmScore(train, score, "doc_id", "text", alpha = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expB = (math.log((1 + 0.5) / (2 + 0.5 * 3)) +
      math.log((0 + 0.5) / (1 + 0.5 * 3))) / 2
    val expC = math.log((0 + 0.5) / (0 + 0.5 * 3)) // = ln(1/V)
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((10L, 2L), (11L, 1L)))
    assert(math.abs(got(0)._3 - expB) < 1e-9, s"${got(0)._3} vs $expB")
    assert(math.abs(got(1)._3 - expC) < 1e-9, s"${got(1)._3} vs $expC")
    assert(math.abs(expC - math.log(1.0 / 3)) < 1e-12, "floor must equal 1/V")
  }

  test("adaptiveQualityFilter: DEFAULT is the memory-bounded sketch path") {
    // the scale-safety contract: a caller who doesn't touch the dial
    // must get percentile_approx (bounded buffer per group), never the
    // exact percentile that materializes whole-group score arrays —
    // asserted on the plan so a future default flip is loud
    val df = (1 to 10).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "grp", "score")
    val plan = Curation.adaptiveQualityFilter(df, col("score"), col("grp"),
      pct = 0.25).queryExecution.analyzed.toString
    assert(plan.contains("percentile_approx"),
      "default threshold must use the percentile_approx sketch\n" + plan)
  }

  test("adaptiveQualityFilter: the null group filters by ITS OWN threshold, not to zero") {
    val df = Seq(
      (Option("a"), 1.0), (Option("a"), 2.0), (Option("a"), 3.0), (Option("a"), 4.0),
      (Option.empty[String], 10.0), (Option.empty[String], 20.0),
      (Option.empty[String], 30.0), (Option.empty[String], 40.0))
      .toDF("src", "score")
    val out = Curation.adaptiveQualityFilter(df, col("score"), col("src"),
        pct = 0.5, exact = true)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toSet
    assert(out.count(_._1.isEmpty) === 2,
      s"null group must keep its TOP half, got $out")
    assert(out.filter(_._1.isEmpty).map(_._2) === Set(30.0, 40.0))
    assert(out.count(_._1.contains("a")) === 2)
  }

  test("refreshDispositions: a NULL quality flag is probed, not silently accepted") {
    import graft.ops.Dedup
    // corpus doc 100 'same exact text'; batch doc 1 is an EXACT dup
    // with a NULL lq flag — must surface as dup_corpus, never slip in
    val corpus = Seq((100L, "same exact text here words")).toDF("doc_id", "text")
    val corpusBands = Dedup.bandIndex(corpus, "doc_id", "text", 3, 12, 2)
    val batch = Seq(
      (1L, "same exact text here words", Option.empty[Boolean]),
      (2L, "totally different unrelated content words", Option(false)),
      (3L, "whatever low quality", Option(true)))
      .toDF("doc_id", "text", "lq")
    val out = Curation.refreshDispositions(batch, "doc_id", "text", "lq",
        corpus, corpusBands)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "dup_corpus",
      s"null-lq exact dup must be caught, got ${out(1L)}")
    assert(out(2L) === "accepted")
    assert(out(3L) === "low_quality")
  }

  test("bpeMerges frees every superseded round's checkpoint blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = Seq.tabulate(30)(i => s"low lower lowest new newer ${i % 5}")
      .toDF("text")
    Curation.bpeMerges(df, col("text"), nMerges = 12, mergesPerRound = 2)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"bpeMerges left ${leaked.size} persisted RDDs behind")
  }

  test("kAnonymize: sub-k groups suppress entirely; null quasi values group and suppress") {
    val df = Seq(
      (1L, Some("en"), "web"), (2L, Some("en"), "web"), (3L, Some("en"), "web"),
      (4L, Some("de"), "web"),                       // singleton -> suppressed
      (5L, None, "web"), (6L, None, "web"), (7L, None, "web"),  // null group of 3
      (8L, None, "wiki"))                            // null singleton -> suppressed
      .toDF("id", "lang", "src")
    val out = Curation.kAnonymize(df, Seq("lang", "src"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 5L, 6L, 7L),
      s"sub-k groups (incl. null singletons) must suppress, got ${out.keySet}")
    assert(out.values.forall(_ === 3L), "survivors carry their group size")
    // k=1 keeps everything (no row may be dropped at the trivial floor)
    assert(Curation.kAnonymize(df, Seq("lang", "src"), k = 1).count() === 8L)
    intercept[IllegalArgumentException] {
      Curation.kAnonymize(df, Seq("nope"), k = 2)
    }
  }

  test("lDiversify: homogeneous groups suppress even when k-large; null sensitive values don't count; null quasi keys group") {
    val df = Seq(
      // group (web): 3 distinct sensitive diseases -> kept at l=3
      (1L, "web", Some("flu")), (2L, "web", Some("cold")), (3L, "web", Some("covid")),
      // group (wiki): 4 rows but ONE sensitive value -> the homogeneity
      // attack k-anonymity misses; suppressed at l >= 2
      (4L, "wiki", Some("flu")), (5L, "wiki", Some("flu")),
      (6L, "wiki", Some("flu")), (7L, "wiki", Some("flu")),
      // group (books): 2 real values + nulls — nulls must not count, so
      // it fails l=3 (n_sensitive = 2)
      (8L, "books", Some("flu")), (9L, "books", Some("cold")),
      (10L, "books", None), (11L, "books", None),
      // NULL quasi key: 3 distinct sensitive values -> the null group
      // must still group (null-safe join) and pass
      (12L, null, Some("flu")), (13L, null, Some("cold")), (14L, null, Some("covid")))
      .toDF("id", "src", "disease")
    val out = Curation.lDiversify(df, Seq("src"), "disease", l = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 12L, 13L, 14L),
      s"homogeneous/under-diverse groups must suppress, got ${out.keySet}")
    assert(out(1L) === ((3L, 3L)) && out(12L) === ((3L, 3L)),
      "survivors carry (group_size, n_sensitive)")
    // the homogeneous wiki group and the under-diverse books group both
    // PASS the k-anonymity sibling at k=4 — the two checks are
    // genuinely different rails (l-diversity suppressed both above)
    assert(Curation.kAnonymize(df, Seq("src"), k = 4)
      .select("id").collect().map(_.getLong(0)).toSet
      === Set(4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
    // l=1 keeps every row whose group has ANY non-null sensitive value
    assert(Curation.lDiversify(df, Seq("src"), "disease", l = 1).count() === 14L)
    intercept[IllegalArgumentException] {
      Curation.lDiversify(df, Seq("disease"), "disease", l = 2)
    }
  }

  test("tCloseness: skewed-but-diverse groups suppress; distances are the exact hand-computed TV; all-null group suppresses") {
    // global distribution over 16 non-null rows: flu 8/16, cold 8/16.
    // group A (web): 4 flu + 4 cold -> p == q, tv = 0 -> kept at any t.
    // group B (wiki): 4 flu, 0 cold -> DIVERSE ENOUGH for l=1, even
    //   k-anonymous at k=4, but maximally skewed: tv = 0.5 -> dropped
    //   at t = 0.25 (the skewness attack the other two rails miss).
    // group C (books): 3 cold + 1 flu -> tv = |0.75-0.5|/1... compute:
    //   ½(|0.25-0.5| + |0.75-0.5|) = 0.25 -> kept at exactly t = 0.25
    //   (boundary inclusive).
    // group D (null src): 1 flu + 3 null-sensitive -> distribution over
    //   non-nulls is all-flu: tv = 0.5 -> dropped; its null-sensitive
    //   rows drop WITH it (group membership, not value presence).
    // group E (tv): all-null sensitive -> no distribution -> suppressed.
    val df = Seq(
      (1L, Some("web"), Some("flu")), (2L, Some("web"), Some("flu")),
      (3L, Some("web"), Some("flu")), (4L, Some("web"), Some("flu")),
      (5L, Some("web"), Some("cold")), (6L, Some("web"), Some("cold")),
      (7L, Some("web"), Some("cold")), (8L, Some("web"), Some("cold")),
      (9L, Some("wiki"), Some("flu")), (10L, Some("wiki"), Some("flu")),
      (11L, Some("wiki"), Some("flu")), (12L, Some("wiki"), Some("flu")),
      (13L, Some("books"), Some("cold")), (14L, Some("books"), Some("cold")),
      (15L, Some("books"), Some("cold")), (16L, Some("books"), Some("flu")),
      (17L, None, Some("flu")), (18L, None, None), (19L, None, None),
      (20L, Some("tv"), None))
      .toDF("id", "src", "disease")
    // global: flu 9/17? count: flu ids 1-4,9-12,16,17 = 10; cold 5-8,13-15 = 7
    // -> q(flu)=10/17, q(cold)=7/17
    // web: p(flu)=.5 -> tv=½(|.5-10/17|+|.5-7/17|)=½(3/34+3/34)... compute
    // in the assertions from first principles instead of the comment.
    val qFlu = 10.0 / 17.0; val qCold = 7.0 / 17.0
    def tv(pFlu: Double, pCold: Double) =
      (math.abs(pFlu - qFlu) + math.abs(pCold - qCold)) / 2.0
    val out = Curation.tCloseness(df, Seq("src"), "disease", t = 0.2)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val webTv = BigDecimal(tv(0.5, 0.5)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val booksTv = BigDecimal(tv(0.25, 0.75)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // web tv ≈ 0.088, books tv ≈ 0.25, wiki tv ≈ 0.41, null-src tv ≈ 0.41
    assert(webTv < 0.2 && booksTv > 0.2, s"fixture sanity: $webTv $booksTv")
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L),
      s"only the globally-representative group survives t=0.2, got ${out.keySet}")
    assert(out(1L) === webTv, s"tv_dist must be the exact TV distance, got ${out(1L)}")
    // boundary is inclusive: at t = books' own distance the group returns
    val out2 = Curation.tCloseness(df, Seq("src"), "disease", t = booksTv)
      .collect().map(_.getLong(0)).toSet
    assert(out2 === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 13L, 14L, 15L, 16L))
    // a huge t keeps every group WITH a distribution; the all-null
    // group (id 20) and the skewed ones return, id 20 never does
    val out3 = Curation.tCloseness(df, Seq("src"), "disease", t = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(out3 === (1L to 19L).toSet,
      s"all-null-sensitive group must suppress even at t=1, got $out3")
  }

  test("tCloseness: group_size is the TOTAL quasi-group row count (kAnonymize semantics); cardinality guard fires loudly") {
    // 4-row group, 2 non-null sensitive: group_size must read 4 (the
    // k-anonymity size a release manifest expects), not 2 (the internal
    // distribution denominator) — ADVICE r10
    val df = Seq(
      (1L, "g", Some("a")), (2L, "g", Some("b")),
      (3L, "g", None), (4L, "g", None),
      (5L, "h", Some("a")), (6L, "h", Some("b"))).toDF("id", "grp", "v")
    val sizes = Curation.tCloseness(df, Seq("grp"), "v", t = 1.0)
      .select("grp", "group_size").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("g" -> 4L, "h" -> 2L))
    val odf = df.withColumn("v", length(col("v")) + col("id") % 2)
    val osizes = Curation.tClosenessOrdered(odf, Seq("grp"), "v", t = 1.0)
      .select("grp", "group_size").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(osizes === Map("g" -> 4L, "h" -> 2L))
    // a high-cardinality sensitive column fails BEFORE the groups ×
    // categories expansion, naming the fix
    val wide = (1 to 50).map(i => (i.toLong, "g", s"cat$i")).toDF("id", "grp", "v")
    val ex = intercept[IllegalArgumentException] {
      Curation.tCloseness(wide, Seq("grp"), "v", t = 1.0, maxCategories = 10)
    }
    assert(ex.getMessage.contains("distinct values"))
    val ex2 = intercept[IllegalArgumentException] {
      Curation.tClosenessOrdered(wide.withColumn("v", col("id")),
        Seq("grp"), "v", t = 1.0, maxCategories = 10)
    }
    assert(ex2.getMessage.contains("maxCategories"))
    // Int.MaxValue is the no-cap idiom (the maxBucket convention) and
    // must DISABLE the rail, not overflow limit(maxCategories + 1)
    assert(Curation.tCloseness(wide, Seq("grp"), "v", t = 1.0,
      maxCategories = Int.MaxValue).count() === 50L)
  }

  test("tClosenessOrdered: ordered EMD charges by displacement where TV cannot; exact hand-computed distances") {
    // global over buckets {1, 2, 3}: uniform (4 each of 12).
    // group near: all mass on bucket 2 (the MIDDLE) — one step from
    //   either tail. diffs sorted by cat: (-1/3, +2/3, -1/3);
    //   prefixes: -1/3, 1/3, 0 -> emd = (1/3 + 1/3 + 0)/2 = 1/3.
    // group far: all mass on bucket 3 (the TAIL) — diffs
    //   (-1/3, -1/3, +2/3); prefixes -1/3, -2/3, 0 -> emd = 1/2.
    // TV distance sees BOTH groups identically (same |p - q| multiset);
    // the ordered form separates them — the property it exists for.
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),          // near-global
      (4L, "near", 2L), (5L, "near", 2L), (6L, "near", 2L),
      (7L, "far", 3L), (8L, "far", 3L), (9L, "far", 3L),
      (10L, "a", 1L), (11L, "a", 2L), (12L, "a", 3L))
      .toDF("id", "grp", "bucket")
    def dists(t: Double) =
      Curation.tClosenessOrdered(df, Seq("grp"), "bucket", t)
        .select("grp", "emd_dist").distinct()
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val all = dists(1.0)
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // expected values replicate the operator's EXACT fold (same IEEE
    // ops in the same order) — asserting hand-simplified fractions
    // would race the last ulp
    def emd(ps: Seq[Double], qs: Seq[Double]): Double = {
      val diffs = ps.zip(qs).map { case (p, q) => p - q }
      val cums = (1 to diffs.size).map(i => diffs.take(i).foldLeft(0.0)(_ + _))
      r9(cums.foldLeft(0.0)((a, c) => a + math.abs(c)) / (diffs.size - 1))
    }
    // global over the 12 rows: buckets (2, 5, 5)/12 — the skewed
    // groups shift it, which is fine: the assertions replicate the
    // fold against the TRUE global
    val q = Seq(2.0 / 12, 5.0 / 12, 5.0 / 12)
    assert(all("a") === emd(Seq(2.0 / 6, 2.0 / 6, 2.0 / 6), q), all.toString)
    assert(all("near") === emd(Seq(0.0 / 3, 3.0 / 3, 0.0 / 3), q), all.toString)
    assert(all("far") === emd(Seq(0.0 / 3, 0.0 / 3, 3.0 / 3), q), all.toString)
    assert(all("far") > all("near"),
      "tail skew must cost more than middle skew under the ordered EMD")
    // the categorical TV distance cannot separate them (identical
    // |p − q| multisets)
    val tv = Curation.tCloseness(df, Seq("grp"), "bucket", t = 1.0)
      .select("grp", "tv_dist").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tv("near") === tv("far"),
      s"fixture sanity: TV must see the two skews identically, got $tv")
    // a threshold between the two (near ≈ 0.292, far = 0.375) keeps
    // the middle-skewed group and drops the tail-skewed one
    val cut = dists(0.33)
    assert(cut.keySet === Set("a", "near"), cut.toString)
  }

  test("normalizeUrl: case, default ports, tracking params, param order, fragments all canonicalize; non-URLs go NULL") {
    val cases = Seq(
      // mixed-case scheme/host, default https port, tracking + unsorted
      // params, fragment — everything at once
      ("HTTPS://CdN.Src1.CoM:443/Docs/7?utm_source=rss&b=2&a=1&fbclid=x#f",
       "https://cdn.src1.com/Docs/7?a=1&b=2"),
      // http default port strips; path case KEPT
      ("http://Host.Org:80/A/B?z=1&y=2", "http://host.org/A/B?y=2&z=1"),
      // NON-default port survives
      ("https://h.io:8443/x", "https://h.io:8443/x"),
      // empty path -> "/"; all-tracking query drops its "?"
      ("https://h.io?utm_campaign=c&gclid=g&ref=r", "https://h.io/"),
      // bare param without "=" sorts too; "ref" only matches whole name
      ("https://h.io/p?beta&refresh=1&alpha", "https://h.io/p?alpha&beta&refresh=1"),
      // no scheme -> NULL (loud, not a garbage passthrough)
      ("not a url", null),
      ("://missing.scheme/x", null))
    val out = cases.map(_._1).toDF("url")
      .select(Curation.normalizeUrl(col("url"))).collect().map(_.getString(0))
    assert(out.toSeq === cases.map(_._2))
  }

  test("registeredDomain: two-label heuristic strips subdomains and ports; degenerate hosts go NULL") {
    val cases = Seq(
      ("https://cdn.src1.com/Docs/7?a=1", "src1.com"),
      ("https://a.b.c.deep.example.org/", "example.org"),
      ("https://h.io:8443/x", "h.io"),
      // userinfo strips BEFORE label extraction: the same page fetched
      // with and without credentials must share a quota bucket
      ("https://alice@example.com/x", "example.com"),
      ("https://alice.smith@sub.example.com/x", "example.com"),
      // multi-label public suffixes register at the THIRD label: two
      // different .co.uk publishers must NOT merge into one "co.uk"
      // quota bucket (r11 VERDICT item 6)
      ("https://www.bbc.co.uk/news", "bbc.co.uk"),
      ("https://cdn.img.bbc.co.uk/x", "bbc.co.uk"),
      ("https://guardian.co.uk/", "guardian.co.uk"),
      ("https://shop.example.com.au/item?id=1", "example.com.au"),
      ("https://alice@sub.site.gov.uk:8443/x", "site.gov.uk"),
      // a BARE public suffix has no registrable part
      ("https://co.uk/x", null),
      // ...but a two-label host whose suffix is NOT multi-label keeps
      // its two labels even when the TLD also appears in the set's
      // country codes ("uk.com" is not in the set)
      ("https://example.uk/x", "example.uk"),
      ("https://localhost/x", null),           // no dot -> no 2-label domain
      (null, null))
    val out = cases.map(c => Tuple1(c._1)).toDF("u")
      .select(Curation.registeredDomain(col("u"))).collect().map(_.getString(0))
    assert(out.toSeq === cases.map(_._2))
  }

  test("quotaCap keeps the n highest-score rows per key (ties to lower id); null scores never survive") {
    val df = Seq(
      ("d1", 1L, 10.0), ("d1", 2L, 30.0), ("d1", 3L, 20.0),
      ("d1", 4L, 30.0),                        // score tie with id 2 -> lower id wins
      ("d2", 5L, 1.0),                         // under-quota key keeps all
      ("d3", 6L, Double.NaN),                  // NaN ranks ABOVE numbers (IEEE >)
      ("d3", 7L, 5.0), ("d3", 8L, 4.0))
      .toDF("domain", "id", "score")
    val kept = Curation.quotaCap(df, Seq("domain"), n = 2,
        scoreCol = col("score"), idCol = col("id"))
      .collect().map(_.getLong(1)).toSet
    assert(kept === Set(2L, 4L, 5L, 6L, 7L))
    // null score rows cannot be ranked and never survive
    val withNull = Seq(("d", 1L, Some(1.0)), ("d", 2L, Option.empty[Double]))
      .toDF("domain", "id", "score")
    val k2 = Curation.quotaCap(withNull, Seq("domain"), n = 2,
        scoreCol = col("score"), idCol = col("id"))
      .collect().map(_.getLong(1)).toSet
    assert(k2 === Set(1L))
    // null KEYS group null-safely (one quota bucket, not dropped rows)
    val nullKey = Seq((Option.empty[String], 1L, 2.0),
      (Option.empty[String], 2L, 1.0), (Option.empty[String], 3L, 3.0))
      .toDF("domain", "id", "score")
    val k3 = Curation.quotaCap(nullKey, Seq("domain"), n = 2,
        scoreCol = col("score"), idCol = col("id"))
      .collect().map(_.getLong(1)).toSet
    assert(k3 === Set(1L, 3L))
    intercept[IllegalArgumentException] {
      Curation.quotaCap(df, Seq("absent"), 2, col("score"), col("id"))
    }
  }

  test("extractHtmlText/htmlTitle: scripts with markup inside, entities, blocks, titles") {
    val cases = Seq(
      // script body containing '<' and a stray closing tag: non-greedy
      // dotall removal must eat the WHOLE script before block handling
      ("<p>a</p><script>if (1 < 2) { x = \"</div>\"; }</script><p>b</p>",
        "a\nb"),
      ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
      // entity decode order: escaped entities ('&amp;X;' — the literal
      // text '&X;' a page shows its readers) must decode exactly ONE
      // level; '&amp;' decoding anywhere but last would double-decode
      ("x &amp;nbsp; y", "x &nbsp; y"),
      ("&amp;lt;b&amp;gt; stays escaped", "&lt;b&gt; stays escaped"),
      ("&lt;b&gt;not&lt;/b&gt; a tag", "<b>not</b> a tag"),
      ("<div>  lots   of\t space </div>", "lots of space"),
      ("plain text, no markup", "plain text, no markup"),
      ("<style>p { a: 1 }</style><!-- gone -->kept", "kept"),
      // numeric character references (r12 VERDICT item 3): decimal,
      // hex, the next named tier; unpaired surrogates, out-of-BMP and
      // malformed refs stay LITERAL
      ("it&#8217;s &#x2019;ok&#x2019;", "it’s ’ok’"),
      ("a &mdash; b &hellip; c &ndash; d", "a — b … c – d"),
      ("&ldquo;q&rdquo; &lsquo;s&rsquo; &apos;a&apos;", "“q” ‘s’ 'a'"),
      ("bad &#55296; &#70000; &#xZZZZ; &#; &bogus; lone & end",
        "bad &#55296; &#70000; &#xZZZZ; &#; &bogus; lone & end"),
      // one-level decode of escaped NUMERIC refs: '&#38;amp;' shows
      // its readers '&amp;' — never '&'
      ("&#38;amp; once", "&amp; once"),
      // decoded newline/tab participate in whitespace tidying exactly
      // like literal ones
      ("a&#10;&#10;b c&#9;d", "a\nb c d"),
      // tag-name anchoring (r12 ADVICE): '<brand>'/'</pre>' are NOT
      // block tags — spaces, not paragraph breaks; real '<br/>' still is
      ("x<brand>y</brand>z<br/>w", "x y z\nw"),
      ("<pre>code body</pre>after", "code body after"))
    val out = cases.map(_._1).toDF("h")
      .select(graft.ops.Curation.extractHtmlText(col("h"))).collect()
      .map(_.getString(0))
    assert(out.toSeq === cases.map(_._2))

    val titles = Seq(
      ("<title>A &amp; B</title>", "A & B"),
      ("<head><title>Sp<b>an</b>ned   title</title></head>", "Sp an ned title"),
      ("<p>no title here</p>", null),
      ("<title></title>", null))
    val t = titles.map(_._1).toDF("h")
      .select(graft.ops.Curation.htmlTitle(col("h"))).collect()
      .map(_.getString(0))
    assert(t.toSeq === titles.map(_._2))
  }

  test("boilerplateBlocks/extractContentText: link-dense rails drop, prose survives") {
    val html =
      "<html><head><title>T</title></head><body>" +
        "<nav><a href=\"/\">Home</a> | <a href=\"/a\">About</a> | " +
        "<a href=\"/c\">Contact us</a></nav>" +
        "<p>This paragraph carries genuine prose content with " +
        "<a href=\"/ref\">one link</a> inside a lot of plain text.</p>" +
        "<footer><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></footer>" +
        "</body></html>"
    val df = Seq((1L, html)).toDF("id", "html")
    val blocks = Curation.boilerplateBlocks(df, "id", "html")
      .orderBy("block_idx").collect()
      .map(r => (r.getString(2), r.getInt(3), r.getInt(4), r.getBoolean(6)))
    // nav: all anchor text -> boilerplate; prose: long, low density ->
    // content; footer: all anchor text -> boilerplate
    val nav = blocks.find(_._1.startsWith("Home")).get
    assert(!nav._4 && nav._2 === "Home".length + "About".length +
      "Contact us".length,
      s"nav must be non-content, anchor chars summed per anchor: $nav")
    val prose = blocks.find(_._1.startsWith("This paragraph")).get
    assert(prose._4 && prose._2 === "one link".length, s"prose: $prose")
    val footer = blocks.find(_._1.startsWith("Terms")).get
    assert(!footer._4, s"footer: $footer")
    // anchor-tag-name anchoring (review finding): '<article>'/'<aside>'
    // prose must NOT count as anchor text — only real '<a ...>' elements
    val art = Seq((1L, "<article>Plain article prose long enough to " +
        "pass the gate with <a href=\"/r\">one ref</a> in it.</article>"))
      .toDF("id", "html")
    val ab = Curation.boilerplateBlocks(art, "id", "html").head()
    assert(ab.getInt(3) === "one ref".length,
      s"only the real anchor's text counts: $ab")
    assert(ab.getBoolean(6), "article prose must stay content")
    // the fused extractor keeps exactly the content blocks
    val text = df.select(Curation.extractContentText($"html")).head().getString(0)
    assert(text.startsWith("This paragraph") && !text.contains("Home") &&
      !text.contains("Terms"), text)
    // empty-after-pruning pages yield the empty string, not null
    val none = Seq(Tuple1("<nav><a href='/'>x y z long enough</a></nav>"))
      .toDF("html").select(Curation.extractContentText($"html")).head()
    assert(none.getString(0) === "")
  }

  test("leakageSafeSplit: NO candidate pair straddles a split; naive per-doc split leaks") {
    import graft.ops.Dedup
    val d = schema.Tables.load(spark, sfDir, "documents")
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
      shingleSize = 3, k = 12, bandRows = 2)
    assert(pairs.limit(1).count() === 1L, "fixture must yield near-dup pairs")
    val safe = Curation.leakageSafeSplit(d, "doc_id", pairs,
      trainPct = 90, valPct = 5)

    def crossPairs(assign: org.apache.spark.sql.DataFrame): Long =
      pairs.join(assign.select($"doc_id".as("id_a"), $"split".as("sa")), Seq("id_a"))
        .join(assign.select($"doc_id".as("id_b"), $"split".as("sb")), Seq("id_b"))
        .filter($"sa" =!= $"sb").count()

    // THE theorem: cluster members share a rep, the rep picks the
    // split, so zero pairs cross — eval contamination through near-dup
    // leakage is impossible by construction
    assert(crossPairs(safe) === 0L)

    // the per-doc content-hash split protects only EXACT dups: on the
    // same pair graph it leaks (near-dup texts hash to different
    // buckets) — the failure mode this operator exists to close
    val naive = d.select($"doc_id",
      Curation.splitLabel(Curation.hashBucket($"text", 100), 90, 5).as("split"))
    assert(crossPairs(naive) > 0L,
      "fixture pairs must expose the naive split's leakage")

    // docs outside every pair are their own rep and still get a split
    assert(safe.count() === d.count())
    assert(safe.filter($"split".isNull).count() === 0L)

    // exact duplicates (same text, both in the pair graph via identical
    // shingles) always share a split in BOTH schemes; near-dup safety
    // is the delta — spot-check one planted pair end to end
    val planted = Seq(
      (9001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9002L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    val pp = Dedup.minhashLshPairs(planted, "doc_id", "text",
      shingleSize = 3, k = 12, bandRows = 2)
    assert(pp.count() >= 1L, "planted near-dups must pair")
    val ps = Curation.leakageSafeSplit(planted, "doc_id", pp, 90, 5)
      .select($"split").distinct().count()
    assert(ps === 1L, "planted near-dup pair must share one split")
  }
}
