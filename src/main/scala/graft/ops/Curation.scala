package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation operators (SURVEY §2.11 north-star surface,
  * round 2): the steps between "deduped corpus" and "training shards"
  * that a 100 TB pipeline runs after the Dedup/Ann/Text passes.
  *
  * All deterministic and engine-portable (md5 / exact string n-grams /
  * integer arithmetic), so every operator is DuckDB-oracle-checkable.
  * Scale shapes: hash split and repetition are per-row (embarrassingly
  * parallel); packing is a windowed cumsum per shard (parallel across
  * shards); contamination broadcasts the benchmark gram set — the only
  * shuffle anywhere is the optional gram explode when the benchmark
  * outgrows a broadcast.
  */
object Curation {

  /** Deterministic content-hash bucket in [0, nBuckets): first 8 hex
    * digits of md5, mod n. Content-based (not id-based) so exact
    * duplicates always land in the SAME split — the property that
    * prevents train/test leakage through dup pairs. */
  def hashBucket(key: Column, nBuckets: Int): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long") % nBuckets

  /** Deterministic stratified sampling: keep a per-stratum fraction of
    * rows, selected by content-hash bucket (NOT rand()) so the sample
    * is reproducible across runs/retries and consistent for duplicate
    * content — the properties a training-data pipeline needs from a
    * sampler. Rates are INTEGER percents (stratum → percent kept,
    * absent strata use `defaultPct`): an integer bucket compare has no
    * float-rounding edge (0.29 * 100 == 28.999…96 in doubles would
    * silently keep one bucket too few). */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       ratesPct: Map[String, Int],
                       defaultPct: Int): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "percents must be in [0, 100]")
    val bucket = hashBucket(key, 100)
    val pctCol = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(strata === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket < pctCol)
  }

  /** Per-group adaptive quality filtering: drop each group's bottom
    * `pct` quantile by score, with the threshold computed FROM the
    * group itself — the standard posture when sources have different
    * score distributions (a fixed global cutoff would empty the
    * lowest-scoring source and pass everything from the highest).
    *
    * Two-pass plan: one aggregation to a |groups|-row threshold frame,
    * then the thresholds broadcast back onto the corpus as a filter —
    * the corpus itself is never shuffled. Rows with a NULL score or a
    * group absent from the threshold frame are dropped (a NULL
    * compare is not a keep).
    *
    * The threshold dial: `exact = false` (the DEFAULT) computes each
    * group's threshold with the mergeable `percentile_approx` sketch —
    * bounded memory per group regardless of group size, rank error
    * ≤ 1/accuracy, map-side partial merge. This is the only safe
    * setting at scale: exact `percentile` buffers EVERY group's score
    * array in a single aggregation buffer, so a billion-row source
    * group OOMs the executor. Opt into `exact = true` only when every
    * group is known memory-sized (tests, oracle-parity queries,
    * per-shard thresholds) and bit-exact interpolated quantiles
    * matter. The two differ by at most one boundary row per group at
    * the cut (the sketch returns a data value, exact interpolates) —
    * spec-asserted in CurationSpec.
    *
    * Broadcast contract (same as [[sourceMix]]'s rates frame): the
    * threshold frame has one row per distinct group, so `group` must be
    * a bounded-cardinality key (source, language, shard) — not a
    * high-cardinality id. An explicit Guard here would re-execute the
    * full-corpus aggregation, so the contract is documented rather
    * than counted. */
  def adaptiveQualityFilter(df: DataFrame, score: Column, group: Column,
                            pct: Double, exact: Boolean = false,
                            accuracy: Int = 10000): DataFrame = {
    require(pct > 0 && pct < 1, s"pct must be in (0, 1), got $pct")
    val reserved = Set("__q", "__g", "__thr")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with this operator's " +
        "scratch columns (__q, __g, __thr) — rename them first")
    val s = df.withColumn("__q", score).withColumn("__g", group)
    val thr = s.groupBy(col("__g")).agg(
      (if (exact) percentile(col("__q"), lit(pct))
       else percentile_approx(col("__q"), lit(pct), lit(accuracy))).as("__thr"))
    // NULL-SAFE group join (the Linkage lesson): groupBy computes a
    // threshold for the null group (a missing source attribute is
    // ordinary dirty data), and a plain equi-join would silently drop
    // 100% of its rows instead of its bottom pct
    s.join(broadcast(thr.withColumnRenamed("__g", "__tg")),
        col("__g") <=> col("__tg"))
      .filter(col("__q") >= col("__thr"))
      .drop("__g", "__tg", "__q", "__thr")
  }

  /** Deterministic source-mixing sampler — the "data mixing" step of a
    * training pipeline: choose per-source keep rates so the sampled
    * corpus approaches target proportions `targetPct` (source → integer
    * percent, must sum to 100), taking the largest total the SCARCEST
    * source allows (no source can be oversampled past 100%):
    *
    *   N = min over s of floor(count_s · 100 / pct_s)   (feasible total)
    *   keep_s = floor(N · pct_s / 100), rate_s = keep_s/count_s as ppm
    *
    * Rows keep by content-hash bucket < rate_ppm — reproducible across
    * runs and consistent for duplicate content, like
    * [[stratifiedSample]]; all arithmetic is integer, so the selection
    * is engine-portable and oracle-checkable (achieved proportions
    * track targets within hash uniformity, spec-asserted). Sources not
    * in `targetPct` are dropped; a TARGET source with zero rows drives
    * the feasible total to 0 (empty result) rather than silently
    * skewing the mix. Scale: one count aggregate over the corpus
    * (source-cardinality rows), rates broadcast back — the corpus
    * itself is filtered in place, never shuffled. */
  def sourceMix(df: DataFrame, source: Column, key: Column,
                targetPct: Map[String, Int]): DataFrame = {
    require(targetPct.values.sum == 100 && targetPct.values.forall(_ > 0),
      "target percents must be positive and sum to 100")
    val spark = df.sparkSession
    import spark.implicits._
    // seed counts from the TARGET list, not the observed sources: a
    // target source with zero rows must drive the feasible total to 0
    // (its count caps N) instead of silently vanishing from the min —
    // returning a wrongly-proportioned corpus would be worse than
    // returning an empty one
    val tgt = targetPct.toSeq.toDF("__src", "__t")
    val counts = tgt
      .join(df.groupBy(source.as("__src")).agg(count(lit(1)).as("__n")),
        Seq("__src"), "left")
      .select(col("__src"), coalesce(col("__n"), lit(0L)).as("__c"), col("__t"))
    val feasible = counts.agg(min(floor(col("__c") * 100 / col("__t"))).as("__N"))
    val rates = counts.crossJoin(broadcast(feasible))
      .select(col("__src"),
        // explicit floor, not a long cast: `/` is double division in
        // both engines, and DuckDB's CAST(double AS BIGINT) rounds
        // where Spark's truncates — floor() agrees everywhere
        floor(floor(col("__N") * col("__t") / 100) * lit(1000000L) / col("__c"))
          .as("__ppm"))
    df.join(broadcast(rates), source === col("__src"))
      .filter(hashBucket(key, 1000000) < col("__ppm"))
      .drop("__src", "__ppm")
  }

  /** Temperature-weighted source mixing (the UniMax / multilingual
    * sampling posture): per-source keep probabilities proportional to
    * n_s^alpha, alpha in (0, 1] — alpha = 1 reproduces raw proportions,
    * smaller alpha flattens toward uniform, lifting scarce sources
    * without a hand-written target map (the knob [[sourceMix]] needs).
    * The sampled total is the largest N where no source is oversampled
    * (N = min_s floor(n_s / p_s)); selection is by content-hash bucket,
    * so the sample is reproducible and duplicate-consistent.
    *
    * Cross-engine determinism: alpha = 0.5 (the default) weights with
    * sqrt — correctly rounded in every IEEE engine, so the whole
    * pipeline is oracle-exact; other alphas go through pow, which
    * carries 1-ulp library variance (rows-only guarantees there). The
    * weight total is folded in sorted-source order on a packed
    * |sources|-row frame — double addition is not associative, so the
    * fold order is pinned the same way the BM25 score slots are.
    *
    * Scale: one count aggregate over the corpus; everything after
    * operates on |sources| rows and broadcasts back — the corpus is
    * filtered in place, never shuffled. */
  def temperatureMix(df: DataFrame, source: Column, key: Column,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__n"))
    val wExpr =
      if (alpha == 0.5) sqrt(col("__n").cast("double"))
      else if (alpha == 1.0) col("__n").cast("double")
      else pow(col("__n").cast("double"), lit(alpha))
    val w = counts.select(col("__src"), col("__n").cast("double").as("__n"),
      wExpr.as("__w"))
    // fixed-order fold of the weight total (see scaladoc)
    val packed = w
      .agg(sort_array(collect_list(struct(col("__src"), col("__n"), col("__w"))))
        .as("__l"))
      .select(col("__l"),
        aggregate(col("__l"), lit(0.0), (a, s) => a + s.getField("__w"))
          .as("__W"))
    val shares = packed
      .select(explode(col("__l")).as("s"), col("__W"))
      .select(col("s.__src").as("__src"), col("s.__n").as("__n"),
        (col("s.__w") / col("__W")).as("__p"))
    val feas = shares.withColumn("__feas", floor(col("__n") / col("__p")))
    // NOT "__N": Spark resolution is case-insensitive, so __N would be
    // ambiguous against the per-source __n
    val total = feas.agg(min(col("__feas")).as("__tot"))
    val rates = feas.crossJoin(broadcast(total))
      .select(col("__src"),
        floor(floor(col("__tot") * col("__p")) * lit(1000000.0) / col("__n"))
          .as("__ppm"))
    df.join(broadcast(rates), source === col("__src"))
      .filter(hashBucket(key, 1000000) < col("__ppm"))
      .drop("__src", "__ppm")
  }

  /** RFC-3986-shaped URL splitter regex shared by [[normalizeUrl]] and
    * its oracle restatements: (scheme)://(authority)(path)[?(query)][#…].
    * RE2-compatible (no lookaround), so DuckDB evaluates it
    * identically. */
  val UrlPattern: String =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** URL canonicalization — the dedup key a web-scale corpus needs
    * BEFORE content dedup (the same page crawled via tracking links,
    * mixed-case hosts, default ports, or param reordering is the
    * cheapest duplicate class to kill, and killing it by URL costs no
    * text shuffle at all). Rules, each engine-portable:
    *
    *  - scheme and host lowercase (path/query case is significant and
    *    kept);
    *  - fragment stripped (never sent to the server);
    *  - default ports dropped (:80 for http, :443 for https);
    *  - tracking params removed (utm_*, fbclid, gclid, ref);
    *  - remaining query params sorted lexicographically (binary
    *    string order — identical in Spark's array_sort and DuckDB's
    *    list_sort for the ASCII param strings a URL can contain);
    *  - empty path canonicalized to "/"; an all-tracking query drops
    *    its "?" entirely.
    *
    * Non-URLs (no scheme://authority) canonicalize to NULL — loud in
    * the data, not a silent passthrough of garbage keys. Pure column
    * expression (regexp + HOF filter + sort), no UDF, no shuffle. */
  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, UrlPattern, 1))
    val auth = lower(regexp_extract(u, UrlPattern, 2))
    val path = regexp_extract(u, UrlPattern, 3)
    val query = regexp_extract(u, UrlPattern, 4)
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)"))
    val sortedQ = array_join(array_sort(params), "&")
    when(scheme === "" || auth === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host,
        when(path === "", lit("/")).otherwise(path),
        when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))))
  }

  /** Well-known MULTI-LABEL public suffixes (a static, embedded subset
    * of the public-suffix list — the ccTLDs that register under a
    * second level, public knowledge): when a host ends in one of
    * these, the registrable domain is THREE labels, not two. Without
    * this, every `*.co.uk` / `*.com.au` publisher merges into one
    * "co.uk" quota bucket and [[quotaCap]] over-caps distinct sites
    * (r11 VERDICT item 6). Shared verbatim with the DuckDB oracle
    * restatement, so keep it a plain lowercase literal list. */
  val MultiLabelTlds: Seq[String] = Seq(
    // uk / au / nz
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    // jp / kr / cn / hk / tw / sg / in
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "res.in",
    // br / mx / ar / za / il / tr / id / my / th / vn / ph / pl / ua
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "org.ar", "net.ar", "edu.ar", "gob.ar",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "org.tr", "net.tr", "edu.tr", "gov.tr",
    "co.id", "or.id", "net.id", "ac.id", "go.id", "web.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.th", "or.th", "ac.th", "go.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.pl", "net.pl", "org.pl", "edu.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua")

  /** Registered-domain heuristic from a CANONICAL url ([[normalizeUrl]]
    * output): the last two host labels — or the last THREE when the
    * last two form a known multi-label public suffix
    * ([[MultiLabelTlds]]) — with userinfo ("alice@") and port stripped
    * off the authority first. Without the userinfo strip,
    * "https://alice@example.com/" would yield "alice@example.com" and
    * the same page fetched with and without credentials would land in
    * different quota buckets. The embedded suffix set is a documented
    * static subset of the full public-suffix list (no wildcard rules,
    * no fetch — zero-egress); swap in a live PSL snapshot where exact
    * coverage matters. NULL for NULL urls, dot-less hosts, and hosts
    * that ARE a bare public suffix ("https://co.uk/" has no registrable
    * part). */
  def registeredDomain(canonicalUrl: Column): Column = {
    val auth = regexp_extract(canonicalUrl, UrlPattern, 2)
    val host = regexp_replace(regexp_replace(auth, "^[^@]*@", ""),
      ":[0-9]+$", "")
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(MultiLabelTlds: _*), nullif(last3, lit("")))
      .otherwise(nullif(last2, lit("")))
  }

  /** Per-key quota — domain caps, per-source ceilings: keep at most
    * `n` rows per key, preferring HIGHER `score`, ties broken by LOWER
    * `id` (the TopKByScore contract); rows with a NULL score or id
    * cannot be ranked and never survive. Scale shape: the argmax-k
    * aggregate ships at most n (score, id) pairs per key through the
    * shuffle — never a per-key sort of the full membership, which is
    * what the row_number window formulation (the oracle) pays — and
    * survivors rejoin on (key, id) null-safely. `idCol` must be a
    * unique-per-row integral id. */
  def quotaCap(df: DataFrame, keyCols: Seq[String], n: Int,
               scoreCol: Column, idCol: Column): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    require(n >= 1, s"n must be >= 1, got $n")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(keyCols.forall(df.columns.contains),
      s"key columns ${keyCols.filterNot(df.columns.contains).mkString(", ")} absent")
    val reserved = keyCols.map(c => s"__qc_$c") :+ "__qc_id"
    val clashes = reserved.filter(df.columns.contains)
    require(clashes.isEmpty,
      s"columns ${clashes.mkString(", ")} are reserved by quotaCap's " +
        "survivor join — rename the input's")
    val topN = column(graft.expr.catalyst.TopKByScore(
      expression(struct(scoreCol.cast("double"), idCol.cast("long"))), n)
      .toAggregateExpression())
    val kept = df.groupBy(keyCols.map(col): _*)
      .agg(topN.as("__top"))
      .select((keyCols.map(c => col(c).as(s"__qc_$c")) :+
        explode(col("__top")).as("__e")): _*)
      .select((keyCols.map(c => col(s"__qc_$c")) :+
        col("__e.id").as("__qc_id")): _*)
    val cond = keyCols.map(c => col(c) <=> col(s"__qc_$c"))
      .reduce(_ && _) && (idCol.cast("long") === col("__qc_id"))
    df.join(kept, cond, "left_semi")
  }

  /** HTML → text extraction — the step BEFORE every text operator in a
    * crawl pipeline (tokenize/dedup/quality all assume prose, and raw
    * markup poisons each of them): drop non-content elements (script /
    * style / comments, tags AND bodies), turn block-closing tags into
    * newlines so paragraph structure survives, strip remaining tags,
    * decode the common entities, and normalize whitespace. Pure
    * regexp_replace / replace column chain — per-row, no shuffle, no
    * UDF; every pattern is RE2-safe (non-greedy dotall, no lookaround)
    * so the DuckDB oracle runs the IDENTICAL chain. This is the
    * deterministic markup core, deliberately NOT a content heuristic:
    * link-density boilerplate pruning (readability/trafilatura class)
    * sits above this as scoring, the same layering as
    * [[graft.expr.Text.qualityScore]] over clean text. */
  def extractHtmlText(html: Column): Column = {
    // tag names are anchored by a non-alphanumeric follower (r12
    // ADVICE: the unanchored form turned '<brand>'/'</pre>' into
    // paragraph breaks) — RE2-safe via a negated char class, no
    // lookaround
    val blocks = regexp_replace(stripNonContent(html),
      blockPattern(BlockTags), "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val entities = decodeEntities(noTags)
    val oneSpace = regexp_replace(entities, "[ \\t]+", " ")
    val tidyLines = regexp_replace(oneSpace, " ?\\n ?", "\n")
    trim(regexp_replace(tidyLines, "\\n{2,}", "\n"), " \n")
  }

  /** Paragraph-level tags whose closers become newlines in
    * [[extractHtmlText]]; [[SegmentTags]] extends them with the page-
    * structure containers boilerplate scoring segments on. Shared with
    * the oracle generator so both engines split identically. */
  private[graft] val BlockTags =
    "br|/p|/div|/li|/tr|/h[1-6]|/ul|/ol|/table|/blockquote"
  private[graft] val SegmentTags = BlockTags +
    "|/nav|/header|/footer|/aside|/section|/article|/main|/td|/title|/head"
  private[graft] def blockPattern(tags: String): String =
    s"(?i)<(?:$tags)(?:[^a-zA-Z0-9>][^>]*)?>"

  /** Script / style / comment elements removed, tags AND bodies. */
  private def stripNonContent(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Tag-stripped, whitespace-collapsed, trimmed text of a raw HTML
    * fragment — the per-block text boilerplate scoring measures
    * (entities deliberately NOT decoded here: lengths are a density
    * signal, and the decode belongs to the extraction output). */
  private def blockText(raw: Column): Column =
    trim(regexp_replace(regexp_replace(raw, "(?s)<[^>]*>", " "), "\\s+", " "))

  /** Total characters of anchor-element inner text in a fragment. The
    * opener's tag name is anchored by a non-alphanumeric follower
    * (same RE2-safe shape as [[blockPattern]]): '<article>'/'<aside>'
    * prose must not count as anchor text. Shared with the oracle
    * generator so both engines measure identically. */
  private[graft] val AnchorPattern = "(?is)<a(?:[^a-zA-Z0-9>][^>]*)?>(.*?)</a>"
  private def anchorChars(raw: Column): Column =
    aggregate(
      transform(regexp_extract_all(raw, lit(AnchorPattern), lit(1)),
        a => length(blockText(a))),
      lit(0), (acc, x) => acc + x)

  /** Per-block boilerplate scoring — the readability-class layer the
    * [[extractHtmlText]] scaladoc names, sitting ABOVE the
    * deterministic markup core: segment the page on block/container
    * closers ([[SegmentTags]]), and score each non-empty block by its
    * LINK DENSITY (anchor-text chars / text chars — the single
    * strongest boilerplate signal in the readability/boilerpipe
    * lineage: navs, footers and related-link rails are mostly anchor
    * text, prose is mostly not). A block is `content` when it carries
    * at least `minChars` of text at link density ≤ `maxLinkDensity`.
    * Pure per-row column math (split/transform/aggregate — no UDF, no
    * shuffle), RE2-safe, oracle-gated via q_boilerplate. */
  def boilerplateBlocks(docs: DataFrame, idCol: String, htmlCol: String,
                        maxLinkDensity: Double = 0.33,
                        minChars: Int = 15): DataFrame = {
    require(maxLinkDensity >= 0 && minChars >= 1)
    val blocks = split(stripNonContent(col(htmlCol)), blockPattern(SegmentTags))
    docs.select(col(idCol), posexplode(blocks).as(Seq("__bi", "__raw")))
      .select(col(idCol), (col("__bi") + 1).as("block_idx"),
        blockText(col("__raw")).as("block_text"),
        anchorChars(col("__raw")).as("n_anchor_chars"))
      .withColumn("n_chars", length(col("block_text")))
      .filter(col("n_chars") > 0)
      .withColumn("link_density",
        round(col("n_anchor_chars").cast("double") / col("n_chars"), 9))
      .withColumn("content",
        col("n_chars") >= minChars && col("link_density") <= maxLinkDensity)
  }

  /** Boilerplate-pruned extraction: [[extractHtmlText]]'s markup core
    * with [[boilerplateBlocks]]' content gate fused in as a per-row
    * filter — segment, keep blocks passing the density/length gate,
    * join survivors with newlines, decode entities. The crawl-pipeline
    * front (q_crawl_e2e) runs THIS, so navigation rails and footer
    * link farms never reach tokenize/dedup/quality. Same purity
    * contract as the rest of the chain: column math only, identical in
    * the oracle. */
  def extractContentText(html: Column, maxLinkDensity: Double = 0.33,
                         minChars: Int = 15): Column = {
    val blocks = split(stripNonContent(html), blockPattern(SegmentTags))
    val scored = transform(blocks, b =>
      struct(blockText(b).as("t"), anchorChars(b).as("a")))
    // density rounds to 9 dp BEFORE the threshold — the same gate
    // definition as [[boilerplateBlocks]], so the two public faces
    // cannot disagree on a boundary block (float quotients straddling
    // the threshold by <1e-9)
    val content = filter(scored, s =>
      length(s.getField("t")) >= minChars &&
        round(s.getField("a").cast("double") / length(s.getField("t")), 9)
          <= maxLinkDensity)
    decodeEntities(
      array_join(transform(content, _.getField("t")), "\n"))
  }

  /** The named entities decoded at a piece head, most-common tier of
    * real crawl HTML; `&#NNNN;`/`&#xHHHH;` numeric references are
    * handled structurally beside them. Canonical table lives with the
    * kernel; shared with the oracle generator
    * ([[graft.queries.CurationQueries]]) so both engines decode the
    * identical set in the identical order. */
  private[graft] val NamedEntities: Seq[(String, String)] =
    graft.expr.catalyst.TextKernelFunctions.NamedEntities

  /** Single-pass entity decoding: split on the literal '&' and decode
    * each piece's HEAD — named entities ([[NamedEntities]]) or a
    * numeric character reference (`&#NNNN;` decimal / `&#xHHHH;` hex,
    * BMP excluding surrogates — r12 VERDICT item 3: '&#8217;' and
    * '&#x2019;' are among the most frequent tokens in real crawl
    * HTML); anything else keeps its literal '&'. Decoded output is
    * never rescanned, so the decode cannot double ('&amp;lt;' — the
    * literal '&lt;' a page shows its readers — yields '&lt;', and
    * '&#38;amp;' yields '&amp;'), which the old fixed-replace-order
    * chain could only approximate.
    *
    * Fused kernel ([[graft.expr.catalyst.DecodeEntities]]) — the
    * declarative split/transform twin below is parity-pinned in
    * KernelParitySpec and restated by the DuckDB oracle (chr() there,
    * the same single-pass head decode). */
  private[graft] def decodeEntities(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.DecodeEntities(expression(c)))
  }

  /** The declarative twin of [[decodeEntities]] — pure
    * split/transform/concat column math, bit-identical to the kernel
    * (KernelParitySpec). Kept as the executable spec of the decode:
    * interpreted-HOF evaluation makes it ~4× slower on the extraction
    * bench, so the chain runs the kernel. */
  private[graft] def decodeEntitiesDeclarative(c: Column): Column = {
    def hexByte(b: Column): Column = lpad(conv(b, 10, 16), 2, "0")
    // STAGE 1 — per-piece scalars computed ONCE into a materialized
    // struct array: higher-order-function lambdas evaluate interpreted
    // (no codegen, no common-subexpression elimination), so a shared
    // regexp_extract subtree re-RUNS at every reference; staging the
    // codepoint and skip length through a struct turns stage 2's many
    // references into field reads (the 3.6× q_html_extract bench
    // regression of the naive one-stage form). The regexes themselves
    // only run for '#'-headed pieces.
    val staged = transform(split(c, "&"), p => {
      val dec = when(p.startsWith("#"),
        regexp_extract(p, "^#([0-9]{1,6});", 1)).otherwise("")
      val hex = when(p.startsWith("#"),
        regexp_extract(p, "^#[xX]([0-9a-fA-F]{1,5});", 1)).otherwise("")
      struct(p.as("p"),
        when(dec =!= "", dec.cast("long"))
          .when(hex =!= "", conv(hex, 16, 10).cast("long")).as("cp"),
        // '#' + digits + ';'  |  '#x' + hex + ';'
        when(dec =!= "", length(dec) + 2)
          .when(hex =!= "", length(hex) + 3).as("skip"))
    })
    def decodePiece(s: Column): Column = {
      val p = s.getField("p")
      val cp = s.getField("cp")
      val cpOk = cp.isNotNull && cp >= 1 && cp <= 0xFFFF &&
        !(cp >= 0xD800 && cp <= 0xDFFF)
      val utf8 = when(cp < 0x80, hexByte(cp))
        .when(cp < 0x800, concat(
          hexByte(shiftright(cp, 6) + 0xC0),
          hexByte(cp.bitwiseAND(lit(0x3FL)) + 0x80)))
        .otherwise(concat(
          hexByte(shiftright(cp, 12) + 0xE0),
          hexByte(shiftright(cp, 6).bitwiseAND(lit(0x3FL)) + 0x80),
          hexByte(cp.bitwiseAND(lit(0x3FL)) + 0x80)))
      val numeric = when(cpOk,
        concat(decode(unhex(utf8), "UTF-8"),
          p.substr(s.getField("skip") + 1, length(p))))
        .otherwise(concat(lit("&"), p))
      NamedEntities.foldRight(numeric) { case ((ent, repl), els) =>
        when(p.startsWith(ent),
          concat(lit(repl), p.substr(lit(ent.length + 1), length(p))))
          .otherwise(els)
      }
    }
    concat(element_at(staged, 1).getField("p"),
      array_join(transform(
        slice(staged, lit(2), greatest(size(staged) - 1, lit(0))),
        decodePiece(_)), ""))
  }

  /** The document title from raw HTML (first <title> element, tags
    * inside stripped, entities decoded, whitespace collapsed); NULL
    * when absent. */
  def htmlTitle(html: Column): Column = {
    val t = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    val clean = trim(regexp_replace(decodeEntities(
      regexp_replace(t, "(?s)<[^>]*>", " ")), "\\s+", " "))
    nullif(clean, lit(""))
  }

  /** Leakage-safe train/val/test split: assign every document its
    * NEAR-DUP CLUSTER representative (connected components over the
    * candidate-pair graph; documents in no pair are their own rep) and
    * split by a content hash OF THE REP — so every member of a near-dup
    * cluster lands in the SAME split by construction. Splitting per-doc
    * ([[hashBucket]] over the text) only protects EXACT duplicates;
    * near-duplicates straddle the train/test boundary and leak test
    * content into training — the contamination class eval suites are
    * most often burned by. The zero-cross-pair guarantee is
    * spec-pinned, and q_leakage_safe_split emits the naive split
    * alongside so the leak it prevents is visible in the data.
    *
    * Scale shape: components over the PAIR graph (log-round,
    * id-and-label shuffles only), one broadcast-size left join of reps
    * onto ids, and a per-row md5 — the text is never shuffled. Returns
    * (idCol, rep, bucket, split) with the standard 100-percent-bucket
    * [[splitLabel]] semantics. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"need 0 < trainPct and trainPct + valPct <= 100, got $trainPct/$valPct")
    require(!Seq("rep", "bucket", "split", "__cc_id", "__cc_rep").contains(idCol),
      s"idCol '$idCol' collides with an output or internal column of leakageSafeSplit")
    // components emit (id, rep): rename BEFORE joining so an input
    // whose key column is itself named "id" or "rep" (the embedding
    // convention elsewhere in this engine) cannot collide
    val rep = Dedup.connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("rep").as("__cc_rep"))
    val withRep = docs.select(col(idCol))
      .join(rep, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol), coalesce(col("__cc_rep"), col(idCol)).as("rep"))
    val b = hashBucket(col("rep").cast("string"), 100)
    withRep.select(col(idCol), col("rep"), b.as("bucket"),
      splitLabel(b, trainPct, valPct).as("split"))
  }

  /** train/val/test label from a percentage bucket. */
  def splitLabel(bucket: Column, trainPct: Int, valPct: Int): Column =
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))

  /** Budgeted sequence packing: assign docs (in a fixed order per
    * shard) to pack ids so each pack holds ~`budget` tokens. This is
    * the parallel floor-of-running-sum approximation of greedy packing
    * — pack boundaries can overshoot by at most one document, but the
    * assignment is a single windowed cumsum per shard instead of a
    * sequential scan (exact greedy packing is inherently serial).
    * Oversized single docs get their own pack(s) downstream. */
  def packBins(df: DataFrame, shard: Column, order: Seq[Column],
               tokenCount: Column, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shard).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokenCount).over(w))
      .withColumn("pack_id", floor((col("__cum") - tokenCount) / budget))
      .drop("__cum")
  }

  /** Lowercased whitespace tokens (empty strings dropped) — the same
    * token definition as graft.expr.Text, not a parallel one. */
  def tokensOf(text: Column): Column = graft.expr.Text.tokens(lower(text))

  /** Split each document into fixed-size token chunks with `overlap`
    * tokens of carried context — the long-document splitter that runs
    * before packing/training (packBins' "oversized docs get their own
    * packs downstream" made concrete). Chunk i covers tokens
    * [i·stride, i·stride + maxTokens) with stride = maxTokens −
    * overlap; the last chunk may be short; every document yields at
    * least one chunk (empty text → one empty chunk). Output adds
    * (chunk_id, chunk_tokens, chunk_text). Per-row explode, no
    * shuffle — embarrassingly parallel at any scale; expected row
    * growth is n_tokens/stride. */
  def chunkTokens(df: DataFrame, textCol: Column, maxTokens: Int,
                  overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val reserved = Seq("chunk_id", "chunk_tokens", "chunk_text", "__toks", "__n")
    require(reserved.forall(!df.columns.contains(_)),
      s"column names $reserved are reserved by chunkTokens")
    val stride = maxTokens - overlap
    val toks = tokensOf(textCol)
    df.withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")))
      .withColumn("chunk_id",
        explode(sequence(lit(0),
          ceil(greatest(col("__n") - overlap, lit(1)).cast("double") / stride)
            .cast("int") - 1)))
      .withColumn("chunk_tokens",
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)))
      .withColumn("chunk_text", array_join(col("chunk_tokens"), " "))
      .withColumn("chunk_tokens", size(col("chunk_tokens")))
      .drop("__toks", "__n")
  }

  /** Distinct word n-grams via the fused native ShingleArray kernel
    * (graft.expr.catalyst) — one tight loop per row, codegen-friendly.
    * The declarative HOF formulation is a trap here: interpreted
    * lambdas re-evaluate captured subexpression trees PER ELEMENT, so
    * gram-building over an inline tokenize costs grams × tokenize
    * (quadratic per document — measured 20 s vs 1.3 s for 5 k docs).
    * Kernel semantics (Dedup.shingles): texts shorter than n tokens
    * fall back to one whole-text shingle. Exact strings — at 100 TB
    * hash each gram to 8 bytes (xxhash64) before shuffling; exact
    * strings keep the operator oracle-checkable. */
  def wordNgrams(text: Column, n: Int): Column = Dedup.shingles(text, n)

  /** Benchmark-contamination check: for each corpus doc, the number of
    * distinct word `n`-grams it shares with ANY benchmark doc. The
    * benchmark gram set is deduped and broadcast (benchmarks are small
    * by nature); corpus grams explode and semi-join it — corpus text
    * never shuffles. Returns (idCol, n_shared) for contaminated docs
    * only. */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 8,
                    maxBenchGrams: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    val benchGrams = Guard.broadcastSmall(
      benchmark
        .select(explode(wordNgrams(col(benchTextCol), n)).as("gram")).distinct(),
      "contamination benchmark gram set", maxBenchGrams)
    corpus
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared"))
  }

  /** Span-level decontamination — the surgical counterpart of
    * [[contamination]] (which only DETECTS): strip every w-token span
    * of a corpus document that appears verbatim in the benchmark set,
    * keeping the rest of the document. The standard eval-hygiene
    * posture when dropping whole contaminated documents would cost too
    * much data (public recipe: n-gram-overlap decontamination as in
    * GPT-3 appendix C / Brown et al. 2020, applied span-wise).
    *
    * Mechanics reuse the [[Dedup.substringDedup]] window family: the
    * benchmark's distinct window fingerprints broadcast (benchmarks
    * are small — loudly guarded); corpus windows semi-join them; hit
    * positions merge into spans (MergeSpans kernel) and strip. Corpus
    * text never shuffles; the detection exchange carries (id, int,
    * 8-byte hash) rows. Output (id, n_tokens, contam_tokens, n_spans,
    * spans, clean_text) — same contract as substringDedup with the
    * count column renamed. */
  def decontaminateSpans(corpus: DataFrame, idCol: String, textCol: String,
                         benchmark: DataFrame, benchTextCol: String,
                         w: Int = 8,
                         maxBenchGrams: Int = Guard.DefaultMaxBroadcastRows): DataFrame = {
    val (base, wins) = Dedup.windowFrame(corpus, idCol, textCol, w)
    val (_, bwins) = Dedup.windowFrame(
      benchmark.select(lit(0L).as("__bid"), col(benchTextCol).as("__btext")),
      "__bid", "__btext", w)
    val benchHashes = Guard.broadcastSmall(
      bwins.select(col("h")).distinct(),
      "decontamination benchmark window set", maxBenchGrams)
    Dedup.stripSpans(base,
      wins.join(broadcast(benchHashes), Seq("h"), "left_semi"),
      w, "contam_tokens")
  }

  /** C4-style line-filtering rules (Raffel et al. 2020, §2.2 — the
    * publicly described cleaning recipe): a line survives when it ends
    * in terminal punctuation, has at least `minWords` words, and
    * contains none of `lineBlockPhrases`; a document survives when it
    * contains none of `docBlockPhrases` (C4 drops pages with
    * "lorem ipsum" or a curly brace) and keeps at least `minKeptLines`
    * lines. Phrases are matched lowercased. */
  case class LineRules(
      minWords: Int = 3,
      requireTerminalPunct: Boolean = true,
      lineBlockPhrases: Seq[String] = Seq("javascript"),
      docBlockPhrases: Seq[String] = Seq("lorem ipsum", "{"),
      minKeptLines: Int = 1) {
    require(minWords >= 0 && minKeptLines >= 0, "negative rule bounds")
    require((lineBlockPhrases ++ docBlockPhrases).forall(p => p == p.toLowerCase),
      "block phrases must be lowercase (matching is on lowercased text)")
  }

  /** C4-style line-level cleaning: filter each document's lines by
    * [[LineRules]], drop documents that fail the doc-level rules, and
    * add (clean_text, n_lines, n_kept). Pure per-row higher-order
    * functions on the split array — zero shuffle, embarrassingly
    * parallel at any corpus size; the only non-per-row cost a caller
    * adds is their own ORDER BY. Terminal punctuation is a last-char
    * set membership (`. ! ? "`), not a regex — byte-identical across
    * engines, so the whole operator is oracle-exact. */
  def cleanLines(df: DataFrame, text: Column,
                 rules: LineRules = LineRules()): DataFrame = {
    val reserved = Seq("clean_text", "n_lines", "n_kept", "__lines", "__kept")
    require(reserved.forall(!df.columns.contains(_)),
      s"column names $reserved are reserved by cleanLines")
    def keepLine(l: Column): Column = {
      val lt = trim(l)
      val punctOk =
        if (rules.requireTerminalPunct)
          substring(lt, -1, 1).isin(".", "!", "?", "\"")
        else lit(true)
      val wordsOk = size(split(lt, "\\s+", -1)) >= rules.minWords
      val blockOk = rules.lineBlockPhrases
        .map(p => instr(lower(lt), p) === 0)
        .foldLeft(lit(true))(_ && _)
      punctOk && wordsOk && blockOk
    }
    val docOk = rules.docBlockPhrases
      .map(p => instr(lower(text), p) === 0)
      .foldLeft(lit(true))(_ && _)
    df.withColumn("__lines", split(text, "\n"))
      .withColumn("__kept", filter(col("__lines"), keepLine _))
      .filter(docOk && size(col("__kept")) >= rules.minKeptLines)
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .drop("__lines", "__kept")
  }

  /** Corpus-level duplicate-line removal (the RefinedWeb / CCNet
    * boilerplate pass): every line whose text occurs at least
    * `minCount` times ACROSS THE WHOLE CORPUS is removed from every
    * document; adds (clean_text, n_dropped). Catches nav bars, cookie
    * banners, license headers — repetition no within-document pass can
    * see.
    *
    * Scale shape: lines explode to (id, pos, sha2-256) — 32-byte
    * fingerprints shuffle, line text never does. The frequent set is
    * the groupBy's survivors (tiny vs the corpus: only lines repeated
    * minCount+ times); doomed positions aggregate per doc and join
    * back on the id (one corpus-width join — AQE broadcasts it when
    * the doomed set is small). Reconstruction is an indexed-lambda
    * filter per row. sha2-256 rather than xxhash64 because at 10^12
    * lines a 64-bit space yields birthday collisions that would doom
    * innocent lines. */
  def dropGlobalDuplicateLines(df: DataFrame, idCol: String, textCol: String,
                               minCount: Int = 3): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val reserved = Seq("clean_text", "n_dropped", "__lines", "__pos", "__h", "__doomed")
    require(reserved.forall(!df.columns.contains(_)),
      s"column names $reserved are reserved by dropGlobalDuplicateLines")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__l")))
      .select(col(idCol), col("__pos"), sha2(col("__l"), 256).as("__h"))
    val frequent = lines.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select(col("__h"))
    val doomed = lines.join(frequent, Seq("__h"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_set(col("__pos")).as("__doomed"))
    df.join(doomed, Seq(idCol), "left")
      .withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("clean_text",
        when(col("__doomed").isNull, col(textCol))
          .otherwise(array_join(
            filter(col("__lines"), (_, i) => !array_contains(col("__doomed"), i)),
            "\n")))
      .withColumn("n_dropped", coalesce(size(col("__doomed")), lit(0)).cast("long"))
      .drop("__lines", "__doomed")
  }

  /** Gopher document-quality rules (Rae et al. 2021, §A1.1 — the
    * published filter set): per-document boolean flags plus the
    * conjunction `gopher_pass`. Every ratio threshold is evaluated as
    * an integer cross-multiplication (`alpha·5 >= n·4` instead of
    * `alpha/n >= 0.8`), so there is no float-division edge and the
    * operator is oracle-exact. Pure per-row expressions — zero
    * shuffle. Flags:
    *  - word count in [minWords, maxWords]
    *  - mean word length in [3, 10]
    *  - symbol-to-word ratio ('#' and '...') <= 0.1
    *  - >= 80% of words contain an alphabetic character
    *  - >= 2 distinct Gopher stopwords present
    *  - <= 90% of lines start with a bullet; <= 30% end with '...' */
  def gopherFlags(df: DataFrame, text: Column,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    require(minWords >= 0 && minWords <= maxWords, "need 0 <= minWords <= maxWords")
    val reserved = Seq("n_words", "flag_word_count", "flag_mean_word_len",
      "flag_symbol_ratio", "flag_alpha_words", "flag_stopwords",
      "flag_bullet_lines", "flag_ellipsis_lines", "gopher_pass",
      "__toks", "__lines", "__sumlen")
    require(reserved.forall(!df.columns.contains(_)),
      s"column names $reserved are reserved by gopherFlags")
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellChars = length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))
    val out = df
      .withColumn("__toks", graft.expr.Text.tokens(lower(text)))
      .withColumn("__lines", split(text, "\n"))
      .withColumn("__sumlen",
        aggregate(col("__toks"), lit(0), (a, w) => a + length(w)))
      .withColumn("n_words", size(col("__toks")).cast("long"))
      .withColumn("flag_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("flag_mean_word_len",
        col("__sumlen") >= col("n_words") * 3 && col("__sumlen") <= col("n_words") * 10)
      // symbols = hashes + ellChars/3; ratio <= 0.1  ⇔  (3·hashes + ellChars)·10 <= 3·n
      .withColumn("flag_symbol_ratio",
        (hashes * 3 + ellChars) * 10 <= col("n_words") * 3)
      .withColumn("flag_alpha_words",
        size(filter(col("__toks"), w => w.rlike("[a-z]"))) * 5 >= col("n_words") * 4)
      .withColumn("flag_stopwords",
        size(filter(array(stops.map(lit): _*),
          s => array_contains(col("__toks"), s))) >= 2)
      .withColumn("flag_bullet_lines",
        size(filter(col("__lines"),
          l => substring(trim(l), 1, 1).isin("•", "-", "*"))) * 10
          <= size(col("__lines")) * 9)
      .withColumn("flag_ellipsis_lines",
        size(filter(col("__lines"),
          l => substring(trim(l), -3, 3) === "...")) * 10
          <= size(col("__lines")) * 3)
    out
      .withColumn("gopher_pass",
        col("flag_word_count") && col("flag_mean_word_len") &&
          col("flag_symbol_ratio") && col("flag_alpha_words") &&
          col("flag_stopwords") && col("flag_bullet_lines") &&
          col("flag_ellipsis_lines"))
      .drop("__toks", "__lines", "__sumlen")
  }

  /** Incremental corpus-refresh dispositions — the decision tree a
    * continuously-ingesting curation pipeline applies to each arriving
    * batch (q_incr_curation's core, surfaced as an operator):
    *
    *   low_quality  the caller's per-row gate said drop (evaluated
    *                FIRST — cheap per-row work happens before any
    *                signing, so rejected docs never reach the index);
    *   dup_corpus   a band-index candidate against the stored corpus
    *                index confirmed at `confirmThreshold` n-gram
    *                Jaccard;
    *   dup_batch    confirmed against a SMALLER-id batch survivor that
    *                was not itself a corpus dup — a one-level rule,
    *                deterministic without label propagation; longer
    *                chains resolve on the next refresh cycle, exactly
    *                as they would had the docs arrived in separate
    *                batches;
    *   accepted     everything else — the rows to append to the
    *                curated corpus (and whose bands to append to the
    *                index, keeping it coherent for the next batch).
    *
    * `batch` carries (idCol, textCol, lqCol boolean); `corpusBands` is
    * a STORED [[Dedup.bandIndex]] (same shingle/k/bandRows parameters —
    * the index-coherence contract); `corpusDocs` supplies corpus text
    * for the confirm stage (candidate-sized join only). Returns every
    * batch row as (idCol, status).
    *
    * Scale shape: gates per-row; survivors signed ONCE; the corpus is
    * probed through its index (never re-signed, never re-paired);
    * Jaccard reads text for candidate pairs only; shuffle payloads are
    * (id, 16-byte band key) or (id, id) throughout. */
  def refreshDispositions(batch: DataFrame, idCol: String, textCol: String,
                          lqCol: String, corpusDocs: DataFrame,
                          corpusBands: DataFrame, shingleSize: Int = 3,
                          k: Int = 12, bandRows: Int = 2,
                          confirmThreshold: Double = 0.8): DataFrame = {
    // a NULL quality flag must not skip the dedup probe: filter(!lq)
    // excludes null rows from signing, and the null-falsy status CASE
    // would then return 'accepted' for an UNINSPECTED row — an exact
    // corpus duplicate slipping into the curated set. Normalize null
    // to false (not flagged low-quality, but probed like every
    // survivor).
    val lqNorm = coalesce(col(lqCol), lit(false))
    val surv = batch.filter(!lqNorm).select(col(idCol), col(textCol))
    // checkpointed (candidate-pair-sized): cand feeds the Jaccard pass
    // AND the src re-join below — lazy, the corpus-index probe union
    // would re-run once per consumer (guide §1.2)
    val cand = Reliable.checkpoint(Dedup.incrementalCandidates(
      Dedup.bandIndex(surv, idCol, textCol, shingleSize, k, bandRows),
      corpusBands))
    // confirm-stage text: batch survivors + corpus (the only ids that
    // can appear in candidates)
    val texts = surv.unionByName(corpusDocs.select(col(idCol), col(textCol)))
    // checkpointed (confirmed-pair-sized): conf feeds dupCorpus AND
    // dupBatch, and dupCorpus is itself consumed twice — lazy, the
    // ngramJaccard lineage (a full shingle pass over batch ∪ corpus
    // text) re-ran 3–4× per refresh (guide §1.2: the dominant cost of
    // q_incr_curation before this checkpoint)
    val conf = Reliable.checkpoint(Dedup.ngramJaccard(texts, idCol, textCol,
        cand.select(col("id_new").as("id_a"), col("id_match").as("id_b")),
        shingleSize)
      .join(cand.select(col("id_new").as("id_a"),
        col("id_match").as("id_b"), col("src")), Seq("id_a", "id_b"))
      .filter(col("jaccard") >= confirmThreshold))
    val dupCorpus = conf.filter(col("src") === "corpus")
      .select(col("id_a").as(idCol)).distinct()
    val dupBatch = conf.filter(col("src") === "batch")
      .join(dupCorpus.select(col(idCol).as("id_b")), Seq("id_b"), "left_anti")
      .select(col("id_a").as(idCol)).distinct()
    batch
      .join(dupCorpus.withColumn("__dc", lit(1)), Seq(idCol), "left")
      .join(dupBatch.withColumn("__db", lit(1)), Seq(idCol), "left")
      .select(col(idCol),
        when(lqNorm, lit("low_quality"))
          .when(col("__dc") === 1, lit("dup_corpus"))
          .when(col("__db") === 1, lit("dup_batch"))
          .otherwise(lit("accepted")).as("status"))
  }

  /** df + `outCol` holding the intra-document repetition ratio
    * (Gopher-style quality signal): the fraction of word n-gram
    * occurrences that duplicate an earlier occurrence; 0 for texts
    * shorter than n tokens. Distinct-gram count comes from the native
    * kernel; the TOTAL occurrence count needs no gram materialization
    * at all — it is token_count − n + 1 by construction.
    *
    * The token COUNT must use the kernel's own tokenizer (unfiltered
    * `split(trim(lower(text)), "\\s+", -1)` — UTF8String.trim strips
    * spaces only, so a leading tab yields an empty first token the
    * kernel keeps). Counting with the empty-filtered tokenizer instead
    * makes the denominator smaller than the numerator's basis and the
    * ratio can go negative on such inputs. */
  def withDupNgramRatio(df: DataFrame, text: Column, n: Int,
                        outCol: String): DataFrame = {
    require(!df.columns.contains("__n_toks") && !df.columns.contains("__n_distinct"),
      "columns __n_toks, __n_distinct are reserved by withDupNgramRatio")
    df.withColumn("__n_toks", size(split(trim(lower(text)), "\\s+", -1)))
      .withColumn("__n_distinct", size(wordNgrams(text, n)))
      .withColumn(outCol,
        when(col("__n_toks") >= n,
          lit(1.0) - col("__n_distinct").cast("double")
            / (col("__n_toks") - (n - 1)))
        .otherwise(lit(0.0)))
      .drop("__n_toks", "__n_distinct")
  }

  /** BPE merge-table training (Sennrich et al. 2016 — the public
    * byte-pair-encoding recipe): learn the `nMerges` most frequent
    * adjacent-symbol merges, exactly the artifact a subword tokenizer
    * ships. The classic distributed shape: ONE corpus pass builds the
    * word-frequency table, then every training iteration runs on that
    * VOCAB-sized frame (distinct words × counts), never the corpus —
    * at 100 TB the corpus pass dominates and training is noise.
    *
    * Merges are learned in BATCHED ROUNDS (VERDICT r7 item 3 — the
    * per-merge formulation was one driver round-trip + checkpoint per
    * merge, so a 32k-merge vocabulary meant 32k sequential Spark
    * jobs): each round counts pairs once, collects the top
    * `mergesPerRound`+1 candidates (bounded TakeOrdered — the
    * watermark-read scalar posture), and accepts a batch that is
    * PROVABLY identical to learning the same merges one at a time:
    *
    *   - the batch is a NO-SKIP PREFIX of the (freq desc, s1, s2)
    *     candidate order, pairwise SYMBOL-DISJOINT including concat
    *     strings (merging (a,b) only changes counts of pairs touching
    *     a, b, or the new symbol a+b — a disjoint later pick keeps
    *     its exact count and, by the prefix property, every
    *     higher-ordered pair is already merged ahead of it);
    *   - members must beat the first rejected/overflow candidate's
    *     freq STRICTLY: a pair created by an earlier batch merge is
    *     count-bounded by its conflicting pre-image pair (each
    *     (x, a+b) occurrence was an (x, a) adjacency), and every
    *     pre-image is conflicting hence ≤ that break freq — so no
    *     created pair can reach a later batch member's freq;
    *   - a merge whose concat ALREADY EXISTS as a symbol (checked
    *     with one bounded existence probe per round) would add count
    *     to existing pairs, so it is only admitted as the LAST batch
    *     member; duplicate concats inside a batch are rejected by the
    *     same disjointness walk.
    *
    * When no multi-merge batch qualifies the round degrades to the
    * plain argmax (sequential semantics trivially), so progress is
    * guaranteed and the output is ALWAYS the sequential greedy table
    * — CurationSpec asserts mergesPerRound=1 == 16 on fixtures. Each
    * merge applies as a greedy left-to-right non-overlapping fold
    * over each word's symbols (a merged symbol cannot re-merge within
    * the same pass — the standard semantics); a round's merges chain
    * as one projection pipeline and checkpoint ONCE, so driver
    * round-trips and checkpoints drop by ~mergesPerRound×. Words are
    * lowercased whitespace tokens split to characters; no end-of-word
    * marker (document-level token statistics, not a drop-in GPT-2
    * vocab).
    *
    * Returns the merge table (rank, s1, s2, freq), rank 1-based in
    * learn order. Stops early when no pair remains. */
  def bpeMerges(df: DataFrame, textCol: Column, nMerges: Int,
                mergesPerRound: Int = 16): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(mergesPerRound >= 1,
      s"mergesPerRound must be positive, got $mergesPerRound")
    val spark = df.sparkSession
    import spark.implicits._
    // superseded vocab rounds free their localCheckpoint blocks
    // immediately (the connectedComponents leak-class fix): a 32k-merge
    // training run is ~2000 rounds — leaving each round's vocab frame
    // persisted until context-cleaner GC pins thousands of RDDs in
    // executor storage
    val sc = spark.sparkContext
    def trackedCheckpoint(d: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = Reliable.checkpoint(d)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val words = df
      .select(explode(graft.expr.Text.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    var (state, stateIds) = trackedCheckpoint(
      words.select(col("wc"), split(col("w"), "").as("syms")))
    val learned = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (learned.size < nMerges && !exhausted) {
      val want = math.min(mergesPerRound, nMerges - learned.size)
      val zipped = when(size(col("syms")) >= 2,
          arrays_zip(slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1)))
        .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))
      val cands = state.select(col("wc"), explode(zipped).as("p"))
        .groupBy(col("p").getField("0").as("s1"), col("p").getField("1").as("s2"))
        .agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("s1"), col("s2"))
        .limit(want + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cands.isEmpty) exhausted = true
      else {
        // no-skip symbol-disjoint prefix; `used` holds accepted
        // symbols AND concats (a candidate touching either would have
        // its count changed by — or change the count of — an earlier
        // batch merge)
        val accepted = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var break = 0L // freq bound on everything outside the prefix
        var stop = false
        for (c @ (s1, s2, f) <- cands if !stop) {
          if (accepted.size >= want || used(s1) || used(s2) || used(s1 + s2)) {
            break = f; stop = true
          } else { accepted += c; used ++= Seq(s1, s2, s1 + s2) }
        }
        // strict-freq truncation (created-pair tie guard); degrade to
        // the plain argmax rather than stall when ties truncate all
        val prefix = accepted.toList.takeWhile(_._3 > break) match {
          case Nil => accepted.toList.take(1)
          case p   => p
        }
        // concat-existence probe: a merge whose concat is already a
        // live symbol may only close the batch
        val concats = prefix.map(p => p._1 + p._2)
        val colliding = state.select(explode(col("syms")).as("s"))
          .filter(col("s").isin(concats: _*)).distinct()
          .collect().map(_.getString(0)).toSet
        val batch = prefix.indexWhere(p => colliding(p._1 + p._2)) match {
          case -1 => prefix
          case i  => prefix.take(i + 1)
        }
        batch.foreach { case (s1, s2, f) =>
          learned += ((learned.size + 1, s1, s2, f))
        }
        // the round's merges chain as ONE projection pipeline over the
        // vocab frame (Catalyst collapses the selects) — sequential
        // application order, one checkpoint
        val merged = batch.foldLeft(state) { case (st, (s1, s2, _)) =>
          st.select(col("wc"), mergeFold(s1, s2).as("syms"))
        }
        val (next, nextIds) = trackedCheckpoint(merged)
        free(stateIds)
        state = next; stateIds = nextIds
      }
    }
    free(stateIds)
    learned.toSeq.toDF("rank", "s1", "s2", "freq")
      .select(col("rank").cast("long").as("rank"), col("s1"), col("s2"),
        col("freq"))
  }

  /** Greedy left-to-right non-overlapping (s1,s2)→s1+s2 merge over a
    * `syms` array column: fold with a one-symbol carry; a completed
    * merge clears the carry so the new symbol cannot chain-merge in
    * this same pass. */
  private def mergeFold(s1: String, s2: String): Column =
    mergeFoldOn(col("syms"), s1, s2)

  /** [[mergeFold]] over an arbitrary symbol-array column (the trainer
    * binds it to its `syms` state; [[bpeEncodeFoldCol]] binds it inside
    * a per-word lambda). */
  private[graft] def mergeFoldOn(syms: Column, s1: String, s2: String): Column =
    aggregate(syms,
      struct(array().cast("array<string>").as("res"),
        lit(null).cast("string").as("carry")),
      (acc, x) =>
        when(acc.getField("carry") === lit(s1) && x === lit(s2),
          struct(concat(acc.getField("res"), array(lit(s1 + s2))).as("res"),
            lit(null).cast("string").as("carry")))
        .when(acc.getField("carry").isNull,
          struct(acc.getField("res").as("res"), x.as("carry")))
        .otherwise(
          struct(concat(acc.getField("res"),
              array(acc.getField("carry"))).as("res"),
            x.as("carry"))),
      acc => when(acc.getField("carry").isNull, acc.getField("res"))
        .otherwise(concat(acc.getField("res"), array(acc.getField("carry")))))

  /** Materialize a trained merge table ([[bpeMerges]] output or any
    * (rank, s1, s2) frame) into the rank-ordered pair list a tokenizer
    * ships. Bounded collect by design — a merge table IS the vocab-sized
    * artifact (32k–100k rows for production vocabularies), the same
    * scalar-state posture as watermark reads; `maxMerges` fails loudly
    * if someone points this at a non-vocab frame. */
  def collectMerges(merges: DataFrame, maxMerges: Int = 1 << 20): Seq[(String, String)] = {
    val rows = merges.select(col("rank"), col("s1"), col("s2"))
      .orderBy(col("rank")).limit(maxMerges + 1).collect()
    require(rows.length <= maxMerges,
      s"merge table exceeds maxMerges=$maxMerges rows — not a vocab-sized artifact")
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** BPE ENCODE — the apply half of the tokenizer lifecycle
    * ([[bpeMerges]] trains the table; Sennrich et al. 2016): document
    * text → subword token array, applying the merges in rank order,
    * each as one greedy left-to-right non-overlapping pass — byte-exact
    * the trainer's own application semantics, so encoding the training
    * corpus reproduces the trainer's final symbol state (spec-pinned).
    *
    * Scale shape: a fused per-row Catalyst kernel
    * ([[graft.expr.catalyst.BpeEncodeText]]) — the vocab-sized merge
    * table rides inside the serialized expression, the corpus never
    * shuffles, nothing leaves whole-stage codegen, and a per-thread
    * word memo exploits Zipf (the cost per OCCURRENCE of a common word
    * is one hash probe). Tokenization parity with [[tokensOf]]:
    * lower → trim → split `\s+` → drop empties. */
  def bpeEncodeCol(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.BpeEncodeText(expression(text), merges))
  }

  /** [[bpeEncodeCol]] over a trained merge-table frame: collects the
    * bounded table once, encodes `textCol` into `outCol`
    * (array<string>) and `outCol`_n (token count). */
  def bpeEncode(df: DataFrame, textCol: Column, merges: DataFrame,
                outCol: String = "bpe_tokens"): DataFrame = {
    val table = collectMerges(merges)
    df.withColumn(outCol, bpeEncodeCol(textCol, table))
      .withColumn(s"${outCol}_n", size(col(outCol)))
  }

  /** Declarative twin of [[bpeEncodeCol]] — the merge table applied as
    * chained [[mergeFoldOn]] HOF passes inside a per-word lambda (the
    * trainer's literal formulation). One chained expression per merge,
    * so this is the PARITY/ORACLE path for bounded tables, not the
    * production encoder (the kernel is); KernelParitySpec-style
    * equality between the two is driver-visible via q_bpe_encode. */
  def bpeEncodeFoldCol(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(tokensOf(text), w =>
      merges.foldLeft(split(w, "")) { case (syms, (s1, s2)) =>
        mergeFoldOn(syms, s1, s2)
      }))

  /** Every substring of `w` with length 1..maxPieceLen, as one array
    * column (the unigram seed generator — shared by [[unigramTrain]]
    * and the q_unigram anchor restatement so the two cannot drift). */
  def substringPiecesCol(w: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - s + 1)),
        l => w.substr(s, l))))

  /** Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
    * trainer), the second tokenizer family member beside [[bpeMerges]]
    * (VERDICT r14 item 7): where BPE GROWS a vocabulary bottom-up by
    * merge frequency, the unigram model SHRINKS a rich seed vocabulary
    * by likelihood — the pair a training pipeline actually chooses
    * between.
    *
    * Hard-EM over the word-frequency table — corpus-pass + vocab-sized
    * state iterations, the bpeMerges shape:
    *
    *  1. **Seed**: every substring (length ≤ `maxPieceLen`) of every
    *     distinct word, weighted by word count; ALL single characters
    *     plus the top `vocabSize·seedMultiplier` multi-character
    *     substrings by (freq DESC, piece) form the seed vocabulary,
    *     with probabilities proportional to substring frequency.
    *  2. **E-step**: Viterbi-segment every distinct word under the
    *     current piece log-probs ([[graft.expr.catalyst
    *     .UnigramEncodeText]] — the exact kernel the encoder ships, so
    *     train and apply cannot diverge); piece counts are
    *     word-count-weighted.
    *  3. **M-step**: exact MLE, logp = ln(cnt) − ln(Σcnt).
    *     Multi-character pieces unused by any segmentation drop out;
    *     single-character pieces are NEVER dropped (the coverage floor
    *     that keeps every corpus word segmentable) — unused ones carry
    *     an effective −∞ log-prob, so they cannot perturb any Viterbi
    *     choice and the M-step stays the exact maximizer, keeping the
    *     EM objective monotone (UnigramSpec pins the non-decreasing
    *     corpus log-likelihood; q_unigram carries the boolean).
    *  4. **Prune**: keep all single characters + the top
    *     (vocabSize − #chars) multi-character pieces by
    *     (cnt DESC, piece) — SentencePiece's never-prune-characters
    *     rule, so the returned vocabulary still covers the corpus and
    *     the corpus re-encodes with zero `<unk>`.
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency
    * aggregation); every EM pass runs over the DISTINCT-word table
    * with the vocabulary broadcast inside the kernel expression.
    * Driver state is vocab-sized (seed ≤ chars + vocabSize·multiplier
    * rows — the bounded-scalar-read exception, same as bpeMerges'
    * per-round candidate collect); nothing corpus-sized shuffles after
    * the first aggregation.
    *
    * Returns (pieces, llByIter): pieces = (rank, piece, cnt, logp)
    * ranked by (cnt DESC, piece); llByIter = each E-step's
    * word-count-weighted corpus log-likelihood under the probabilities
    * it segmented with. */
  def unigramTrain(df: DataFrame, textCol: Column, vocabSize: Int,
                   emIters: Int = 2, maxPieceLen: Int = 8,
                   seedMultiplier: Int = 4): (DataFrame, Seq[Double]) = {
    require(vocabSize > 0 && emIters >= 1 && maxPieceLen >= 1 &&
      seedMultiplier >= 1,
      s"bad vocabSize=$vocabSize / emIters=$emIters / " +
        s"maxPieceLen=$maxPieceLen / seedMultiplier=$seedMultiplier")
    val spark = df.sparkSession
    import spark.implicits._
    val words = Reliable.checkpoint(
      df.select(explode(tokensOf(textCol)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("wc")))
    val subs = words
      .select(col("wc"),
        explode(substringPiecesCol(col("w"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("freq"))
    val seedSingles = subs.filter(length(col("piece")) === 1)
    val seedMultis = subs.filter(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece"))
      .limit(vocabSize * seedMultiplier)
    // the alphabet — bounded by the charset, never the corpus
    val charSet = seedSingles.select(col("piece")).collect()
      .map(_.getString(0)).toSet
    require(charSet.nonEmpty, "unigramTrain: corpus has no tokens")
    def toVocab(counts: Seq[(String, Long)]): Seq[(String, Double)] = {
      val lnTotal = math.log(counts.iterator.map(_._2).sum.toDouble)
      counts.map { case (p, c) => (p, math.log(c.toDouble) - lnTotal) } ++
        // coverage floor: unused single chars survive at effective -inf
        (charSet -- counts.iterator.map(_._1).toSet).toSeq.sorted.map((_, -1e9))
    }
    var counts: Seq[(String, Long)] = seedSingles.unionByName(seedMultis)
      .orderBy(col("piece")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val lls = scala.collection.mutable.ListBuffer.empty[Double]
    for (_ <- 1 to emIters) {
      val vocab = toVocab(counts)
      val pieceCounts = words.select(col("wc"),
          explode(unigramEncodeCol(col("w"), vocab)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(!pieceCounts.exists(_._1 == graft.expr.catalyst.UnigramKernel.Unk),
        "unigramTrain: a corpus word lost coverage mid-EM — the " +
          "never-drop-characters invariant is broken")
      val lpMap = vocab.toMap
      lls += pieceCounts.iterator.map { case (p, c) => c * lpMap(p) }.sum
      counts = pieceCounts
    }
    val multis = counts.filterNot(p => charSet(p._1))
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - charSet.size))
    val cmap = counts.toMap
    val kept = charSet.toSeq.sorted.map(p => (p, cmap.getOrElse(p, 0L))) ++ multis
    val lpFinal = toVocab(kept.filter(_._2 > 0)).toMap
    val pieces = kept.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => (i + 1L, p, c, lpFinal(p)) }
      .toDF("rank", "piece", "cnt", "logp")
    (pieces, lls.toList)
  }

  /** [[unigramEncodeCol]] over a trained piece frame: collects the
    * bounded vocabulary once, encodes `textCol` into `outCol`
    * (array<string>) and `outCol`_n (token count). */
  def unigramEncode(df: DataFrame, textCol: Column, pieces: DataFrame,
                    outCol: String = "unigram_tokens"): DataFrame = {
    val vocab = collectUnigramVocab(pieces)
    df.withColumn(outCol, unigramEncodeCol(textCol, vocab))
      .withColumn(s"${outCol}_n", size(col(outCol)).cast("long"))
  }

  /** The bounded (piece, logp) collect behind [[unigramEncode]] —
    * loud past `maxPieces` (a runaway "vocabulary" would broadcast to
    * every task inside the kernel expression). */
  def collectUnigramVocab(pieces: DataFrame,
                          maxPieces: Int = 1 << 20): Seq[(String, Double)] = {
    val rows = pieces.select(col("piece"), col("logp"))
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"unigram vocabulary exceeds $maxPieces pieces — not a trained " +
        "tokenizer artifact")
    rows.map(r => (r.getString(0), r.getDouble(1))).toSeq
  }

  /** Viterbi unigram-LM encode as a fused per-row kernel (the APPLY
    * half; [[unigramTrain]] trains). */
  def unigramEncodeCol(text: Column, pieces: Seq[(String, Double)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expr.catalyst.UnigramEncodeText(expression(text), pieces))
  }

  /** Bigram language-model quality score — the CCNet/Gopher-family
    * "LM perplexity" filter (Wenzek et al. 2020 score with a trained
    * LM; here the LM is an add-α-smoothed bigram model trained ON the
    * corpus itself, so the operator is self-contained and
    * engine-portable). For each doc in `score`:
    *
    *   avg_logp = (1/N) Σᵢ ln P(wᵢ | wᵢ₋₁)
    *   P(w₂|w₁) = (c(w₁,w₂) + α) / (c(w₁,·) + α·V)
    *
    * with counts from `train`'s bigrams and V = |distinct second
    * tokens| in training. Low avg_logp = text the corpus LM finds
    * improbable (gibberish, boilerplate soup, wrong language) — the
    * standard perplexity cut-off signal. Docs with fewer than 2 tokens
    * have no bigrams and are absent from the output (same explode
    * semantics in the DuckDB oracle). Training and scoring sets may differ
    * (hold-out split) or coincide (self-scoring); unseen contexts
    * degrade to the smoothed floor α/(α·V) = 1/V, never a log of zero.
    *
    * Scale shapes: tokens explode to (w₁, w₂) pairs — WORD-sized
    * shuffle rows with map-side partial counting, the vocabulary
    * aggregation posture of q_vocab_topk, never document text. The
    * model frames are vocab-bounded (pair counts ≤ V², context counts
    * ≤ V); scoring joins them by hash on the word keys — bigram vocab
    * at web scale (~10⁸ rows) exceeds broadcast, so the shuffle join
    * is the honest default and AQE broadcasts when a small corpus
    * makes the model tiny. V rides a 1-row broadcast cross join (the
    * bounded-scalar posture). The per-doc double sum is rounded to
    * 1e-9 (same contract as BM25 — float addition order across
    * partitions is not associative; the ~1e-13 worst-case wobble on
    * hundreds of terms sits far inside the rounding). */
  def bigramLmScore(train: DataFrame, score: DataFrame, idCol: String,
                    textCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
    // arrays_zip of two slices, NOT transform+element_at: a lambda body
    // re-evaluates its captured argument per element, turning the
    // tokenize chain into O(len²) string work per document; the two
    // slices evaluate it O(1) times per row (measured 8x on the sf0.1
    // fixture — 10.5s to 1.3s)
    def bigrams(df: DataFrame, cols: Column*): DataFrame = {
      val t = graft.expr.Text.tokens(lower(col(textCol)))
      val zipped = when(size(t) >= 2,
          arrays_zip(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1)))
        .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))
      df.select(cols :+ explode(zipped).as("__b"): _*)
        .select(cols :+ col("__b").getField("0").as("w1")
          :+ col("__b").getField("1").as("w2"): _*)
    }
    // No string ever crosses a shuffle: bigrams reduce to 8-byte
    // xxhash64 keys BEFORE the first exchange — __pk keys the pair,
    // __ck the context, __wk the second token (for V). A 64-bit pair
    // collision merges two bigram counts (a per-bigram score wobble of
    // ~1/c, never a failure) with ~n²/2^65 expected collisions — zero
    // for any fixture-scale vocabulary, immaterial at web scale — the
    // same trade [[Dedup.substringDedup]] documents for its window
    // hashes; the DuckDB oracle keeps exact strings and stays
    // hash-green because no collision occurs at oracle scale.
    //
    // ONE explode+shuffle pass over the training corpus, materialized
    // once (Reliable.checkpoint — three consumers below would each
    // re-run the corpus tokenization otherwise); the context counts
    // (c1 = Σ_w2 c12) and vocabulary size (V = |distinct w2|) both
    // derive from the vocab²-bounded pair-count frame, not from
    // re-tokenizing the corpus.
    def keyed(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ xxhash64(col("w1"), col("w2")).as("__pk")
        :+ xxhash64(col("w1")).as("__ck") :+ xxhash64(col("w2")).as("__wk"): _*)
        .drop("w1", "w2")
    val pairCounts = Reliable.checkpoint(
      keyed(bigrams(train)).groupBy(col("__pk"), col("__ck"))
        .agg(count(lit(1)).as("__c12"), first(col("__wk")).as("__wk")))
    val ctxCounts = pairCounts.groupBy(col("__ck"))
      .agg(sum(col("__c12")).as("__c1"))
    val vocab = pairCounts.select(col("__wk")).distinct()
      .agg(count(lit(1)).as("__v"))

    keyed(bigrams(score, col(idCol)), col(idCol))
      .join(pairCounts.select(col("__pk"), col("__c12")), Seq("__pk"), "left")
      .join(ctxCounts, Seq("__ck"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("__c12"), lit(0L)) + lit(alpha)) /
          (coalesce(col("__c1"), lit(0L)) + lit(alpha) * col("__v"))).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__lp")) / count(lit(1)), 9).as("avg_logp"))
  }

  /** k-anonymity suppression (public recipe: Sweeney 2002): drop every
    * row whose quasi-identifier combination is shared by fewer than
    * `k` rows, so no released row can be narrowed below a k-member
    * crowd — the coarse privacy rail a training-data release runs
    * AFTER direct-identifier redaction (PII strips the identifiers;
    * this suppresses the combinations that still single people out).
    * Survivors carry `group_size` so the release manifest can report
    * its anonymity floor.
    *
    * Scale shape: one hash aggregate over the quasi columns (map-side
    * combined, count-only payload) joined back NULL-SAFELY — groupBy
    * keeps the null group, and a missing quasi attribute is the
    * common case, so a plain equi-join would silently exempt null-key
    * rows from suppression (the Linkage lesson). The counts side is
    * distinct-combination-sized; AQE broadcasts it when small. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(quasiCols.forall(df.columns.contains),
      s"quasi columns ${quasiCols.filterNot(df.columns.contains).mkString(", ")} absent")
    require(!df.columns.contains("group_size"),
      "column group_size is produced by kAnonymize — rename the input's")
    val clashes = quasiCols.map(c => s"__ka_$c").filter(df.columns.contains)
    require(clashes.isEmpty,
      s"columns ${clashes.mkString(", ")} are reserved by kAnonymize's " +
        "count join — rename the input's (an ambiguous-reference failure " +
        "or a silent data-column drop otherwise)")
    val counts = quasiCols.foldLeft(
        df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("group_size"))
      )((d, c) => d.withColumnRenamed(c, s"__ka_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__ka_$c")).reduce(_ && _)
    df.join(counts, cond)
      .drop(quasiCols.map(c => s"__ka_$c"): _*)
      .filter(col("group_size") >= k)
  }

  /** l-diversity suppression (public recipe: Machanavajjhala et al.
    * 2007, "l-Diversity: Privacy Beyond k-Anonymity") — the check the
    * privacy literature pairs with [[kAnonymize]]: a k-sized quasi
    * group whose SENSITIVE value is constant still discloses it to
    * anyone who can place a person in the group (the homogeneity
    * attack k-anonymity cannot see). Keeps only rows whose
    * quasi-identifier group contains at least `l` DISTINCT non-null
    * values of `sensitiveCol`; survivors carry (group_size,
    * n_sensitive) for the release manifest. NULL sensitive values do
    * not count toward diversity (an absent attribute protects nobody
    * — counting it would let a group of k nulls plus one real value
    * pass as "diverse" while disclosing that value for every
    * identified member).
    *
    * Scale shape identical to kAnonymize: one hash aggregate over the
    * quasi columns (count + distinct-count payload) joined back
    * NULL-SAFELY — a missing quasi attribute is the common case, and a
    * plain equi-join would silently exempt null-key rows from
    * suppression. Run it AFTER kAnonymize (or with l ≤ expected group
    * size) — the two filters compose. */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require((quasiCols :+ sensitiveCol).forall(df.columns.contains),
      s"columns ${(quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
        .mkString(", ")} absent")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi column — " +
        "each group would have exactly one sensitive value by construction")
    Seq("group_size", "n_sensitive").foreach(c => require(!df.columns.contains(c),
      s"column $c is produced by lDiversify — rename the input's"))
    val clashes = quasiCols.map(c => s"__ld_$c").filter(df.columns.contains)
    require(clashes.isEmpty,
      s"columns ${clashes.mkString(", ")} are reserved by lDiversify's " +
        "count join — rename the input's")
    val counts = quasiCols.foldLeft(
        df.groupBy(quasiCols.map(col): _*)
          .agg(count(lit(1)).as("group_size"),
            countDistinct(col(sensitiveCol)).as("n_sensitive"))
      )((d, c) => d.withColumnRenamed(c, s"__ld_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__ld_$c")).reduce(_ && _)
    df.join(counts, cond)
      .drop(quasiCols.map(c => s"__ld_$c"): _*)
      .filter(col("n_sensitive") >= l)
  }

  /** t-closeness suppression (public recipe: Li, Li & Venkatasubramanian
    * 2007, "t-Closeness: Privacy Beyond k-Anonymity and l-Diversity") —
    * the third privacy rail: a quasi group can be large (k-anonymous)
    * and diverse (l-diverse) and STILL leak via its sensitive-value
    * DISTRIBUTION (a group that is 90% one disease in a 10% corpus
    * discloses strong probabilistic information — the skewness attack).
    * Keeps only rows whose group's sensitive distribution sits within
    * `t` of the global distribution, measured as total variation
    * distance ½·Σ|p_i − q_i| — the paper's EMD with the uniform ground
    * distance, the standard form for CATEGORICAL sensitive attributes
    * (ordered attributes want the ordered-EMD variant). Survivors carry
    * (group_size, tv_dist); group_size is the TOTAL row count of the
    * quasi group — the same meaning as [[kAnonymize]]/[[lDiversify]],
    * so a release manifest reads one group-size semantics across the
    * rails (the non-null-sensitive count is the internal distribution
    * denominator only).
    *
    * NULL handling follows [[lDiversify]]: null sensitive values join
    * neither distribution (they disclose nothing; rows with a null
    * sensitive value in a KEPT group survive with it), null quasi keys
    * group and suppress null-safely, and a group whose sensitive
    * values are ALL null has no distribution to certify — it
    * suppresses entirely (the conservative reading). Determinism: the per-group
    * distance folds |p−q| over a SORTED category list (sequential
    * double accumulation — the NearestCents precedent), then rounds to
    * 9 dp, so the kept row set is bit-stable across partitionings and
    * engines even for groups near the threshold.
    *
    * Scale shape: two hash aggregates (global category counts — a
    * category-sized frame, broadcast; per-(group, category) counts) and
    * one distinct-combination × category expansion for the
    * absent-category |0 − q_i| terms — all fixed-width count rows, the
    * corpus never shuffles twice. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double,
                 maxCategories: Int = DefaultMaxCategories): DataFrame =
    tClosenessImpl(df, quasiCols, sensitiveCol, t, ordered = false,
      maxCategories)

  /** [[tCloseness]] for ORDERED sensitive attributes (income bands,
    * length buckets, severity grades): the distance is the paper's
    * ordered EMD — mass must TRAVEL across the value order, so
    * dist = Σᵢ|Σ_{j≤i}(p_j − q_j)| / (m − 1) over the m categories in
    * sorted order. The categorical TV distance would call a group
    * skewed toward ADJACENT buckets exactly as leaky as one skewed to
    * the far tail; the ordered form charges by displacement, which is
    * the actual disclosure for ordinal attributes. Cumulative sums and
    * the outer fold both run as slice-prefix sequential folds over the
    * sorted category list — the structure the oracle mirrors term for
    * term, so the distance is bit-stable cross-engine. Same null and
    * grouping contracts as [[tCloseness]]. */
  def tClosenessOrdered(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String, t: Double,
                        maxCategories: Int = DefaultMaxCategories): DataFrame =
    tClosenessImpl(df, quasiCols, sensitiveCol, t, ordered = true,
      maxCategories)

  /** Cap on the sensitive attribute's category cardinality for both
    * t-closeness forms. The plan expands every quasi group to the FULL
    * category list (the absent-category |0 − q| terms) and folds the
    * per-group distance over an m-element array — t-closeness is
    * defined for CATEGORICAL/ordinal attributes (Li et al. 2007), and
    * a high-cardinality column fed here (an id, a free-text field)
    * would silently turn the expansion into groups × corpus work. */
  val DefaultMaxCategories: Int = 10000

  private def tClosenessImpl(df: DataFrame, quasiCols: Seq[String],
                             sensitiveCol: String, t: Double,
                             ordered: Boolean,
                             maxCategories: Int): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"t must be in (0, 1], got $t")
    require(maxCategories >= 1, "maxCategories must be >= 1")
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require((quasiCols :+ sensitiveCol).forall(df.columns.contains),
      s"columns ${(quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
        .mkString(", ")} absent")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi column")
    Seq("group_size", if (ordered) "emd_dist" else "tv_dist")
      .foreach(c => require(!df.columns.contains(c),
        s"column $c is produced by tCloseness — rename the input's"))
    val clashes = quasiCols.map(c => s"__tc_$c").filter(df.columns.contains)
    require(clashes.isEmpty,
      s"columns ${clashes.mkString(", ")} are reserved by tCloseness's " +
        "stats join — rename the input's")
    val s = col(sensitiveCol)
    // global categorical distribution over non-null sensitive values,
    // CHECKPOINTED: the cardinality rail below executes it eagerly, and
    // without materialization the guard would pay the full upstream
    // lineage once at plan-build time and the real plan again at
    // execution (the Guard.broadcastSmall discipline — guard and
    // consumers read one computed, category-sized copy)
    val nonNull = df.filter(s.isNotNull)
    val global = Reliable.checkpoint(
      nonNull.groupBy(s.as("__cat")).agg(count(lit(1)).as("__gc")))
    // loud cardinality rail BEFORE the groups × categories expansion
    // executes: a limit+count, never a full count of a runaway column.
    // limit is overflow-safe: maxCategories = Int.MaxValue (the
    // documented no-cap idiom elsewhere in this API) must disable the
    // rail, not crash on Int.MaxValue + 1.
    val lim = if (maxCategories == Int.MaxValue) maxCategories
              else maxCategories + 1
    val nCats = global.limit(lim).count()
    require(nCats <= maxCategories,
      s"tCloseness sensitive column $sensitiveCol has > $maxCategories " +
        "distinct values — t-closeness is a categorical/ordinal rail and " +
        "the plan expands every quasi group to the full category list; " +
        "bucket the column first or raise maxCategories explicitly")
    val globalTot = global.agg(sum(col("__gc")).as("__gt"))
    val q = global.crossJoin(broadcast(globalTot))
      .select(col("__cat"), (col("__gc").cast("double") / col("__gt")).as("__q"))
    // per-(group, category) counts + per-group totals. __n (non-null
    // sensitive rows) is the distribution denominator; __nt (ALL rows
    // of the quasi group) is the emitted group_size — the same
    // semantics as kAnonymize/lDiversify, so a release manifest reads
    // one group-size meaning across the three rails (ADVICE r10).
    // count(s) skips nulls, so one aggregate produces both; all-null
    // groups (__n = 0) have no distribution and suppress entirely.
    val byGroupCat = nonNull
      .groupBy((quasiCols.map(col) :+ s.as("__cat")): _*)
      .agg(count(lit(1)).as("__c"))
    val groupTot = df.groupBy(quasiCols.map(col): _*)
      .agg(count(s).as("__n"), count(lit(1)).as("__nt"))
      .filter(col("__n") > 0)
    // expand every group to the FULL category list (absent categories
    // contribute |0 - q_i|), then fold |p - q| in sorted-category order
    val expanded = groupTot.crossJoin(broadcast(q))
      .join(byGroupCat,
        quasiCols.map(c => groupTot(c) <=> byGroupCat(c))
          .reduce(_ && _) && q("__cat") === byGroupCat("__cat"),
        "left")
      .select((quasiCols.map(groupTot(_)) ++ Seq(
        groupTot("__n"), groupTot("__nt"), q("__cat"), q("__q"),
        (coalesce(byGroupCat("__c"), lit(0L)).cast("double") / groupTot("__n"))
          .as("__p"))): _*)
    val distExpr: Column = {
      val terms = col("__terms")
      if (!ordered)
        round(aggregate(terms, lit(0.0d),
          (acc, e) => acc + abs(e.getField("__p") - e.getField("__q"))) / 2.0, 9)
      else {
        // ordered EMD: |prefix sums of (p - q)| in sorted-category
        // order, normalized by (m - 1). ONE O(m) pass with a
        // (running, acc) accumulator — running_i = running_{i-1} + d_i
        // is the identical IEEE addition sequence the O(m²)
        // slice-prefix form folded (left-fold prefix == running sum),
        // so the emitted distance is bit-equal to it and to the
        // oracle's slice restatement. The i = m prefix is
        // mathematically zero; its FP residue is kept — both engines
        // compute the identical fold.
        val diffs = transform(terms,
          e => e.getField("__p") - e.getField("__q"))
        val m = size(terms)
        val folded = aggregate(diffs,
          struct(lit(0.0d).as("run"), lit(0.0d).as("acc")),
          (st, x) => struct(
            (st.getField("run") + x).as("run"),
            (st.getField("acc") + abs(st.getField("run") + x)).as("acc")),
          st => st.getField("acc"))
        when(m === 1, lit(0.0d)).otherwise(
          round(folded / (m - 1).cast("double"), 9))
      }
    }
    val distCol = if (ordered) "emd_dist" else "tv_dist"
    val dists = expanded
      .groupBy(quasiCols.map(col): _*)
      .agg(first(col("__nt")).as("group_size"),
        sort_array(collect_list(struct(col("__cat"), col("__p"), col("__q"))))
          .as("__terms"))
      .select((quasiCols.map(col) :+ col("group_size") :+
        distExpr.as(distCol)): _*)
    val stats = quasiCols.foldLeft(dists)(
      (d, c) => d.withColumnRenamed(c, s"__tc_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__tc_$c")).reduce(_ && _)
    df.join(stats, cond)
      .drop(quasiCols.map(c => s"__tc_$c"): _*)
      .filter(col(distCol) <= t)
  }
}
