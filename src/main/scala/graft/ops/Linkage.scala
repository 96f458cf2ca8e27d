package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find records that describe the
  * same real-world entity despite textual noise (typos, reformatting)
  * and collapse them to one canonical id.
  *
  * Beyond-reference (north-star) surface: the classic blocking
  * architecture every large-scale linkage system uses —
  *
  *  1. BLOCK: a caller-supplied cheap key (phonetic code, sorted
  *     token prefix, suffix digits …) partitions records so that true
  *     matches co-occur in a block. Pair generation is BLOCK-LOCAL:
  *     nothing all-pairs ever runs, the global O(n²) is reduced to
  *     Σ|block|² with |block| capped.
  *  2. COMPARE: exact Levenshtein edit distance on the pair's strings
  *     (both engines' built-in — the oracle recomputes it), keeping
  *     pairs within `maxDist`.
  *  3. RESOLVE: transitive closure over the match graph via
  *     [[Dedup.connectedComponents]] (min-label propagation,
  *     O(diameter) rounds); canonical id = component minimum.
  *
  * Scale posture: records shuffle ONCE on the block key; within-block
  * combinatorics run on collected (id, name) structs with block size
  * capped at `maxBlock` — oversized blocks (junk keys: empty names,
  * boilerplate) are diverted to a `flagged` side output for
  * cluster-level handling instead of silently exploding a task (the
  * [[Dedup.pruneOversizedBuckets]] posture). Downstream of pair
  * generation only (id, id) edges move — never the strings.
  */
object Linkage {

  /** Matched pairs + diverted oversized blocks + the block-size
    * distribution report ([[Scale.sizeDistribution]] over per-block
    * counts — the Σ|block|² instrumentation to watch as data grows:
    * linkage work tracks this DISTRIBUTION, not corpus size). */
  final case class LinkageResult(pairs: DataFrame, flagged: DataFrame,
                                 blockReport: DataFrame)

  /** Candidate pairs within blocks, kept when
    * `levenshtein(name_a, name_b) <= maxDist`.
    *
    * Output `pairs`: (id_a, id_b, dist) with id_a < id_b;
    * `flagged`: (block_key, n_ids) for blocks larger than `maxBlock`;
    * `blockReport`: log2-bucketed block-size distribution (ALL blocks,
    * flagged included — the report exists to expose them).
    * Ids must be distinct across records (the linkage key contract).
    *
    * Within-block pairing is SUB-BLOCK SALTED so one near-`maxBlock`
    * block cannot run its whole |b|²/2 comparison load in a single
    * task: members hash into g = ⌈|b|/targetSub⌉ sub-groups (g = 1 for
    * ordinary blocks — the common case degenerates to plain block-local
    * pairing), and pair generation fans out over the g·(g+1)/2 cells of
    * the sub-group × sub-group upper triangle — the same triangle
    * decomposition as [[Dedup.simhashPairs]]' banding, here over an
    * explicit hash salt. Each unordered member pair lands in EXACTLY
    * one cell (the (min, max) of its two sub-groups), so the pair set
    * is identical to unsalted block-local generation (LinkageSpec pins
    * set equality); each cell's task compares ~2·targetSub members
    * instead of |b|. Cost: each member replicates g times (g small by
    * construction); collected agg buffers shrink from |b| to ~2·targetSub. */
  def linkPairs(records: DataFrame, idCol: String, nameCol: String,
                blockKey: Column, maxDist: Int,
                maxBlock: Int = 1000, targetSub: Int = 256): LinkageResult = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    require(targetSub >= 2, s"targetSub must be >= 2, got $targetSub")
    val keyed = records
      .select(blockKey.as("block_key"),
        struct(col(idCol).as("id"), col(nameCol).as("name")).as("rec"))
    // size blocks BEFORE collecting: a junk-key flood block would
    // otherwise materialize its full membership in one agg buffer and
    // kill the task before the size filter could drop it — the count
    // agg is map-side-combined and carries (key, long) only
    val counts = keyed.groupBy(col("block_key"))
      .agg(count(lit(1)).as("n_ids"))
    val flagged = counts.filter(col("n_ids") > maxBlock)
    val report = Scale.sizeDistribution(counts, "n_ids")
    // per-record sub-group: deterministic id hash into the block's g
    // sub-groups; the block size rides in via an equi-join on the
    // block key (the same shuffle key the grouping uses). NULL-SAFE
    // equality: groupBy keeps the null-key block (a missing blocking
    // attribute is the common real-world case), so a plain equi-join
    // here would silently exclude those records from pairing while
    // blockReport still counted them — the null block must pair,
    // cap, and divert exactly like any other
    val sized = keyed
      .join(counts.filter(col("n_ids") <= maxBlock)
          .withColumnRenamed("block_key", "__bk"),
        col("block_key") <=> col("__bk"))
      .drop("__bk")
      .withColumn("__g", ceil(col("n_ids") / lit(targetSub)).cast("int"))
      .withColumn("__sg", pmod(xxhash64(col("rec.id")), col("__g")).cast("int"))
    // a record in sub-group s attends the g cells {(min(i,s), max(i,s))}
    // of the upper triangle — each exactly once
    val celled = sized.select(col("block_key"), col("rec"), col("__sg"),
      explode(transform(sequence(lit(0), col("__g") - 1),
        i => struct(least(i, col("__sg")).as("ci"),
          greatest(i, col("__sg")).as("cj")))).as("cell"))
    val cells = celled
      .groupBy(col("block_key"), col("cell"))
      .agg(sort_array(collect_list(
        struct(col("__sg").as("sg"), col("rec").as("rec")))).as("ms"))
      .filter(size(col("ms")) > 1)
    def recsOf(sg: Column) = transform(
      filter(col("ms"), m => m.getField("sg") === sg), m => m.getField("rec"))
    // diagonal cell: every member shares the cell's sub-group, and the
    // (sg, rec) sort makes the rec projection sorted —
    // Dedup.pairsFromSortedIds is element-type-agnostic and yields each
    // unordered (id, name)-struct pair once
    val diagPairs = Dedup.pairsFromSortedIds(
      transform(col("ms"), m => m.getField("rec")))
    // off-diagonal cell: full cross of the two sub-group member lists,
    // normalized so id_a < id_b (ids are distinct by contract)
    val crossPairs = flatten(transform(recsOf(col("cell.ci")), a =>
      transform(recsOf(col("cell.cj")), b =>
        when(a.getField("id") < b.getField("id"),
          struct(a.as("id_a"), b.as("id_b")))
          .otherwise(struct(b.as("id_a"), a.as("id_b"))))))
    val pairs = cells
      .select(explode(when(col("cell.ci") === col("cell.cj"), diagPairs)
        .otherwise(crossPairs)).as("p"))
      .select(col("p.id_a.id").as("id_a"), col("p.id_b.id").as("id_b"),
        levenshtein(col("p.id_a.name"), col("p.id_b.name")).as("dist"))
      .filter(col("dist") <= maxDist)
      // a record may land in several blocks when blockKey is derived
      // multi-valued upstream; keep each edge once (min dist is the
      // deterministic pick)
      .groupBy(col("id_a"), col("id_b")).agg(min(col("dist")).as("dist"))
    LinkageResult(pairs, flagged, report)
  }

  /** Full resolution: every input record mapped to its canonical
    * entity — (id, canonical_id, entity_size). Records in no match
    * pair are their own singleton entity. One extra left join over
    * [[linkPairs]] + components; strings never shuffle past pair
    * generation. */
  def resolveEntities(records: DataFrame, idCol: String, nameCol: String,
                      blockKey: Column, maxDist: Int,
                      maxBlock: Int = 1000, targetSub: Int = 256): DataFrame = {
    val matched = linkPairs(records, idCol, nameCol, blockKey, maxDist,
      maxBlock, targetSub)
    val comps = Dedup.connectedComponents(
      matched.pairs.select(col("id_a"), col("id_b")))
    records.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("rep"), col("id")).as("canonical_id"),
        coalesce(col("cluster_size"), lit(1L)).as("entity_size"))
  }
}
