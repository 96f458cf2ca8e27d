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

  /** Matched pairs + diverted oversized blocks. */
  final case class LinkageResult(pairs: DataFrame, flagged: DataFrame)

  /** Candidate pairs within blocks, kept when
    * `levenshtein(name_a, name_b) <= maxDist`.
    *
    * Output `pairs`: (id_a, id_b, dist) with id_a < id_b;
    * `flagged`: (block_key, n_ids) for blocks larger than `maxBlock`.
    * Ids must be distinct across records (the linkage key contract). */
  def linkPairs(records: DataFrame, idCol: String, nameCol: String,
                blockKey: Column, maxDist: Int,
                maxBlock: Int = 1000): LinkageResult = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val keyed = records
      .select(blockKey.as("block_key"),
        struct(col(idCol).as("id"), col(nameCol).as("name")).as("rec"))
    // size blocks BEFORE collecting: a junk-key flood block would
    // otherwise materialize its full membership in one agg buffer and
    // kill the task before the size filter could drop it — the count
    // agg is map-side-combined and carries (key, long) only
    val flagged = keyed.groupBy(col("block_key"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxBlock)
    val blocks = keyed
      .join(flagged.select(col("block_key")), Seq("block_key"), "left_anti")
      .groupBy(col("block_key"))
      .agg(sort_array(collect_list(col("rec"))).as("recs"))
    val pairs = blocks
      .filter(size(col("recs")) > 1)
      // Dedup.pairsFromSortedIds is element-type-agnostic: over the
      // sorted struct array it yields each unordered pair once with
      // id_a/id_b holding the (id, name) structs
      .select(explode(Dedup.pairsFromSortedIds(col("recs"))).as("p"))
      .select(col("p.id_a.id").as("id_a"), col("p.id_b.id").as("id_b"),
        levenshtein(col("p.id_a.name"), col("p.id_b.name")).as("dist"))
      .filter(col("dist") <= maxDist)
      // a record may land in several blocks when blockKey is derived
      // multi-valued upstream; keep each edge once (min dist is the
      // deterministic pick)
      .groupBy(col("id_a"), col("id_b")).agg(min(col("dist")).as("dist"))
    LinkageResult(pairs, flagged)
  }

  /** Full resolution: every input record mapped to its canonical
    * entity — (id, canonical_id, entity_size). Records in no match
    * pair are their own singleton entity. One extra left join over
    * [[linkPairs]] + components; strings never shuffle past pair
    * generation. */
  def resolveEntities(records: DataFrame, idCol: String, nameCol: String,
                      blockKey: Column, maxDist: Int,
                      maxBlock: Int = 1000): DataFrame = {
    val matched = linkPairs(records, idCol, nameCol, blockKey, maxDist, maxBlock)
    val comps = Dedup.connectedComponents(
      matched.pairs.select(col("id_a"), col("id_b")))
    records.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("rep"), col("id")).as("canonical_id"),
        coalesce(col("cluster_size"), lit(1L)).as("entity_size"))
  }
}
