package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy ENTITY RESOLUTION (record linkage) — the classic
 * blocking + verify + rank pipeline (Fellegi–Sunter framing,
 * Christen 2012's textbook blocking architecture): dirty mentions are
 * matched against a clean entity catalog without ever forming the
 * all-pairs product. The reference has no linkage operator; this is
 * part of the LLM-pipeline layer (entity linking of noisy source
 * metadata — site names, author strings, product titles — against a
 * curated catalog is a standard corpus-curation join).
 *
 * Scale shape (the whole point): the entity CATALOG is the small
 * side — catalogs are entity-sized (thousands..millions), mentions
 * are corpus-sized (billions). Every operator here:
 *   1. aggregates the catalog once (two-phase, map-side combinable),
 *   2. broadcasts a BLOCK INDEX of it (block key → candidate set),
 *   3. streams mentions through ONE broadcast hash join + row-local
 *      verify — mentions are never shuffled, never exploded beyond
 *      their block's candidate list, and the edit-distance verify is
 *      Spark's thresholded `levenshtein(l, r, d)` (banded DP, O(len·d)
 *      per pair, codegen'd) — never the full O(len²) matrix.
 * [[bestMatches]] goes one step further: the index row carries the
 * block's candidates as an ARRAY, so the argmin is a row-local
 * `array_min` over structs — zero shuffle end to end on the mention
 * side (PlanShapeSpec pins it).
 *
 * Blocking contract: TWO complementary passes, candidates unioned
 * before the verify (the multi-pass architecture Christen 2012
 * prescribes — "same shape, more index rows"):
 *   - pass 1: key = (first [[BlockPrefixLen]] chars, length ±maxDist);
 *   - pass 2: key = (LAST [[BlockPrefixLen]] chars, length ±maxDist) —
 *     a single edit damages the prefix or the suffix, never both
 *     (at length ≥ 2·[[BlockPrefixLen]]), so the union's recall is
 *     exact for ANY single-edit corruption, and er_blocking_eval
 *     measures both per-pass and unioned completeness.
 * The passes stay disjoint by a ROW-LOCAL predicate (pass 2 keeps
 * only different-prefix pairs), so the union needs no distinct — no
 * exchange on the corpus-sized candidate relation.
 */
object LinkOps {

  /** Blocking-prefix length: long enough to split the catalog into
   *  many blocks, short enough that typical typos land past it. */
  val BlockPrefixLen = 3

  /** Blocking key of a name — the first [[BlockPrefixLen]] chars. */
  def blockKey(name: Column): Column =
    substring(name, 1, BlockPrefixLen)

  /** Second-pass blocking key — the LAST [[BlockPrefixLen]] chars:
   *  the complementary pass that recovers prefix-damaged corruptions
   *  (a deletion before the tail leaves the tail's CONTENT intact
   *  even though every position shifts). */
  def suffixKey(name: Column): Column =
    substring(name, -BlockPrefixLen, BlockPrefixLen)

  /** Entity catalog from a (possibly duplicated) reference relation:
   *  one row per distinct surface form, canonical `entity_id` = the
   *  smallest source key carrying it (the dedup_exact keeper
   *  convention). One two-phase agg — catalog-sized output. */
  def entityCatalog(df: DataFrame, id: Column, name: Column): DataFrame =
    df.groupBy(name.as("entity_name")).agg(min(id).as("entity_id"))
      .select(col("entity_id"), col("entity_name"))

  /** The broadcastable block index under `keyFn`: every entity
   *  appears under the (key, len + d) keys for d in
   *  [-maxDist, maxDist] — an edit within the distance budget changes
   *  length by at most maxDist, so a mention joins EXACTLY the blocks
   *  that can contain its entity.
   *  (2·maxDist + 1) × |catalog| rows, ints and short strings. */
  private def blockIndex(entities: DataFrame, maxDist: Int,
      keyFn: Column => Column): DataFrame =
    entities
      .select(col("entity_id"), col("entity_name"),
        keyFn(col("entity_name")).as("blk"),
        explode(array((-maxDist to maxDist).map(lit): _*)).as("d"))
      .select(col("blk"), (length(col("entity_name")) + col("d")).as("mlen"),
        col("entity_id"), col("entity_name"))

  /** RAW blocked pairs of ONE pass — the blocker's output BEFORE the
   *  edit-distance verify (what blocking-quality metrics measure:
   *  pair completeness counts true pairs surviving to here, reduction
   *  ratio counts how much of the cross product this stage prunes).
   *  `mentions` must carry (mention_id, mention); all other columns
   *  pass through. */
  def blockedPairs(mentions: DataFrame, entities: DataFrame,
      maxDist: Int, keyFn: Column => Column = blockKey,
      hintBroadcast: Boolean = true): DataFrame =
    mentions.join(
        maybeBroadcast(blockIndex(entities, maxDist, keyFn),
          hintBroadcast),
        keyFn(col("mention")) === col("blk") &&
          length(col("mention")) === col("mlen"))
      .drop("blk", "mlen")

  /** BOTH passes' raw blocked pairs, unioned DISJOINTLY with a `pass`
   *  tag (1 = prefix, 2 = suffix-only): the pass-2 side keeps only
   *  pairs whose PREFIXES differ — a row-local predicate on the
   *  joined pair, so the union is exact with no distinct and no
   *  exchange on the corpus-sized candidate relation. */
  /** CALLER CONTRACT: pass a MATERIALIZED `entities` frame
   *  (localCheckpoint) when it is derived by an aggregation — both
   *  pass branches (and typically the caller's own entity count)
   *  re-evaluate it otherwise; erBlockingEval checkpoints once and
   *  feeds all three consumers. */
  def blockedPairsUnion(mentions: DataFrame, entities: DataFrame,
      maxDist: Int, hintBroadcast: Boolean = true): DataFrame =
    blockedPairs(mentions, entities, maxDist, blockKey, hintBroadcast)
      .withColumn("pass", lit(1))
      .unionAll(
        blockedPairs(mentions, entities, maxDist, suffixKey,
            hintBroadcast)
          .filter(blockKey(col("mention")) =!=
            blockKey(col("entity_name")))
          .withColumn("pass", lit(2)))

  /** Candidate (mention, entity) pairs with edit distance ≤ maxDist:
   *  [[blockedPairs]] + the thresholded levenshtein verify in the
   *  join projection. */
  def blockedCandidates(mentions: DataFrame, entities: DataFrame,
      maxDist: Int, hintBroadcast: Boolean = true): DataFrame =
    blockedPairs(mentions, entities, maxDist,
        hintBroadcast = hintBroadcast)
      .withColumn("lev",
        levenshtein(col("mention"), col("entity_name"), maxDist)
          .cast("bigint"))
      .filter(col("lev") >= 0)

  /** The block-ARRAY form of one pass's index: one row per (key, len)
   *  carrying the block's candidate array — what [[resolveAgainst]]
   *  joins, so a mention meets at most ONE index row PER PASS. Built
   *  once per consumer in batch; the live gate materializes both
   *  passes at topology build
   *  ([[graft.streaming.StreamOps.erGateStream]]). */
  def blockArrayIndex(entities: DataFrame, maxDist: Int,
      keyFn: Column => Column = blockKey): DataFrame =
    blockIndex(entities, maxDist, keyFn)
      .groupBy(col("blk"), col("mlen"))
      .agg(collect_list(struct(col("entity_id"), col("entity_name")))
        .as("cands"))

  /** One pass's row-local argmin: the candidate array verified with
   *  thresholded levenshtein, reduced by `array_min` over
   *  struct(lev, entity_id, entity_name) — ties to the smaller
   *  entity_id by struct ordering. NULL when the mention missed the
   *  pass's block (left-join null propagates through
   *  transform/filter/array_min). */
  private def passBest(mention: Column, cands: Column,
      maxDist: Int): Column =
    array_min(filter(
      transform(cands, e =>
        struct(
          levenshtein(mention, e("entity_name"), maxDist)
            .cast("bigint").as("lev"),
          e("entity_id").as("entity_id"),
          e("entity_name").as("entity_name"))),
      s => s("lev") >= 0))

  /** Resolution against prebuilt [[blockArrayIndex]] frames (pass 1 =
   *  prefix-keyed, pass 2 = suffix-keyed) — the ONE definition batch
   *  [[bestMatches]] and the live er gate share (stream == batch by
   *  construction): one broadcast left join PER PASS, then a
   *  row-local [[passBest]] argmin per pass combined with `least`
   *  (null-skipping; struct ordering = the GLOBAL best across both
   *  passes, ties to the smaller entity_id). LEV-0 FAST PATH: when
   *  the prefix pass verifies an EXACT match, the suffix probe is
   *  skipped ROW-LOCALLY (`when` branches short-circuit in codegen) —
   *  sound because a lev-0 candidate shares the mention's surface
   *  form, hence its prefix block, so EVERY lev-0 entity (including
   *  the smallest-id tiebreak winner) is already in the prefix
   *  pass's array; the suffix pass can only add lev ≥ 1 candidates
   *  the argmin would discard. Identity with the always-both-probes
   *  form is spec-pinned on the full corruption mix plus exact
   *  mentions (LinkOpsSpec). Unmatched mentions keep a NULL `best`, so
   *  the caller can count coverage. Mentions still never shuffle:
   *  two broadcast joins, everything else per-row. */
  def resolveAgainst(mentions: DataFrame, idxPrefix: DataFrame,
      idxSuffix: DataFrame, maxDist: Int,
      hintBroadcast: Boolean = true): DataFrame =
    mentions
      .join(maybeBroadcast(idxPrefix
          .withColumnRenamed("cands", "cands1"), hintBroadcast),
        blockKey(col("mention")) === col("blk") &&
          length(col("mention")) === col("mlen"),
        "left")
      .drop("blk", "mlen")
      .join(maybeBroadcast(idxSuffix
          .withColumnRenamed("cands", "cands2"), hintBroadcast),
        suffixKey(col("mention")) === col("blk") &&
          length(col("mention")) === col("mlen"),
        "left")
      .drop("blk", "mlen")
      .withColumn("best1", passBest(col("mention"), col("cands1"), maxDist))
      .withColumn("best",
        when(col("best1")("lev") === 0, col("best1"))
          .otherwise(least(col("best1"),
            passBest(col("mention"), col("cands2"), maxDist))))
      .drop("cands1", "cands2", "best1")

  /** Candidate-ENTRY budget for the FORCED broadcast hint — the same
   *  semantics (and the same 4M figure) as the live gates' refusal
   *  caps: a block index holds (2·maxDist + 1) × |catalog| entries
   *  per pass, and THAT is what gets broadcast, so the budget is
   *  compared against the entry count, not the raw catalog count
   *  (comparing catalogs would admit broadcasts 5× past the
   *  calibrated cap). Past it the block-index joins fall back to the
   *  planner's shuffled equi-joins — correct and scalable (mentions
   *  pay one exchange PER PASS, prefix- then suffix-keyed), where a
   *  forced broadcast of an entity-scale index would OOM the
   *  executors. The graph family's adaptive-broadcast convention
   *  (triangles' closing side). */
  val MaxBroadcastEntities = 4000000L

  /** Block-index entries one pass broadcasts for a catalog of `n`. */
  def indexEntries(n: Long, maxDist: Int): Long =
    n * (2L * maxDist + 1L)

  /** The broadcast hint, applied only when the caller KNOWS the small
   *  side fits — a hint is a command, not a suggestion, and forcing
   *  it on an entity-scale index is the one way this operator family
   *  could fall over at 100 TB. */
  private def maybeBroadcast(df: DataFrame, hint: Boolean): DataFrame =
    if (hint) broadcast(df) else df

  /** Best match per mention WITHOUT shuffling mentions (when the
   *  catalog fits the broadcast budget — measured, not assumed):
   *  [[resolveAgainst]] over freshly-built prefix + suffix
   *  [[blockArrayIndex]] passes. The catalog aggregation is
   *  MATERIALIZED once (localCheckpoint) — both index branches and
   *  the budget count read it instead of re-running the
   *  distinct-surface agg per pass (catalog-sized, the phashCorpus
   *  convention; handle left to the ContextCleaner). Past
   *  [[MaxBroadcastEntities]] the hint is dropped and the planner's
   *  shuffled equi-join carries the join — the honest fallback at
   *  entity-scale catalogs. */
  def bestMatches(mentions: DataFrame, entities: DataFrame,
      maxDist: Int,
      maxBroadcastEntries: Long = MaxBroadcastEntities): DataFrame = {
    val ents = entities.localCheckpoint()
    resolveAgainst(mentions,
      blockArrayIndex(ents, maxDist, blockKey),
      blockArrayIndex(ents, maxDist, suffixKey), maxDist,
      hintBroadcast =
        indexEntries(ents.count(), maxDist) <= maxBroadcastEntries)
  }
}
