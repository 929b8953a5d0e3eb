package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.LinkOps

/**
 * ENTITY-RESOLUTION (record linkage) queries over the part catalog —
 * the [[graft.ops.LinkOps]] blocking + verify + rank pipeline gated
 * end to end. The testdata carries no dirty-mention feed, so mentions
 * are derived DETERMINISTICALLY from part names (the cdcApply
 * engineered-fixture convention; the oracle re-derives them):
 *
 *   - every part row emits one SINGLE-DELETION mention (drop the char
 *     at 1-indexed pos = 4 + p_partkey % (len − 4) — past the
 *     3-char blocking prefix by construction, so blocking recall is
 *     exact): true distance 1;
 *   - rows with p_partkey ≡ 0 (mod [[HardMod]]) apply the SAME
 *     deletion rule a second time to the once-deleted string: true
 *     distance 2, where the nearest catalog entity is sometimes a
 *     DIFFERENT name at a tied distance ("old ring" →→ "old rg" sits
 *     at distance 2 from both "old ring" and "old rod", and the
 *     deterministic entity_id tiebreak picks the wrong one — 4 wrong
 *     matches at sf0.01, measured) — the non-vacuous error channel
 *     `er_eval` exists to measure;
 *   - rows with p_partkey ≡ 0 (mod [[JunkMod]]) ALSO emit a junk
 *     mention (the reversed name, id in the disjoint −(key+1)
 *     keyspace, NULL clean form): matches nothing, so coverage
 *     (n_matched < n_mentions) is non-vacuous too.
 *
 * Scale: catalog = 64 distinct names here, entity-sized in general —
 * aggregated once, broadcast as a block index; the corpus-sized
 * mention side is ONE scan with a broadcast hash join (er_matches
 * never shuffles mentions at all — PlanShapeSpec pins it).
 */
object LinkageQueries {

  /** Edit-distance budget for candidate verification. */
  val MaxDist = 2

  /** Every HardMod-th part key gets the double-deletion mention. */
  val HardMod = 11

  /** Every JunkMod-th part key adds an unmatched junk mention. */
  val JunkMod = 17

  /** One deletion at pos = 4 + (key mod (len − 4)) of `name` — the
   *  ONE corruption definition every dirty-mention derivation shares
   *  (batch mention feeds AND the er_gate live demo); `mod` renders
   *  the modulus (`%` for nonnegative catalog keys, `pmod` for signed
   *  hash keys — same value class on nonnegative inputs). */
  private[graft] def deleteAtWith(name: String, key: String,
      mod: (String, String) => String): String = {
    val off = mod(key, s"(length($name) - 4)")
    s"concat(substr($name, 1, 4 + $off - 1), " +
      s"substr($name, 4 + $off + 1, 100))"
  }

  /** One deletion at pos = 4 + key % (len − 4) of `name` — SQL text
   *  shared by both deletion passes (string-typed, codegen'd). */
  private def deleteAt(name: String, key: String): String =
    deleteAtWith(name, key, (k, m) => s"$k % $m")

  /** The deterministic dirty-mention feed: (mention_id, mention,
   *  clean) — clean is NULL on junk rows. */
  private[graft] def mentionsOf(parts: DataFrame): DataFrame = {
    val d1 = parts.filter(length(col("p_name")) >= 6)
      .select(col("p_partkey").as("k"), col("p_name").as("clean"),
        expr(deleteAt("p_name", "p_partkey")).as("m1"))
    val single = d1.filter(col("k") % HardMod =!= 0)
      .select(col("k").as("mention_id"), col("m1").as("mention"),
        col("clean"))
    val double = d1.filter(col("k") % HardMod === 0 &&
        length(col("m1")) >= 6)
      .select(col("k").as("mention_id"),
        expr(deleteAt("m1", "k")).as("mention"), col("clean"))
    val junk = parts.filter(col("p_partkey") % JunkMod === 0)
      .select((-(col("p_partkey") + 1)).as("mention_id"),
        reverse(col("p_name")).as("mention"),
        lit(null).cast("string").as("clean"))
    single.unionAll(double).unionAll(junk)
  }

  private def catalogOf(parts: DataFrame): DataFrame =
    LinkOps.entityCatalog(parts, col("p_partkey"), col("p_name"))

  /** Blocked candidate pairs within distance [[MaxDist]] — the
   *  observable middle of the linkage pipeline (what a threshold
   *  sweep or a match-weight model trains on). */
  def erCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
    // The same MEASURED broadcast verdict bestMatches applies: the
    // catalog agg is materialized once (blockedPairs' caller
    // contract), its ENTRY count compared against the 4M budget, and
    // the hint dropped past it — this was the one ER path still
    // forcing the hint unconditionally, which at an entity-scale
    // catalog is an executor OOM, not a plan preference.
    val ents = catalogOf(parts).localCheckpoint()
    LinkOps.blockedCandidates(mentionsOf(parts), ents, MaxDist,
        hintBroadcast = LinkOps.indexEntries(ents.count(), MaxDist) <=
          LinkOps.MaxBroadcastEntities)
      .select(col("mention_id"), col("mention"), col("entity_id"),
        col("entity_name"), col("lev"))
  }

  /** Best entity per mention (ties to the smaller entity_id), with the
   *  correctness bit against the mention's true surface form. */
  def erMatches(spark: SparkSession, sfDir: String): DataFrame =
    erMatchesOf(Tables.part(spark, sfDir))

  /** The [[erMatches]] engine over any part-shaped frame. */
  private[graft] def erMatchesOf(parts: DataFrame): DataFrame =
    LinkOps.bestMatches(mentionsOf(parts), catalogOf(parts), MaxDist)
      .filter(col("best").isNotNull)
      .select(col("mention_id"), col("mention"),
        col("best")("entity_id").as("entity_id"),
        col("best")("entity_name").as("entity_name"),
        col("best")("lev").as("lev"),
        coalesce(col("best")("entity_name") === col("clean"), lit(false))
          .as("is_correct"))

  /** Every DupMod-th part key contributes a fuzzy-duplicate record to
   *  the [[erSelfClusters]] dirty relation. */
  val DupMod = 7

  /** Every PrefixDamageMod-th key of [[erBlockingEval]]'s mention mix
   *  deletes INSIDE the blocking prefix instead of past it. */
  val PrefixDamageMod = 19

  /** BLOCKING-QUALITY scorecard — the two metrics the record-linkage
   *  literature reports for a blocking scheme (Christen 2012):
   *  PAIR COMPLETENESS (the fraction of true (mention, entity) pairs
   *  the blocker lets through — blocking RECALL) and REDUCTION RATIO
   *  (the fraction of the mentions × entities cross product the
   *  blocker prunes). The dedup_eval convention: the mention mix is
   *  eval-specific so the curve is non-vacuous — every key gets a
   *  single deletion, but keys ≡ 0 (mod [[PrefixDamageMod]]) delete
   *  at position 2, INSIDE the 3-char blocking prefix, so the
   *  (prefix, length) pass provably misses them (completeness
   *  ≈ 1 − 1/19, measured 0.947 at sf0.01) — and the SUFFIX pass
   *  provably recovers them (a deletion damages the prefix or the
   *  tail content, never both at length ≥ 6), so the UNIONED
   *  completeness is exactly 1.0 on this mix. Both rungs are
   *  reported: per-pass completeness (the measured recall hole) and
   *  unioned completeness + reduction ratio (the production
   *  scheme's honest cost — more candidates, still ≈ 0.96 pruned).
   *  Metrics measure [[graft.ops.LinkOps.blockedPairsUnion]] — the
   *  blockers ALONE, before the edit-distance verify; the pass tag
   *  keeps the two schemes separable in ONE scan.
   *
   *  Scale shape: one mention scan per pass through a broadcast
   *  block join + ONE global agg over the tagged union (the pass
   *  split is a row-local predicate, no distinct); the entity/
   *  mention counts are one-row broadcast frames (the crossJoin-tiny
   *  convention). */
  def erBlockingEval(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
    val men = parts.filter(length(col("p_name")) >= 6)
      .select(col("p_partkey").as("mention_id"),
        col("p_name").as("clean"),
        when(col("p_partkey") % PrefixDamageMod === 0,
          expr("concat(substr(p_name, 1, 1), substr(p_name, 3, 100))"))
          .otherwise(expr(deleteAt("p_name", "p_partkey")))
          .as("mention"))
    // catalog agg MATERIALIZED once — both pass branches, the entity
    // count, AND the broadcast-budget check read it (the bestMatches
    // convention; handle left to the ContextCleaner). The driver-side
    // count serves BOTH the budget check and the n_entities column —
    // no second in-plan aggregation of the catalog
    val ents = catalogOf(parts).localCheckpoint()
    val nEnts = ents.count()
    val counts = men.agg(count(lit(1)).as("n_mentions"))
      .withColumn("n_entities", lit(nEnts))
    LinkOps.blockedPairsUnion(men, ents, MaxDist,
        hintBroadcast =
          LinkOps.indexEntries(nEnts, MaxDist) <=
            LinkOps.MaxBroadcastEntities)
      .agg(
        count(when(col("pass") === 1, 1)).as("n_cand_prefix"),
        count(when(col("pass") === 1 &&
          col("entity_name") === col("clean"), 1)).as("n_caught_prefix"),
        count(lit(1)).as("n_cand_union"),
        count(when(col("entity_name") === col("clean"), 1))
          .as("n_caught_union"))
      .crossJoin(broadcast(counts))
      .select(col("n_mentions"), col("n_entities"),
        col("n_cand_prefix"), col("n_caught_prefix"),
        (col("n_caught_prefix").cast("double") / col("n_mentions"))
          .as("completeness_prefix"),
        col("n_cand_union"), col("n_caught_union"),
        (col("n_caught_union").cast("double") / col("n_mentions"))
          .as("completeness_union"),
        (lit(1.0) - col("n_cand_union").cast("double") /
          (col("n_mentions") * col("n_entities")))
          .as("reduction_ratio"))
  }

  /** ENTITY SELF-DEDUP — the other half of entity resolution beside
   *  mention→catalog linkage ([[erMatches]]): deduplicate a DIRTY
   *  relation against itself. Records = every part row plus, for keys
   *  ≡ 0 (mod [[DupMod]]), a fuzzy-duplicate record (the same
   *  [[deleteAt]] one-char corruption, −(key+1) keyspace) standing
   *  for the same real-world entity. The pass: collapse exact
   *  surfaces (distinct names, min-record canonical ids — exact dedup
   *  first, the cheap 99%), generate blocked fuzzy pairs BETWEEN
   *  surfaces (the [[graft.ops.LinkOps.blockedCandidates]] device
   *  with the surface table on both sides, lev 1..[[MaxDist]],
   *  canonical id1 < id2), CONNECTED COMPONENTS over the surface
   *  pairs, then label every RECORD through its surface — min-id
   *  survivors, the dedup_clusters convention (on this fixture the
   *  min of a dup-bridged component is the NEGATIVE dup record: the
   *  convention is a deterministic tiebreak, and exactly why the
   *  mmPhashClusters scaladoc notes a production keep-policy ranks
   *  members by QUALITY instead).
   *
   *  TRANSITIVE OVERMERGE is deliberately observable: a corrupted
   *  surface at distance ≤ 2 of TWO real names bridges their clusters
   *  (the classic ER hazard a production pass bounds with
   *  cluster-size caps or match-score thresholds) — deterministic
   *  here, and the oracle re-derives the same closure.
   *
   *  Scale shape: surfaces ≪ records (the exact collapse is a
   *  two-phase agg); the fuzzy join runs on the SURFACE table only —
   *  broadcast block index, never a record-level self-join; CC runs
   *  over surface-pair edges; the final record labeling is one
   *  broadcast join back on the name. */
  /** The ONE dirty-records relation both self-dedup variants
   *  deduplicate: every part row plus the DupMod-th keys' fuzzy
   *  duplicates (−(key+1) keyspace, the [[deleteAt]] corruption). */
  private[graft] def selfDedupRecsOf(parts: DataFrame): DataFrame =
    parts
      .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
      .unionAll(parts
        .filter(col("p_partkey") % DupMod === 0 &&
          length(col("p_name")) >= 6)
        .select((-(col("p_partkey") + 1)).as("rec_id"),
          expr(deleteAt("p_name", "p_partkey")).as("name")))

  /** Session-memoized (surfaces, clusters, fits) of the REGISTERED
   *  self-dedup corpus — the PipelineQueries.clusterFrame device:
   *  [[erSelfClusters]] and [[erSelfClustersCapped]] share the
   *  exact-surface collapse + blocked fuzzy join + CC fixpoint, and
   *  each previously re-ran the whole pass (the most expensive plan in
   *  the ER family) per query. The fixpoint is deterministic (exact
   *  component minimum), so reuse is semantics-free; keyed by the
   *  sfDir string (corpus identity — the kmCache rationale); cleared
   *  on applicationEnd like every session memo. */
  private val selfLabelsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (DataFrame, DataFrame, Boolean)]

  private val hookedContexts = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean])

  private def ensureEvictionHook(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (hookedContexts.add(sc.applicationId)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          selfLabelsCache.clear()
          hookedContexts.remove(sc.applicationId)
        }
      })
    }
  }

  private def selfLabelsFor(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, Boolean) = {
    ensureEvictionHook(spark)
    selfLabelsCache.computeIfAbsent(
      (org.apache.spark.sql.GraftColumnBridge.sessionUUID(spark), sfDir),
      _ => selfClusterLabels(selfDedupRecsOf(Tables.part(spark, sfDir))))
  }

  def erSelfClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val (surfaces, clusters, fits) = selfLabelsFor(spark, sfDir)
    labelRecords(selfDedupRecsOf(Tables.part(spark, sfDir)),
      surfaces, clusters, fits)
  }

  /** The ONE surface-closure construction [[erSelfClustersOf]] and
   *  [[erSelfClustersCappedOf]] share: exact-surface collapse, blocked
   *  fuzzy surface pairs, connected components. Returns (surfaces,
   *  clusters(id, cluster)). */
  private def selfClusterLabels(recs: DataFrame)
      : (DataFrame, DataFrame, Boolean) = {
    // the surface table is consumed FOUR times (fuzzy-join mention
    // side, entities side, CC node universe, the record label join) —
    // materialize the distinct-name agg once, and measure it for the
    // adaptive broadcast hint (self-dedup surfaces are corpus-derived:
    // "surfaces ≪ records" is the expectation, not a bound). The ONE
    // measured verdict governs every surface-cardinality broadcast in
    // the pass: the blocked fuzzy join AND the label joins.
    val surfaces = LinkOps.entityCatalog(
      recs, col("rec_id"), col("name")).localCheckpoint()
    val fits = LinkOps.indexEntries(surfaces.count(), MaxDist) <=
      LinkOps.MaxBroadcastEntities
    val pairs = LinkOps.blockedCandidates(
        surfaces.select(col("entity_id").as("mention_id"),
          col("entity_name").as("mention")),
        surfaces, MaxDist, hintBroadcast = fits)
      .filter(col("lev") >= 1 && col("mention_id") < col("entity_id"))
      .select(col("mention_id").as("id1"), col("entity_id").as("id2"))
    (surfaces, graft.ops.DedupOps.connectedComponents(
      pairs, surfaces.select(col("entity_id").as("id"))), fits)
  }

  /** Label every record through its surface's cluster id — the shared
   *  tail of both self-dedup variants; `hint` = the measured
   *  surface-fits-broadcast verdict (clusters are surface-sized). */
  private def labelRecords(recs: DataFrame, surfaces: DataFrame,
      clusters: DataFrame, hint: Boolean): DataFrame = {
    def mb(df: DataFrame) = if (hint) broadcast(df) else df
    recs
      .join(mb(surfaces), col("name") === col("entity_name"))
      .join(mb(clusters), col("entity_id") === col("id"))
      .select(col("rec_id"), col("cluster"),
        (col("rec_id") === col("cluster")).as("is_survivor"))
  }

  /** The [[erSelfClusters]] engine over any (rec_id, name) relation —
   *  factored so the spec can plant bridge/overmerge shapes. */
  private[graft] def erSelfClustersOf(recs: DataFrame): DataFrame = {
    val (surfaces, clusters, fits) = selfClusterLabels(recs)
    labelRecords(recs, surfaces, clusters, fits)
  }

  /** Surface-count cap for [[erSelfClustersCapped]]: the fixture's
   *  intended merges are (base, dup) two-surface components, so any
   *  larger component is transitive overmerge by construction. */
  val SelfClusterCap = 2

  /** OVERMERGE-BOUNDED self-dedup — the production guardrail the
   *  [[erSelfClusters]] scaladoc names (cluster-size caps bounding
   *  the classic transitive-closure hazard), as a gated twin (the
   *  uv_approx/mad_approx convention: the cap is a parameter, the
   *  oracle re-derives the same capped closure): components whose
   *  SURFACE count exceeds [[SelfClusterCap]] DISSOLVE back to
   *  exact-surface clusters — the fuzzy merges in an oversized
   *  component are exactly the untrusted ones (a corrupted surface
   *  within distance of TWO real names bridges their clusters), so
   *  the pass keeps the cheap exact dedup and routes the oversized
   *  closure to review instead of silently merging distinct
   *  entities. The cap counts SURFACES, not records: popular exact
   *  duplicates must not dissolve a legitimate merge.
   *
   *  Scale shape: [[erSelfClusters]] plus ONE surface-sized size agg
   *  and a row-local CASE — same broadcast joins, no new shuffle on
   *  the record side. */
  def erSelfClustersCapped(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val (surfaces, clusters, fits) = selfLabelsFor(spark, sfDir)
    labelRecords(selfDedupRecsOf(Tables.part(spark, sfDir)), surfaces,
      capClusters(clusters, SelfClusterCap, fits), fits)
  }

  /** The cap transform alone — surface-sized size agg + row-local
   *  CASE, shared by the memoized and generic capped paths. */
  private def capClusters(clusters: DataFrame, cap: Int,
      fits: Boolean): DataFrame = {
    val sizes = clusters.groupBy(col("cluster")).agg(
      count(lit(1)).as("sz"))
    clusters
      .join(if (fits) broadcast(sizes) else sizes, "cluster")
      .select(col("id"),
        when(col("sz") > cap, col("id")).otherwise(col("cluster"))
          .as("cluster"))
  }

  /** The [[erSelfClustersCapped]] engine over any (rec_id, name)
   *  relation — factored so the spec can plant a bridge the cap
   *  splits. */
  private[graft] def erSelfClustersCappedOf(recs: DataFrame,
      cap: Int): DataFrame = {
    val (surfaces, clusters, fits) = selfClusterLabels(recs)
    labelRecords(recs, surfaces, capClusters(clusters, cap, fits), fits)
  }

  /** The linkage scorecard: coverage (junk mentions lower it),
   *  precision (the double-deletion ambiguity lowers it), mean
   *  verified distance. One broadcast join + one global agg. */
  def erEval(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
    LinkOps.bestMatches(mentionsOf(parts), catalogOf(parts), MaxDist)
      .agg(
        count(lit(1)).as("n_mentions"),
        count(col("best")).as("n_matched"),
        count(when(col("best")("entity_name") === col("clean"), 1))
          .as("n_correct"))
      .select(col("n_mentions"), col("n_matched"), col("n_correct"),
        (col("n_matched").cast("double") / col("n_mentions"))
          .as("match_rate"),
        (col("n_correct").cast("double") / col("n_matched"))
          .as("precision"))
  }
}
