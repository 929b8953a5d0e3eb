package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LinkOps]] blocking + verify + argmin semantics on planted
  * catalogs, and the [[graft.queries.LinkageQueries]] fixture
  * contracts (blocking recall exact for past-prefix deletions; junk
  * never matches; the deterministic tiebreak). */
class LinkOpsSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Seq(
    (1L, "acme corp"), (2L, "acme core"), (7L, "zen labs"))
    .toDF("p_partkey", "p_name")

  test("bestMatches: exact hit, within-budget fuzzy hit, tie to the " +
      "smaller entity_id, junk unmatched") {
    val mentions = Seq(
      (10L, "acme corp"), // exact: lev 0 beats the lev-1 sibling
      (11L, "acme cor"),  // deletion, tied at lev 1 to BOTH -> id 1
      (12L, "zen lab"),   // deletion -> zen labs
      (13L, "qqqqqqqq"))  // junk: no block, no match
      .toDF("mention_id", "mention")
    val ents = LinkOps.entityCatalog(catalog, col("p_partkey"), col("p_name"))
    val got = LinkOps.bestMatches(mentions, ents, maxDist = 2)
      .select(col("mention_id"), col("best")("entity_id"),
        col("best")("lev"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((10L, 1L, 0L), (11L, 1L, 1L), (12L, 7L, 1L),
      (13L, -1L, -1L)), got)
  }

  test("blockedCandidates emits every within-budget pair and nothing " +
      "past the distance or outside the block") {
    val mentions = Seq((20L, "acme cor")).toDF("mention_id", "mention")
    val ents = LinkOps.entityCatalog(catalog, col("p_partkey"), col("p_name"))
    val got = LinkOps.blockedCandidates(mentions, ents, maxDist = 2)
      .select("entity_id", "lev").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L)), got) // zen labs: wrong block
  }

  test("erSelfClustersOf: exact surfaces collapse, a fuzzy dup record " +
      "bridges entities into one component (the documented overmerge), " +
      "min-id survivors, untouched entities stay singletons") {
    val recs = Seq(
      (1L, "acme corp"), (2L, "acme core"), (9L, "zen labs"),
      (3L, "acme corp"),   // exact dup of 1: same surface
      (-5L, "acme cor"))   // fuzzy dup: lev 1 to BOTH corp and core
      .toDF("rec_id", "name")
    val got = graft.queries.LinkageQueries.erSelfClustersOf(recs)
      .select("rec_id", "cluster", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    // surfaces: corp(sid 1), core(2), cor(-5), labs(9); pairs
    // (-5,1), (-5,2), (1,2) -> one component with min -5
    val want = Set(
      (1L, -5L, false), (2L, -5L, false), (3L, -5L, false),
      (-5L, -5L, true), (9L, 9L, true))
    assert(got == want, got)
  }

  test("the adaptive broadcast hint: past the entry budget the block " +
      "joins fall back to SHUFFLED equi-joins with IDENTICAL output " +
      "(budget 0 forces the fallback; the default keeps broadcasting)") {
    val mentions = Seq((10L, "acme corp"), (11L, "acme cor"),
      (12L, "zen lab"), (13L, "qqqqqqqq"), (30L, "ame corp"))
      .toDF("mention_id", "mention")
    val ents = LinkOps.entityCatalog(catalog, col("p_partkey"), col("p_name"))
    def run(budget: Long) = LinkOps.bestMatches(mentions, ents,
        maxDist = 2, maxBroadcastEntries = budget)
      .select(col("mention_id"), col("best")("entity_id"),
        col("best")("lev"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // disable the planner's own size-based auto-broadcast so the plan
    // shape observes the HINT alone (on a KB fixture the planner would
    // correctly broadcast either way — that choice is its to make; the
    // budget governs only the FORCED hint)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = LinkOps.bestMatches(mentions, ents, maxDist = 2,
        maxBroadcastEntries = 0L).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "budget 0 must drop the broadcast hint:\n" + plan)
      val hinted = LinkOps.bestMatches(mentions, ents, maxDist = 2)
        .queryExecution.executedPlan.toString
      assert(hinted.contains("BroadcastHashJoin"),
        "within budget the hint must force the broadcast:\n" + hinted)
      assert(run(0L) == run(LinkOps.MaxBroadcastEntities),
        "the shuffled fallback changed the resolution")
    } finally spark.conf.set(key, prev)
  }

  test("erSelfClustersCappedOf: a planted bridge (one corrupt surface " +
      "within distance of TWO real names) is SPLIT by the cap — the " +
      "oversized component dissolves to exact-surface clusters — " +
      "while a legitimate two-surface (base, dup) merge survives") {
    val recs = Seq(
      (1L, "acme corp"), (2L, "acme core"), // two REAL entities
      (-5L, "acme cor"),  // bridge: lev 1 to BOTH -> size-3 component
      (9L, "zen labs"), (-10L, "zen lab"), // legitimate pair: size 2
      (11L, "zen labs"))  // exact dup of 9 (records, ONE surface)
      .toDF("rec_id", "name")
    val got = graft.queries.LinkageQueries
      .erSelfClustersCappedOf(recs, cap = 2)
      .select("rec_id", "cluster", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    val want = Set(
      // bridged component {corp, core, cor} dissolved: each surface
      // keeps its exact-collapse cluster
      (1L, 1L, true), (2L, 2L, true), (-5L, -5L, true),
      // the two-surface zen merge is UNDER the cap and survives,
      // exact record-dups riding the surface (cap counts SURFACES)
      (9L, -10L, false), (11L, -10L, false), (-10L, -10L, true))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the UNCAPPED variant merges the bridge — the capped twin is
    // non-vacuous against it
    val un = graft.queries.LinkageQueries.erSelfClustersOf(recs)
      .filter(col("rec_id") === 1L || col("rec_id") === 2L)
      .select("cluster").as[Long].collect().toSet
    assert(un == Set(-5L), s"fixture drifted: the bridge must overmerge uncapped: $un")
  }

  test("erBlockingEval is non-vacuous THREE ways: the prefix-damage " +
      "class lowers the prefix pass's completeness below 1, the " +
      "SUFFIX pass recovers it to exactly 1.0 (a single deletion " +
      "damages prefix or tail content, never both), and the unioned " +
      "blocker still prunes most of the cross product") {
    val r = graft.queries.LinkageQueries
      .erBlockingEval(spark, "/root/testdata/sf0.001")
      .collect().head
    val cp = r.getAs[Double]("completeness_prefix")
    val cu = r.getAs[Double]("completeness_union")
    val reduction = r.getAs[Double]("reduction_ratio")
    assert(cp < 1.0 && cp > 0.85,
      s"prefix completeness $cp out of the designed band")
    assert(cu == 1.0, s"unioned completeness $cu — the suffix pass " +
      "must recover every single-deletion corruption")
    assert(reduction > 0.5, s"reduction $reduction — blocker not pruning")
    // the union's honest cost: more candidates than pass 1 alone
    assert(r.getAs[Long]("n_cand_union") > r.getAs[Long]("n_cand_prefix"))
  }

  test("the suffix pass recovers a PREFIX-damaged mention that the " +
      "prefix pass provably misses, through the same global argmin") {
    val mentions = Seq((30L, "ame corp")) // deletion INSIDE the prefix
      .toDF("mention_id", "mention")
    val ents = LinkOps.entityCatalog(catalog, col("p_partkey"), col("p_name"))
    // pass 1 alone: block key "ame" != "acm" -> no candidates
    val p1 = LinkOps.blockedCandidates(mentions, ents, maxDist = 2)
    assert(p1.count() == 0, "fixture drifted: prefix pass must miss")
    // the union: suffix "orp" == "orp" -> found at lev 1
    val got = LinkOps.bestMatches(mentions, ents, maxDist = 2)
      .select(col("mention_id"), col("best")("entity_id"),
        col("best")("lev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((30L, 1L, 1L)), got.toSeq)
  }

  test("two-pass resolution is HASH-IDENTICAL to the prefix-only pass " +
      "on the fixture's past-prefix corruption class — the second " +
      "pass adds recall, never disturbs an existing match") {
    val parts = graft.model.Tables.part(spark, "/root/testdata/sf0.001")
    val men = graft.queries.LinkageQueries.mentionsOf(parts)
    val ents = LinkOps.entityCatalog(parts, col("p_partkey"), col("p_name"))
    val d = graft.queries.LinkageQueries.MaxDist
    val idxP = LinkOps.blockArrayIndex(ents, d, LinkOps.blockKey)
    val oldBest = men.join(broadcast(idxP),
        LinkOps.blockKey(col("mention")) === col("blk") &&
          length(col("mention")) === col("mlen"), "left")
      .withColumn("best", array_min(filter(transform(col("cands"), e =>
        struct(levenshtein(col("mention"), e("entity_name"), d)
            .cast("bigint").as("lev"),
          e("entity_id").as("entity_id"),
          e("entity_name").as("entity_name"))),
        s => s("lev") >= 0)))
      .filter(col("best").isNotNull)
      .select(col("mention_id"), col("best")("entity_id").as("eid"),
        col("best")("lev").as("lv"))
      .as[(Long, Long, Long)].collect().toSet
    val newBest = LinkOps.bestMatches(men, ents, d)
      .filter(col("best").isNotNull)
      .select(col("mention_id"), col("best")("entity_id").as("eid"),
        col("best")("lev").as("lv"))
      .as[(Long, Long, Long)].collect().toSet
    assert(oldBest == newBest,
      s"diff=${(oldBest diff newBest).take(3)} / ${(newBest diff oldBest).take(3)}")
  }

  test("blocking recall is EXACT for the fixture's corruption class: " +
      "every non-junk mention matches, and every single-deletion " +
      "mention matches its true entity") {
    val sfDir = "/root/testdata/sf0.001"
    val parts = graft.model.Tables.part(spark, sfDir)
    val m = graft.queries.LinkageQueries.erMatchesOf(parts)
    val nonJunk = graft.queries.LinkageQueries
      .mentionsOf(parts).filter(col("mention_id") >= 0).count()
    assert(m.count() == nonJunk, "a non-junk mention missed its block")
    assert(m.filter(col("mention_id") >= 0 &&
        col("mention_id") % graft.queries.LinkageQueries.HardMod =!= 0 &&
        !col("is_correct")).count() == 0,
      "a single-deletion mention matched the wrong entity")
    // junk rows never match: every matched id is non-negative
    assert(m.filter(col("mention_id") < 0).count() == 0)
  }

  test("lev-0 fast path: resolveAgainst == the always-both-probes " +
      "reference on the full corruption mix PLUS exact mentions — " +
      "skipping the suffix probe after an exact prefix-pass hit can " +
      "never change a verdict (every lev-0 entity shares the " +
      "mention's prefix block)") {
    val parts = graft.model.Tables.part(spark, "/root/testdata/sf0.001")
    // the full corruption mix, plus every CLEAN surface form as an
    // exact mention (the rows that actually take the fast path)
    val men = graft.queries.LinkageQueries.mentionsOf(parts)
      .unionByName(parts.select(
        (col("p_partkey") + 1000000L).as("mention_id"),
        col("p_name").as("mention"), col("p_name").as("clean")))
    val ents = LinkOps.entityCatalog(parts, col("p_partkey"), col("p_name"))
    val d = graft.queries.LinkageQueries.MaxDist
    val idxP = LinkOps.blockArrayIndex(ents, d, LinkOps.blockKey)
    val idxS = LinkOps.blockArrayIndex(ents, d, LinkOps.suffixKey)
    def collectBest(df: org.apache.spark.sql.DataFrame) =
      df.select(col("mention_id"),
          col("best")("entity_id").as("eid"), col("best")("lev").as("lv"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
    // the r19 form: candidates of BOTH passes concatenated, one argmin
    val ref = men
      .join(broadcast(idxP.withColumnRenamed("cands", "cands1")),
        LinkOps.blockKey(col("mention")) === col("blk") &&
          length(col("mention")) === col("mlen"), "left")
      .drop("blk", "mlen")
      .join(broadcast(idxS.withColumnRenamed("cands", "cands2")),
        LinkOps.suffixKey(col("mention")) === col("blk") &&
          length(col("mention")) === col("mlen"), "left")
      .drop("blk", "mlen")
      .withColumn("best", array_min(filter(transform(
        flatten(array_compact(array(col("cands1"), col("cands2")))), e =>
          struct(levenshtein(col("mention"), e("entity_name"), d)
              .cast("bigint").as("lev"),
            e("entity_id").as("entity_id"),
            e("entity_name").as("entity_name"))),
        s => s("lev") >= 0)))
    val want = collectBest(ref)
    val got = collectBest(LinkOps.resolveAgainst(men, idxP, idxS, d))
    assert(got == want,
      s"diff=${(got.toSet diff want.toSet).take(3)} / " +
        s"${(want.toSet diff got.toSet).take(3)}")
    // non-vacuity: the exact mentions resolve at lev 0, so the fast
    // path genuinely fires on this mix
    assert(got.exists { case (id, b) => id >= 1000000L &&
      b.exists(_._2 == 0L) })
  }

  test("erSelfClusters/erSelfClustersCapped registered queries " +
      "(session-memoized shared labels) reproduce the generic engines " +
      "bit for bit — including on a memo HIT (second call)") {
    import graft.queries.LinkageQueries
    val sfd = "/root/testdata/sf0.001"
    val recs = LinkageQueries.selfDedupRecsOf(
      graft.model.Tables.part(spark, sfd))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toList: Seq[Any]).sortBy(_.toString).toSeq
    val wantPlain = rows(LinkageQueries.erSelfClustersOf(recs))
    val wantCapped = rows(LinkageQueries.erSelfClustersCappedOf(
      recs, LinkageQueries.SelfClusterCap))
    // first call trains the memo, second call HITS it — both must
    // match the uncached engine exactly
    assert(rows(LinkageQueries.erSelfClusters(spark, sfd)) == wantPlain)
    assert(rows(LinkageQueries.erSelfClusters(spark, sfd)) == wantPlain,
      "memo-hit path diverged for erSelfClusters")
    assert(rows(LinkageQueries.erSelfClustersCapped(spark, sfd))
      == wantCapped, "memo path diverged for erSelfClustersCapped")
  }
}
