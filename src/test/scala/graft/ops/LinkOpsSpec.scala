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

  test("erBlockingEval is non-vacuous BOTH ways: the prefix-damage " +
      "class lowers pair completeness below 1, and the blocker still " +
      "prunes most of the cross product") {
    val r = graft.queries.LinkageQueries
      .erBlockingEval(spark, "/root/testdata/sf0.001")
      .collect().head
    val completeness = r.getAs[Double]("pair_completeness")
    val reduction = r.getAs[Double]("reduction_ratio")
    assert(completeness < 1.0 && completeness > 0.85,
      s"completeness $completeness out of the designed band")
    assert(reduction > 0.5, s"reduction $reduction — blocker not pruning")
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
}
