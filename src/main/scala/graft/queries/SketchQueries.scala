package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/**
 * Mergeable-sketch queries (Datasketches family, built into Spark 4.1):
 * HLL distinct, theta set operations, KLL quantiles, approx top-k.
 *
 * This is the core 100 TB aggregation pattern the exact queries can't
 * scale to: a sketch is a fixed-size, ORDER-INDEPENDENT, MERGEABLE
 * state — per-partition partials combine associatively, re-aggregation
 * (daily → monthly rollups) unions the stored sketches WITHOUT
 * rescanning the base data, and set operations (intersection /
 * difference of user sets) run on the sketches alone. The reference's
 * only sketchless analog is UniqueVisitorBolt's exact per-window sets
 * (lib/bolt/UniqueVisitorBolt.java:36-93), which hold O(distinct)
 * state per key; these hold O(k).
 *
 * Oracle strategy (same contract pattern as uv_approx /
 * value_quantiles): exact values are computed relationally on both
 * engines and hash-compared; the sketch estimate is asserted Spark-side
 * as a within-tolerance boolean the oracle emits as literal TRUE. HLL
 * and theta sketches are deterministic (hash-register max / k-smallest
 * hashes — no RNG, order-independent); KLL compaction is randomized, so
 * its contract bound (5% rank error vs a ~0.7% sketch guarantee at
 * k=400) has overwhelming margin.
 */
object SketchQueries {

  /**
   * HLL distinct-users: per event_type, exact distinct + HLL-sketch
   * contract; plus an `__all__` row whose estimate comes from
   * `hll_union_agg` over the five PER-TYPE SKETCHES — the rollup
   * re-aggregates stored sketch state, not the base table. lgConfigK=12
   * (4 KiB registers) ≈ 1.6% standard error; the contract allows 5%
   * or ±2 absolute.
   */
  def hllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def ok(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      (abs(est - exact) <= greatest(exact * 0.05, lit(2.0))).as("hll_ok")
    val perType = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val typed = perType.select(col("event_type"), col("n_exact"),
      ok(hll_sketch_estimate(col("sk")), col("n_exact")))
    // rollup WITHOUT rescanning events: union the per-type sketches
    val unionEst = perType.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val globalExact = ev.agg(countDistinct(col("user_id")).as("n_exact"))
    val all = globalExact.crossJoin(unionEst)
      .select(lit("__all__").as("event_type"), col("n_exact"),
        ok(col("est"), col("n_exact")))
    typed.unionByName(all)
  }

  /**
   * Theta-sketch set algebra on user sets: |clickers ∩ purchasers|,
   * |∪|, |clickers ∖ purchasers| estimated purely from two stored
   * sketches (intersection/difference are what HLL cannot do — the
   * reason theta exists). Exact counterparts ride along for the
   * contract. lgNomEntries=14: below 16384 retained hashes the sketch
   * is in exact mode, so at bench scale the estimates are exact; the
   * 5%/±2 contract keeps the gate honest past that.
   */
  def thetaSets(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val users = (t: String) => ev.filter(col("event_type") === t).select("user_id")
    val sketches = users("click")
      .agg(expr("theta_sketch_agg(user_id, 14)").as("sk_c"))
      .crossJoin(users("purchase")
        .agg(expr("theta_sketch_agg(user_id, 14)").as("sk_p")))
      .select(
        expr("theta_sketch_estimate(theta_intersection(sk_c, sk_p))").as("est_inter"),
        expr("theta_sketch_estimate(theta_union(sk_c, sk_p))").as("est_union"),
        expr("theta_sketch_estimate(theta_difference(sk_c, sk_p))").as("est_diff"))
    // full-outer on the DISTINCT user sets: one row per user per side
    val exactDistinct = users("click").distinct().as("c")
      .join(users("purchase").distinct().as("p"),
        col("c.user_id") === col("p.user_id"), "full_outer")
      .agg(
        count(when(col("c.user_id").isNotNull && col("p.user_id").isNotNull, 1))
          .as("n_inter"),
        count(lit(1)).as("n_union"),
        count(when(col("c.user_id").isNotNull && col("p.user_id").isNull, 1))
          .as("n_diff"))
    def ok(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column,
        name: String) =
      (abs(est - exact) <= greatest(exact * 0.05, lit(2.0))).as(name)
    exactDistinct.crossJoin(sketches)
      .select(col("n_inter"), col("n_union"), col("n_diff"),
        ok(col("est_inter"), col("n_inter"), "inter_ok"),
        ok(col("est_union"), col("n_union"), "union_ok"),
        ok(col("est_diff"), col("n_diff"), "diff_ok"))
  }

  /**
   * KLL quantile sketch per event_type: exact interpolated percentiles
   * (the oracle-matched values) plus the KLL estimate's RANK-ERROR
   * contract — the honest guarantee a quantile sketch makes. The
   * estimate's true rank (share of values ≤ it, computed exactly with
   * one conditional agg against the broadcast one-row-per-type
   * estimates) must sit within 5% of the target rank; KLL at k=400
   * guarantees ~0.7%, so the bound holds despite KLL's randomized
   * compaction.
   */
  def kllQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val sk = ev.groupBy(col("event_type"))
      .agg(expr("kll_sketch_agg_double(value, 400)").as("sk"))
      .select(col("event_type").as("et"),
        expr("kll_sketch_get_quantile_double(sk, 0.5)").as("est50"),
        expr("kll_sketch_get_quantile_double(sk, 0.95)").as("est95"))
    ev.join(broadcast(sk), col("event_type") === col("et"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50_r"),
        round(expr("percentile(value, 0.95)"), 4).as("p95_r"),
        (sum(when(col("value") <= col("est50"), 1L).otherwise(0L)) / count(lit(1)))
          .as("rank50"),
        (sum(when(col("value") <= col("est95"), 1L).otherwise(0L)) / count(lit(1)))
          .as("rank95"))
      .select(col("event_type"), col("n"), col("p50_r"), col("p95_r"),
        (abs(col("rank50") - 0.5) <= 0.05).as("rank50_ok"),
        (abs(col("rank95") - 0.95) <= 0.05).as("rank95_ok"))
  }

  /**
   * Frequent items via approx_top_k (Datasketches ItemsSketch): top
   * event types with frequencies. With maxItemsTracked ≥ the distinct
   * count the sketch never evicts, so counts are EXACT and the oracle
   * is the plain relational top-k — the query still exercises the
   * sketch's build/merge path (two-phase partial aggregation), which is
   * what ships at 100 TB when the key domain overflows maxItemsTracked
   * and counts degrade to guaranteed-error estimates.
   */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .agg(expr("approx_top_k(event_type, 5, 64)").as("top"))
      // rank by sorting the k-element array in place (count desc, item asc
      // for tie determinism) and posexploding — no window function, so no
      // single-partition WindowExec over what is already a <= k-row side
      .select(posexplode(expr(
        """array_sort(top, (l, r) ->
          |  CASE WHEN l.count > r.count THEN -1 WHEN l.count < r.count THEN 1
          |       WHEN l.item < r.item THEN -1 WHEN l.item > r.item THEN 1
          |       ELSE 0 END)""".stripMargin)))
      .select((col("pos") + 1).cast("bigint").as("rank"),
        col("col.item").as("event_type"), col("col.count").as("n"))

  /**
   * approx_top_k at user cardinality, where boundary TIES between equal
   * counts make the returned ITEMS engine-dependent: the deterministic
   * (hence oracle-checkable) projection is the rank → count sequence.
   * maxItemsTracked=65536 covers the user domain at bench SFs (exact
   * counts); items are dropped from the output by design.
   */
  def heavyUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .agg(expr("approx_top_k(user_id, 10, 65536)").as("top"))
      // rank via array_sort + posexplode (see heavyHitters); only the
      // count sequence is emitted, so tie order among equal counts is moot
      .select(posexplode(expr(
        """array_sort(top, (l, r) ->
          |  CASE WHEN l.count > r.count THEN -1 WHEN l.count < r.count THEN 1
          |       ELSE 0 END)""".stripMargin)))
      .select((col("pos") + 1).cast("bigint").as("rank"), col("col.count").as("n"))
}
