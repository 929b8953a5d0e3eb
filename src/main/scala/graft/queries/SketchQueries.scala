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

  /** Count-Min depth (hash rows). */
  val CmDepth = 4

  /** Count-Min width (counters per row; power of two so the position
   *  arithmetic is a mask). d=4 x w=16384 = 64 K counters = 512 KiB of
   *  longs — fixed whatever the corpus size. */
  val CmWidth: Int = 1 << 14

  /** Point queries emitted by [[countMin]]: the exact top-K words. */
  val CmTopK = 10

  /** Counter position of 60-bit hash column `h` in Count-Min row `i` —
   *  the enhanced-double-hashing arithmetic shared with
   *  [[graft.functions.VectorMath.bloomHits]] (three fixed 20-bit
   *  fields of the md5-60 hash; Dillinger–Manolios 2004), masked to
   *  [[CmWidth]]. */
  private[graft] def cmPos(h: org.apache.spark.sql.Column, i: Int)
      : org.apache.spark.sql.Column = {
    val f = lit(0xFFFFFL)
    (h.bitwiseAND(f)
      + lit(i.toLong) * shiftright(h, 20).bitwiseAND(f)
      + lit((i.toLong * (i - 1)) / 2) * shiftright(h, 40).bitwiseAND(f))
      .bitwiseAND(lit((CmWidth - 1).toLong))
  }

  /** Word → md5-60 hash, relationally (the portable-hash device in
   *  column form: both engines parse the same 15 hex chars). */
  private[graft] def cmHash(w: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("bigint")

  /** The Count-Min cell table of a (word, c) frame: d cells per
   *  distinct word, re-agged to <= d x w rows. Counters are SUMS, so
   *  two corpora's cell tables merge by adding matching cells — the
   *  mergeable-sketch contract (CountMinSpec pins per-source merge ==
   *  global build). Public so monitors and the spec build sketches
   *  over arbitrary slices. */
  def countMinCells(words: DataFrame): DataFrame =
    words.withColumn("hh", cmHash(col("word")))
      .select(explode(array((0 until CmDepth).map(i =>
        struct(lit(i).as("r"), cmPos(col("hh"), i).as("p"),
          col("c"))): _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.p").as("p"))
      .agg(sum(col("cell.c")).as("cnt"))

  /**
   * COUNT-MIN sketch over document word frequencies — the mergeable
   * point-frequency sketch the family was missing (HLL answers
   * distinct, theta answers set algebra, KLL answers quantiles,
   * approx_top_k answers heavy hitters; Count-Min answers "how often
   * did THIS item occur" for items chosen AFTER the scan). Fully
   * deterministic here — positions are integer arithmetic on md5-60
   * word hashes (the [[graft.queries.PipelineQueries.bloomBitsOf]]
   * enhanced-double-hashing device) and counters are sums — so the
   * DuckDB oracle re-derives the ENTIRE d x w counter matrix and the
   * exact same estimates, a stronger gate than the family's
   * within-tolerance contracts. Output: the exact top-[[CmTopK]] words
   * with (n_exact, n_est, overcount); Count-Min guarantees
   * n_est >= n_exact always (spec-pinned for every word, not just the
   * top), with overcount bounded by collisions in the min row.
   * Word split: Spark `split(text, "\\s+")` vs the oracle's RE2
   * split — carries the family's standing U+000B scope note
   * ([[graft.functions.VectorMath]] isWs): no corpus or fixture holds
   * a vertical tab, and narrowing would break established pins.
   * Scale shape: one standard wordcount two-phase agg over the corpus
   * is the ONLY pass that sees data; the sketch is built from the
   * distinct-word table (d cells per distinct word, re-agged to
   * <= d x w = 64 K fixed rows — per-partition partials merge by +,
   * the mergeable-sketch contract, spec-pinned per source), and the
   * point lookups broadcast a K x d probe table against it. At 100 TB
   * the cell table is still 64 K rows.
   */
  /**
   * Count-Min ROLLUP — the hllDistinct `__all__`-row device for CM:
   * per-source cell tables (the sketch a pipeline PERSISTS per
   * source/day) are merged by cell-wise sum into the global sketch
   * WITHOUT rescanning the corpus, and the top-K point queries are
   * answered from the MERGED state. Emits exactly [[countMin]]'s
   * rows (sum-mergeability makes merge-then-probe ≡ build-then-probe
   * — the oracle is literally the same SQL), but the PLAN is the
   * rollup: one (source, r, p) agg producing the stored partials,
   * one tiny (r, p) re-agg over ≤ sources x d x w rows. At 100 TB
   * the first agg ran yesterday; today's rollup touches only the
   * stored cells. CountMinSpec pins >1 source contributing.
   */
  def countMinRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.documents(spark, sfDir)
      .select(col("source"),
        explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
    // the stored artifact: one cell table per source
    val perSource = t.withColumn("hh", cmHash(col("word")))
      .select(col("source"), explode(array((0 until CmDepth).map(i =>
        struct(lit(i).as("r"), cmPos(col("hh"), i).as("p"),
          col("c"))): _*)).as("cell"))
      .groupBy(col("source"), col("cell.r").as("r"), col("cell.p").as("p"))
      .agg(sum(col("cell.c")).as("cnt"))
    // the rollup: cell-wise + over the stored partials only
    val merged = perSource.groupBy("r", "p").agg(sum(col("cnt")).as("cnt"))
    val probes = t.groupBy("word").agg(sum(col("c")).as("c"))
      .orderBy(col("c").desc, col("word")).limit(CmTopK)
      .withColumn("hh", cmHash(col("word")))
      .select(col("word"), col("c").as("n_exact"),
        explode(array((0 until CmDepth).map(i =>
          struct(lit(i).as("r"), cmPos(col("hh"), i).as("p"))): _*)).as("q"))
      .select(col("word"), col("n_exact"),
        col("q.r").as("r"), col("q.p").as("p"))
    broadcast(probes).join(merged, Seq("r", "p"))
      .groupBy("word", "n_exact").agg(min(col("cnt")).as("n_est"))
      .select(col("word"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
  }

  def countMin(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("c"))
    val cells = countMinCells(t)
    // hash AFTER the top-K cut: K hashes, not |vocab| (the cells
    // branch already pays one hash per distinct word by necessity)
    val probes = t.orderBy(col("c").desc, col("word")).limit(CmTopK)
      .withColumn("hh", cmHash(col("word")))
      .select(col("word"), col("c").as("n_exact"),
        explode(array((0 until CmDepth).map(i =>
          struct(lit(i).as("r"), cmPos(col("hh"), i).as("p"))): _*)).as("q"))
      .select(col("word"), col("n_exact"),
        col("q.r").as("r"), col("q.p").as("p"))
    broadcast(probes).join(cells, Seq("r", "p"))
      .groupBy("word", "n_exact").agg(min(col("cnt")).as("n_est"))
      .select(col("word"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
  }
}
