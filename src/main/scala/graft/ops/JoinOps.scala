package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's one join: the all-pairs aircraft proximity check
 * (DistFilterBolt, RollingFlightDist.java:124-269), decomposed Spark-first —
 * plus the temporal joins a training-data/eventlog pipeline needs at scale
 * (point-in-time as-of join, banded range join), which Spark has no
 * built-in operator for. Shared by the batch queries and the streaming
 * per-trigger path (graft.streaming.StreamOps.proximityWarnings).
 */
object JoinOps {

  /**
   * Point-in-time (as-of) join: attach to each probe row the latest build
   * row with `build.tsCol <= probe.tsCol` on the same key — the classic
   * event -> most-recent-prior-state lookup. Equal timestamps DO match;
   * ties among build rows at the same timestamp resolve to the largest
   * `tiebreak` value. Inner semantics: probes with no prior build row are
   * dropped. Output: key columns, probe payload, then `asof_<tsCol>` and
   * the build payload.
   *
   * Scale design: NOT a join at all. Both sides union into one relation
   * tagged by side; a single `last(_, ignoreNulls)` running window over
   * (key) ordered by (ts, side, tiebreak) forward-fills the latest build
   * payload onto each probe row. One shuffle on the key + one
   * per-partition sort — linear in input — where the naive formulation
   * (theta join + argmax) is O(probe x build) per key. This is the same
   * plan a sort-merge as-of join would produce, built from primitives.
   */
  def asOfJoin(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, tiebreak: String): DataFrame = {
    val bPayload = build.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)
    val bStruct = struct(col(tsCol).as(s"asof_$tsCol") +: bPayload.map(col): _*)
    val bType = build.select(bStruct.as("__b")).schema.head.dataType
    val pPayload = probe.columns.toSeq.filterNot(keyCols.contains)
    val pStruct = struct(pPayload.map(col): _*)
    val pType = probe.select(pStruct.as("__p")).schema.head.dataType
    val b = build.select(keyCols.map(col) ++ Seq(col(tsCol).as("__ts"),
      lit(0).as("__side"), col(tiebreak).cast("long").as("__tb"),
      bStruct.as("__b"), lit(null).cast(pType).as("__p")): _*)
    val p = probe.select(keyCols.map(col) ++ Seq(col(tsCol).as("__ts"),
      lit(1).as("__side"), lit(Long.MaxValue).as("__tb"),
      lit(null).cast(bType).as("__b"), pStruct.as("__p")): _*)
    // build rows sort before probe rows at the same ts (side 0 < 1), so a
    // build row exactly at the probe's ts is visible to the fill (<=)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("__m", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(keyCols.map(col) ++ pPayload.map(c => col(s"__p.$c").as(c)) ++
        (s"asof_$tsCol" +: bPayload).map(c => col(s"__m.$c").as(c)): _*)
  }

  /**
   * Banded range join: (left, right) pairs sharing `keyCols` with
   * `0 <= right.rightTsMs - left.leftTsMs <= gapMs` (epoch-millis longs).
   *
   * The band trick turns the range predicate into an equi-join: both
   * sides bucket time by gapMs (exact integer division), each left row
   * probes its own bucket and the next, and the exact predicate
   * re-filters candidates. The shuffle is hash-partitioned on
   * (key, bucket) — never a theta/cross join — so it scales like any
   * equi-join, with candidate blow-up bounded at 2x. This is the
   * standard interval-join plan streaming engines build internally.
   */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsMs: String, rightTsMs: String, gapMs: Long): DataFrame = {
    val l = left.withColumn("__bucket",
      explode(array(expr(s"$leftTsMs div $gapMs"), expr(s"$leftTsMs div $gapMs") + 1)))
    val r = right.withColumn("__bucket", expr(s"$rightTsMs div $gapMs"))
    l.join(r, keyCols :+ "__bucket")
      .filter(col(rightTsMs) >= col(leftTsMs) &&
        col(rightTsMs) - col(leftTsMs) <= gapMs)
      .drop("__bucket")
  }

  /**
   * Skew-resistant equi-join: when one join key is hot enough that a
   * single reducer drowns (the classic power-law key), salt the skewed
   * side into `salts` sub-keys and replicate the other side across all
   * salts, so the hot key's rows spread over `salts` reducers. The
   * result set is identical to the plain equi-join (salts only route
   * rows; JoinOpsSpec asserts equality, and the `salted_join` query
   * puts the plan under the DuckDB gate). The salt is a DETERMINISTIC
   * hash of the row's columns — a nondeterministic salt (rand,
   * monotonically_increasing_id) used as a shuffle key can silently
   * drop/duplicate rows when a stage is partially recomputed after a
   * fetch failure (rows re-enumerate in a different order and route to
   * different reducers than the surviving map outputs did). AQE's
   * skew-join split handles sort-merge cases adaptively at runtime;
   * explicit salting is the plan-level tool when the skew is known and
   * extreme, or the join is not a splittable SMJ. Replication
   * multiplies the small side by `salts` — size it accordingly.
   */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Pairwise speculative proximity warnings over a snapshot of latest
   * positions (columns: icao, pos_time, lat, lng, spd_kms, trak).
   *
   * Plan shape: broadcast theta self-join on icao ordering (replaces the
   * reference's hashCode-ownership sharding, RollingFlightDist.java:213),
   * speculative timesteps via explode(sequence) (RollingFlightDist.java:232),
   * then ONE fused native expression for dead-reckoning + haversine
   * (graft.functions.ProjectedDist). Output: (icao1, icao2, step,
   * curr_time, dist_r) canonically ordered, dist rounded to 0.1 km.
   */
  def proximityPairs(latest: DataFrame, thresholdKm: Double,
      steps: Int, stepSec: Int): DataFrame = {
    // Explicit fan-out of the probe side: a post-agg snapshot is tiny and
    // lands in ~1 partition; the O(n^2) pair generation must use all
    // cores. Round-robin, NOT hash-by-icao: hash would be statically
    // redundant with an upstream groupBy(icao) partitioning and get
    // elided, and AQE then coalesces the tiny-by-bytes output to one
    // partition. Fixed count so AQE won't re-coalesce.
    val shufflePartitions = latest.sparkSession.sessionState.conf.numShufflePartitions
    val a = latest.select(col("icao").as("icao1"), col("pos_time").as("pt1"),
      col("lat").as("lat1"), col("lng").as("lng1"),
      col("spd_kms").as("spd1"), col("trak").as("trak1"))
      .repartition(shufflePartitions)
    val b = latest.select(col("icao").as("icao2"), col("pos_time").as("pt2"),
      col("lat").as("lat2"), col("lng").as("lng2"),
      col("spd_kms").as("spd2"), col("trak").as("trak2"))
    a.join(broadcast(b), col("icao1") < col("icao2"))
      .withColumn("step", explode(sequence(lit(0), lit(steps - 1))))
      .withColumn("curr_time",
        greatest(col("pt1"), col("pt2")) + col("step") * lit(stepSec * 1000L))
      .withColumn("dist_km", graft.functions.native.projected_dist(
        col("lat1"), col("lng1"), col("trak1"),
        col("spd1") * (col("curr_time") - col("pt1")) / 1000,
        col("lat2"), col("lng2"), col("trak2"),
        col("spd2") * (col("curr_time") - col("pt2")) / 1000))
      .filter(col("dist_km") <= thresholdKm)
      .select(col("icao1"), col("icao2"), col("step"), col("curr_time"),
        round(col("dist_km"), 1).as("dist_r"))
  }
}
