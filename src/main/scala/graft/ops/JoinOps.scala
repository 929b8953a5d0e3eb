package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's one join: the all-pairs aircraft proximity check
 * (DistFilterBolt, RollingFlightDist.java:124-269), decomposed Spark-first.
 * Shared by the batch query (BenchQueries.flightDist) and the streaming
 * per-trigger path (graft.streaming.StreamOps.proximityWarnings).
 */
object JoinOps {

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
