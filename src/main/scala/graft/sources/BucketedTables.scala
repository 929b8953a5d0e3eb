package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Bucketed managed tables — the co-located join/aggregation path at
 * 100 TB. A fact table bucketed (and sorted) on its join key pays its
 * shuffle ONCE at write time; after that, every equi-join against a
 * table bucketed the same way, and every aggregation keyed on the
 * bucket column, runs without an Exchange: Catalyst recognizes the
 * bucket layout as a valid `HashPartitioning` and plans bucket-local
 * sort-merge joins / aggregations. That turns the per-query shuffle of
 * the biggest table in a workload into a one-time cost amortized over
 * the whole query mix (the classic warehouse layout decision).
 *
 * The reference has no storage layer at all (SURVEY.md §2.2 — results
 * are logged, state is heap); bucketing is part of what "Spark-first at
 * scale" adds. Verified by BucketedTablesSpec: the joined plan must
 * contain no Exchange on either bucketed side.
 */
object BucketedTables {

  /** Write `df` as a bucketed + in-bucket-sorted managed parquet table.
    * `buckets` must match on both sides of a co-located join (Spark
    * only elides the shuffle when the bucket counts line up). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** [[writeBucketed]] with a COMPOSITE bucket key — the layout for
    * equi-joins on multiple columns (the cluster-assign stored band
    * table joins on (band, bh)). Spark elides the history-side shuffle
    * only when the join keys equal the bucket columns exactly. */
  def writeBucketedKeys(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` hive-style partitioned by `partCol` (low-cardinality
    * columns only — day, source shard, event type). Scans filtered on
    * the partition column read ONLY the matching directories
    * (PartitionFilters in the scan, zero data touched elsewhere) — the
    * other half of the 100 TB layout story next to bucketing: partition
    * prune the time/shard axis, bucket the join-key axis. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write
      .partitionBy(partCol)
      .mode("overwrite")
      .parquet(path)
}
