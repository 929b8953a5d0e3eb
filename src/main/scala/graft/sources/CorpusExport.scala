package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.queries.PipelineQueries

/**
 * The pipeline's terminal SINK: write the curated corpus in
 * REPRODUCIBLE TRAINING ORDER — the export a pretraining loader
 * actually consumes. Layout: hive-partitioned by `shard` (the
 * [[graft.queries.PipelineQueries.shuffleShard]] content-keyed
 * assignment, so re-exports of the same corpus land byte-identical),
 * each partition written by ONE task with rows sorted by `pos`
 * inside the file — a loader streams `shard=K` in training order
 * with ZERO read-time sort, and a shard-restricted read (data-
 * parallel worker k of N) prunes to its own directory at the
 * partition level (CorpusExportSpec pins order-on-read, pruning,
 * determinism, and completeness).
 *
 * Scale shape: the rank/shard frame carries fixed-width hashes only
 * (shardProjection drops text before its window); document bytes
 * travel exactly once, in the doc_id equi-join straight into the
 * writing tasks — one fixed-width rank exchange, one hash join, one
 * `repartition(shard)` exchange, no global sort (per-shard
 * `sortWithinPartitions` bounds each task's sort to its shard slice,
 * the [[graft.queries.PipelineQueries.ShuffleShards]] knob). At
 * 100 TB the shard count is the only thing that changes.
 */
object CorpusExport {

  /** Writes `sfDir`'s documents to `outPath/shard=K/...` in training
   *  order; returns the exported (doc_id, shard, pos) manifest frame
   *  (the thing a loader checkpoint references). */
  def exportShards(spark: SparkSession, sfDir: String,
      outPath: String): DataFrame = {
    val ranks = PipelineQueries.shuffleShard(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    ranks.join(docs, "doc_id")
      .repartition(col("shard"))
      // (shard, pos): pos alone would still write each file ascending
      // (per-file order is a subsequence of task order) but grouping
      // shards keeps the writer on one open file at a time
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(outPath)
    ranks
  }
}
