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
 * Scale shape: document bytes cross the wire EXACTLY ONCE — the
 * payload rides through shardProjection's own rank-window exchange
 * (its text column is a copy, so the hash/shard/pos arithmetic is
 * shuffleShard's verbatim and the manifest matches the query
 * row-for-row, spec-pinned), and the window's required sort
 * (shard, h, tie) already satisfies the writer's
 * sorted-by-partition-column requirement, so `partitionBy("shard")`
 * writes with NO further exchange and NO added sort (per-file pos
 * order = the window's own order; exactly one Exchange in the whole
 * plan, spec-pinned). The first cut joined the text back to a
 * text-less rank frame and re-repartitioned — two full-corpus text
 * shuffles; this layout trades the query's fixed-width-only exchange
 * (right for shuffle_shard, whose OUTPUT is the manifest) for the
 * sink's one-move contract (right here, where text must reach the
 * writer anyway). [[graft.queries.PipelineQueries.ShuffleShards]] is
 * the knob that bounds each task's sort slice; at 100 TB the shard
 * count is the only thing that changes.
 */
object CorpusExport {

  /** The export frame: all document columns + (h, shard, pos), hash-
   *  partitioned by shard and sorted (shard, h) by shardProjection's
   *  window — write-ready with no further movement. Factored so the
   *  spec pins its plan (one Exchange, no Join). */
  private[graft] def exportFrame(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    PipelineQueries.shardProjection(
      docs.withColumn("payload", col("text")), col("doc_id"))
      .withColumnRenamed("payload", "text")
  }

  /** Writes `sfDir`'s documents to `outPath/shard=K/...` in training
   *  order; returns the exported (doc_id, shard, pos) manifest frame
   *  (the thing a loader checkpoint references). */
  def exportShards(spark: SparkSession, sfDir: String,
      outPath: String): DataFrame = {
    val frame = exportFrame(spark, sfDir)
    frame.drop("h")
      .write.partitionBy("shard").mode("overwrite").parquet(outPath)
    frame.select(col("doc_id"), col("shard"), col("pos"))
  }
}
