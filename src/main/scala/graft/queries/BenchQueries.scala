package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops._

/**
 * The reference's 12 topologies (SURVEY.md §2, table at top) as batch
 * queries over the driver-generated parquet (TESTDATA.md), plus the
 * LLM-data-pipeline extensions. Each query is a named composition of
 * `graft.ops` operators; the same ops compose under Structured Streaming
 * (graft.streaming) — that shared core is the point of the design.
 *
 * Inputs are mapped onto the testdata tables:
 *   book sentences   -> documents.text
 *   page views       -> events (url:=event_type, user:=user_id, ...)
 *   tweets           -> synthesized 13-field pipe lines from documents
 *   adsb positions   -> synthesized deterministic positions from events
 */
object BenchQueries {

  val GrepPattern = "spark" // reference default pattern is "Tom" (conf.yaml:33)

  /** Topology 1: WordCount — kafka -> SplitSentence -> Count (WordCount.java:49). */
  def wordcount(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.wordCount(Tables.documents(spark, sfDir), col("text"))

  /** Topology 2: Grep — regex filter + running match count (Grep.java:52). */
  def grep(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.grepCount(Tables.documents(spark, sfDir), col("text"), GrepPattern)
}
