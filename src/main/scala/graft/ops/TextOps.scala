package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text operators: the reference's word/sentence/hashtag bolts re-expressed
 * as pure `DataFrame => DataFrame` column pipelines (SURVEY.md §2.3-2.5).
 *
 * All operators are built from codegen'd `functions._` expressions — no
 * UDFs — so they stay inside WholeStageCodegen and predicate pushdown
 * keeps working through them.
 */
object TextOps {

  /**
   * Sentence -> one row per word. Reference: WordCount.SplitSentence
   * (WordCount.java:54-72, lib/operation/WordSplit.java:32-37): split on
   * `\s+`. Java's split emits a leading empty token on leading whitespace;
   * we define the operator as "maximal non-whitespace runs" (empty tokens
   * dropped) — the semantics every downstream count actually wants.
   */
  def splitWords(df: DataFrame, text: Column, out: String = "word"): DataFrame =
    df.select(explode(split(text, "\\s+")).as(out))
      .filter(length(col(out)) > 0)

  /** Running per-word count. Reference: WordCount.Count (WordCount.java:74-100).
   *  Streaming form: same plan under update-mode (see graft.streaming). */
  def wordCount(df: DataFrame, text: Column): DataFrame =
    splitWords(df, text).groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Regex match filter. Reference: Grep.FindMatchingSentence
   *  (Grep.java:57-86) uses Matcher.find() => unanchored contains-match,
   *  which is exactly `rlike`. */
  def grepFilter(df: DataFrame, text: Column, pattern: String): DataFrame =
    df.filter(text.rlike(pattern))

  /** Global running count of matches. Reference: Grep.CountMatchingSentence
   *  (Grep.java:88-104). One output row (the final count). */
  def grepCount(df: DataFrame, text: Column, pattern: String): DataFrame =
    grepFilter(df, text, pattern).agg(count(lit(1)).as("matches"))

  /**
   * Tweet line -> hashtags. Reference: RollingHashtagCount.HashtagBolt
   * (RollingHashtagCount.java:42-77): drop `[`-prefixed lines; split on
   * `|`; require exactly 13 fields; split text field (index 4) on single
   * spaces; keep tokens starting with '#' of length > 1.
   */
  def extractHashtags(df: DataFrame, line: Column, out: String = "hashtag"): DataFrame = {
    val fields = split(line, "\\|", -1)
    df.filter(!line.startsWith("[") && size(fields) === 13)
      .select((df.columns.map(col).toSeq :+
        explode(split(element_at(fields, 5), " ")).as(out)): _*)
      .filter(col(out).startsWith("#") && length(col(out)) > 1)
  }

  /** Identity re-emit, field renamed `message`. Reference: ConstBolt
   *  (lib/bolt/ConstBolt.java:31-51); chained N deep by SOL (SOL.java:44-49).
   *  Each Storm hop was a network shuffle; in Spark the chain collapses
   *  into one narrow WholeStageCodegen stage — that IS the optimization. */
  def constChain(df: DataFrame, in: Column, levels: Int): DataFrame =
    (1 to math.max(levels - 1, 1)).foldLeft(df.select(in.as("message"))) {
      (d, _) => d.select(col("message"))
    }

  /** Exchange-per-hop variant of [[constChain]]: the thing SOL actually
   *  measures is the NETWORK hop — every bolt level is shuffleGrouping'd
   *  (SOL.java:44-49), so each hop serializes + transfers every tuple.
   *  A round-robin repartition between levels declares that exchange
   *  per hop (results identical — identity op).
   *
   *  Catalyst's CollapseRepartition then merges the ADJACENT identity
   *  exchanges into one (plan-guarded in PlanShapeSpec): where Storm
   *  pays levels-1 identical network hops, Spark proves them redundant
   *  and pays exactly one full-data exchange — that surviving exchange
   *  is the serialization+transfer unit cost the bench carries
   *  (multiply by levels-1 for the Storm-equivalent bill). Defeating
   *  the optimizer to keep all hops would benchmark a pessimization
   *  no Spark user would run. */
  def constChainShuffled(df: DataFrame, in: Column, levels: Int): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    (1 to math.max(levels - 1, 1)).foldLeft(df.select(in.as("message"))) {
      (d, _) => d.repartition(parts).select(col("message"))
    }
  }
}
