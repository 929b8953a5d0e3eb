package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  import graft.queries.{AnalyticsQueries, BenchQueries, Oracles, PipelineQueries}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BenchQueries.flightDist(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount" -> BenchQueries.wordcount,
    "grep" -> BenchQueries.grep,
    "sol" -> BenchQueries.sol,
    "dataclean" -> BenchQueries.dataclean,
    "pageview_count" -> BenchQueries.pageviewCount,
    "unique_visitor" -> BenchQueries.uniqueVisitor,
    "rolling_count" -> BenchQueries.rollingCount,
    "rolling_hashtag" -> BenchQueries.rollingHashtag,
    "rolling_geo" -> BenchQueries.rollingGeo,
    "rolling_sort" -> BenchQueries.rollingSort,
    "flight_dist" -> BenchQueries.flightDist,
    "trident_wordcount" -> BenchQueries.tridentWordcount,
    // training-data pipeline extensions
    "dedup_exact" -> PipelineQueries.dedupExact,
    "dedup_fingerprint" -> PipelineQueries.dedupFingerprint,
    "dedup_ngram" -> PipelineQueries.dedupNgram,
    "dedup_minhash" -> PipelineQueries.dedupMinhash,
    "dedup_simhash" -> PipelineQueries.dedupSimhash,
    "sim_topk" -> PipelineQueries.simTopK,
    "sim_ann" -> PipelineQueries.simAnn,
    "sim_ivf" -> PipelineQueries.simIvf,
    "sim_ivf_kmeans" -> PipelineQueries.simIvfKmeans,
    "embed_neardup" -> PipelineQueries.embedNearDup,
    "embed_neardup_lsh" -> PipelineQueries.embedNearDupLsh,
    "text_langid" -> PipelineQueries.textLangId,
    "text_quality" -> PipelineQueries.textQuality,
    "text_tokens" -> PipelineQueries.textTokens,
    "mm_meta" -> PipelineQueries.mmMeta,
    "mm_frames" -> PipelineQueries.mmFrames,
    "mm_features" -> PipelineQueries.mmFeatures,
    "mm_resize" -> PipelineQueries.mmResize,
    "text_repetition" -> PipelineQueries.textRepetition,
    "pipeline_curate" -> PipelineQueries.pipelineCurate,
    // classic analytic joins (engine-completeness demonstrations)
    "q_revenue_by_region" -> AnalyticsQueries.revenueByRegion,
    "q_top_brands" -> AnalyticsQueries.topBrands,
    "sessionize" -> AnalyticsQueries.sessionize,
    "salted_distinct" -> AnalyticsQueries.saltedDistinct,
    // temporal joins + sketch-contract scale variants
    "asof_join" -> AnalyticsQueries.asofClicks,
    "range_join" -> AnalyticsQueries.rangePairs,
    "value_quantiles" -> AnalyticsQueries.valueQuantiles,
    "uv_approx" -> BenchQueries.uniqueVisitorApprox,
    // multi-level agg, window frames, set ops
    "q_rollup" -> AnalyticsQueries.eventRollup,
    "q_cube" -> AnalyticsQueries.eventCube,
    "q_topn_group" -> AnalyticsQueries.topBrandsPerRegion,
    "q_moving_avg" -> AnalyticsQueries.movingAvg,
    "q_anti_join" -> AnalyticsQueries.clickNoPurchase,
    "q_pivot" -> AnalyticsQueries.eventPivot,
    "q_gaps" -> AnalyticsQueries.eventGaps,
    "q_intersect" -> AnalyticsQueries.clickAndPurchase,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wordcount" -> Oracles.wordcount,
    "grep" -> Oracles.grep,
    "sol" -> Oracles.sol,
    "dataclean" -> Oracles.dataclean,
    "pageview_count" -> Oracles.pageviewCount,
    "unique_visitor" -> Oracles.uniqueVisitor,
    "rolling_count" -> Oracles.rollingCount,
    "rolling_hashtag" -> Oracles.rollingHashtag,
    "rolling_geo" -> Oracles.rollingGeo,
    "rolling_sort" -> Oracles.rollingSort,
    "flight_dist" -> Oracles.flightDist,
    "trident_wordcount" -> Oracles.tridentWordcount,
    "dedup_exact" -> Oracles.dedupExact,
    "dedup_fingerprint" -> Oracles.dedupFingerprint,
    "dedup_ngram" -> Oracles.dedupNgram,
    "dedup_minhash" -> Oracles.dedupMinhash,
    "dedup_simhash" -> Oracles.dedupSimhash,
    "sim_topk" -> Oracles.simTopK,
    "sim_ann" -> Oracles.simAnn,
    "sim_ivf" -> Oracles.simIvf,
    "sim_ivf_kmeans" -> Oracles.simIvfKmeans,
    "embed_neardup" -> Oracles.embedNearDup,
    "embed_neardup_lsh" -> Oracles.embedNearDupLsh,
    "text_langid" -> Oracles.textLangId,
    "text_quality" -> Oracles.textQuality,
    "text_tokens" -> Oracles.textTokens,
    "mm_meta" -> Oracles.mmMeta,
    "mm_frames" -> Oracles.mmFrames,
    "mm_features" -> Oracles.mmFeatures,
    "mm_resize" -> Oracles.mmResize,
    "text_repetition" -> Oracles.textRepetition,
    "pipeline_curate" -> Oracles.pipelineCurate,
    "q_revenue_by_region" -> Oracles.revenueByRegion,
    "q_top_brands" -> Oracles.topBrands,
    "sessionize" -> Oracles.sessionize,
    "salted_distinct" -> Oracles.saltedDistinct,
    "asof_join" -> Oracles.asofClicks,
    "range_join" -> Oracles.rangePairs,
    "value_quantiles" -> Oracles.valueQuantiles,
    "uv_approx" -> Oracles.uvApprox,
    "q_rollup" -> Oracles.eventRollup,
    "q_cube" -> Oracles.eventCube,
    "q_topn_group" -> Oracles.topBrandsPerRegion,
    "q_moving_avg" -> Oracles.movingAvg,
    "q_anti_join" -> Oracles.clickNoPurchase,
    "q_pivot" -> Oracles.eventPivot,
    "q_gaps" -> Oracles.eventGaps,
    "q_intersect" -> Oracles.clickAndPurchase,
  )
}
