package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: language ID,
 * quality scoring, token counting, document fingerprinting. All pure
 * column expressions (array higher-order functions — row-local, no
 * shuffle, no UDFs), so they run identically in batch and streaming and
 * scale linearly with document count.
 */
object TextAnalyticsOps {

  /** Tiny per-language stopword lists for the n-gram/stopword-hit
   *  language heuristic. Deliberately small + deterministic. Canonical
   *  definition lives beside the native kernel (functions.VectorMath). */
  val Stopwords: Seq[(String, Seq[String])] = graft.functions.VectorMath.Stopwords

  /** Non-empty whitespace tokens. */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Occurrences of any word from `stops` (not distinct — frequency). */
  def stopwordHits(text: Column, stops: Seq[String]): Column =
    size(filter(words(text), w => w.isin(stops: _*)))

  /**
   * Language-ID heuristic: argmax of stopword-hit counts with a fixed
   * precedence order (en > es > de > fr) for ties; no hits at all (or
   * null text) -> "und". Fast path: one-pass native kernel
   * ([[graft.functions.LangId]]) — bit-equal to [[langIdHof]]
   * (NativeExprSpec) but tokenizes once instead of 4 regex splits +
   * interpreted array lambdas per row.
   */
  def langId(text: Column): Column =
    coalesce(graft.functions.native.lang_id(text), lit("und"))

  /** Reference formulation of [[langId]] from composed built-in columns;
   *  kept for cross-validation against the native kernel. */
  def langIdHof(text: Column): Column = {
    val scores = Stopwords.map { case (lang, stops) => lang -> stopwordHits(text, stops) }
    val pred = scores.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((lang, s), i)) =>
        val laterMax = scores.drop(i + 1).map(_._2)
        val isMax = laterMax.foldLeft(s > 0: Column)((c, o) => c && s >= o)
        when(acc.isNotNull, acc).otherwise(when(isMax, lit(lang)))
    }
    coalesce(pred, lit("und"))
  }

  /** Quality features + a combined [0,1]-ish score. Counts come from
   *  the one-pass [[graft.functions.QualityStats]] kernel (the composed
   *  form is two regexp_replace passes + a split + an in-list lambda per
   *  row — see [[qualityFeaturesHof]], kept for cross-checks); the
   *  ratio/score math stays composed columns, all exact int/int double
   *  divisions — reproducible across engines. Divisors are
   *  nullif-guarded: empty/whitespace-only docs yield null features, not
   *  an ANSI DIVIDE_BY_ZERO that kills the job. */
  def qualityFeatures(text: Column): Column = {
    val st = graft.functions.native.quality_stats(text)
    val nWords = st.getField("n_words")
    val meanWlen = st.getField("n_nonws") / nullif(nWords, lit(0L))
    val stopRatio = st.getField("n_stop") / nullif(nWords, lit(0L))
    val alphaRatio = st.getField("n_alpha") / nullif(st.getField("n_chars"), lit(0L))
    val score = stopRatio * 0.4 + alphaRatio * 0.3 +
      least(meanWlen / 10.0, lit(1.0)) * 0.3
    struct(nWords.as("n_words"), meanWlen.as("mean_wlen"),
      stopRatio.as("stop_ratio"), alphaRatio.as("alpha_ratio"), score.as("score"))
  }

  /** Reference formulation of [[qualityFeatures]] from composed built-in
   *  columns; kept for cross-validation against the native kernel. */
  def qualityFeaturesHof(text: Column): Column = {
    val nWords = size(words(text))
    val nChars = length(text)
    val meanWlen = length(regexp_replace(text, "\\s+", "")) / nullif(nWords, lit(0))
    val stopRatio = stopwordHits(text, Stopwords.head._2) / nullif(nWords, lit(0))
    val alphaRatio = length(regexp_replace(text, "[^a-zA-Z]", "")) / nullif(nChars, lit(0))
    val score = stopRatio * 0.4 + alphaRatio * 0.3 +
      least(meanWlen / 10.0, lit(1.0)) * 0.3
    struct(nWords.cast("long").as("n_words"), meanWlen.as("mean_wlen"),
      stopRatio.as("stop_ratio"), alphaRatio.as("alpha_ratio"), score.as("score"))
  }

  /** Whitespace token count (native one-pass kernel; bit-equal to the
   *  split/filter form [[wsTokenCountHof]] — NativeExprSpec). */
  def wsTokenCount(text: Column): Column =
    graft.functions.native.ws_token_count(text)

  /** Reference formulation of [[wsTokenCount]], kept for cross-checks. */
  def wsTokenCountHof(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish sub-word token count: letter runs, single digits, single
   *  punctuation — the classic pre-tokenizer regex shape. Native
   *  one-pass scan; bit-equal to [[bpeishTokenCountHof]]. */
  val BpeishPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    graft.functions.native.bpeish_token_count(lower(text))

  /** Reference regex formulation of [[bpeishTokenCount]]. */
  def bpeishTokenCountHof(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0))).cast("long")

  /** REAL merge-table BPE token count: whitespace words segmented
   *  against the frozen corpus-learned merge list
   *  ([[graft.functions.VectorMath.BpeMerges]]) by iteratively merging
   *  the leftmost occurrence of the lowest-rank adjacent pair — the
   *  merge-table algorithm a production tokenizer applies, so these
   *  counts (unlike the [[bpeishTokenCount]] character-class
   *  heuristic) reflect actual subword segmentation. Row-local native
   *  kernel, zero shuffle, memoized per distinct word per executor. */
  def bpeTokenCount(text: Column): Column =
    graft.functions.native.bpe_token_count(lower(text))

  /** Canonical document fingerprint: md5 of whitespace-collapsed,
   *  trimmed, lower-cased text (lowercase hex both in Spark and DuckDB). */
  def fingerprint(text: Column): Column =
    md5(trim(lower(regexp_replace(text, "\\s+", " "))))
}
