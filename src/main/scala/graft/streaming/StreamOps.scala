package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.model.{AdsbPosition, FlightState, ProximityWarning, ShardedReport}
import graft.ops.JoinOps

/**
 * Structured Streaming forms of the reference topologies. Each reuses
 * the same `graft.ops` column pipelines as the batch queries — that
 * shared core is the design win over the reference, which duplicates
 * every operator per engine (e.g. Count vs Trident Count).
 *
 * Semantics mapping (SURVEY.md §2.10):
 *  - per-tuple emission        -> update-mode micro-batch emission
 *                                 (final-state-per-trigger equivalence)
 *  - tick tuples (emitFreq)    -> Trigger.ProcessingTime
 *  - SlidingWindow slots       -> window(ts, winLen, slide) + watermark
 *  - at-least-once + acker     -> exactly-once with checkpointing
 *  - max.spout.pending         -> maxOffsetsPerTrigger (Kafka source)
 */
object StreamOps {

  /** Kafka topic as a string stream — the analog of KafkaSpout +
   *  StringScheme (common/BenchmarkBase.java:70-73). */
  def kafkaLines(spark: SparkSession, bootstrap: String, topic: String,
      maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest") // kafka.api.OffsetRequest.EarliestTime()
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger) // backpressure
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** Running count per key, emitted per trigger (WordCount.Count /
   *  PageViewCount semantics — unbounded state, update mode). Exact
   *  reference parity; on an unbounded key domain use
   *  [[runningCountTtl]] (SURVEY §7.4.4). */
  def runningCount(lines: DataFrame, key: Column, keyName: String): DataFrame =
    lines.groupBy(key.as(keyName)).agg(count(lit(1)).as("cnt"))

  /**
   * Running count with per-key EVENT-TIME TTL — the bounded-state
   * variant of [[runningCount]] for unbounded key domains (URLs, user
   * ids, doc fingerprints at 100 TB). Keyed state via
   * flatMapGroupsWithState with an event-time timeout: once the
   * watermark passes a key's last event + ttl, its count is evicted and
   * restarts from zero on the next arrival — the explicit trade that
   * keeps state O(active keys), not O(all keys ever). Event-time (not
   * processing-time) timeouts keep the op deterministic under replay
   * and don't force the engine to schedule empty wall-clock batches.
   * Emits (key, cnt) per updated key per trigger (update mode).
   */
  def runningCountTtl(lines: DataFrame, tsName: String, key: Column,
      ttlMs: Long, watermarkDelay: String = "0 seconds"): DataFrame = {
    val spark0 = lines.sparkSession
    import spark0.implicits._
    // the watermarked timestamp column itself must reach the stateful
    // operator (the analyzer rejects event-time timeout otherwise) —
    // convert to millis inside the lambda, not in a projection
    lines.withWatermark(tsName, watermarkDelay)
      .select(key.cast("string").as("k"), col(tsName).as("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      // state = (count, max event ts ever seen): the timeout must come
      // from the RUNNING max, not this batch's max — a late row would
      // otherwise shorten the TTL and evict a live count early
      .flatMapGroupsWithState[(Long, Long), (String, Long)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (k: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var n = 0L
            var maxTs = Long.MinValue
            rows.foreach { r => n += 1; if (r._2.getTime > maxTs) maxTs = r._2.getTime }
            val (prevCnt, prevMax) = state.getOption.getOrElse((0L, Long.MinValue))
            val cnt = prevCnt + n
            val runningMax = math.max(prevMax, maxTs)
            state.update((cnt, runningMax))
            // evict once the watermark passes last-event + ttl; guard
            // against a timeout already in the past vs the watermark
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(runningMax + ttlMs, wm + 1))
            Iterator((k, cnt))
          }
      }.toDF("key", "cnt")
  }

  /** Sliding-window count per key with watermarked eviction —
   *  RollingCountBolt + SlidingWindow, state managed by Spark. */
  def slidingCount(lines: DataFrame, tsName: String, key: Column, keyName: String,
      winLen: String, slide: String, watermarkDelay: String): DataFrame =
    lines.withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), winLen, slide).as("w"), key.as(keyName))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col(keyName), col("cnt"))

  /**
   * Streaming ring-buffer sort: SortBolt's EXACT tick semantics
   * (RollingSort.java:70-127) — keyed state holds the last `n` ARRIVALS
   * (overwrite oldest), and every trigger re-emits the key's sorted,
   * ranked chunk. State is a bounded Vector (fixed size n — never
   * grows), so this is safe on an unbounded stream; arrival order
   * within a micro-batch follows partition iterator order, the same
   * arrival race the reference's multi-worker shuffleGrouping has.
   * Batch form: `WindowOps.lastNSorted` (gated as `rolling_sort_lastn`).
   */
  def lastNSortedStream(values: Dataset[(String, Double)], n: Int)
      : Dataset[(String, Long, Double)] = {
    import values.sparkSession.implicits._
    values.groupByKey(_._1)
      .flatMapGroupsWithState[Vector[Double], (String, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Vector[Double]]) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(Vector.empty[Double])) {
            (b, r) => (if (b.size >= n) b.drop(b.size - n + 1) else b) :+ r._2
          }
          state.update(buf)
          buf.sorted.zipWithIndex.iterator
            .map { case (v, i) => (key, i + 1L, v) }
      }
  }

  /** Sliding-window distinct per key — UniqueVisitorBolt. Streaming
   *  aggregation cannot hold exact distinct cheaply at scale; HLL++
   *  (approx_count_distinct) is the honest 100 TB path (SURVEY.md §4.3). */
  def slidingApproxDistinct(lines: DataFrame, tsName: String, key: Column,
      keyName: String, item: Column, winLen: String, slide: String,
      watermarkDelay: String): DataFrame =
    lines.withWatermark(tsName, watermarkDelay)
      .groupBy(window(col(tsName), winLen, slide).as("w"), key.as(keyName))
      .agg(approx_count_distinct(item).as("uniques"))
      .select(col("w.start").as("w_start"), col(keyName), col("uniques"))

  /**
   * Streaming exact dedup on a key expression (e.g. the md5 fingerprint
   * from TextAnalyticsOps.fingerprint): first occurrence passes, later
   * duplicates within the watermark delay drop. Uses
   * `dropDuplicatesWithinWatermark`: plain `dropDuplicates` on a key
   * subset that excludes the event-time column NEVER evicts its state
   * (the watermark only bounds state when event time is part of the
   * keys), which would be exactly the unbounded seen-set this op exists
   * to avoid. The trade is explicit: duplicates farther apart than the
   * delay pass through — the streaming contract at 100 TB is bounded
   * state + windowed dedup, with the batch pass as the exact sweep.
   */
  def streamingDedup(df: DataFrame, tsName: String, dedupKey: Column,
      watermarkDelay: String): DataFrame =
    df.withColumn("__dedup_key", dedupKey)
      .withWatermark(tsName, watermarkDelay)
      .dropDuplicatesWithinWatermark("__dedup_key")
      .drop("__dedup_key")

  /**
   * Live gap-based sessionization — the streaming form of
   * `AnalyticsQueries.sessionize`, via the IDENTICAL
   * `sessionAgg` expression (native `session_window`) over a
   * watermarked stream. Runs in Append mode: a (user, session) row is
   * emitted exactly once, when the watermark passes the session's
   * close (last event + gap) — the loader-friendly finalized-sessions
   * contract, and also what bounds state: Spark evicts a session's
   * accumulator at emission, so state is O(open sessions), never
   * O(history). Session merging (an event bridging two open windows
   * collapses them) is the engine's native semantics on both sides,
   * which is why batch and stream agree row-for-row on any in-order
   * feed once sessions finalize (RunTopologySpec). Expects
   * (ts, user_id) columns.
   */
  def sessionizeStream(events: DataFrame, gap: String,
      watermarkDelay: String): DataFrame =
    graft.queries.AnalyticsQueries.sessionAgg(
      events.withWatermark("ts", watermarkDelay), gap)

  /**
   * Streaming curation: the batch `PipelineQueries.pipelineCurate`
   * stages under continuous ingestion. The enrichment + filter are the
   * IDENTICAL row-local ops; the dedup stage differs in two documented
   * ways inherent to streaming: the survivor is the first arrival (not
   * the min doc_id — a stream can't know a smaller id arrives later),
   * there is no n_copies count, and only duplicates within the
   * watermark delay are caught ([[streamingDedup]]'s bounded-state
   * contract; the batch pass is the exact sweep). Expects (ts, doc_id,
   * text) columns.
   */
  def curateStream(docs: DataFrame, tsName: String, minScore: Double,
      minWords: Long, watermarkDelay: String): DataFrame = {
    import graft.ops.TextAnalyticsOps
    val enriched = docs.select(col(tsName), col("doc_id"), col("text"),
      TextAnalyticsOps.langId(col("text")).as("lang_pred"),
      TextAnalyticsOps.qualityFeatures(col("text")).as("q"))
      .select(col(tsName), col("doc_id"), col("text"), col("lang_pred"),
        col("q.n_words").as("n_words"), col("q.score").as("score"))
      .filter(col("lang_pred") === "en" &&
        col("score") >= minScore && col("n_words") >= minWords)
    streamingDedup(enriched, tsName,
      TextAnalyticsOps.fingerprint(col("text")), watermarkDelay)
      .select(col(tsName), col("doc_id"), col("n_words"), col("score"))
  }

  /**
   * Live benchmark-DECONTAMINATION gate — flag streaming documents that
   * share any word n-gram with a static benchmark set (the streaming
   * form of `PipelineQueries.decontaminate`, the test-set-overlap scrub
   * applied at INGEST time instead of as a batch sweep). The
   * benchmark's distinct 64-bit shingle hashes are collapsed into one
   * static row (`collect_set` over the ShingleHashes kernel) and
   * broadcast-joined into the stream on a constant key; per-document
   * hit counting is then a row-local `array_intersect` — no streaming
   * aggregation, no state, Append-safe, and per-doc counts identical
   * to the batch query's (both sides are distinct gram-hash sets).
   * Scale: the benchmark side is small by construction (an eval
   * suite), the same offline-statistic / online-filter split as the
   * `quality_cut` topology; the stream side stays stateless so
   * throughput is bounded by the shingle kernel, not by state I/O.
   * Docs must carry a `text` column; all input columns pass through
   * with `n_hits` appended, docs with zero overlap are dropped.
   */
  def decontaminateStream(docs: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    val benchSet = bench
      .select(explode(graft.functions.native.shingle_hashes(col("text"), n)).as("sh"))
      .agg(collect_set(col("sh")).as("bench_sh"))
      .withColumn("jk", lit(1))
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("sh", graft.functions.native.shingle_hashes(col("text"), n))
      .withColumn("jk", lit(1))
      .join(broadcast(benchSet), "jk")
      .select(passthrough :+
        size(array_intersect(col("sh"), col("bench_sh"))).cast("bigint")
          .as("n_hits"): _*)
      .filter(col("n_hits") > 0)
  }

  /**
   * Live COUNT-MIN maintenance — the streaming form of
   * `SketchQueries.countMin`'s cell table: Spark's state store IS the
   * sketch. Counters are sums, so ONE Complete-mode streaming
   * aggregation on (row, position) maintains the d x w matrix
   * incrementally — each arriving word contributes +1 to its d cells
   * and the engine's two-phase agg does the merge the sketch contract
   * promises (per-partition partials combine by +). State is bounded
   * by d x w = 64 K cells REGARDLESS of stream length or vocabulary
   * growth — the entire point of sketching an unbounded stream; the
   * exact wordcount twin's state grows with distinct words. The
   * snapshot equals the batch `countMinCells` build over everything
   * seen (sum-mergeability, CountMinSpec-pinned cell-for-cell),
   * so batch point lookups serve from the live state unchanged.
   * The per-word weight is 1 here where the batch build weights by
   * the pre-agged count c — same sums, one streaming agg (chained
   * aggs are not allowed in streaming, and the pre-agg would be one).
   */
  def countMinStream(docs: DataFrame): DataFrame = {
    import graft.queries.SketchQueries
    docs.select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("hh", SketchQueries.cmHash(col("word")))
      .select(explode(array((0 until SketchQueries.CmDepth).map(i =>
        struct(lit(i).as("r"), SketchQueries.cmPos(col("hh"), i).as("p"))): _*))
        .as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.p").as("p"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Live OLS REGRESSION monitor — the streaming form of
   * `AnalyticsQueries.linregOf` (the countMinStream device: the state
   * store IS the model): one Complete-mode aggregate maintains the
   * six sufficient statistics per key as DECIMAL sums — exact,
   * order-independent, mergeable, so state is six numbers per key
   * whatever the stream length — and the normal-equation quotient
   * tail is the SHARED `linregQuotients` definition applied above the
   * agg, so every trigger's snapshot equals the batch fit over the
   * rows ingested so far (spec-pinned across triggers). Input:
   * (key, x: decimal, y: decimal) rows.
   */
  def linregStream(rows: DataFrame, key: String): DataFrame = {
    import graft.queries.AnalyticsQueries
    AnalyticsQueries.linregQuotients(
      rows.groupBy(col(key)).agg(AnalyticsQueries.linregSumExprs.head,
        AnalyticsQueries.linregSumExprs.tail: _*),
      key)
  }

  /**
   * Live LINE-LEVEL cleaning — the streaming form of
   * `PipelineQueries.textLineFilter` with no model at all: the rules
   * are row-local constants, so the topology IS the batch projection
   * (`lineFilterProjection`) applied to the stream — one fused kernel
   * call per doc, zero state, Append-safe, replay-stable. The
   * batch/live split that needs an offline artifact (quality_cut,
   * span_flag, bloom_gate) degenerates here to sharing one function.
   */
  def lineFilterStream(docs: DataFrame): DataFrame =
    graft.queries.PipelineQueries.lineFilterProjection(docs)

  /**
   * Live Bloom DECONTAMINATION GATE — the scale form of
   * [[decontaminateStream]]: instead of broadcasting the benchmark's
   * exact distinct-gram set and intersecting ARRAYS per row (O(|bench|)
   * state, O(grams x log) work — the 200 k rows/s shape), the benchmark
   * folds ONCE at topology build into a fixed 128 KiB Bloom bitmap
   * (`PipelineQueries.bloomBitsOf` — size independent of benchmark
   * growth) and each arriving doc runs ONE native
   * [[graft.functions.BloomProbe]] kernel call: k bit probes per
   * distinct gram, no join, no array materialization, Append-safe,
   * replay-stable. Admission keeps docs with ZERO probe hits; the Bloom
   * one-sided error means every truly-contaminated doc is REJECTED for
   * certain (no false negatives), and an FPR-bounded sliver of clean
   * docs is over-rejected — the right polarity for decontamination,
   * where a missed benchmark leak costs more than a lost clean doc
   * (batch `decontaminate_bloom_eval` measures the over-drop). Docs too
   * short to gram admit unconditionally (no grams ⇒ no hits — agreed
   * with the batch form's filter). BloomDecontSpec pins gate == batch
   * complement on the same frame.
   */
  def bloomGateStream(docs: DataFrame, bench: DataFrame,
      n: Int = graft.queries.PipelineQueries.DecontN,
      k: Int = graft.queries.PipelineQueries.DecontBloomK): DataFrame = {
    val bits = graft.queries.PipelineQueries.bloomBitsOf(bench, n, k)
    val bc = docs.sparkSession.sparkContext.broadcast(bits)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("st", graft.functions.native.bloom_probe(col("text"), n, k, bc))
      .filter(col("st.n_hits") === 0)
      .select(passthrough :+ col("st.n_grams").as("n_grams"): _*)
  }

  /**
   * Live unigram-LM quality scoring — the streaming form of
   * `PipelineQueries.textUnigramNll`, split offline-statistic /
   * online-filter like `quality_cut` and [[decontaminateStream]]: the
   * unigram model is LEARNED from a static corpus ONCE, at topology
   * build (`PipelineQueries.unigramModel` — the identical formulation
   * the gated batch query trains, collected vocab-sized and
   * sc.broadcast as a real hash map), and scoring is a pure
   * projection through the native [[graft.functions.LmUnigramScore]]
   * kernel — no streaming aggregation, no state, no stream-static
   * join, Append-safe. The first cut joined a 1-row model frame and
   * folded with `element_at` on a map column; that shape re-ran the
   * learn aggregation EVERY micro-batch (static subtrees re-execute
   * per trigger) and probed Spark's MapData by LINEAR scan per token
   * — the kernel's O(1) hash probes and build-once model replaced it
   * (bisected 420 k → 3.08 M rows/s; the bigram form measured the
   * same failure at 15.6 k → 3.08 M). Out-of-vocabulary words — impossible in the batch
   * query, which scores the corpus it learned from — cost
   * `floor(ln(total_tokens)·NllMicro)`: the NLL a singleton would
   * have had, the add-one ceiling of the learned distribution. For
   * all-in-vocab docs the emitted (n_words, nll_micro_sum) equal the
   * batch query's exactly (RunTopologySpec pins both; the nll values
   * are collected from the SAME Spark expressions the batch query
   * computes, so engine-side float identity is by construction).
   * Empty lines emit (0, 0) rather than vanishing (the batch explode
   * drops them): a live gate should never silently swallow rows.
   * Scale: the model is VOCAB-sized (the natural-language vocabulary
   * curve — megabytes at web scale), resident per executor either
   * way (a broadcast join would hold the same hash table);
   * throughput is bounded by the tokenize kernel, not state I/O.
   * Docs must carry a `text` column; all input columns pass through
   * with (n_words, nll_micro_sum) appended.
   */
  def lmScoreStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val micro = graft.queries.PipelineQueries.NllMicro
    val entries = graft.queries.PipelineQueries.unigramModel(corpus)
      .select(col("w"), col("nll_micro"), col("freq")).collect()
    val m = new java.util.HashMap[String, java.lang.Long](entries.length * 2)
    var tot = 0L
    entries.foreach { r =>
      m.put(r.getString(0), r.getLong(1))
      tot += r.getLong(2)
    }
    // StrictMath = Spark's own Log implementation, so the ceiling is
    // the number the engine itself would have computed
    val oov = math.floor(StrictMath.log(tot.toDouble) * micro.toDouble).toLong
    val bc = docs.sparkSession.sparkContext.broadcast(m)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("ws",
        graft.ops.TextAnalyticsOps.words(lower(col("text"))))
      .select(passthrough ++ Seq(
        size(col("ws")).cast("long").as("n_words"),
        graft.functions.native.lm_unigram_score(col("ws"), bc, oov)
          .as("nll_micro_sum")): _*)
  }

  /**
   * Live BIGRAM-LM scoring — the streaming form of
   * `PipelineQueries.textBigramNll`, same offline-model/online-filter
   * split as [[lmScoreStream]]. The broadcast maps carry the full
   * add-one model, so every fallback is the probability the smoothed
   * model itself assigns — not an ad-hoc penalty: a seen bigram costs
   * its table entry -ln((c_ab+1)/(c_a+V)); an unseen bigram with a
   * KNOWN context costs -ln(1/(c_a+V)) from the context map; an
   * unknown context costs -ln(1/V). Keys are space-joined ("a b") —
   * unambiguous because words are whitespace-split (the BpeRank
   * device). The model is learned ONCE at topology build — the
   * vocab²-bounded bigram relation is collected (nll values computed
   * by the SAME Spark expression shape the batch query uses, so
   * engine-side float identity is by construction) and sc.broadcast
   * as real hash maps probed by the native
   * [[graft.functions.LmBigramScore]] kernel. The first cut was a
   * stream-static join + `element_at` fold: it re-ran the model
   * aggregation every micro-batch AND probed MapData by linear scan
   * per bigram over a vocab²-sized map — measured 15.6 k rows/s vs
   * the kernel's 3.08 M (197×). Stateless row-local projection,
   * Append-safe; for lines whose bigrams all appear in the corpus the
   * emitted (n_bigrams, nll_micro_sum) equal the batch query's
   * exactly (RunTopologySpec pins all four cases). Lines with <2
   * words emit (0, 0) rather than vanishing (the batch contract drops
   * them; a live gate should not silently swallow rows).
   *
   * The broadcast model is the FULL bigram relation — vocab²-BOUNDED,
   * not vocab²-sized (natural text realizes a tiny, Zipf-thinned
   * fraction of the square), but still the one collect in the gate
   * family whose size is quadratic in a corpus statistic. Past
   * `maxModelEntries` distinct bigrams the build REFUSES (one count of
   * the already-aggregated bigram relation — model-sized, not
   * corpus-sized) instead of collecting a map that would brown-out the
   * driver and every executor: use the batch
   * `PipelineQueries.textBigramNll` join form, which keeps the model
   * distributed, for corpora past the cap (the `embed_neardup`
   * maxCorpus device; StreamOpsSpec asserts the refusal).
   */
  def bigramScoreStream(docs: DataFrame, corpus: DataFrame,
      maxModelEntries: Long = 4000000L): DataFrame = {
    val micro = graft.queries.PipelineQueries.NllMicro
    def nllOf(num: Column, den: Column): Column =
      floor(-log(num.cast("double") / den.cast("double")) *
        lit(micro.toDouble)).cast("bigint")
    val bgCounts = corpus
      .select(graft.ops.TextAnalyticsOps.words(lower(col("text"))).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("a"),
          element_at(col("ws"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
      // lazy snapshot (the unigramModel device): the cap count below
      // materializes it once; the model rows and the V scalar then
      // read blocks instead of re-deriving the corpus agg
      .localCheckpoint(false)
    val nEntries = bgCounts.count()
    require(nEntries > 0,
      "bigram model is EMPTY (no corpus doc has two words) — every " +
        "score would read 0 micro-nats (probability 1) and a " +
        "downstream quality gate would admit everything; point " +
        "--corpus at a real text corpus")
    require(nEntries <= maxModelEntries,
      s"bigram model has $nEntries entries > cap $maxModelEntries; a " +
        "broadcast map this size risks driver/executor memory — score " +
        "with the distributed batch join form " +
        "(PipelineQueries.textBigramNll) instead, or raise " +
        "maxModelEntries if the memory budget allows")
    val bg = bgCounts
      .withColumn("c_a", sum("c_ab").over(
        org.apache.spark.sql.expressions.Window.partitionBy("a")))
      // V (= distinct contexts) as a scalar aggregate broadcast back
      // by crossJoin — the whole-frame-window collect_set form moved
      // the entire (capped, but up to 4M-row) type relation to ONE
      // partition and built a vocab-sized set there (guide §2.5's
      // monster-partition class); same value, batch arithmetic
      // unchanged (PipelineQueries.textBigramNll uses the same form)
      .crossJoin(broadcast(bgCounts.agg(
        count_distinct(col("a")).as("v"))))
    val entries = bg.select(
      concat(col("a"), lit(" "), col("b")).as("k"),
      nllOf(col("c_ab") + 1, col("c_a") + col("v")).as("nll"),
      col("a"),
      nllOf(lit(1), col("c_a") + col("v")).as("ctx_nll"),
      col("v")).collect()
    val lm = new java.util.HashMap[String, java.lang.Long](entries.length * 2)
    val ctx = new java.util.HashMap[String, java.lang.Long]
    var v = 1L
    entries.foreach { r =>
      lm.put(r.getString(0), r.getLong(1))
      ctx.put(r.getString(2), r.getLong(3))
      v = r.getLong(4)
    }
    // -ln(1/V), NOT ln(V): the 1/V rounding step can move the result
    // an ulp, and the quantized ceiling must be the exact number the
    // model's own nllOf(1, V) form would produce
    val unk = math.floor(-StrictMath.log(1.0 / v.toDouble) * micro.toDouble).toLong
    val spark0 = docs.sparkSession
    val bcLm = spark0.sparkContext.broadcast(lm)
    val bcCtx = spark0.sparkContext.broadcast(ctx)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("ws",
        graft.ops.TextAnalyticsOps.words(lower(col("text"))))
      .select(passthrough ++ Seq(
        greatest(size(col("ws")) - 1, lit(0)).cast("long").as("n_bigrams"),
        graft.functions.native.lm_bigram_score(col("ws"), bcLm, bcCtx, unk)
          .as("nll_micro_sum")): _*)
  }

  /**
   * Live KNESER-NEY bigram scoring — [[bigramScoreStream]]'s sibling
   * with the smoothing KenLM-style filters actually ship (the gated
   * batch form is `PipelineQueries.textBigramKn`): the full KN model
   * trains relationally over `corpus` by the batch query's EXACT
   * expressions, so a seen bigram scores the identical quantized
   * micro-nats live and in batch (spec-pinned corpus-wide). Backoff —
   * which the batch twin never exercises, since it scores its own
   * training corpus — is the model's own definition in quantized
   * components: seen context + unseen pair → ctxBase(a) + cont(b)
   * (the discount mass times the continuation prior); unknown
   * context → cont(b) alone; unknown continuation word → the
   * 1/|types| floor. Each component is floored to micro-nats before
   * summing (≤ 1 micro-nat from a single-ln form — a definitional
   * choice, spec-pinned per case, the add-one kernel's convention).
   * Same bounded-broadcast contract as the add-one form: the build
   * REFUSES past `maxModelEntries` distinct bigrams, counted BEFORE
   * the collect, naming the distributed batch form as the tool.
   */
  def bigramKnScoreStream(docs: DataFrame, corpus: DataFrame,
      maxModelEntries: Long = 4000000L): DataFrame = {
    import graft.queries.PipelineQueries.{KnDiscount, NllMicro}
    val bgCounts = corpus
      .select(graft.ops.TextAnalyticsOps.words(lower(col("text"))).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("a"),
          element_at(col("ws"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    def micro(e: Column): Column =
      floor(e * lit(NllMicro.toDouble)).cast("bigint")
    // the SHARED batch definitions (knStats + knSeenNllMicro), so a
    // seen pair scores micro-nat-identical live and gated.
    // Checkpointed once, BEFORE the cap count: counting the raw agg
    // first would run the whole corpus aggregation twice (once for
    // the count, once for the checkpoint — review-pass fix); the
    // count still happens BEFORE any driver collect, which is what
    // the cap protects (localCheckpoint is distributed
    // MEMORY_AND_DISK state, never driver memory). Three MINIMAL
    // driver round-trips read it below (per-pair nll, per-context
    // ctx_base, per-word cont_nll) instead of one denormalized
    // 7-column collect — the old form duplicated every word string
    // across the concatenated key and the a/b columns and carried
    // per-pair copies of the per-context and per-word components,
    // ~2-3× the driver footprint of the add-one model under the same
    // maxModelEntries cap.
    val bg = graft.queries.PipelineQueries.knStats(bgCounts)
      .localCheckpoint()
    val nEntries = bg.count()
    def refuse(msg: String): Nothing = {
      graft.ops.DedupOps.releaseTruncated(bg)
      throw new IllegalArgumentException(msg)
    }
    if (nEntries == 0) refuse(
      "KN bigram model is EMPTY (no corpus doc has two words) — every " +
        "score would read 0 micro-nats (probability 1) and a " +
        "downstream quality gate would admit everything; point " +
        "--corpus at a real text corpus")
    if (nEntries > maxModelEntries) refuse(
      s"KN bigram model has $nEntries entries > cap $maxModelEntries; " +
        "a broadcast map this size risks driver/executor memory — " +
        "score with the distributed batch join form " +
        "(PipelineQueries.textBigramKn) instead, or raise " +
        "maxModelEntries if the memory budget allows")
    val lm = new java.util.HashMap[String, java.lang.Long](
      (nEntries * 2).toInt)
    bg.select(concat(col("a"), lit(" "), col("b")).as("k"),
        graft.queries.PipelineQueries.knSeenNllMicro.as("nll"))
      .collect().foreach(r => lm.put(r.getString(0), r.getLong(1)))
    val base = new java.util.HashMap[String, java.lang.Long]
    bg.select(col("a"),
        micro(-log((lit(KnDiscount) * col("n1p_a")) /
          col("c_a").cast("double"))).as("ctx_base"))
      .distinct()
      .collect().foreach(r => base.put(r.getString(0), r.getLong(1)))
    val cont = new java.util.HashMap[String, java.lang.Long]
    var tt = 1L
    bg.select(col("b"),
        micro(-log(col("cont_b").cast("double") /
          col("tt").cast("double"))).as("cont_nll"),
        col("tt"))
      .distinct()
      .collect().foreach { r =>
        cont.put(r.getString(0), r.getLong(1)); tt = r.getLong(2)
      }
    // the stats frame fed only the three model collects — release the
    // checkpoint blocks before the long-lived stream starts
    graft.ops.DedupOps.releaseTruncated(bg)
    // -ln(1/T), not ln(T): quantize the exact form the model's own
    // cont_nll expression would produce for a count-1 word
    val contDefault =
      math.floor(-StrictMath.log(1.0 / tt.toDouble) *
        NllMicro.toDouble).toLong
    val spark0 = docs.sparkSession
    val bcLm = spark0.sparkContext.broadcast(lm)
    val bcBase = spark0.sparkContext.broadcast(base)
    val bcCont = spark0.sparkContext.broadcast(cont)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("ws",
        graft.ops.TextAnalyticsOps.words(lower(col("text"))))
      .select(passthrough ++ Seq(
        greatest(size(col("ws")) - 1, lit(0)).cast("long").as("n_bigrams"),
        graft.functions.native.lm_bigram_score_kn(col("ws"), bcLm,
          bcBase, bcCont, contDefault).as("kn_nll_micro_sum")): _*)
  }

  /**
   * Live KNESER-NEY TRIGRAM scoring — [[bigramKnScoreStream]] one
   * order up (`lm_score --order 3 --smoothing kn`; production
   * ppl-bucketing runs n ≥ 3 with interpolation): the full
   * interpolated-KN trigram model trains relationally by the batch
   * query's EXACT expressions (`PipelineQueries.kn3Stats` +
   * `kn3SeenNllMicro` — one shared definition, micro-nat identity by
   * construction for every seen triple), and backoff is the model's
   * own definition in quantized components one level deeper than the
   * bigram stream: seen context (a,b) + unseen triple → ctxBase(ab) +
   * midScore(b,c); unknown context → midScore(b,c); midScore = the
   * seen (b,c)-type NLL, else midBase(b) + cont(c), else cont(c);
   * unknown continuation word → the 1/T₂ floor. Each component is
   * floored to micro-nats before summing (spec-pinned per case).
   * Same bounded-broadcast contract: the build REFUSES past
   * `maxModelEntries` distinct trigrams, counted BEFORE any collect,
   * naming the distributed batch form as the tool; five MINIMAL
   * driver round-trips (per-triple nll, per-context ctx_base,
   * per-(b,c) mid nll, per-middle-word mid base, per-word cont) read
   * a once-checkpointed stats frame — never one denormalized collect.
   */
  def trigramKnScoreStream(docs: DataFrame, corpus: DataFrame,
      maxModelEntries: Long = 4000000L): DataFrame = {
    import graft.queries.PipelineQueries.{KnDiscount, NllMicro}
    val tgCounts = corpus
      .select(graft.ops.TextAnalyticsOps.words(lower(col("text"))).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 3),
        i => struct(element_at(col("ws"), i + 1).as("a"),
          element_at(col("ws"), i + 2).as("b"),
          element_at(col("ws"), i + 3).as("c")))).as("t"))
      .groupBy(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .agg(count(lit(1)).as("c_abc"))
    def micro(e: Column): Column =
      floor(e * lit(NllMicro.toDouble)).cast("bigint")
    // checkpoint BEFORE the cap count (the bigram stream's
    // review-pass rule: counting the raw agg first runs the corpus
    // aggregation twice; the cap protects driver collects, which a
    // distributed checkpoint never touches)
    val tg = graft.queries.PipelineQueries.kn3Stats(tgCounts)
      .localCheckpoint()
    val nEntries = tg.count()
    def refuse(msg: String): Nothing = {
      graft.ops.DedupOps.releaseTruncated(tg)
      throw new IllegalArgumentException(msg)
    }
    if (nEntries == 0) refuse(
      "KN trigram model is EMPTY (no corpus doc has three words) — " +
        "every score would read 0 micro-nats (probability 1) and a " +
        "downstream quality gate would admit everything; point " +
        "--corpus at a real text corpus")
    if (nEntries > maxModelEntries) refuse(
      s"KN trigram model has $nEntries entries > cap $maxModelEntries; " +
        "a broadcast map this size risks driver/executor memory — " +
        "score with the distributed batch join form " +
        "(PipelineQueries.textTrigramKn) instead, or raise " +
        "maxModelEntries if the memory budget allows")
    val lm = new java.util.HashMap[String, java.lang.Long](
      (nEntries * 2).toInt)
    tg.select(concat(col("a"), lit(" "), col("b"), lit(" "), col("c"))
          .as("k"),
        graft.queries.PipelineQueries.kn3SeenNllMicro.as("nll"))
      .collect().foreach(r => lm.put(r.getString(0), r.getLong(1)))
    val base = new java.util.HashMap[String, java.lang.Long]
    tg.select(concat(col("a"), lit(" "), col("b")).as("k"),
        micro(-log((lit(KnDiscount) * col("n1p_ab")) /
          col("c_ab").cast("double"))).as("ctx_base"))
      .distinct()
      .collect().foreach(r => base.put(r.getString(0), r.getLong(1)))
    val mid = new java.util.HashMap[String, java.lang.Long]
    tg.select(concat(col("b"), lit(" "), col("c")).as("k"),
        micro(-log(
          (greatest(col("n1p_dot_bc").cast("double") - lit(KnDiscount),
            lit(0.0)) +
            ((lit(KnDiscount) * col("n1p_b_dot")) *
              (col("n1p_dot_c").cast("double") /
                col("tt2").cast("double")))) /
          col("n1p_mid_b").cast("double"))).as("mid_nll"))
      .distinct()
      .collect().foreach(r => mid.put(r.getString(0), r.getLong(1)))
    val midBase = new java.util.HashMap[String, java.lang.Long]
    tg.select(col("b"),
        micro(-log((lit(KnDiscount) * col("n1p_b_dot")) /
          col("n1p_mid_b").cast("double"))).as("mid_base"))
      .distinct()
      .collect().foreach(r => midBase.put(r.getString(0), r.getLong(1)))
    val cont = new java.util.HashMap[String, java.lang.Long]
    var tt2 = 1L
    tg.select(col("c"),
        micro(-log(col("n1p_dot_c").cast("double") /
          col("tt2").cast("double"))).as("cont_nll"),
        col("tt2"))
      .distinct()
      .collect().foreach { r =>
        cont.put(r.getString(0), r.getLong(1)); tt2 = r.getLong(2)
      }
    graft.ops.DedupOps.releaseTruncated(tg)
    // -ln(1/T₂), not ln(T₂): quantize the exact form the model's own
    // cont_nll expression would produce for a count-1 word
    val contDefault =
      math.floor(-StrictMath.log(1.0 / tt2.toDouble) *
        NllMicro.toDouble).toLong
    val spark0 = docs.sparkSession
    val bcLm = spark0.sparkContext.broadcast(lm)
    val bcBase = spark0.sparkContext.broadcast(base)
    val bcMid = spark0.sparkContext.broadcast(mid)
    val bcMidBase = spark0.sparkContext.broadcast(midBase)
    val bcCont = spark0.sparkContext.broadcast(cont)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("ws",
        graft.ops.TextAnalyticsOps.words(lower(col("text"))))
      .select(passthrough ++ Seq(
        greatest(size(col("ws")) - 2, lit(0)).cast("long").as("n_trigrams"),
        graft.functions.native.lm_trigram_score_kn(col("ws"), bcLm,
          bcBase, bcMid, bcMidBase, bcCont, contDefault)
          .as("kn3_nll_micro_sum")): _*)
  }

  /**
   * Live REPEATED-SPAN gate — the streaming form of
   * `PipelineQueries.dedupSpans`, same offline-model / online-filter
   * split as [[lmScoreStream]]: the set of duplicated gram hashes is
   * learned from a static corpus ONCE at topology build
   * (`DedupOps.repeatedGramHashes` — the identical window rule the
   * gated batch query applies), collected to a SORTED primitive
   * long[] (8 bytes/hash, no boxing) and sc.broadcast; flagging is a
   * pure projection through the native
   * [[graft.functions.SpanFlagStats]] kernel — binary-search probes,
   * no state, no stream-static join (which would re-run the learn agg
   * every micro-batch — the measured lm_score failure mode),
   * Append-safe. When the streamed rows ARE the model corpus the
   * emitted (n_grams, n_dup, dup_tokens) equal the batch query's
   * exactly (RunTopologySpec pins it). Scale: the model is the
   * DUP-gram set of the reference corpus — bounded by the curated
   * corpus's repetition, not the stream; at sizes past executor
   * memory the batch join form is the right tool instead. Docs must
   * carry a `text` column; all input columns pass through.
   */
  def spanFlagStream(docs: DataFrame, corpus: DataFrame,
      n: Int = graft.queries.PipelineQueries.SpanN): DataFrame = {
    val dup = graft.ops.DedupOps.repeatedGramHashes(corpus, col("text"), n)
      .collect().map(_.getLong(0)).sorted
    val bc = docs.sparkSession.sparkContext.broadcast(dup)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("st", graft.functions.native.span_flag_stats(col("text"), n, bc))
      .select(passthrough ++ Seq(col("st.n_grams").as("n_grams"),
        col("st.n_dup").as("n_dup"), col("st.dup_tokens").as("dup_tokens")): _*)
  }

  /**
   * Live NEAR-DUP ADMISSION GATE — the streaming form of
   * `DedupOps.bandCollideAdmit`, the offline-model / online-filter
   * split of [[spanFlagStream]] applied to MinHash+LSH: the corpus's
   * combined band keys are learned ONCE at topology build
   * (`DedupOps.corpusBandKeys` — the identical xxhash64 chain the
   * batch candidate join matches on), collected to a SORTED primitive
   * long[] and sc.broadcast; each arriving doc is admitted iff NONE of
   * its bands collides (the candidate-stage gate — no exact-Jaccard
   * verify, see bandCollideAdmit for why that is the right trade
   * live). Flagging is one native [[graft.functions.LshBandCollide]]
   * kernel call per row — shingle → 64 minhash slots → band probes in
   * one JIT-friendly pass (the composed column form is 64 interpreted
   * HOF transforms — the measured 50× minhash-expression failure
   * mode). Stateless row-local filter, Append-safe, replay-stable.
   * Docs too short to shingle admit unconditionally (no bands ⇒ no
   * collision — bit-agreed with the batch explode, which drops them
   * before any signature exists). RunTopologySpec pins stream == batch
   * admit sets. Scale: the model is bands × |corpus| keys less
   * sharing — 8 bytes each, ~1.3 GB per 10⁹ history docs; past
   * executor memory the batch join form is the right tool (the
   * [[spanFlagStream]] bound). Docs must carry a `text` column; all
   * input columns pass through.
   */
  def nearDupGateStream(docs: DataFrame, corpus: DataFrame,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16): DataFrame = {
    val keys = graft.ops.DedupOps.corpusBandKeys(corpus, col("doc_id"),
      col("text"), k, bands, shingleN).collect().map(_.getLong(0)).sorted
    val bc = docs.sparkSession.sparkContext.broadcast(keys)
    docs.filter(graft.functions.native
      .lsh_band_collide(col("text"), shingleN, k, bands, bc)
      .getField("n_collide") === 0L)
  }

  /**
   * Live IMAGE NEAR-DUP ADMISSION GATE — [[nearDupGateStream]]'s
   * semantics on the MULTIMODAL side, completing the gate family with
   * the first streaming image topology: the corpus's perceptual
   * hashes are computed ONCE at topology build (the batch
   * `MultimodalOps.phashPartitioned` decode, quarantined images
   * excluded — the mm_phash_neardup corpus rule) and bucketed into
   * the broadcastable [[graft.ops.MultimodalOps.PhashBandIndex]] —
   * the SAME 28 C(8,2) block-pair keys the batch
   * `DedupOps.hammingNearDups64` joins on, so the live probe finds
   * the EXACT nearest within-radius corpus image by pigeonhole, never
   * a miss, never all-pairs. Each arriving image pays one
   * partition-batched decode + hash + 28 map lookups
   * ([[graft.ops.MultimodalOps.phashGatePartitioned]]); every input
   * column passes through (Row-merge) plus (width, height, phash,
   * matched_id, hamming, decision ∈ admit/neardup/quarantine) — the
   * decision column instead of a silent filter is the mm-family
   * observability convention (quarantine routing matters). Stateless,
   * Append-safe, replay-stable. Same bounded-broadcast contract as
   * the text gates: the build REFUSES past `maxCorpus` decoded
   * hashes, counted BEFORE the collect, and an EMPTY corpus refuses
   * loud (a gate over zero fingerprints would admit everything —
   * the buildHybridIndex rule). Scale: the model is ~28 int entries
   * + 16 bytes per corpus image — ~0.2 GB per 10⁹ images; past
   * executor memory the batch banded join is the right tool. Images
   * must carry a `png` binary column.
   */
  def phashGateStream(images: DataFrame, corpus: DataFrame,
      maxHamming: Int =
        graft.queries.PipelineQueries.PhashNeardupMaxHamming,
      maxCorpus: Long = 4000000L): DataFrame = {
    val hashed = graft.ops.MultimodalOps.phashPartitioned(
        corpus, "img_id", "png", 0)
      .toDF()
      .filter(col("width") =!= -1)
      .select(col("id"), col("phash"))
      .localCheckpoint() // the count + the collect both read it
    val n = hashed.count()
    require(n > 0,
      "phash gate corpus is EMPTY (no image decoded) — a gate over " +
        "zero fingerprints would admit everything; point --corpus at " +
        "a real image corpus")
    require(n <= maxCorpus,
      s"phash gate corpus has $n decoded images > cap $maxCorpus; a " +
        "broadcast index this size risks executor memory — dedup with " +
        "the batch banded join (PipelineQueries.mmPhashNeardup) " +
        "instead, or raise maxCorpus if the memory budget allows")
    val idx = graft.ops.MultimodalOps.PhashBandIndex(
      hashed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    graft.ops.DedupOps.releaseTruncated(hashed)
    val bc = images.sparkSession.sparkContext.broadcast(idx)
    graft.ops.MultimodalOps.phashGatePartitioned(
      images, "png", bc, maxHamming)
  }

  /**
   * Live VIDEO near-dup admission gate — the `phash_gate` device
   * lifted to FRAME SEQUENCES (the streaming form of
   * `PipelineQueries.mmVideoNeardup`'s qualification rule): corpus
   * clips (columns `corpusIdCol`/`corpusBytesCol`, BY NAME — a
   * user-supplied parquet with reordered columns must not silently
   * bind the wrong field; container magic-sniffed per clip — GIF or
   * MJPEG-AVI) are decoded +
   * per-frame hashed ONCE at topology build (the
   * SHARED batch decode — stream and batch hash the same pixels by
   * construction), bucketed into one banded image index PER FRAME
   * POSITION plus frame counts (`MultimodalOps.VideoBandIndex`), and
   * broadcast; each arriving clip pays one partition-batched decode +
   * one DCT per frame + an intersected banded probe — EXACT against
   * the batch rule (same count + every aligned frame within radius)
   * by the per-frame pigeonhole. Decisions
   * admit/neardup/quarantine with matched_id + max_hamming
   * observability, full column passthrough. Empty corpus and the
   * index cap refuse loud; the corpus count is checked BEFORE the
   * collect (the KN-model rule).
   */
  def videoGateStream(clips: DataFrame, corpus: DataFrame,
      maxHamming: Int =
        graft.queries.PipelineQueries.VideoFrameMaxHamming,
      maxCorpus: Long = 4000000L,
      bytesCol: String = "gif",
      corpusIdCol: String = "clip_id",
      corpusBytesCol: String = "gif"): DataFrame = {
    val hashed = graft.ops.MultimodalOps.videoFramePhashesPartitioned(
        corpus, corpusIdCol, corpusBytesCol, brightShift = 0)
      .toDF()
      .filter(col("width") =!= -1)
      .select(col("id"), col("frame"), col("phash"))
      .localCheckpoint() // the count + the collect both read it
    val n = hashed.count()
    require(n > 0,
      "video gate corpus is EMPTY (no clip decoded) — a gate over " +
        "zero fingerprints would admit everything; point --corpus at " +
        "a real clip corpus")
    require(n <= maxCorpus,
      s"video gate corpus has $n decoded frames > cap $maxCorpus; a " +
        "broadcast index this size risks executor memory — dedup with " +
        "the batch aligned banded join (PipelineQueries.mmVideoNeardup) " +
        "instead, or raise maxCorpus if the memory budget allows")
    val idx = graft.ops.MultimodalOps.VideoBandIndex(
      hashed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    graft.ops.DedupOps.releaseTruncated(hashed)
    val bc = clips.sparkSession.sparkContext.broadcast(idx)
    graft.ops.MultimodalOps.videoGatePartitioned(
      clips, bytesCol, bc, maxHamming)
  }

  /**
   * Live AUDIO near-dup admission gate — completes the admission-gate
   * family (text quality/gopher/decontaminate/lm_score, embedding
   * outlier, image phash_gate, video video_gate, linkage er_gate)
   * with the envelope-DCT fingerprint of
   * `PipelineQueries.mmAudioFingerprint`: corpus clips (columns
   * `corpusIdCol`/`corpusBytesCol`, BY NAME — the video_gate
   * contract) are decoded + fingerprinted ONCE
   * at topology build through the SHARED
   * `MultimodalOps.audioClipFingerprint` (stream and batch hash the
   * same samples by construction), banded into the hash-agnostic
   * `PhashBandIndex` (any 64-bit fingerprint bands into the same
   * C(8,2) block pairs), and broadcast; each arriving clip pays one
   * partition-batched decode + one 64-point DCT + one banded probe —
   * EXACT over the radius by the pigeonhole, so the gate's verdicts
   * agree clip for clip with the batch `mm_audio_neardup` pairs.
   * Decisions admit/neardup/quarantine with matched_id + hamming
   * observability, full column passthrough. Amplitude-scaled
   * re-masters match at hamming ~0 (the fingerprint's invariance
   * class); reversed audio sits tens of bits out — the committed
   * fixture's ground truth, spec-pinned.
   *
   * Guardrails (the phash-gate corpus conventions): empty corpus and
   * the index cap refuse loud; the corpus count is checked BEFORE the
   * collect (the KN-model rule).
   */
  def audioGateStream(clips: DataFrame, corpus: DataFrame,
      maxHamming: Int =
        graft.queries.PipelineQueries.AudioNeardupMaxHamming,
      maxCorpus: Long = 4000000L,
      bytesCol: String = "wav",
      corpusIdCol: String = "clip_id",
      corpusBytesCol: String = "wav"): DataFrame = {
    val hashed = graft.ops.MultimodalOps.audioFingerprintPartitioned(
        corpus, corpusIdCol, corpusBytesCol)
      .toDF()
      .filter(col("sample_rate") =!= -1)
      .select(col("id"), col("fp"))
      .localCheckpoint() // the count + the collect both read it
    val n = hashed.count()
    require(n > 0,
      "audio gate corpus is EMPTY (no clip decoded) — a gate over " +
        "zero fingerprints would admit everything; point --corpus at " +
        "a real audio corpus")
    require(n <= maxCorpus,
      s"audio gate corpus has $n decoded clips > cap $maxCorpus; a " +
        "broadcast index this size risks executor memory — dedup with " +
        "the batch banded join (PipelineQueries.mmAudioNeardup) " +
        "instead, or raise maxCorpus if the memory budget allows")
    val idx = graft.ops.MultimodalOps.PhashBandIndex(
      hashed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    graft.ops.DedupOps.releaseTruncated(hashed)
    val bc = clips.sparkSession.sparkContext.broadcast(idx)
    graft.ops.MultimodalOps.audioGatePartitioned(
      clips, bytesCol, bc, maxHamming)
  }

  /**
   * Live ENTITY-LINKAGE GATE — the streaming form of
   * `LinkageQueries.erMatches`' resolution (link noisy arriving
   * mentions to a curated catalog at ingest): the entity catalog is
   * aggregated ONCE at topology build (`LinkOps.entityCatalog` over
   * the static reference relation) and its block-array index
   * MATERIALIZED with `localCheckpoint`, so no stream-static subplan
   * re-runs the catalog aggregation per micro-batch (the measured
   * lm_score failure mode); every arriving mention then resolves
   * through the IDENTICAL `LinkOps.resolveAgainst` the batch query
   * uses — broadcast join on the block key + row-local thresholded
   * levenshtein argmin, stream == batch by shared definition.
   * Decisions: "match" (entity_id / entity_name / lev attached) or
   * "nomatch" (nulls); every input column passes through. Stateless →
   * Append mode, deterministic under replay.
   *
   * Guardrails (the phash-gate corpus conventions): an EMPTY catalog
   * refuses loudly — a gate over zero entities would mark everything
   * nomatch; an index past `maxCatalog` candidate entries refuses —
   * a broadcast that size risks executor memory, and catalog-scale
   * linkage belongs to the batch blocked join (`er_matches`). Index
   * size is counted from the CHECKPOINTED frame, never collected.
   */
  def erGateStream(mentions: DataFrame, catalog: DataFrame,
      idCol: String, nameCol: String,
      maxDist: Int = graft.queries.LinkageQueries.MaxDist,
      maxCatalog: Long = 4000000L): DataFrame = {
    val ents = graft.ops.LinkOps.entityCatalog(
      catalog, col(idCol), col(nameCol)).localCheckpoint()
    // BOTH blocking passes materialized at build (the batch
    // er_matches architecture: prefix + suffix, candidates unioned
    // row-locally at resolve time)
    val idxP = graft.ops.LinkOps.blockArrayIndex(
      ents, maxDist, graft.ops.LinkOps.blockKey).localCheckpoint()
    val idxS = graft.ops.LinkOps.blockArrayIndex(
      ents, maxDist, graft.ops.LinkOps.suffixKey).localCheckpoint()
    // ONE driver action sizes both checkpointed indexes — but the cap
    // compares the LARGER pass, not the two-pass sum: each pass is
    // its own broadcast, so summing would silently halve the
    // effective catalog capacity vs the single-pass gate this
    // replaced (the r19 ADVICE finding).
    val perPass = idxP
      .select(size(col("cands")).as("n"), lit(1).as("pass"))
      .unionAll(idxS.select(size(col("cands")).as("n"), lit(2).as("pass")))
      .groupBy(col("pass")).agg(sum(col("n")).as("n"))
      .collect().map(_.getAs[Long]("n"))
    val total = perPass.sum
    val maxPass = if (perPass.isEmpty) 0L else perPass.max
    require(total > 0,
      "er gate catalog is EMPTY (no entities) — a gate over zero " +
        "entities would mark every mention nomatch; point --catalog " +
        "at a real reference relation")
    require(maxPass <= maxCatalog,
      s"er gate block index holds $maxPass candidate entries in its " +
        s"larger blocking pass ($total across the prefix + suffix " +
        s"passes — each pass broadcasts separately) > cap " +
        s"$maxCatalog; a broadcast this size risks executor memory — " +
        "link with the batch blocked join (LinkageQueries.erMatches) " +
        "instead, or raise maxCatalog if the memory budget allows")
    graft.ops.LinkOps.resolveAgainst(mentions, idxP, idxS, maxDist)
      .withColumn("decision",
        when(col("best").isNotNull, lit("match")).otherwise(lit("nomatch")))
      .withColumn("entity_id", col("best")("entity_id"))
      .withColumn("entity_name", col("best")("entity_name"))
      .withColumn("lev", col("best")("lev"))
      .drop("best")
  }

  /**
   * Live EMBEDDING OUTLIER GATE — the streaming form of
   * `PipelineQueries.embedOutliers`' cut, completing the admission-gate
   * family on the embedding side: k-means prototypes are trained ONCE
   * at topology build from a static corpus (`SimilarityOps
   * .kmeansCentroids` — the same decimal-exact Lloyd the batch
   * queries share), embedded as codegen reference objects/literals,
   * and every arriving vector is scored against its OWN nearest
   * centroid by the IDENTICAL row-local expressions the batch query
   * applies (`SimilarityOps.centroidScore` — one `IvfProbeCells`
   * kernel + k literal-vector dot kernels; no stream-static join to
   * re-run the training per micro-batch, the measured lm_score
   * failure mode). Vectors below the cosine floor are dropped;
   * admitted rows pass through with (cell, cos_r) appended — the
   * prototype-distance observability a curation monitor wants.
   * Stateless, Append-safe, replay-stable. Scale: the model is k×dim
   * floats — trivially broadcastable at any real k; training cost is
   * the batch Lloyd, paid once at build. Docs must carry an
   * `embedding` column (array<float>). RunTopologySpec pins admitted
   * set + scores == the batch query.
   */
  def outlierGateStream(vecs: DataFrame, corpus: DataFrame, k: Int,
      iters: Int, threshold: Double): DataFrame = {
    val cents = graft.ops.SimilarityOps.kmeansCentroids(corpus, k, iters)
    graft.ops.SimilarityOps.centroidScore(vecs, cents, threshold)
      .filter(!col("is_outlier"))
      .drop("is_outlier")
  }

  /**
   * Live EMBEDDING NEAR-DUP ADMISSION GATE — [[nearDupGateStream]]'s
   * semantics on the embedding side, completing the gate family: the
   * corpus's combined LSH band keys are learned ONCE at topology build
   * (`SimilarityOps.embeddingBandKeys` — the identical sign-projection
   * banding the batch admit joins on), collected to a SORTED primitive
   * long[] and sc.broadcast — bounded by `tables · 2^bits` keys (≈ 16 k
   * at the defaults) REGARDLESS of corpus size, the one gate whose
   * model cannot outgrow an executor. Each arriving vector is admitted
   * iff NONE of its bands collides; probing is one native
   * [[graft.functions.EmbBandCollide]] kernel call per row (all planes
   * + all band binary-searches in one JIT-friendly pass — the composed
   * form is bits×tables hash expressions plus a membership scan).
   * Stateless row-local filter, Append-safe, replay-stable.
   * RunTopologySpec pins stream == batch
   * (`SimilarityOps.bandCollideAdmitEmbedding`) admit sets. Vectors
   * must carry an `embedding` column (array<float>); all input columns
   * pass through.
   */
  def embedNearDupGateStream(vecs: DataFrame, corpus: DataFrame,
      bits: Int = graft.ops.SimilarityOps.GateBandBits,
      tables: Int = graft.ops.SimilarityOps.GateBandTables): DataFrame = {
    val keys = graft.ops.SimilarityOps.embeddingBandKeys(corpus, bits, tables)
      .collect().map(_.getLong(0)).sorted
    val bc = vecs.sparkSession.sparkContext.broadcast(keys)
    vecs.filter(graft.functions.native
      .emb_band_collide(col("embedding"), bits, tables, bc)
      .getField("n_collide") === 0L)
  }

  /**
   * Live CHARACTER-ENTROPY band gate — the corpus-relative
   * offline-statistic / online-filter split (quality_cut's pattern)
   * over `text_entropy`'s signal: the [p5, p95] entropy-micro
   * quantiles are learned ONCE at topology build from a static corpus
   * and applied as literal BAND bounds — degenerate text ("aaaa…")
   * sits at the low extreme and garbled/encoded content at the high
   * one, so the keep region is two-sided where quality_cut's is not.
   * Scoring is one row-local [[graft.functions.CharEntropy]] kernel
   * call per row; stateless, Append-safe, replay-stable. Admitted
   * rows carry (n_cp, entropy_micro) observability. Scale: the model
   * is TWO longs; training is one corpus kernel pass + a 2-value
   * percentile_approx (exact percentile would sort the doc-count
   * frame; the approx sketch is the uv_approx trade, fine for a gate
   * threshold). Docs must carry a `text` column.
   */
  def entropyGateStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val bounds = corpus
      .select(graft.functions.native.char_entropy(col("text"))
        .getField("entropy_micro").as("e"))
      .agg(percentile_approx(col("e"), array(lit(0.05), lit(0.95)),
        lit(10000)).as("q"))
      .head().getSeq[Long](0)
    require(bounds != null && bounds.length == 2,
      "entropyGateStream: corpus has no scorable text rows — the " +
        "quantile bounds cannot be learned; point --corpus at a " +
        "non-empty documents table")
    val (lo, hi) = (bounds(0), bounds(1))
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("ce",
        graft.functions.native.char_entropy(col("text")))
      .select(passthrough ++ Seq(col("ce.n_cp").as("n_cp"),
        col("ce.entropy_micro").as("entropy_micro")): _*)
      .filter(col("entropy_micro").between(lo, hi))
  }

  /**
   * Live WINNOWING admission gate — the [[nearDupGateStream]] split at
   * winnowing granularity, completing the text-admission family with
   * its POSITION-GUARANTEED member: the corpus's rare fingerprint
   * hashes (document frequency ≤ WinnowMaxDf — the stopword-
   * fingerprint device, so ubiquitous grams can't veto everything) are
   * learned ONCE at topology build
   * (`PipelineQueries.rareWinnowFingerprints`), collected to a SORTED
   * primitive long[] and sc.broadcast; an arriving doc is admitted iff
   * FEWER than WinnowMinShared of its distinct fingerprints collide —
   * and because winnowing guarantees any shared verbatim run of
   * K+W−1 words yields a shared fingerprint, a long verbatim overlap
   * with the corpus CANNOT slip between sampled shingles the way a
   * MinHash band can probabilistically miss (dedup_eval measures that
   * gap). One native [[graft.functions.WinnowCollide]] kernel call
   * per row (deque selection + per-doc dedup + binary-search probes);
   * stateless, Append-safe, replay-stable. Aggregate-vs-corpus
   * semantics (collisions counted against the whole model, not per
   * partner doc) — the admission form of dedupWinnow's pairwise rule;
   * RunTopologySpec pins stream == the batch relational rule. Scale:
   * model = rare-fingerprint count × 8 B — bounded by the df cap ×
   * vocabulary, the spanFlagStream bound. Docs must carry `text`.
   */
  def winnowGateStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.queries.PipelineQueries
    val model = PipelineQueries.rareWinnowFingerprints(
        PipelineQueries.winnowDocFingerprints(corpus))
      .collect().map(_.getLong(0)).sorted
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.filter(graft.functions.native
      .winnow_collide(col("text"), PipelineQueries.WinnowK,
        PipelineQueries.WinnowW, bc)
      .getField("n_collide") < PipelineQueries.WinnowMinShared)
  }

  /**
   * Live TRAINED-CLASSIFIER admission gate — `classify_train`'s learn
   * stage deployed: the logistic-regression weight table is trained
   * ONCE at topology build from a labeled static corpus
   * (`PipelineQueries.trainClassifierWeights` — the identical
   * quantized-GD learner the gated batch query runs and the DuckDB
   * oracle reproduces), broadcast as a 64-long array, and each
   * arriving doc is admitted iff its quantized margin is positive —
   * the model's own prediction arithmetic (Σ_b floor(w_b·c_b /
   * n_words)), computed by one native
   * [[graft.functions.ClassifyTrainedMargin]] kernel call per row.
   * Where `classify_gate` applies the FROZEN weight formula, this is
   * the train→deploy loop closed: retrain on a fresh corpus, rebuild
   * the topology, the gate serves the new model. Stateless,
   * Append-safe, replay-stable; admitted rows carry (n_words,
   * margin_micro) for observability. Docs must carry a `text` column;
   * all input columns pass through.
   */
  def trainedClassifyGateStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val w = graft.queries.PipelineQueries.trainClassifierWeights(corpus)
    val bc = docs.sparkSession.sparkContext.broadcast(w)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("tc",
        graft.functions.native.classify_trained_margin(lower(col("text")), bc))
      .select(passthrough ++ Seq(col("tc.n_words").as("n_words"),
        col("tc.margin_micro").as("margin_micro")): _*)
      .filter(col("margin_micro") > 0L)
  }

  /**
   * Live DSIR admission gate — the streaming form of
   * `PipelineQueries.sampleDsir`'s selection, offline-model /
   * online-filter like [[trainedClassifyGateStream]]: the B-row
   * micro-nat log-ratio model and the batch top-N's minimum score are
   * learned ONCE at topology build from a static (lang, text) corpus;
   * each live document then scores in ONE native [[graft.functions
   * .DsirScore]] kernel call (md5-60 bucket per word, exact integer
   * sum over the broadcast long[]) and is admitted iff its log
   * importance weight clears the threshold. A rank cut is not
   * streamable, so the gate's contract is the SCORE-threshold form:
   * ties AT the batch cutoff admit (the batch rank breaks them by
   * doc_id; a gate has no corpus to rank against). Buckets unseen in
   * the corpus take the natural add-one-smoothing value for zero
   * counts — a novel live word neither crashes nor silently drops.
   * Wordless documents reject (no evidence of target fit — the batch
   * ranking likewise never selects them). Stateless, Append-safe,
   * replay/retry-stable; docs must carry `text`, all input columns
   * pass through.
   */
  def dsirGateStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.queries.PipelineQueries
    val spark = docs.sparkSession
    val b = PipelineQueries.DsirBuckets
    val rows = PipelineQueries.dsirModel(corpus).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
    require(rows.nonEmpty,
      "dsirGateStream: the corpus yielded no scorable words — the gate " +
        "cannot learn a model or threshold from an empty/wordless corpus")
    val rtot = rows.map(_._2).sum
    val ttot = rows.map(_._3).sum
    val unseen = math.floor(math.log(
      (1.0 * (rtot + b)) / (1.0 * (ttot + b))) * 1000000.0).toLong
    val model = Array.fill(b)(unseen)
    rows.foreach { case (bk, _, _, lr) => model(bk) = lr }
    val bc = spark.sparkContext.broadcast(model)
    // threshold from the SAME kernel the gate scores with (pinned
    // equal to the relational dsirScores by RunTopologySpec), so the
    // learn phase is one corpus pass instead of re-deriving the model
    // in-plan a second time
    val thr = corpus
      .select(col("doc_id"),
        graft.functions.native.dsir_score(lower(col("text")), bc).as("ds"))
      .select(col("doc_id"), col("ds.n_words").as("n_words"),
        col("ds.logw_micro").as("logw_micro"))
      .filter(col("n_words") > 0L)
      .orderBy(col("logw_micro").desc, col("doc_id"))
      .limit(PipelineQueries.DsirN.toInt)
      .agg(min(col("logw_micro"))).head().getLong(0)
    val passthrough = docs.columns.map(col)
    docs
      .withColumn("ds", graft.functions.native.dsir_score(lower(col("text")), bc))
      .select(passthrough ++ Seq(col("ds.n_words").as("n_words"),
        col("ds.logw_micro").as("logw_micro")): _*)
      .filter(col("n_words") > 0L && col("logw_micro") >= thr)
  }

  /**
   * Live temperature-mixture SAMPLING GATE — the streaming form of
   * `PipelineQueries.mixSample`, offline-statistic / online-filter
   * like [[lmScoreStream]] and [[spanFlagStream]]: the per-source keep
   * thresholds are learned ONCE at topology build from a static corpus
   * (the gated batch query's own `mixThresholds` arithmetic), embedded
   * as a LITERAL map (source-count entries — codegen'd lookup, no
   * broadcast join whose static subtree would re-run per micro-batch),
   * and the keep decision is the identical row-local md5-prefix
   * predicate — stateless, Append-safe, replay/retry-stable. A source
   * unseen at learn time keeps EVERYTHING: absent from the learned
   * mixture means zero natural share, so its rate capped at 1 — the
   * same cap the batch query applies to under-target sources. Docs
   * must carry (source, text); all input columns pass through.
   */
  def mixSampleStream(docs: DataFrame, corpus: DataFrame): DataFrame =
    mixSampleGate(docs, mixThresholdEntries(corpus))

  /** The learned (source, keep-threshold) entries of [[mixSampleStream]],
   *  collected ONCE — callers that also need the source names (Run's
   *  demo labeler, MaxRateProbe) share this single collect instead of
   *  re-deriving the threshold frame per consumer (and the entries are
   *  sorted by source so downstream label indexing is deterministic). */
  def mixThresholdEntries(corpus: DataFrame): Array[(String, Long)] =
    graft.queries.PipelineQueries.mixThresholds(
      corpus.select(col("source"),
        graft.ops.TextAnalyticsOps.wsTokenCount(col("text")).as("n_tokens")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)

  /** The filter stage of [[mixSampleStream]] over pre-collected
   *  threshold entries. */
  def mixSampleGate(docs: DataFrame,
      thresholds: Array[(String, Long)]): DataFrame = {
    import graft.queries.PipelineQueries
    val tmap = map(thresholds.flatMap {
      case (s, t) => Seq(lit(s), lit(t)) }.toIndexedSeq: _*)
    docs.filter(PipelineQueries.mixHash24(col("text")) <
      coalesce(element_at(tmap, col("source")),
        lit(PipelineQueries.MixHashSpace)))
  }

  /**
   * Live LANGID CONFUSION MONITOR — the streaming form of
   * `PipelineQueries.textLangIdEval`: running (label, prediction)
   * confusion counts as a Complete-mode aggregate — the
   * [[mixWeightsStream]] output-mode reasoning verbatim: the group
   * count is |langs|² and BOUNDED BY THE KERNEL'S LABEL SET, so the
   * full-snapshot re-emission is exactly the matrix a monitor wants,
   * and state can never grow past it. The prediction is the same
   * row-local `LangId` kernel the batch query applies. Docs must
   * carry (lang, text). StreamOpsSpec pins each snapshot against the
   * batch agg over everything seen.
   */
  def langIdEvalStream(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"),
      graft.ops.TextAnalyticsOps.langId(col("text")).as("lang_pred"))
      .agg(count(lit(1)).as("n"))

  /**
   * Live TRAINED language-ID — the streaming form of
   * `PipelineQueries.textLangIdNb` (the char-bigram Naive Bayes),
   * same offline-model/online-score split as [[lmScoreStream]]: the
   * Laplace grid and log-priors are learned ONCE at topology build by
   * the IDENTICAL batch formulation over the static corpus (so the
   * integer micro-nat values match by construction), collected
   * (vocab × langs rows — bounded by the character alphabet squared,
   * guarded by `maxModelEntries` with the distributed batch join
   * named as the alternative), and broadcast as a bigram →
   * lang-indexed score array probed by the native
   * [[graft.functions.NbLangId]] codegen kernel — one row-local call
   * per line, zero joins, zero state. Contract deltas vs batch: a
   * post-training NOVEL bigram contributes nothing (the batch inner
   * join's semantics), and a line with < 2 characters labels as the
   * prior argmax instead of dropping (a live gate must label every
   * line); stream == batch is spec-pinned on the corpus itself.
   */
  def nbLangIdStream(docs: DataFrame, corpus: DataFrame,
      maxModelEntries: Long =
        graft.queries.PipelineQueries.NbMaxModelEntries): DataFrame = {
    val (modelF0, priorsF) = graft.queries.PipelineQueries
      .langIdNbModelFrames(corpus.select(col("lang"), col("text")))
    // one grid materialization serves the size-guard count AND the
    // collect; the count runs BEFORE the collect it protects — a live
    // topology has no distributed fallback, so over-cap fails fast
    // pointing at the batch query
    val modelF = modelF0.localCheckpoint()
    val nEntries = modelF.count()
    require(nEntries <= maxModelEntries,
      s"NB langid model has $nEntries entries > cap " +
        s"$maxModelEntries; a broadcast map this size risks driver/" +
        "executor memory — score in batch with " +
        "PipelineQueries.textLangIdNb (which routes to a distributed " +
        "relational apply), or raise maxModelEntries if the memory " +
        "budget allows")
    val (bcM, bcP, bcL) = graft.queries.PipelineQueries
      .nbLangIdBroadcast(modelF, priorsF)
      .getOrElse(throw new IllegalArgumentException(
        "NB langid model is empty (no labeled docs with >= 2 chars " +
          "in the corpus) — nothing to score against; fix the corpus " +
          "or use the stopword heuristic topology (langid_eval)"))
    val passthrough = docs.columns.map(col)
    // coalesce: a NULL text labels like an empty one (prior argmax) —
    // the kernel's null-propagation would emit lang_pred = NULL, the
    // exact vanishing a live labeler must not do
    docs.select(passthrough :+
      graft.functions.native.nb_langid(
        lower(coalesce(col("text"), lit(""))), bcM, bcP, bcL)
        .getField("lang_pred").as("lang_pred"): _*)
  }

  /**
   * Live PERPLEXITY-BUCKET labeling — the streaming form of
   * `PipelineQueries.textPplBuckets` (the CCNet gate applied at
   * ingest): the two bucket thresholds are learned ONCE at topology
   * build from the static corpus by the IDENTICAL batch formulation
   * (`unigramNllOf` + interpolated tertiles — a 2-double model, the
   * cheapest in the gate family), and arriving lines are scored by
   * [[lmScoreStream]]'s broadcast unigram model + kernel, then
   * labeled by the same CASE. Known-vocabulary lines bucket exactly
   * as the batch query would (RunTopologySpec pins the corpus replay
   * row-for-row); OOV words carry the model's singleton-ceiling cost
   * (the lm_score contract), pushing them toward 'tail' — the
   * drop-side answer a filter wants for unknown text. Empty lines
   * (n_words = 0, no perplexity defined) also label 'tail' rather
   * than vanishing: a live gate never silently swallows rows.
   */
  def pplBucketStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val thr = graft.queries.PipelineQueries.unigramNllOf(corpus)
      .select(floor(col("nll_micro_sum") / col("n_words"))
        .cast("bigint").as("s"))
      .agg(percentile(col("s"), lit(1.0 / 3)).as("t1"),
        percentile(col("s"), lit(2.0 / 3)).as("t2"))
      .collect().head
    val (t1, t2) = (thr.getDouble(0), thr.getDouble(1))
    lmScoreStream(docs, corpus)
      .withColumn("mean_nll_micro", when(col("n_words") > 0,
        floor(col("nll_micro_sum") / col("n_words")).cast("bigint")))
      .withColumn("ppl_bucket",
        when(col("mean_nll_micro").isNull, lit("tail"))
          .when(col("mean_nll_micro") < t1, lit("head"))
          .when(col("mean_nll_micro") < t2, lit("middle"))
          .otherwise(lit("tail")))
  }

  /**
   * Live CORPUS-REPORT monitor — the streaming form of
   * `PipelineQueries.corpusReport`: running per-source doc/token
   * totals, micro-quantized quality-score sum, langid/label
   * disagreements, and classifier keep counts, via the IDENTICAL
   * shared `corpusReportAgg` plan (four row-local kernels + one
   * grouped agg — nothing in it is batch-only). Complete mode by the
   * [[mixWeightsStream]] reasoning: the group count is |sources|,
   * bounded by construction, and the full snapshot IS the dashboard a
   * monitor re-renders per trigger. Docs must carry
   * (source, lang, text). StreamOpsSpec pins each snapshot against
   * the batch agg over everything seen.
   */
  def corpusReportStream(docs: DataFrame): DataFrame =
    graft.queries.PipelineQueries.corpusReportAgg(docs)

  /**
   * Live MIXTURE MONITOR — the streaming form of
   * `PipelineQueries.mixWeights`: running per-source doc/token totals
   * as a Complete-mode aggregate (group count = sources, bounded by
   * construction — the one output mode whose re-emission is exactly
   * the full snapshot the normalizer needs), with the temperature
   * weights computed per trigger in foreachBatch over that snapshot
   * via the SAME `weightsOf` the gated batch query uses. A chained
   * streaming agg (totals → normalizer) would be unsupported — and
   * unnecessary: the per-trigger batch is a static frame. State is one
   * (count, sum) pair per source, the same O(sources) bound as
   * [[packSequencesStream]].
   */
  def mixWeightsStream(docs: DataFrame, checkpoint: String,
      emitFreqSec: Long = 0L)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val totals = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(graft.ops.TextAnalyticsOps.wsTokenCount(col("text")))
        .as("n_tokens"))
    val writer = totals.writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(graft.queries.PipelineQueries.weightsOf(batch), id)
      }
    // same --emit-freq pacing contract as the other Run topologies
    // (0 = default trigger, for tests that drain as fast as possible)
    val paced = if (emitFreqSec > 0)
      writer.trigger(Trigger.ProcessingTime(s"$emitFreqSec seconds"))
    else writer
    paced.start()
  }

  /**
   * Live greedy sequence PACKING — the streaming form of
   * `PipelineQueries.packSequences`: each arriving document is assigned
   * to the training sequence where its first token lands, from a
   * per-source RUNNING token offset held in keyed state (one long per
   * source — state is O(sources), never O(stream)). Within a trigger a
   * source's docs pack in doc_id order; across triggers the offset
   * carries forward, so with per-source-ordered arrival (the loader
   * contract for an ingest feed — same caveat as [[temporalAsOf]]) the
   * assignment equals the batch query's bit-for-bit. Emits
   * (doc_id, source, n_tokens, seq_id), Append (an assignment never
   * retracts — exactly why the greedy cut, not bin-packing, is the
   * loader standard).
   */
  def packSequencesStream(docs: DataFrame, budget: Int): DataFrame = {
    val spark0 = docs.sparkSession
    import spark0.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        graft.ops.TextAnalyticsOps.wsTokenCount(col("text")).as("n_tokens"))
      // a null id/source/text row would crash the primitive-Long
      // encoder below — drop malformed rows BEFORE binding it, the
      // same guard order as Run's rolling_sort_lastn
      .na.drop()
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(Long, String, Long)],
            state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, tok) =>
            val seq = cum / budget // floor(preceding tokens / budget)
            cum += tok
            (id, src, tok, seq)
          }
          state.update(cum)
          out.iterator
      }.toDF("doc_id", "source", "n_tokens", "seq_id")
  }

  /**
   * Live ANOMALY gate — the streaming form of
   * `AnalyticsQueries.eventAnomalies`: the per-type (mean, σ) model
   * is learned ONCE at topology build from a history table by the
   * IDENTICAL decimal-exact batch formulation (`anomalyStats`) and
   * embedded as literal maps (|event_types| entries — tiny, the
   * mix_sample threshold-map device); arriving events flag row-locally
   * when |value − m| > kσ. The same offline-model/online-filter split
   * as lm_score: a chained streaming agg could not both maintain the
   * moments and filter against them in one query, and a monitor wants
   * the FROZEN baseline anyway — yesterday's distribution judging
   * today's stream, retrained on an operator's schedule. Events of a
   * type absent from the history pass unflagged (no baseline — the
   * conservative answer for an alerting gate; the batch join drops
   * them identically).
   */
  def anomalyGateStream(events: DataFrame, history: DataFrame,
      sigma: Double = graft.queries.AnalyticsQueries.AnomalySigma)
      : DataFrame = {
    val stats = graft.queries.AnalyticsQueries.anomalyStats(history)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    require(stats.nonEmpty, "anomaly_gate: empty history — no baseline")
    val mMap = map(stats.flatMap { case (t, m, _) =>
      Seq(lit(t), lit(m)) }.toIndexedSeq: _*)
    val sdMap = map(stats.flatMap { case (t, _, sd) =>
      Seq(lit(t), lit(sd)) }.toIndexedSeq: _*)
    events
      .withColumn("m", element_at(mMap, col("event_type")))
      .withColumn("sd", element_at(sdMap, col("event_type")))
      .filter(col("m").isNotNull &&
        abs(col("value") - col("m")) > lit(sigma) * col("sd"))
      .withColumn("z_r", round((col("value") - col("m")) / col("sd"), 4))
      .drop("m", "sd")
  }

  /**
   * Live FUNNEL state machine — the streaming form of
   * `AnalyticsQueries.eventFunnel`: one (stage, qualifying-time) pair
   * of keyed state per user; an arriving event ADVANCES its user
   * exactly when it is the next stage's type, strictly after the
   * qualifying time, and within the attribution window — the batch
   * CTE chain restated as a transition rule. Emits one Append row per
   * advance (user_id, stage, event_type, ts); counting rows per stage
   * downstream reproduces the batch funnel. Ordering contract: events
   * are processed in event-time order WITHIN each trigger (sorted
   * here); across triggers, first-touch semantics make a late-arriving
   * EARLIER event unable to retract an already-taken advance — the
   * same running-state contract as the reference's per-bolt state
   * (RunTopologySpec pins an in-order replay transition-for-transition
   * against the batch stage frames). State is one (int, long) per user
   * seen, NoTimeout — bounded by the user domain; an unbounded domain
   * takes the [[runningCountTtl]] event-time-TTL device.
   */
  def funnelStream(events: DataFrame,
      stages: Seq[String] = graft.queries.AnalyticsQueries.FunnelStages,
      windowSec: Long = graft.queries.AnalyticsQueries.FunnelWindowSec)
      : DataFrame = {
    val spark0 = events.sparkSession
    import spark0.implicits._
    val winMicros = windowSec * 1000000L
    events
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts").cast("timestamp_ntz"))
      .na.drop()
      .as[(Long, String, java.time.LocalDateTime)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long),
          (Long, Int, String, java.time.LocalDateTime)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, java.time.LocalDateTime)],
            state: GroupState[(Int, Long)]) =>
          def micros(t: java.time.LocalDateTime): Long = {
            val i = t.toInstant(java.time.ZoneOffset.UTC)
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          }
          var (stage, t0) = state.getOption.getOrElse((0, 0L))
          val out = rows.toSeq.sortBy(e => micros(e._3)).flatMap {
            case (_, tpe, ts) =>
              val t = micros(ts)
              val advances = stage < stages.length && tpe == stages(stage) &&
                (stage == 0 || (t > t0 && t <= t0 + winMicros))
              if (advances) {
                stage += 1; t0 = t
                Some((uid, stage, tpe, ts))
              } else None
          }
          state.update((stage, t0))
          out.iterator
      }.toDF("user_id", "stage", "event_type", "ts")
  }

  /**
   * Watermarked stream-stream interval join: right rows within
   * `[left.ts, left.ts + gap]` on an equality key — the streaming form
   * of JoinOps.bandedRangeJoin, using Spark's native stream-stream join.
   * The watermarks plus the two-sided time condition bound BOTH state
   * stores: each side evicts rows once the other side's watermark passes
   * the join window, so state is O(gap x rate), not O(stream). Column
   * names must be disjoint apart from the range condition's inputs
   * (pre-alias the sides); `keyEq` is the equality predicate.
   */
  def streamingRangeJoin(left: DataFrame, right: DataFrame, keyEq: Column,
      leftTs: String, rightTs: String, gap: String,
      watermarkDelay: String): DataFrame =
    left.withWatermark(leftTs, watermarkDelay)
      .join(right.withWatermark(rightTs, watermarkDelay),
        keyEq && col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $gap"))

  /**
   * Similarity search as a continuous service: a stream of query
   * vectors (query_id, embedding) scored per trigger against a static
   * corpus. Each micro-batch broadcasts that trigger's queries and
   * streams the corpus through the SAME scoring pipeline the batch
   * operator uses (corpus never shuffles; only the tiny per-query rank
   * exchanges) — foreachBatch is the honest idiom for per-trigger
   * relational algebra that streaming-native operators can't express
   * (global rank over a micro-batch).
   */
  def streamingTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      checkpoint: String)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ops.SimilarityOps
    val withNorm = corpus.select(col("vec_id"), col("embedding"),
      SimilarityOps.l2Norm(col("embedding")).as("nrm"))
    queries.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val q = batch.select(col("query_id"), col("embedding").as("q_emb"),
          SimilarityOps.l2Norm(col("embedding")).as("q_nrm"))
        val scored = withNorm.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos", SimilarityOps.cosine(col("embedding"),
            col("q_emb"), col("nrm"), col("q_nrm")))
        val rank = org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("vec_id")))
        sink(scored.withColumn("rank", rank.cast("bigint"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("rank"),
            col("vec_id").as("neighbor_id"), round(col("cos"), 4).as("cos_r")),
          id)
      }
      .start()
  }

  /**
   * Streaming incremental cluster-id maintenance — the live form of
   * [[graft.ops.DedupOps.incrementalClusterAssign]]: each micro-batch
   * of documents adopts the converged cluster frame accumulated so
   * far (and triggers the merges it causes) through the contracted
   * local fixpoint, then becomes history for the next trigger.
   * foreachBatch is the honest idiom — a per-trigger CC fixpoint is
   * relational algebra no streaming-native operator expresses.
   *
   * State rides at `statePath` as VERSIONED parquet keyed by batch id:
   * `v<id>/docs` holds ONLY that batch's documents (append-only — text
   * is written once and never rewritten, the 100 TB requirement),
   * `bands/version=<id>/gen=<g>` and `shingles/version=<id>/gen=<g>`
   * (manifest-committed — see [[ClusterStateManifest]]) that batch's
   * [[graft.ops.DedupOps.clusterBandKeys]] / `clusterShingleSets`
   * (append-only, fixed-width — the PRECOMPUTED derived state that
   * makes steady-state ingest O(|batch|): band keys and shingle
   * hashes are pure functions of text, so computing them once at
   * ingest and reading the stored triples thereafter is exact), and
   * `v<id>/clusters` a full snapshot of the converged frame
   * (fixed-width (doc_id, cluster) rows — the small, rewritable half;
   * superseded snapshots are PRUNED each trigger down to the current
   * and one prior version — the prior is what a retry of the next
   * batch reads — so cluster state is bounded at two frames while
   * docs/bands/shingles grow append-only).
   *
   * Incremental in COST, not just semantics: a trigger shingles and
   * minhashes ONLY its own batch; history enters as ONE partitioned
   * read each of the stored band and shingle tables (`version` is a
   * hive partition column, so the plan is a single scan relation with
   * a `version < id` partition filter — never an O(#versions) union —
   * and history TEXT is never scanned; StreamOpsSpec pins both at the
   * plan level). At warehouse scale the stored band table additionally
   * rides the bucketed layout BucketedTablesSpec proves erases the
   * history-side join exchanges.
   *
   * doc_ids are IMMUTABLE IDENTITIES: a doc_id already in state
   * re-arriving (at-least-once upstream, replay) is dropped by an
   * anti-join against the accumulated cluster frame — its stored text
   * stays authoritative, state gains no duplicate (doc_id, cluster)
   * rows, and the sink still reports its CURRENT cluster (content
   * updates need a new doc_id). Duplicates WITHIN a trigger collapse
   * to one deterministic representative (min text).
   *
   * A trigger reads history as every version STRICTLY BELOW its own
   * batch id, so a retried batch never sees its own partial writes
   * (overwrite mode makes the rewrite idempotent). Because versions
   * are keyed by batch id, the statePath is BOUND to its checkpoint:
   * a `_graft_checkpoint` marker records it on the first trigger and
   * every later trigger verifies the match — pointing a fresh or
   * rewound checkpoint at existing state fails loud instead of
   * restarting ids at 0 (which would silently ignore all history and
   * overwrite v0). The derived band/shingle tables carry their own
   * transactional layer: every partition set is resolved through the
   * [[ClusterStateManifest]] commit log, so torn writes are invisible,
   * gap detection is exact, and [[compactClusterState]] runs safely
   * CONCURRENT with the stream.
   *
   * `sink` receives each batch's assignment AT INGEST TIME (a later
   * merge may relabel a cluster retroactively — the STATE snapshot is
   * the current truth, exactly like the batch operator's history
   * frame; StreamOpsSpec pins state == full recompute after every
   * trigger).
   */
  def clusterAssignStream(docs: DataFrame, statePath: String,
      checkpoint: String, threshold: Double = 0.5)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        // state ↔ checkpoint binding: versions are keyed by BATCH ID,
        // so a fresh/rewound checkpoint over an existing statePath
        // restarts ids at 0, silently ignores all history (version <
        // id sees nothing) AND overwrites legacy v0 — fail loud
        // instead. The marker is written FIRST on the first-ever
        // trigger (before any state write, so a crash can't strand
        // state without it); thereafter the recorded checkpoint must
        // match.
        val marker = new org.apache.hadoop.fs.Path(
          s"$statePath/_graft_checkpoint")
        if (fs.exists(marker)) {
          val recorded = {
            val in = fs.open(marker)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          }
          require(recorded == checkpoint,
            s"clusterAssignStream: statePath $statePath belongs to " +
              s"checkpoint '$recorded' but this query runs under " +
              s"'$checkpoint' — batch ids would restart and silently " +
              "ignore/overwrite existing state; resume the original " +
              "checkpoint or use a fresh statePath")
        } else {
          val all = clusterAssignVersions(spark, statePath, Long.MaxValue)
          require(all.forall(_ < id),
            s"clusterAssignStream: statePath $statePath already holds " +
              s"versions >= batch id $id and carries no checkpoint " +
              "marker — a fresh/rewound checkpoint over existing state " +
              "would overwrite it; resume the original checkpoint or " +
              "use a fresh statePath")
          val out = fs.create(marker, true)
          try out.write(checkpoint.getBytes("UTF-8")) finally out.close()
        }
        val versions = clusterAssignVersions(spark, statePath, id)
        // migrate / guard: a statePath written before the derived-state
        // layout (docs only, no bands/shingles) would otherwise read as
        // EMPTY history and silently mis-cluster — backfill instead
        ensureDerivedClusterState(spark, statePath, versions)
        val histClusters = clusterAssignHistClusters(spark, statePath, versions)
        // admission: collapse within-trigger duplicates to one
        // deterministic representative, then drop doc_ids already in
        // state (immutable-identity contract — see scaladoc).
        // localCheckpoint: four actions consume this frame per trigger
        // (bands write, shingles write, the assignment, the docs
        // write) — materialize the admission ONCE; released below.
        val batchDocs = batch.select(col("doc_id"), col("text"))
          .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
          .join(histClusters.select("doc_id"), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        // persist this batch's derived state FIRST (overwrite = retry-
        // idempotent; readers resolve partitions through the COMMITTED
        // manifest, so the write is invisible until the commit below),
        // then assign against the STORED history triples — and pass
        // the just-written batch triples back in, so the assignment
        // never re-shingles even its own batch. gen is 0 unless a
        // crashed prior attempt already committed this version (then
        // rewrite the same directory — nothing reads version=id until
        // this trigger's own read-back).
        val g = readClusterManifest(spark, statePath)
          .flatMap(_.liveOf("bands").find(_._1 == id)).map(_._2)
          .getOrElse(0L)
        val bandsDir = clusterPartDir(statePath, "bands", id, g)
        val shinglesDir = clusterPartDir(statePath, "shingles", id, g)
        graft.ops.DedupOps
          .clusterBandKeys(batchDocs, col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(bandsDir)
        graft.ops.DedupOps
          .clusterShingleSets(batchDocs, col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(shinglesDir)
        // COMMIT: both tables' new partition enter the manifest in ONE
        // atomic publish — a crash before this line leaves orphan
        // directories no reader ever lists (the retry rewrites them)
        commitClusterManifest(spark, statePath) { prev =>
          val m = prev.getOrElse(ClusterStateManifest.empty)
          m.copy(live = m.live
            .updated("bands",
              ClusterStateManifest.upsert(m.liveOf("bands"), id, g))
            .updated("shingles",
              ClusterStateManifest.upsert(m.liveOf("shingles"), id, g)))
        }
        val assigned = clusterAssignTrigger(
          spark, statePath, id, batchDocs, histClusters, threshold,
          freshBands = Some(spark.read.parquet(bandsDir)),
          freshShingles = Some(spark.read.parquet(shinglesDir)))
        // materialize the new frame BEFORE it becomes readable state
        assigned.write.mode("overwrite")
          .parquet(s"$statePath/v$id/clusters")
        batchDocs.write.mode("overwrite")
          .parquet(s"$statePath/v$id/docs")
        // prune superseded cluster snapshots: only the LATEST frame is
        // ever read forward, but a RETRY of batch id+1 reads the
        // latest below id+1 — so keep this version's and the one
        // prior, delete older (docs are history and never pruned).
        // Only the most recent TWO superseded versions are targeted —
        // constant filesystem RPCs per trigger (everything older was
        // deleted by earlier triggers; the second covers the
        // crash-between-write-and-prune window, whose straggler the
        // next trigger reclaims)
        versions.dropRight(1).takeRight(2).foreach { v =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$statePath/v$v/clusters"), true)
          ()
        }
        // the batch's ORIGINAL doc_ids (pre-admission): re-ingested
        // ids report their current cluster from the new snapshot
        sink(spark.read.parquet(s"$statePath/v$id/clusters")
          .join(batch.select("doc_id").distinct(), "doc_id"), id)
        graft.ops.DedupOps.releaseTruncated(batchDocs)
      }
      .start()
  }

  /** Backfill missing derived band/shingle partitions — EXACT gap
   *  detection against the committed manifest: a version is missing
   *  iff it is above the table's compaction floor AND absent from the
   *  live set. An on-disk partition directory the manifest does not
   *  list (a torn write from a crash mid-ingest or mid-backfill) is
   *  never trusted — it is rewritten with overwrite and only then
   *  committed. Pre-manifest layouts adopt first (the one place
   *  directory listings are trusted, see
   *  [[adoptClusterStateLayout]]). A warning names each backfill. */
  private[graft] def ensureDerivedClusterState(spark: SparkSession,
      statePath: String, versions: Array[Long]): Unit = {
    val m0 = adoptClusterStateLayout(spark, statePath)
      .getOrElse(ClusterStateManifest.empty)
    val missing = ClusterStateManifest.Tables.map { table =>
      table -> versions.filter(v =>
        v > m0.floor(table) && !m0.liveOf(table).exists(_._1 == v))
    }.toMap
    if (missing.values.exists(_.nonEmpty)) {
      missing.foreach { case (table, vs) => vs.foreach { v =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "clusterAssignStream: backfilling {} for uncommitted state " +
            "version {} at {}", table, v.toString, statePath)
        val docs = spark.read.parquet(s"$statePath/v$v/docs")
        val derived =
          if (table == "bands")
            graft.ops.DedupOps.clusterBandKeys(docs, col("doc_id"), col("text"))
          else
            graft.ops.DedupOps.clusterShingleSets(docs, col("doc_id"), col("text"))
        derived.write.mode("overwrite")
          .parquet(clusterPartDir(statePath, table, v, 0L))
      }}
      commitClusterManifest(spark, statePath) { prev =>
        val m = prev.getOrElse(ClusterStateManifest.empty)
        m.copy(live = ClusterStateManifest.Tables.map { table =>
          table -> missing(table).foldLeft(m.liveOf(table))(
            (es, v) => ClusterStateManifest.upsert(es, v, 0L))
        }.toMap)
      }
      ()
    }
  }

  /** The versions strictly below `id` present at `statePath`. */
  private[graft] def clusterAssignVersions(spark: SparkSession,
      statePath: String, id: Long): Array[Long] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Array.empty[Long]
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .flatMap(n => scala.util.Try(n.drop(1).toLong).toOption)
      .filter(_ < id).sorted
  }

  private[graft] def clusterAssignHistClusters(spark: SparkSession,
      statePath: String, versions: Array[Long]): DataFrame = {
    import spark.implicits._
    versions.lastOption.map(v =>
        spark.read.parquet(s"$statePath/v$v/clusters"))
      .getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "cluster"))
  }

  /** One trigger's assignment PLAN against the stored derived state —
   *  factored out so StreamOpsSpec can pin its shape: the only file
   *  scans are the batch-invisible ones (stored bands, stored
   *  shingles, the cluster snapshot); history DOCS never appear, so
   *  history text is provably never re-shingled. */
  private[graft] def clusterAssignTrigger(spark: SparkSession,
      statePath: String, id: Long, batchDocs: DataFrame,
      histClusters: DataFrame, threshold: Double,
      freshBands: Option[DataFrame] = None,
      freshShingles: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    // partitions resolve through the COMMITTED manifest — an
    // uncommitted (torn) directory is invisible, and the explicit
    // path list still reads as one scan relation with the version
    // partition filter
    val manifest = readClusterManifest(spark, statePath)
    def stored(table: String, cols: Seq[String], empty: => DataFrame)
        : DataFrame =
      manifest.map(_.liveOf(table)).filter(_.nonEmpty)
        .map(entries => spark.read
          .option("basePath", s"$statePath/$table")
          .parquet(entries.map(e =>
            clusterPartDir(statePath, table, e._1, e._2)): _*)
          .filter(col("version") < id).select(cols.map(col): _*))
        .getOrElse(empty)
    val histBands = stored("bands", Seq("id", "band", "bh"),
      Seq.empty[(Long, Int, Long)].toDF("id", "band", "bh"))
    val histShingles = stored("shingles", Seq("sid", "shs"),
      Seq.empty[(Long, Array[Long])].toDF("sid", "shs"))
    graft.ops.DedupOps.incrementalClusterAssignPre(
      batchDocs, histBands, histShingles, histClusters,
      col("doc_id"), col("text"), threshold,
      freshBands = freshBands, freshShingles = freshShingles)
  }

  /** A committed derived-state partition directory:
   *  `<statePath>/<table>/version=<v>/gen=<g>`. The `gen` sublevel is
   *  what makes compaction concurrent-safe — a fold writes a FRESH
   *  directory (never overwrites a live one) and becomes visible only
   *  through the manifest commit. */
  private[graft] def clusterPartDir(statePath: String, table: String,
      v: Long, g: Long): String = s"$statePath/$table/version=$v/gen=$g"

  /** Serializes manifest commits within this JVM; cross-JVM the
   *  create-no-overwrite sequence file is the arbiter. */
  private object ClusterManifestLock

  private def clusterManifestDir(statePath: String) =
    new org.apache.hadoop.fs.Path(s"$statePath/_manifests")

  /** The newest COMPLETE manifest (with its sequence number). A torn
   *  file from a writer crash — missing the `eof=true` terminator or
   *  unparseable — was never committed; the reader steps down to the
   *  previous sequence. */
  private[graft] def readClusterManifestSeq(spark: SparkSession,
      statePath: String): Option[(Long, ClusterStateManifest)] = {
    val dir = clusterManifestDir(statePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .flatMap(n => scala.util.Try(
        n.stripSuffix(".manifest").toLong).toOption)
      .sorted.reverseIterator
      .map { seq =>
        // the open/read can race commitClusterManifest's pruning (file
        // listed, then deleted before fs.open) — a vanished or
        // unreadable candidate is treated exactly like a torn one:
        // step down a sequence (the newest COMPLETE manifest is
        // always within the ManifestKeep window)
        scala.util.Try {
          val in = fs.open(new org.apache.hadoop.fs.Path(
            dir, f"$seq%020d.manifest"))
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }.toOption
          .flatMap(ClusterStateManifest.parse).map(seq -> _)
      }
      .collectFirst { case Some(x) => x }
  }

  private[graft] def readClusterManifest(spark: SparkSession,
      statePath: String): Option[ClusterStateManifest] =
    readClusterManifestSeq(spark, statePath).map(_._2)

  /** Manifest files older than the newest minus this many sequences
   *  are pruned at commit time — enough step-down depth for torn
   *  manifests and in-flight readers, while bounding the directory a
   *  long-running stream's per-trigger reads must list. */
  private val ManifestKeep = 16L

  /** Commit a manifest transformation with optimistic concurrency:
   *  read the newest complete manifest, apply `update`, publish as
   *  sequence `max-present + 1` via create-no-overwrite. A
   *  [[org.apache.hadoop.fs.FileAlreadyExistsException]] means
   *  another writer claimed the number first — re-read and retry, so
   *  concurrent trigger and compaction commits MERGE instead of
   *  clobbering; any other I/O failure (disk full, permissions)
   *  propagates loud rather than spinning. `update` must therefore be
   *  a pure transformation of the CURRENT manifest, re-runnable on
   *  retry. Concurrency envelope: within one JVM the lock serializes
   *  writers outright; across JVMs the claim is atomic wherever
   *  create-no-overwrite is (HDFS and object stores with conditional
   *  create — local filesystems check-then-create, so multi-PROCESS
   *  writers on a local statePath are outside the contract; the
   *  stream + its in-process maintenance job is the supported local
   *  shape). After publishing, sequences older than the newest
   *  [[ManifestKeep]] are pruned so per-trigger manifest reads list a
   *  bounded directory. */
  private[graft] def commitClusterManifest(spark: SparkSession,
      statePath: String)(
      update: Option[ClusterStateManifest] => ClusterStateManifest)
      : ClusterStateManifest = ClusterManifestLock.synchronized {
    val dir = clusterManifestDir(statePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    def seqs(): Array[Long] = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .flatMap(n => scala.util.Try(
        n.stripSuffix(".manifest").toLong).toOption)
    var committed: Option[(Long, ClusterStateManifest)] = None
    while (committed.isEmpty) {
      // next sequence counts every file PRESENT (torn ones included —
      // their number is burned, not reusable), content comes from the
      // newest COMPLETE one
      val next = seqs().maxOption.getOrElse(-1L) + 1
      val out = update(readClusterManifest(spark, statePath))
      try {
        val os = fs.create(new org.apache.hadoop.fs.Path(
          dir, f"$next%020d.manifest"), false)
        try os.write(ClusterStateManifest.render(out).getBytes("UTF-8"))
        finally os.close()
        committed = Some((next, out))
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          () // lost the sequence race — merge onto the winner and retry
      }
    }
    val (seq, out) = committed.get
    seqs().filter(_ < seq - ManifestKeep).foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(
        dir, f"$s%020d.manifest"), false)
      ()
    }
    out
  }

  /** One-time adoption of a pre-manifest `<table>/version=<v>` layout:
   *  restructure each partition directory to `version=<v>/gen=0` (so
   *  partition depth is uniform) and seed the manifest from the
   *  directory listing — the single point where on-disk directories
   *  are trusted; thereafter only manifest-committed partitions are
   *  ever read. Legacy gaps below a table's lowest stored version are
   *  prior folds, recorded as that table's floor. NOT concurrent-safe
   *  (the move is multi-step): runs inside the single-writer trigger
   *  or a quiesced maintenance call, and is a no-op once the manifest
   *  exists. Crash-resumable — an interrupted move leaves a
   *  `.mig-version=<v>` staging directory the next call completes. */
  private[graft] def adoptClusterStateLayout(spark: SparkSession,
      statePath: String): Option[ClusterStateManifest] =
    readClusterManifest(spark, statePath).orElse {
      val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def finishMove(root: org.apache.hadoop.fs.Path, v: Long): Unit = {
        fs.mkdirs(new org.apache.hadoop.fs.Path(root, s"version=$v"))
        fs.rename(new org.apache.hadoop.fs.Path(root, s".mig-version=$v"),
          new org.apache.hadoop.fs.Path(root, s"version=$v/gen=0"))
        ()
      }
      val present = ClusterStateManifest.Tables.map { table =>
        val root = new org.apache.hadoop.fs.Path(s"$statePath/$table")
        if (!fs.exists(root)) table -> Array.empty[Long]
        else {
          fs.listStatus(root).map(_.getPath.getName)
            .filter(_.startsWith(".mig-version=")).foreach(n =>
              finishMove(root, n.stripPrefix(".mig-version=").toLong))
          val vs = fs.listStatus(root).map(_.getPath.getName)
            .filter(_.startsWith("version="))
            .flatMap(n => scala.util.Try(
              n.stripPrefix("version=").toLong).toOption).sorted
          vs.foreach { v =>
            val d = new org.apache.hadoop.fs.Path(root, s"version=$v")
            if (!fs.exists(new org.apache.hadoop.fs.Path(d, "gen=0"))) {
              fs.rename(d, new org.apache.hadoop.fs.Path(
                root, s".mig-version=$v"))
              finishMove(root, v)
            }
          }
          table -> vs
        }
      }.toMap
      if (present.values.forall(_.isEmpty)) None
      else Some(commitClusterManifest(spark, statePath) { prev =>
        prev.getOrElse(ClusterStateManifest(
          floors = present.map { case (t, vs) =>
            t -> (if (vs.isEmpty) -1L else vs.min - 1) },
          genHw = ClusterStateManifest.Tables.map(_ -> 0L).toMap,
          live = present.map { case (t, vs) =>
            t -> vs.map(v => (v, 0L)).toSeq },
          retired = Nil))
      })
    }

  /**
   * MAINTENANCE compaction for [[clusterAssignStream]]'s derived
   * state: fold every `bands`/`shingles` partition with
   * `version <= upTo` into one partition and retire the lower ones. A
   * long-running stream otherwise accumulates one partition directory
   * (of possibly many small files) per trigger; compaction bounds the
   * per-trigger file-listing and scan-open cost at O(triggers since
   * last compaction) and reclaims the superseded storage. Row content
   * is unchanged, so trigger results are identical before/after
   * (spec-pinned).
   *
   * CONCURRENT-SAFE under running triggers via the manifest-commit
   * protocol: the fold is written to a FRESH `version=upTo/gen=<g+1>`
   * directory (no live directory is ever overwritten), published by
   * ONE manifest commit (atomic create of the next sequence file), and
   * every reader resolves its partition set from the manifest — a
   * trigger concurrent with compaction reads either the pre-fold set
   * or the post-fold set, never a half-fold, and since row content is
   * identical both give the same assignment. Superseded directories
   * are not deleted at commit (an in-flight reader may still hold
   * them): they are RETIRED in the manifest and swept at the START of
   * the NEXT compaction — the retention contract is that no single
   * trigger spans two whole compaction runs, trivially true when
   * maintenance is spaced beyond the trigger interval. Run ONE
   * compactor at a time (it is a maintenance job); triggers may keep
   * flowing.
   *
   * The enforced `upTo < latest` bound covers the other hazard — a
   * post-restart retry of the latest batch must not find its own rows
   * folded into history (it would pair documents with themselves).
   *
   * Crash-recovery: before the commit, the only effect is an orphan
   * fold directory no manifest references (a re-run recomputes the
   * same generation number and overwrites it); after the commit the
   * fold is fully live and the old directories await the next sweep.
   * A re-run is idempotent throughout (sweeping already-deleted paths
   * is a no-op, folding a single live partition is skipped).
   */
  def compactClusterState(spark: SparkSession, statePath: String,
      upTo: Long): Unit = {
    val maxV = clusterAssignVersions(spark, statePath, Long.MaxValue)
      .lastOption.getOrElse(
        sys.error(s"compactClusterState: no versions at $statePath"))
    require(upTo < maxV,
      s"compactClusterState: upTo=$upTo must stay below the latest " +
        s"version $maxV — a post-restart retry of batch $maxV reads " +
        "versions below itself and must not find its own rows there")
    adoptClusterStateLayout(spark, statePath).foreach { m0 =>
      val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // SWEEP: directories retired by the PREVIOUS compaction have had
      // a full compaction interval of reader grace — delete them now
      // (and the version= parent when its last gen leaves)
      m0.retired.foreach { case (t, v, g) =>
        val gone = new org.apache.hadoop.fs.Path(
          clusterPartDir(statePath, t, v, g))
        fs.delete(gone, true)
        val parent = gone.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty) {
          fs.delete(parent, false)
          ()
        }
      }
      val folds: Map[String, Long] =
        ClusterStateManifest.Tables.flatMap { table =>
          val entries = m0.liveOf(table).filter(_._1 <= upTo)
          if (entries.length <= 1) None
          else {
            val g = m0.genHw.getOrElse(table, 0L) + 1
            // materialize before writing — same statePath filesystem
            val combined = spark.read
              .option("basePath", s"$statePath/$table")
              .parquet(entries.map(e =>
                clusterPartDir(statePath, table, e._1, e._2)): _*)
              .drop("version", "gen")
              .localCheckpoint()
            combined.write.mode("overwrite")
              .parquet(clusterPartDir(statePath, table, upTo, g))
            graft.ops.DedupOps.releaseTruncated(combined)
            Some(table -> g)
          }
        }.toMap
      if (folds.nonEmpty || m0.retired.nonEmpty) {
        commitClusterManifest(spark, statePath) { prev =>
          val m = prev.getOrElse(ClusterStateManifest.empty)
          // remove EXACTLY the entries this fold consumed (the m0
          // snapshot) — an entry <= upTo committed concurrently (a
          // restarted stream's backfill) is NOT in the fold and must
          // stay live, or its rows would vanish with the floor raised
          // past re-detection
          val consumed: Map[String, Set[(Long, Long)]] =
            folds.keys.map(t =>
              t -> m0.liveOf(t).filter(_._1 <= upTo).toSet).toMap
          val newRetired = folds.keys.toSeq.sorted.flatMap { table =>
            consumed(table).toSeq.sortBy(_._1).map(e =>
              (table, e._1, e._2))
          }
          m.copy(
            floors = m.floors ++ folds.keys.map(t =>
              t -> math.max(m.floor(t), upTo)),
            genHw = m.genHw ++ folds.map { case (t, g) =>
              t -> math.max(m.genHw.getOrElse(t, 0L), g) },
            live = m.live ++ folds.map { case (t, g) =>
              t -> ClusterStateManifest.upsert(
                m.liveOf(t).filterNot(consumed(t)), upTo, g) },
            // entries we just swept leave; this fold's victims enter
            retired = m.retired.filterNot(m0.retired.contains)
              ++ newRetired)
        }
        ()
      }
    }
  }

  /**
   * IVF-PQ similarity serving — [[streamingTopK]]'s 100 TB sibling:
   * the two-level IVFADC index (coarse centroids + shared residual
   * codebooks + the ENCODED corpus) is built ONCE at topology start
   * and the code relation localCheckpointed, so per trigger the
   * corpus floats are never read again — each micro-batch's query
   * vectors probe nProbe cells and score against the compact codes
   * via broadcast ADC tables (`SimilarityOps.ivfPqScore`, the exact
   * scoring tail the gated batch query runs; StreamOpsSpec pins
   * stream == batch per trigger). This is the serving shape at scale:
   * bytes scanned per query are codes (4 B/vector at the default
   * config) in the probed cells only, not embeddings.
   */
  /**
   * HYBRID retrieval SERVING — the live form of
   * `PipelineQueries.simHybrid` and the composition a production
   * search stack actually deploys: arriving queries carry BOTH
   * representations (`query_id`, `text`, `embedding` — an upstream
   * embedder enriches before retrieval, the embed-gate pattern), and
   * each trigger ranks them lexically AND densely, fusing by RRF.
   *
   * Serving artifacts build ONCE at topology start and the corpus is
   * never re-derived per trigger: the INVERTED INDEX — the per-(doc,
   * term) tf relation with doc lengths, exactly what a lexical engine
   * materializes — plus the vocab-sized df table, the 1-double avgdl,
   * and the norm-carrying embedding relation, all reliable-truncated
   * ([[streamingTopKIvfPq]]'s executor-loss trade). Per trigger the
   * postings relation is read through a BROADCAST restriction to the
   * batch's query terms (map-side, no index shuffle), scored by the
   * SHARED `bm25Contribution` expression (the quantized integers
   * cannot drift from batch), rank-cut, fused by the SHARED `rrfFuse`
   * tail against the dense crossJoin-broadcast ranks — stream == the
   * gated batch query on replayed corpus queries, spec-pinned across
   * multiple triggers.
   */
  def streamingHybrid(queries: DataFrame, docs: DataFrame, emb: DataFrame,
      checkpoint: String, emitFreqSec: Int = 0)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val idx = buildHybridIndex(docs, emb)
    val writer = queries.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(hybridTrigger(idx, batch), id)
      }
    (if (emitFreqSec > 0)
       writer.trigger(Trigger.ProcessingTime(s"$emitFreqSec seconds"))
     else writer)
      .start()
  }

  /** The build-once serving artifacts of [[streamingHybrid]]. */
  private[graft] case class HybridServeIndex(withNorm: DataFrame,
      tfC: DataFrame, dfC: DataFrame, n: Long, avgdl: Double)

  private[graft] def buildHybridIndex(docs: DataFrame,
      emb: DataFrame): HybridServeIndex = {
    import graft.ops.{SimilarityOps, TextAnalyticsOps}
    val withNorm = graft.ops.DedupOps.reliableTruncate(
      emb.select(col("vec_id"), col("embedding"),
        SimilarityOps.l2Norm(col("embedding")).as("nrm")))
    val n = docs.count()
    require(n > 0, "hybrid_serve: empty docs corpus — avgdl and df " +
      "are undefined with nothing to index")
    val tfC = graft.ops.DedupOps.reliableTruncate(
      docs.select(col("doc_id"),
          TextAnalyticsOps.wsTokenCount(col("text")).as("dl"),
          explode(TextAnalyticsOps.words(lower(col("text")))).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf")))
    val dfC = graft.ops.DedupOps.reliableTruncate(
      tfC.groupBy("term").agg(count(lit(1)).as("dfreq")))
    val avgdl = docs
      .select(TextAnalyticsOps.wsTokenCount(col("text")).as("dl"))
      .agg((sum(col("dl")).cast("double") / lit(n.toDouble)).as("a"))
      .head().getDouble(0)
    HybridServeIndex(withNorm, tfC, dfC, n, avgdl)
  }

  /** One trigger's fused retrieval over the built index — factored so
   *  the max-rate probe drives the exact per-trigger plan. Arriving
   *  rows dedupe on query_id first: a repeated query in one
   *  micro-batch (two users typing the same search) would otherwise
   *  double every corpus vector under that qid and corrupt the dense
   *  ranks (safe for content-derived ids — equal id ⇒ equal text;
   *  ingestion with unstable id↔text mappings must dedupe upstream).
   *  Query ids must be DISJOINT from corpus doc/vec ids — the
   *  query-by-example self-exclusion filters equal-id pairs out of
   *  BOTH rankers, so a colliding live id silently loses that corpus
   *  doc (Run's demo derives strictly negative ids; the -(k+1)
   *  disjoint-keyspace convention). */
  private[graft] def hybridTrigger(idx: HybridServeIndex,
      batchRaw: DataFrame): DataFrame = {
    import graft.ops.{SimilarityOps, TextAnalyticsOps}
    import graft.queries.PipelineQueries
    val batch = batchRaw.dropDuplicates("query_id")
    val q = batch.select(col("query_id"), col("embedding").as("q_emb"),
      SimilarityOps.l2Norm(col("embedding")).as("q_nrm"))
    // the SHARED dense scoring + rank-cut definitions (cosineTopK's
    // core), so a tie-break change cannot diverge stream from batch
    val dense = SimilarityOps.cosineRankCut(
        SimilarityOps.scoreExternalQueries(idx.withNorm, q),
        PipelineQueries.HybridCand)
      .select(col("query_id").as("qid"), col("vec_id").as("doc_id"),
        col("rank").as("dense_rank"))
    val qterms = batch.select(col("query_id").as("qid"),
        explode(TextAnalyticsOps.words(lower(col("text")))).as("term"))
      .distinct()
    // no separate distinct-terms restriction join here: tfC is already
    // aggregated (the batch form's restriction prunes BELOW its tf
    // agg), so the qterms join IS the restriction
    val scores = idx.tfC
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(idx.dfC), "term")
      .withColumn("avgdl", lit(idx.avgdl))
      .filter(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        PipelineQueries.bm25Contribution(idx.n.toDouble).as("c"))
      .groupBy("qid", "doc_id").agg(sum(col("c")).as("score_nano"))
    PipelineQueries.rrfFuse(dense, PipelineQueries.lexRankCut(scores))
  }

  def streamingTopKIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, nCells: Int = 8, nProbe: Int = 4, m: Int = 4, ks: Int = 8,
      iters: Int = 2, checkpoint: String)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ops.SimilarityOps
    val built = SimilarityOps.buildIvfPqIndex(corpus, dim, nCells, nProbe,
      m, ks, iters)
    // reliableTruncate, not bare localCheckpoint: a long-running serving
    // topology on a cluster must survive executor loss — when a reliable
    // checkpoint dir is configured the code snapshot goes there; local
    // blocks are the single-JVM fallback only (the same trade the
    // dedup/CC family makes).
    val idx = built.copy(
      codes = graft.ops.DedupOps.reliableTruncate(built.codes))
    queries.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import scala.math.Ordering.Implicits.seqOrdering
        val raw = batch.select(col("query_id"), col("embedding")).collect()
          .map(r => r.getLong(0) ->
            Option(r.getSeq[Float](1)).map(_.toArray).orNull)
        // the serving-boundary hygiene a real service needs: malformed
        // vectors (null / wrong width) QUARANTINE — yield no rows, not
        // a killed topology (the decode convention); duplicate
        // query_ids in one trigger collapse to ONE deterministic
        // representative (lexicographically smallest vector — an
        // at-least-once upstream must not double every neighbor row
        // and halve the served k)
        val (valid, malformed) = raw.partition { case (_, v) =>
          v != null && v.length == dim }
        if (malformed.nonEmpty)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "streamingTopKIvfPq: trigger {} quarantined {} malformed " +
              "query vectors (null or wrong dim): ids {}",
            id.toString, malformed.length.toString,
            malformed.map(_._1).take(10).mkString(","))
        val qs = valid.groupBy(_._1).map { case (qid, rs) =>
          qid -> rs.map(_._2).minBy(_.toSeq)
        }.toSeq.sortBy(_._1)
        sink(SimilarityOps.ivfPqScore(idx, qs, k), id)
      }
      .start()
  }

  /** Envelope for [[temporalAsOf]]: both sides union into one tagged
   *  relation (probe rows have isBuild = false). */
  case class Timed(key: Long, ts: Long, id: Long, isBuild: Boolean)
  case class LatestBuild(ts: Long, id: Long)
  case class TemporalMatch(key: Long, probeId: Long, probeTs: Long,
      buildId: Long, buildTs: Long)

  /**
   * Streaming temporal join (the streaming as-of): each probe event
   * joins the latest build row with ts <= probe.ts on its key, where
   * "latest" is keyed state maintained across triggers — Flink calls
   * this a temporal table join; it is the streaming form of
   * JoinOps.asOfJoin. Within a micro-batch the group's rows process in
   * (ts, side, id) order — builds before probes at equal ts, so <=
   * matches — and the state only moves forward (a stale build arriving
   * after a newer one never regresses it). Caveat shared with Flink's
   * processing-time temporal join: a build row arriving in a LATER
   * trigger than a probe cannot retro-match it; with per-key-ordered
   * sources the result equals the batch as-of join. Probes with no
   * prior build drop (inner semantics, like the batch op).
   */
  def temporalAsOf(events: Dataset[Timed]): Dataset[TemporalMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[LatestBuild, TemporalMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[LatestBuild]) =>
          var latest = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[TemporalMatch]()
          rows.toSeq.sortBy(e => (e.ts, if (e.isBuild) 0 else 1, e.id)).foreach { e =>
            if (e.isBuild) {
              if (latest == null || e.ts > latest.ts ||
                (e.ts == latest.ts && e.id > latest.id)) {
                latest = LatestBuild(e.ts, e.id)
              }
            } else if (latest != null) {
              out += TemporalMatch(key, e.id, e.ts, latest.id, latest.ts)
            }
          }
          if (latest != null) state.update(latest)
          out.iterator
      }
  }

  /**
   * Continuously-maintained latest position per aircraft via keyed state
   * (mapGroupsWithState) — the streaming form of WindowOps.latestPerKey
   * and the exact analog of DistFilterBolt's flightMap
   * (RollingFlightDist.java:216-218: newer PosTime wins).
   */
  def latestPositions(positions: Dataset[AdsbPosition]): Dataset[AdsbPosition] = {
    import positions.sparkSession.implicits._
    positions.groupByKey(_.icao)
      .mapGroupsWithState[AdsbPosition, AdsbPosition](GroupStateTimeout.NoTimeout) {
        (_, updates, state: GroupState[AdsbPosition]) =>
          val freshest = (state.getOption.iterator ++ updates)
            .maxBy(p => (p.posTime, p.lat, p.lng)) // posTime wins; determinisitic tiebreak
          state.update(freshest)
          freshest
      }
  }

  /**
   * Per-trigger proximity warnings with cumulative state: each
   * micro-batch folds its position reports into a versioned
   * latest-position snapshot (parquet, one version per batch — the
   * freshest-position map of DistFilterBolt, RollingFlightDist.java:216),
   * then runs the batch pairwise join (JoinOps.proximityPairs) on the
   * FULL snapshot. Per-trigger snapshot semantics — coarser interleaving
   * than the reference's per-tuple compare but the same warning set over
   * time (SURVEY.md §7.4 risk 3).
   */
  def proximityWarnings(positions: Dataset[AdsbPosition], thresholdKm: Double,
      steps: Int, stepSec: Int, triggerSec: Int, checkpointDir: String,
      stateDir: String)(
      onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    positions.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds"))
      .foreachBatch { (batch: Dataset[AdsbPosition], batchId: Long) =>
        val spark = batch.sparkSession
        val updates = batch.toDF().select(col("icao"),
          col("posTime").as("pos_time"), col("lat"), col("lng"),
          (col("spd") * graft.ops.GeoOps.KnotToKmPerSec).as("spd_kms"),
          col("trak"))
        // resume from the NEWEST existing version, not batchId-1: after a
        // checkpoint restart batch ids continue but a fresh run must still
        // find the accumulated state. Old versions are pruned (keep 2, so
        // a concurrent reader of the previous version never races the
        // delete). Listing and pruning go through the Hadoop FileSystem
        // resolved from the path's scheme — stateDir may be local on a
        // laptop but HDFS/S3 on a cluster, where java.io.File sees nothing.
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def versions(): Seq[Long] =
          if (!fs.exists(statePath)) Seq.empty
          else fs.listStatus(statePath).toSeq.map(_.getPath.getName).collect {
            case n if n.length > 1 && n.head == 'v' && n.tail.forall(_.isDigit) =>
              n.tail.toLong
          }.sorted
        val existing = versions()
        val merged = existing.lastOption match {
          case Some(v) => spark.read.parquet(s"$stateDir/v$v").union(updates)
          case None => updates
        }
        val latest = graft.ops.WindowOps.latestPerKey(merged,
          Seq("icao"), Seq("pos_time"))
        val next = existing.lastOption.getOrElse(-1L) + 1
        latest.write.mode("overwrite").parquet(s"$stateDir/v$next")
        versions().dropRight(2).foreach { v =>
          fs.delete(new org.apache.hadoop.fs.Path(statePath, s"v$v"), true)
        }
        val snapshot = spark.read.parquet(s"$stateDir/v$next")
        onBatch(JoinOps.proximityPairs(snapshot, thresholdKm, steps, stepSec), batchId)
      }
      .start()
  }

  /**
   * Per-EVENT incremental proximity warnings — DistFilterBolt's actual
   * arrival interleaving (RollingFlightDist.java:213-256), as opposed to
   * [[proximityWarnings]]'s per-trigger snapshot join: each arriving
   * report is compared against the continuously-maintained latest
   * positions of the other aircraft AS OF that arrival, then (if owned
   * by the shard) installed as its aircraft's freshest position when
   * strictly newer (:217).
   *
   * Sharding mirrors the reference's allGrouping + hashCode ownership:
   * every report is fanned out to all `numShards` comparison shards,
   * each shard's keyed state holds only the aircraft it owns
   * (floorMod(icao.hashCode, numShards)), so a pair is compared exactly
   * once per arrival — at the shard owning the OTHER aircraft. State is
   * therefore partitioned, not replicated: at 1000 executors each shard
   * carries 1/numShards of the fleet, and fan-out cost (numShards
   * copies of each small report) is the same network price Storm pays
   * for allGrouping.
   *
   * `strictSharding = true` reproduces the reference verbatim: an OWNED
   * arrival only updates the map and is never compared
   * (:213-219) — which silently means same-shard pairs are never warned
   * and a single-task deployment emits NOTHING. The default (false)
   * closes that blind spot: every arrival is compared against the
   * shard's owned flights (excluding itself) before the state update,
   * making results shard-count-invariant (ProximityFidelitySpec proves
   * both properties).
   *
   * Arrival order within a trigger is made deterministic by sorting on
   * (posTime, icao) — the replay-stable stand-in for Storm's
   * nondeterministic tuple arrival.
   *
   * STATE TTL: the reference retains every aircraft's latest position
   * forever (RollingFlightDist.java:216-218) — unbounded at fleet
   * scale, where decommissioned/out-of-range aircraft accumulate. Here
   * an aircraft silent for more than `silenceTtlSec` (default: the
   * speculative horizon `steps * stepSec` — a fix older than the
   * horizon could only be compared by extrapolating it past the model's
   * own speculative window) is (a) INVISIBLE to comparisons — arrival
   * `r` sees stored `f` only when `f.posTime >= r.posTime - ttl` — and
   * (b) physically EVICTED from the keyed state once the shard's
   * event-time high-water mark `C` passes its fix by the TTL. For
   * IN-ORDER data the two rules coincide and results are independent
   * of trigger chunking: anything evicted was already invisible to
   * every later arrival. For LATE data they do not: a report `r` below
   * the high-water mark by ANY amount may find entries with posTime in
   * `[r.posTime - ttl, C - ttl)` already deleted if eviction ran in an
   * earlier trigger, though rule (a) alone would have shown them — so
   * out-of-order output CAN depend on how triggers chunked the stream
   * (the standard allowed-lateness contract, not a pure pairwise
   * rule). Pass
   * `silenceTtlSec = Long.MaxValue` for the reference's retain-forever
   * behavior.
   */
  def proximityWarningsPerEvent(positions: Dataset[AdsbPosition],
      thresholdKm: Double, steps: Int, stepSec: Int, numShards: Int = 1,
      strictSharding: Boolean = false,
      silenceTtlSec: Long = -1L): Dataset[ProximityWarning] = {
    val spark0 = positions.sparkSession
    import spark0.implicits._
    val ttlMs = resolveTtlMs(silenceTtlSec, steps, stepSec)
    val sharded = positions.flatMap { p =>
      val owner = math.floorMod(p.icao.hashCode, numShards)
      (0 until numShards).iterator.map { s =>
        ShardedReport(s, s == owner, p.icao, p.posTime, p.lat, p.lng,
          p.spd * graft.ops.GeoOps.KnotToKmPerSec, p.trak)
      }
    }
    sharded.groupByKey(_.shard)
      .flatMapGroupsWithState[Map[String, FlightState], ProximityWarning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, reports, state) =>
        val (owned, out) = processShardBatch(
          state.getOption.getOrElse(Map.empty[String, FlightState]),
          reports.toVector, thresholdKm, steps, stepSec, strictSharding, ttlMs)
        state.update(owned)
        out.iterator
      }
  }

  /** `silenceTtlSec < 0` selects the default TTL — the speculative
   *  horizon; saturating multiplication guards MaxValue-style opt-outs
   *  from overflowing to a negative TTL. */
  private[streaming] def resolveTtlMs(silenceTtlSec: Long, steps: Int,
      stepSec: Int): Long = {
    val sec = if (silenceTtlSec < 0) steps.toLong * stepSec else silenceTtlSec
    if (sec > Long.MaxValue / 1000L) Long.MaxValue else sec * 1000L
  }

  /** One shard's batch transition — DistFilterBolt's arrival loop plus
   *  the TTL contract documented on [[proximityWarningsPerEvent]] —
   *  factored pure so the eviction behavior is unit-testable without a
   *  state store. Returns (state after physical eviction, warnings). */
  private[streaming] def processShardBatch(owned0: Map[String, FlightState],
      reports: Seq[ShardedReport], thresholdKm: Double, steps: Int,
      stepSec: Int, strictSharding: Boolean,
      ttlMs: Long): (Map[String, FlightState], Vector[ProximityWarning]) = {
    var owned = owned0
    val out = Vector.newBuilder[ProximityWarning]
    reports.sortBy(r => (r.posTime, r.icao)).foreach { r =>
      if (!strictSharding || !r.owned)
        owned.foreach { case (icao2, f) =>
          // difference form: r - MaxValue would wrap; r - f never can
          // (both are epoch millis); a NEWER stored fix is negative-
          // silent and always visible
          if (r.posTime - f.posTime <= ttlMs)
            out ++= speculativeWarnings(r, icao2, f, thresholdKm, steps, stepSec)
        }
      if (r.owned && owned.get(r.icao).forall(_.posTime < r.posTime))
        owned = owned.updated(r.icao,
          FlightState(r.posTime, r.lat, r.lng, r.spdKms, r.trak))
    }
    // physical eviction at the shard's event-time high-water mark: the
    // freshest owned entry always survives its own cursor, so the
    // cursor is monotone across batches and eviction never resurrects
    val cursor = (reports.iterator.map(_.posTime) ++
      owned.valuesIterator.map(_.posTime)).foldLeft(Long.MinValue)(math.max)
    // difference form (cursor >= f.posTime for every owned f by
    // construction, so this never overflows, even at ttl = MaxValue)
    (owned.filter { case (_, f) => cursor - f.posTime <= ttlMs }, out.result())
  }

  /** One arrival vs one stored flight: the speculative step loop —
   *  same arithmetic as JoinOps.proximityPairs (one fused GeoMath call
   *  per step), so every formulation is bit-comparable
   *  (RollingFlightDist.java:230-258). Shared by the
   *  flatMapGroupsWithState and transformWithState forms. */
  private[streaming] def speculativeWarnings(r: ShardedReport, icao2: String,
      f: FlightState, thresholdKm: Double, steps: Int,
      stepSec: Int): Seq[ProximityWarning] = {
    if (icao2 == r.icao) return Nil
    val out = Vector.newBuilder[ProximityWarning]
    var currTime = math.max(r.posTime, f.posTime)
    var i = 0
    while (i < steps) {
      val dist = graft.functions.GeoMath.projectedDistKm(
        r.lat, r.lng, r.trak, r.spdKms * (currTime - r.posTime) / 1000,
        f.lat, f.lng, f.trak, f.spdKms * (currTime - f.posTime) / 1000)
      if (dist <= thresholdKm) {
        val distR = BigDecimal(dist)
          .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (i1, i2) = if (r.icao < icao2) (r.icao, icao2) else (icao2, r.icao)
        out += ProximityWarning(i1, i2, i, currTime, distR)
      }
      currTime += 1000L * stepSec
      i += 1
    }
    out.result()
  }

  /**
   * `transformWithState` formulation of [[proximityWarningsPerEvent]] —
   * identical semantics (ProximityFidelitySpec asserts equal output),
   * different STATE GRANULARITY: the fMGWS form reads and rewrites the
   * shard's whole `Map[icao, FlightState]` blob every trigger, while
   * this processor keys a `MapState` per aircraft, so a trigger only
   * writes the entries it updated — point lookups + delta commits
   * instead of full-map (de)serialization.
   *
   * MEASURED (round 10, fleet 2000, 8 shards, bisected max-rate): this
   * form sustains 421 ev/s vs fMGWS's 841 ev/s — 2× SLOWER, and the
   * gap is the formulation, not the provider (fMGWS measures 841 on
   * both HDFS and RocksDB stores). Proximity's access pattern is a
   * full scan of the owned fleet per arrival, which degenerates
   * MapState's per-entry granularity into per-entry store reads, while
   * fMGWS amortizes one blob (de)serialization per trigger. Prefer
   * [[proximityWarningsPerEvent]] for scan-per-event shapes like this
   * one; this form is the right granularity when per-event access is
   * sparse/keyed (O(1) entries touched per arrival). Requires
   * `spark.sql.streaming.stateStore.providerClass =
   * ...state.RocksDBStateStoreProvider` (TWS's supported provider).
   *
   * Applies the same event-time silence TTL as
   * [[proximityWarningsPerEvent]] (see its contract; default = the
   * speculative horizon), with per-entry `removeKey` eviction — point
   * deletes, matching the per-aircraft state granularity.
   */
  def proximityWarningsTws(positions: Dataset[AdsbPosition],
      thresholdKm: Double, steps: Int, stepSec: Int, numShards: Int = 1,
      strictSharding: Boolean = false,
      silenceTtlSec: Long = -1L): Dataset[ProximityWarning] = {
    val spark0 = positions.sparkSession
    import spark0.implicits._
    val ttlMs = resolveTtlMs(silenceTtlSec, steps, stepSec)
    val sharded = positions.flatMap { p =>
      val owner = math.floorMod(p.icao.hashCode, numShards)
      (0 until numShards).iterator.map { s =>
        ShardedReport(s, s == owner, p.icao, p.posTime, p.lat, p.lng,
          p.spd * graft.ops.GeoOps.KnotToKmPerSec, p.trak)
      }
    }
    sharded.groupByKey(_.shard)
      .transformWithState(
        new ProximityShardProcessor(thresholdKm, steps, stepSec,
          strictSharding, ttlMs),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append)
  }

  /** Start a query into the in-memory sink (tests / console parity with
   *  the reference's log-based observability). */
  def toMemory(df: DataFrame, name: String, mode: OutputMode,
      checkpointDir: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode(mode).option("checkpointLocation", checkpointDir).start()
}

/**
 * A committed snapshot of [[StreamOps.clusterAssignStream]]'s derived
 * band/shingle state — the manifest-commit protocol that gives the
 * bare-parquet layout transactional reads (the Delta/Iceberg shape,
 * hand-rolled at the two-table scale this operator needs):
 *
 *  - `live`: per table, the exact committed partition set as
 *    (version, gen) pairs — readers list ONLY these directories, so a
 *    torn write (crash mid-ingest, mid-backfill, or mid-fold) is
 *    never visible.
 *  - `floors`: per table, the highest compaction fold bound — a
 *    version `<= floor` absent from `live` was folded, one `> floor`
 *    absent is MISSING and gets backfilled (exact gap detection).
 *  - `genHw`: highest fold generation ever allocated per table, so a
 *    fold never reuses a directory name still awaiting sweep.
 *  - `retired`: partitions superseded by the last compaction as
 *    (table, version, gen) tuples RELATIVE to the state path (paths
 *    are reconstructed through [[StreamOps.clusterPartDir]] at sweep
 *    time, so the state directory is relocatable and no path byte —
 *    '|', newline — can tear the manifest), swept at the start of the
 *    next compaction (reader grace window).
 *
 * Manifests live as `_manifests/<seq>.manifest` line files; commit =
 * create-no-overwrite of the next sequence (serialized in-JVM by a
 * lock; atomic across JVMs wherever create-no-overwrite is — see
 * [[StreamOps.commitClusterManifest]] for the exact envelope),
 * complete = trailing `eof=true` (a torn manifest parses as absent
 * and readers step down one sequence); sequences older than the
 * newest [[StreamOps.ManifestKeep]] prune at commit so reads list a
 * bounded directory.
 */
private[graft] case class ClusterStateManifest(
    floors: Map[String, Long],
    genHw: Map[String, Long],
    live: Map[String, Seq[(Long, Long)]],
    retired: Seq[(String, Long, Long)]) {
  def floor(table: String): Long = floors.getOrElse(table, -1L)
  def liveOf(table: String): Seq[(Long, Long)] =
    live.getOrElse(table, Nil)
}

private[graft] object ClusterStateManifest {
  val Tables: Seq[String] = Seq("bands", "shingles")
  val empty: ClusterStateManifest =
    ClusterStateManifest(Map.empty, Map.empty, Map.empty, Nil)

  def upsert(es: Seq[(Long, Long)], v: Long, g: Long)
      : Seq[(Long, Long)] = (es.filterNot(_._1 == v) :+ (v, g)).sortBy(_._1)

  def render(m: ClusterStateManifest): String = {
    def longMap(p: Map[String, Long]): String =
      p.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")
    (Seq(s"floors=${longMap(m.floors)}", s"gens=${longMap(m.genHw)}") ++
      Tables.map(t => s"live.$t=" + m.liveOf(t).sortBy(_._1)
        .map { case (v, g) => s"$v:$g" }.mkString(",")) ++
      Seq("retired=" + m.retired
        .map { case (t, v, g) => s"$t:$v:$g" }.mkString(","),
        "eof=true"))
      .mkString("\n") + "\n"
  }

  /** Pre-tuple manifests stored retired entries as ABSOLUTE partition
   *  paths joined on '|' — recover the (table, version, gen) triple
   *  from the path tail (every legacy entry came from
   *  [[StreamOps.clusterPartDir]], so the tail shape is fixed). */
  private val LegacyRetired =
    """([^/|]+)/version=(\d+)/gen=(\d+)/?$""".r.unanchored

  /** A manifest that WAS committed (the `eof=true` terminator is the
   *  last rendered line, so no torn prefix can carry it) but does not
   *  parse — a legacy retired entry outside the fixed
   *  [[StreamOps.clusterPartDir]] shape, a corrupt line, or a newer
   *  format this reader does not know. This must FAIL LOUD: treating
   *  it as torn would make readers silently step down to an older
   *  sequence — a quiet state regression (resurrected floors and live
   *  sets) on real committed state. */
  final class UnmigratableManifestException(msg: String,
      cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** None for a torn manifest — it was never committed (a torn write
   *  is a strict prefix of [[render]]'s output, which ends with the
   *  `eof=true` terminator, so completeness is decidable from the last
   *  line). A COMMITTED manifest that fails to parse for ANY reason —
   *  unmigratable legacy entry, corrupt line, unknown future format —
   *  throws [[UnmigratableManifestException]] instead of reading as
   *  absent — see its scaladoc. */
  def parse(text: String): Option[ClusterStateManifest] = {
    val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty || lines.last != "eof=true") None
    else scala.util.Try {
      val kv = lines.dropRight(1).map { l =>
        val i = l.indexOf('=')
        (l.substring(0, i), l.substring(i + 1))
      }.toMap
      def longMap(s: String): Map[String, Long] =
        if (s.isEmpty) Map.empty
        else s.split(",").map { p =>
          val Array(a, b) = p.split(":"); a -> b.toLong
        }.toMap
      def entries(s: String): Seq[(Long, Long)] =
        if (s.isEmpty) Nil
        else s.split(",").toSeq.map { p =>
          val Array(a, b) = p.split(":"); (a.toLong, b.toLong)
        }
      ClusterStateManifest(
        floors = longMap(kv("floors")),
        genHw = longMap(kv("gens")),
        live = Tables.map(t => t -> entries(kv(s"live.$t"))).toMap,
        retired = kv("retired") match {
          case "" => Nil
          case s if s.contains('/') => // legacy absolute-path form
            s.split("\\|").toSeq.map {
              case LegacyRetired(t, v, g) => (t, v.toLong, g.toLong)
              case p => throw new UnmigratableManifestException(
                s"committed manifest has a legacy retired entry outside " +
                  s"the clusterPartDir shape (cannot migrate): $p")
            }
          case s => s.split(",").toSeq.map { p =>
            val Array(t, v, g) = p.split(":")
            (t, v.toLong, g.toLong)
          }
        })
    } match {
      case scala.util.Success(m) => Some(m)
      // the Try only runs past the eof-terminator gate, so EVERY
      // failure here is committed-but-unparseable ≠ torn: fail loud
      // instead of stepping down past real committed state
      case scala.util.Failure(e: UnmigratableManifestException) => throw e
      case scala.util.Failure(e) => throw new UnmigratableManifestException(
        s"committed manifest (eof terminator present) failed to parse: " +
          s"${e.getMessage}", e)
    }
  }
}
