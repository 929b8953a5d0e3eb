package graft.queries

import SyntheticSources._

/**
 * DuckDB oracle SQL for every SQL-expressible query in [[BenchQueries]].
 * Mirrors each Spark plan's arithmetic *structurally* (same operation
 * order) so integer/string results match exactly and float results match
 * to libm ulps (rounded where emitted). Column aliases must equal the
 * Spark output names — the driver sorts columns by name before hashing.
 */
object Oracles {

  private val slide2h = "CROSS JOIN (VALUES (0),(1)) h(h)"
  private val wStart = "date_trunc('hour', ts) - h.h * INTERVAL 1 HOUR"

  val wordcount: String =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents) t
      |WHERE word <> '' GROUP BY word""".stripMargin

  val grep: String =
    s"SELECT count(*) AS matches FROM documents WHERE regexp_matches(text, '${BenchQueries.GrepPattern}')"

  val sol: String = "SELECT props AS message FROM events"

  /** Identity chain — the shuffles only move rows, never change them. */
  val solShuffled: String = sol

  val dataclean: String =
    s"""WITH $pageViewSql
       |SELECT url || chr(9) || CAST(http_status AS VARCHAR) || chr(9) ||
       |       CAST(zip_code AS VARCHAR) || chr(9) || CAST(user_id AS VARCHAR) AS page_view
       |FROM pv WHERE http_status <> 200""".stripMargin

  val pageviewCount: String =
    s"""WITH $pageViewSql
       |SELECT url, count(*) AS cnt FROM pv GROUP BY url""".stripMargin

  val uniqueVisitor: String =
    s"""WITH $pageViewSql
       |SELECT $wStart AS w_start, url, count(DISTINCT user_id) AS uniques
       |FROM pv $slide2h GROUP BY 1, 2""".stripMargin

  val rollingCount: String =
    s"""SELECT $wStart AS w_start, event_type AS word, count(*) AS cnt
       |FROM events $slide2h GROUP BY 1, 2""".stripMargin

  val rollingHashtag: String =
    s"""WITH $tweetTextSql
       |SELECT $wStart AS w_start, word AS hashtag, count(*) AS cnt
       |FROM (SELECT ts, unnest(string_split(txt, ' ')) AS word FROM tw) t
       |$slide2h
       |WHERE word LIKE '#%' AND length(word) > 1 GROUP BY 1, 2""".stripMargin

  /** Zone arithmetic mirrors GeoOps.zoneOf / RollingGeoCount.java:64-77. */
  val rollingGeo: String =
    s"""WITH $geoSql,
       |z AS (
       |  SELECT ts,
       |         CASE WHEN lat >= -80 AND lat < 84 AND lng >= -180 AND lng < 180 THEN
       |           CAST(CAST(1 + floor((lng + 180) / 6) AS INTEGER) AS VARCHAR) ||
       |           substr('CDEFGHIJKLMNOPQRSTUVWX', CAST(
       |             CASE WHEN lat < -32 THEN floor((lat + 80) / 8)
       |                  WHEN lat < 8  THEN 7 + floor((lat + 32) / 8)
       |                  WHEN lat < 72 THEN 13 + floor((lat - 8) / 8)
       |                  ELSE 21 END AS INTEGER) + 1, 1)
       |         ELSE 'undefined' END AS zone
       |  FROM geo)
       |SELECT $wStart AS w_start, zone, count(*) AS cnt
       |FROM z $slide2h GROUP BY 1, 2""".stripMargin

  val rollingSort: String =
    """SELECT * FROM (
      |  SELECT date_trunc('hour', ts) AS w_start,
      |         CAST(row_number() OVER (
      |           PARTITION BY date_trunc('hour', ts)
      |           ORDER BY value, event_id) AS BIGINT) AS rn,
      |         event_id, value
      |  FROM events) t WHERE rn <= 5""".stripMargin

  /** Last-500-arrivals ring buffer (newest by ts, event_id), ranked by
   *  (value, event_id) — RollingSort's count-based chunk semantics. */
  val rollingSortLastN: String =
    """WITH lastn AS (
      |  SELECT event_id, value FROM events
      |  ORDER BY ts DESC, event_id DESC LIMIT 500)
      |SELECT CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT) AS rn,
      |       value, event_id
      |FROM lastn""".stripMargin

  /** Mirrors flightDist stage-by-stage: latest-per-icao, theta self-join,
   *  speculative steps, dead-reckoning (computeLatLong), haversine
   *  (computeDist), threshold. Same expression structure as GeoOps so
   *  doubles agree to libm ulps; emitted distance is rounded to 0.1 km. */
  private def flightDistFrom(posCte: String): String = {
    val steps = (0 until BenchQueries.SpecSteps).map(i => s"($i)").mkString(",")
    s"""WITH $posCte,
       |latest AS (
       |  SELECT icao, pos_time, lat, lng, spd_kms, trak FROM (
       |    SELECT pos.*, row_number() OVER (
       |      PARTITION BY icao ORDER BY pos_time DESC, event_id DESC) AS rn
       |    FROM pos) t
       |  WHERE rn = 1),
       |paired AS (
       |  SELECT a.icao AS icao1, a.pos_time AS pt1, a.lat AS lat1, a.lng AS lng1,
       |         a.spd_kms AS spd1, a.trak AS trak1,
       |         b.icao AS icao2, b.pos_time AS pt2, b.lat AS lat2, b.lng AS lng2,
       |         b.spd_kms AS spd2, b.trak AS trak2, s.step,
       |         greatest(a.pos_time, b.pos_time) + s.step * ${BenchQueries.SpecStepSec * 1000L} AS curr_time
       |  FROM latest a JOIN latest b ON a.icao < b.icao
       |  CROSS JOIN (VALUES $steps) s(step)),
       |rel AS (
       |  SELECT *, spd1 * (curr_time - pt1) / 1000 / 6378.137 AS d1,
       |            spd2 * (curr_time - pt2) / 1000 / 6378.137 AS d2 FROM paired),
       |plat AS (
       |  SELECT *,
       |    asin(sin(radians(lat1)) * cos(d1) + cos(radians(lat1)) * sin(d1) * cos(radians(trak1))) AS plat1_r,
       |    asin(sin(radians(lat2)) * cos(d2) + cos(radians(lat2)) * sin(d2) * cos(radians(trak2))) AS plat2_r
       |  FROM rel),
       |proj AS (
       |  SELECT icao1, icao2, step, curr_time,
       |    degrees(plat1_r) AS plat1,
       |    degrees(radians(lng1) + atan2(sin(radians(trak1)) * sin(d1) * cos(radians(lat1)),
       |            cos(d1) - sin(radians(lat1)) * sin(plat1_r))) AS plng1,
       |    degrees(plat2_r) AS plat2,
       |    degrees(radians(lng2) + atan2(sin(radians(trak2)) * sin(d2) * cos(radians(lat2)),
       |            cos(d2) - sin(radians(lat2)) * sin(plat2_r))) AS plng2
       |  FROM plat),
       |dist AS (
       |  SELECT icao1, icao2, step, curr_time,
       |    6378.137 * 2 * atan2(
       |      sqrt(sin(radians(plat2 - plat1) / 2) * sin(radians(plat2 - plat1) / 2) +
       |           cos(radians(plat1)) * cos(radians(plat2)) *
       |           sin(radians(plng2 - plng1) / 2) * sin(radians(plng2 - plng1) / 2)),
       |      sqrt(1 - (sin(radians(plat2 - plat1) / 2) * sin(radians(plat2 - plat1) / 2) +
       |           cos(radians(plat1)) * cos(radians(plat2)) *
       |           sin(radians(plng2 - plng1) / 2) * sin(radians(plng2 - plng1) / 2)))) AS dist_km
       |  FROM proj)
       |SELECT icao1, icao2, step, curr_time, round(dist_km, 1) AS dist_r
       |FROM dist WHERE dist_km <= ${BenchQueries.DistThresholdKm}""".stripMargin
  }

  val flightDist: String = flightDistFrom(adsbSql)

  /** Same pipeline entered through the JSON wire parse: the guards drop
   *  the Spd-null / Gnd-true slivers; position arithmetic is unchanged
   *  because the JSON double embed round-trips exactly. */
  val flightDistWire: String = flightDistFrom(adsbWireSql)

  val tridentWordcount: String = wordcount

  // ---- training-data pipeline oracles ------------------------------------

  /** Mirrors hashSample: identical md5 hex in both engines. */
  val hashSample: String =
    """SELECT doc_id, source, md5(text) AS h FROM documents
      |WHERE substr(md5(text), 1, 1) IN ('0', '1', '2')""".stripMargin

  val dedupExact: String =
    "SELECT min(doc_id) AS keeper, count(*) AS n FROM documents GROUP BY text"

  val dedupFingerprint: String =
    """SELECT md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
      |       min(doc_id) AS keeper, count(*) AS n
      |FROM documents GROUP BY 1""".stripMargin

  val dedupNgram: String =
    """WITH w AS (
      |  SELECT doc_id, source,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS ws
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, source, unnest(list_distinct(
      |    CASE WHEN len(ws) >= 3
      |         THEN list_transform(range(0, len(ws) - 2),
      |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
      |         ELSE [] END)) AS sh
      |  FROM w),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS i
      |  FROM sh x JOIN sh y
      |    ON x.sh = y.sh AND x.source = y.source AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT id1, id2, i / (s1.sz + s2.sz - i) AS jaccard
      |FROM inter
      |JOIN sizes s1 ON id1 = s1.doc_id
      |JOIN sizes s2 ON id2 = s2.doc_id
      |WHERE i / (s1.sz + s2.sz - i) >= 0.8""".stripMargin

  /** Mirrors [[PipelineQueries.dedupSpans]]: same whitespace words, same
   *  gram windows, the corpus count grouped on the gram STRING where
   *  Spark groups on its xxhash64 (identical counts barring 2^-64-scale
   *  collisions — the decontaminate oracle's established equivalence),
   *  same lead()-window interval union. sum() is CAST to BIGINT
   *  (DuckDB sums to HUGEINT; Spark's is bigint). */
  val dedupSpans: String = {
    val n = PipelineQueries.SpanN
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i AS pos, array_to_string(ws[i+1:i+$n], ' ') AS gram
       |  FROM w, unnest(range(0, greatest(len(ws) - $n + 1, 0))) t(i)),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
       |tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
       |d AS (
       |  SELECT doc_id, pos, lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
       |  FROM g JOIN dup USING (gram)),
       |cov AS (
       |  SELECT doc_id, count(*) AS n_dup,
       |         CAST(sum(least(coalesce(nxt - pos, $n), $n)) AS BIGINT) AS dup_tokens
       |  FROM d GROUP BY 1)
       |SELECT w.doc_id,
       |       coalesce(n_grams, 0) AS n_grams,
       |       coalesce(n_dup, 0) AS n_dup,
       |       coalesce(dup_tokens, 0) AS dup_tokens
       |FROM w LEFT JOIN tot USING (doc_id) LEFT JOIN cov USING (doc_id)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.dedupSpansMaximal]]: same whitespace
   *  words, same gram windows, the dup flag grouped on the gram STRING
   *  where Spark groups on its xxhash64 (the dedupSpans equivalence),
   *  same gaps-and-islands run grouping (pos - row_number), same
   *  ≥ MaxSpanL qualification. An INDEPENDENT relational computation
   *  of the maximal-run semantics — not the Spark plan echoed back. */
  val dedupSpansMaximal: String = {
    val n = PipelineQueries.SpanN
    val l = PipelineQueries.MaxSpanL
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i AS pos, array_to_string(ws[i+1:i+$n], ' ') AS gram
       |  FROM w, unnest(range(0, greatest(len(ws) - $n + 1, 0))) t(i)),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
       |d AS (
       |  SELECT doc_id, pos,
       |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM g JOIN dup USING (gram)),
       |runs AS (
       |  SELECT doc_id, max(pos) - min(pos) + $n AS len
       |  FROM d GROUP BY doc_id, grp
       |  HAVING max(pos) - min(pos) + $n >= $l),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |         CAST(max(len) AS BIGINT) AS max_span,
       |         CAST(sum(len) AS BIGINT) AS span_tokens
       |  FROM runs GROUP BY 1)
       |SELECT w.doc_id,
       |       coalesce(n_spans, 0) AS n_spans,
       |       coalesce(max_span, 0) AS max_span,
       |       coalesce(span_tokens, 0) AS span_tokens
       |FROM w LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.dedupSpansRemoval]]: same run
   *  construction as [[dedupSpansMaximal]], occurrence groups
   *  fingerprinted by the run's gram STRINGS in position order where
   *  Spark hashes the gram-hash sequence (the established
   *  string-vs-hash equivalence), same (doc_id, p0) first-occurrence
   *  survivorship, removal = NOT EXISTS a cut interval covering the
   *  token, reconstruction = ordered string_agg of survivors. */
  val dedupSpansRemoval: String = {
    val n = PipelineQueries.SpanN
    val l = PipelineQueries.MaxSpanL
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i AS pos, array_to_string(ws[i+1:i+$n], ' ') AS gram
       |  FROM w, unnest(range(0, greatest(len(ws) - $n + 1, 0))) t(i)),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
       |d AS (
       |  SELECT doc_id, pos, gram,
       |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM g JOIN dup USING (gram)),
       |runs AS (
       |  SELECT doc_id, min(pos) AS p0, max(pos) AS p1,
       |         string_agg(gram, '|' ORDER BY pos) AS fp
       |  FROM d GROUP BY doc_id, grp
       |  HAVING max(pos) - min(pos) + $n >= $l),
       |rem AS (
       |  SELECT doc_id, p0, p1 + $n - 1 AS pend
       |  FROM (SELECT *, row_number() OVER (PARTITION BY fp
       |                    ORDER BY doc_id, p0) AS rn FROM runs)
       |  WHERE rn > 1),
       |tok AS (
       |  SELECT doc_id, i, ws[CAST(i + 1 AS INT)] AS word
       |  FROM w, unnest(range(0, len(ws))) t(i)),
       |kept AS (
       |  SELECT t.doc_id, t.i, t.word
       |  FROM tok t
       |  WHERE NOT EXISTS (SELECT 1 FROM rem r
       |                    WHERE r.doc_id = t.doc_id
       |                      AND t.i BETWEEN r.p0 AND r.pend)),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(word, ' ' ORDER BY i) AS ktext
       |  FROM kept GROUP BY 1)
       |SELECT w.doc_id,
       |       CAST(len(ws) AS BIGINT) AS n_tokens,
       |       CAST(len(ws) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |       md5(coalesce(ktext, '')) AS kept_hash
       |FROM w LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.dedupParagraphs]]: same whitespace words,
   *  same fixed-width unit cut, survivorship grouped on the unit STRING
   *  where Spark groups on its md5 (identical barring collisions — the
   *  dedupSpans equivalence), same (doc_id, unit_id) first-occurrence
   *  order. Reconstruction concatenates kept units in unit order
   *  (string_agg ORDER BY unit_id), which equals Spark's sorted
   *  kept-id word re-slice: units are space-joined words, so the
   *  kept-unit join and the kept-word join are the same string. */
  val dedupParagraphs: String = {
    val k = PipelineQueries.ParaTokens
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, i AS unit_id,
       |         array_to_string(ws[i*$k+1:i*$k+$k], ' ') AS unit
       |  FROM w, unnest(range(0, CAST(ceil(CAST(len(ws) AS DOUBLE) / $k) AS INT))) t(i)),
       |s AS (
       |  SELECT doc_id, unit_id, unit,
       |         row_number() OVER (PARTITION BY unit ORDER BY doc_id, unit_id) = 1 AS keep
       |  FROM u),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_units,
       |         count(*) FILTER (WHERE keep) AS n_kept,
       |         CAST(coalesce(sum(len(string_split(unit, ' '))) FILTER (WHERE keep), 0) AS BIGINT) AS kept_tokens,
       |         coalesce(string_agg(unit, ' ' ORDER BY unit_id) FILTER (WHERE keep), '') AS kept_text
       |  FROM s GROUP BY doc_id)
       |SELECT w.doc_id,
       |       coalesce(n_units, 0) AS n_units,
       |       coalesce(n_kept, 0) AS n_kept,
       |       coalesce(kept_tokens, 0) AS kept_tokens,
       |       md5(coalesce(kept_text, '')) AS kept_hash
       |FROM w LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Unblocked exact-Jaccard pairs at the minhash threshold. Valid as the
   *  dedup_minhash oracle because the LSH stage (b=16, r=4 -> S-curve
   *  midpoint ~0.54) has empirically total recall on this corpus: every
   *  true pair has J >= 0.8 (P_miss = (1-0.8^4)^16 ~ 2e-4, and the fixed
   *  xxhash64 family makes the outcome deterministic — verified equal at
   *  sf0.001/0.01); the exact-verify stage then removes all false
   *  positives, so LSH+verify == exact all-pairs. DedupOpsSpec asserts
   *  the recall equality. */
  val dedupMinhash: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS ws
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(ws) >= 3
      |         THEN list_transform(range(0, len(ws) - 2),
      |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
      |         ELSE [] END)) AS sh
      |  FROM w),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS i
      |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT id1, id2, i / (s1.sz + s2.sz - i) AS jaccard
      |FROM inter
      |JOIN sizes s1 ON id1 = s1.doc_id
      |JOIN sizes s2 ON id2 = s2.doc_id
      |WHERE i / (s1.sz + s2.sz - i) >= 0.5""".stripMargin

  /** Mirrors [[PipelineQueries.dedupIncrementalMinhash]] with EXACT
   *  all-pairs Jaccard in place of LSH+verify (the dedupMinhash
   *  equivalence: total recall on this corpus makes them equal; shingle
   *  strings where Spark uses 64-bit hashes). A fresh doc is rejected
   *  by any history partner or any SMALLER-id fresh partner at
   *  J >= 0.5; shingle-less docs admit (no shared shingle possible). */
  val dedupIncrementalMinhash: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS ws
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(ws) >= 3
      |         THEN list_transform(range(0, len(ws) - 2),
      |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
      |         ELSE [] END)) AS sh
      |  FROM w),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT x.doc_id AS fid, y.doc_id AS oid, count(*) AS i
      |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id <> y.doc_id
      |  WHERE x.doc_id % 5 = 0
      |    AND (y.doc_id % 5 <> 0 OR y.doc_id < x.doc_id)
      |  GROUP BY 1, 2),
      |rej AS (
      |  SELECT DISTINCT fid FROM pairs
      |  JOIN sizes s1 ON fid = s1.doc_id
      |  JOIN sizes s2 ON oid = s2.doc_id
      |  WHERE i / (s1.sz + s2.sz - i) >= 0.5)
      |SELECT doc_id FROM documents
      |WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT fid FROM rej)""".stripMargin

  /** Recomputes the portable (md5-60) SimHash signature per document —
   *  word hash = first 15 hex chars of md5 as a 60-bit int, bit j of the
   *  signature = sign of the +1/-1 sum over words — then joins all pairs
   *  within Hamming distance 3. Exact-match with the Spark plan: the
   *  pigeonhole band join there is lossless for d <= 3 over 4 chunks, and
   *  the integer bit-counter math is engine-independent. */
  val dedupSimhash: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS w
      |  FROM documents),
      |h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM w),
      |bits AS (
      |  SELECT doc_id, b.bit,
      |         CASE WHEN sum(((h >> b.bit) & 1) * 2 - 1) > 0
      |              THEN (1::BIGINT << b.bit) ELSE 0 END AS v
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS bit) b
      |  GROUP BY 1, 2),
      |sigs0 AS (SELECT doc_id, sum(v)::BIGINT AS sig FROM bits GROUP BY 1),
      |sigs AS (
      |  SELECT d.doc_id, coalesce(s.sig, 0) AS sig
      |  FROM documents d LEFT JOIN sigs0 s USING (doc_id))
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |       bit_count(xor(a.sig, b.sig)) AS hamming
      |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin

  /** Mirrors [[PipelineQueries.dedupClusters]]: the same minhash pairs
   *  (embedded as a derived table), symmetric closure, then per-node
   *  min reachable label via a recursive CTE — the same fixpoint the
   *  Spark min-label propagation converges to. */
  val dedupClusters: String =
    s"""WITH RECURSIVE
       |pairs AS (SELECT id1, id2 FROM ($dedupMinhash) mh),
       |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
       |          UNION SELECT id2, id1 FROM pairs),
       |reach(node, l) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node)
       |SELECT node AS doc_id, min(l) AS cluster FROM reach GROUP BY node""".stripMargin

  /** Mirrors [[PipelineQueries.dedupClusterSizes]]: the cluster
   *  fixpoint rolled to its size histogram. */
  val dedupClusterSizes: String =
    s"""WITH cl AS ($dedupClusters),
       |s AS (SELECT cluster, count(*) AS sz FROM cl GROUP BY 1)
       |SELECT sz AS cluster_size, count(*) AS n_clusters,
       |       CAST(sum(sz) AS BIGINT) AS n_docs
       |FROM s GROUP BY 1""".stripMargin

  /** Survivor per multi-doc cluster: nests the cluster fixpoint and the
   *  quality-score CTEs as subqueries (their hash-gated queries prove
   *  both sides bit-identical), then picks max (score, -doc_id).
   *  Lazy: textQuality is declared further down this object. */
  lazy val dedupSurvivors: String =
    s"""WITH cl AS ($dedupClusters),
       |sc AS (SELECT doc_id, coalesce(score, -1.0) AS score FROM ($textQuality) q),
       |j AS (SELECT cl.cluster, cl.doc_id, sc.score FROM cl JOIN sc USING (doc_id)),
       |r AS (SELECT cluster, doc_id,
       |        count(*) OVER (PARTITION BY cluster) AS n_docs,
       |        row_number() OVER (PARTITION BY cluster ORDER BY score DESC, doc_id) AS rn
       |      FROM j)
       |SELECT cluster, doc_id AS survivor, CAST(n_docs AS BIGINT) AS n_docs
       |FROM r WHERE rn = 1 AND n_docs >= 2""".stripMargin

  /** NOT EXISTS, not NOT IN: a null fingerprint (null text) in the
   *  history would make NOT IN return nothing, while Spark's left_anti
   *  keeps non-matching rows — NOT EXISTS has the anti-join's
   *  null semantics on both engines. */
  val dedupIncremental: String =
    s"""WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
       |fresh AS (SELECT * FROM d WHERE doc_id % 5 = 0),
       |hist AS (SELECT fp FROM d WHERE doc_id % 5 <> 0)
       |SELECT min(doc_id) AS doc_id, fp FROM fresh f
       |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = f.fp)
       |GROUP BY fp""".stripMargin

  /** Same score CTE as textQuality (proven bit-identical by its own
   *  gate); quantile_cont == Spark's interpolated percentile, the
   *  equivalence value_quantiles gates. Lazy: textQuality is declared
   *  further down this object. */
  lazy val qualityCut: String =
    s"""WITH sc AS (SELECT doc_id, score FROM ($textQuality) q)
       |SELECT doc_id, score FROM sc
       |WHERE score >= (SELECT quantile_cont(score, 0.25) FROM sc)""".stripMargin

  val sampleStratified: String =
    s"""SELECT doc_id, source, h, rn FROM (
       |  SELECT doc_id, source, md5(text) AS h,
       |         row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
       |  FROM documents) t
       |WHERE rn <= ${PipelineQueries.StratifiedN}""".stripMargin

  private val dotSql =
    "list_sum(list_transform(list_zip(%s, %s), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  val simTopK: String = {
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
       |      FROM e WHERE vec_id IN ($ids)),
       |s AS (
       |  SELECT query_id, vec_id,
       |         ${dotSql.format("embedding", "q_emb")} / (nrm * q_nrm) AS cos
       |  FROM e CROSS JOIN q WHERE vec_id <> query_id),
       |r AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       |         vec_id AS neighbor_id, round(cos, 4) AS cos_r
       |  FROM s)
       |SELECT query_id, rank, neighbor_id, cos_r FROM r WHERE rank <= ${PipelineQueries.SimK}""".stripMargin
  }

  /** Mirrors [[PipelineQueries.embedProject]]: the identical seed-43
   *  sign table re-derived into a VALUES list (the simAnn device), the
   *  same left-to-right double accumulation (list_sum over list_zip ==
   *  the native dot kernel's sequential fold), same 4-dp round. */
  val embedProject: String = {
    val planes = (0 until PipelineQueries.ProjDim).map { p =>
      val signs = (0 until PipelineQueries.EmbeddingDim).map { d =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          (p.toLong << 32) | d.toLong, org.apache.spark.sql.types.LongType, 43L)
        if ((h & 1L) == 0L) "1.0" else "-1.0"
      }.mkString(",")
      s"($p, [$signs])"
    }.mkString(",\n")
    s"""WITH planes(p, s) AS (VALUES $planes)
       |SELECT vec_id, CAST(pl.p AS BIGINT) AS plane,
       |       round(${dotSql.format("embedding", "pl.s")}, 4) AS proj_r
       |FROM embeddings, planes pl""".stripMargin
  }

  /** Mirrors [[SimilarityOps.annTopK]] end-to-end, including the LSH
   *  bucketing: the hyperplane signs are deterministic (parity of
   *  XXH64(plane << 32 | dim, seed 42) — graft.functions.VectorMath
   *  .lshBucket), so this SQL embeds the 8x64 sign table as literals,
   *  generated here by calling the same hash function the kernel calls.
   *  Projection sums are sequential double folds on both sides, so the
   *  bucket ids — and therefore the candidate sets — match exactly. */
  /** Deterministic hyperplane sign table as SQL VALUES rows — generated
   *  by calling the same hash (XXH64 of plane<<32|dim, seed 42) the
   *  LshBucket kernel calls, so SQL-side buckets match exactly. */
  private def lshPlanesSql(bits: Int, dim: Int): String =
    (0 until bits).map { p =>
      val signs = (0 until dim).map { d =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          (p.toLong << 32) | d.toLong, org.apache.spark.sql.types.LongType, 42L)
        if ((h & 1L) == 0L) "1.0" else "-1.0"
      }.mkString(",")
      s"($p, [$signs])"
    }.mkString(",\n")

  /** Shared bucket-assignment CTEs (planes -> per-plane sign bit ->
   *  bucket id), appended after an `e(vec_id, embedding, nrm)` CTE. */
  private def lshBucketCtes(bits: Int, dim: Int): String =
    s"""planes(p, s) AS (VALUES ${lshPlanesSql(bits, dim)}),
       |proj AS (
       |  SELECT vec_id, pl.p,
       |         CASE WHEN list_sum(list_transform(range(0, $dim),
       |                d -> CAST(embedding[d+1] AS DOUBLE) * pl.s[d+1])) >= 0
       |              THEN (1::BIGINT << pl.p) ELSE 0 END AS pv
       |  FROM e CROSS JOIN planes pl),
       |bkt AS (SELECT vec_id, sum(pv)::BIGINT AS bucket FROM proj GROUP BY 1),
       |eb AS (SELECT e.vec_id, e.embedding, e.nrm, b.bucket
       |       FROM e JOIN bkt b USING (vec_id))""".stripMargin

  val simAnn: String = {
    val bits = PipelineQueries.AnnBits
    val dim = PipelineQueries.EmbeddingDim
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |${lshBucketCtes(bits, dim)},
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
       |             bucket AS q_bucket
       |      FROM eb WHERE vec_id IN ($ids)),
       |sc AS (
       |  SELECT query_id, vec_id,
       |         ${dotSql.format("embedding", "q_emb")} / (nrm * q_nrm) AS cos
       |  FROM eb JOIN q ON bucket = q_bucket AND vec_id <> query_id),
       |r AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       |         vec_id AS neighbor_id, round(cos, 4) AS cos_r
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cos_r FROM r WHERE rank <= ${PipelineQueries.SimK}""".stripMargin
  }

  /** Mirrors [[SimilarityOps.ivfTopK]] end-to-end, including the IVF
   *  partitioning: the coarse quantizer is deterministic (centroids =
   *  vec_id < IvfCells), so cells, probe lists, and candidate sets are
   *  recomputable relationally — no literal tables needed. Cosines are
   *  sequential double folds on both sides, so cell argmax and probe
   *  ranking (score DESC, cid ASC) match exactly. */
  val simIvf: String = {
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |c AS (SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
       |      FROM e WHERE vec_id < ${PipelineQueries.IvfCells}),
       |a AS (
       |  SELECT vec_id, embedding, nrm, cid,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY coalesce(${dotSql.format("embedding", "c_emb")} / nullif(nrm * c_nrm, 0),
       |                             CAST('-infinity' AS DOUBLE)) DESC, cid) AS rnk
       |  FROM e CROSS JOIN c),
       |cells AS (SELECT vec_id, embedding, nrm, cid AS cell FROM a WHERE rnk = 1),
       |qp AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, cid AS cell
       |       FROM a WHERE vec_id IN ($ids) AND rnk <= ${PipelineQueries.IvfProbe}),
       |sc AS (
       |  SELECT query_id, vec_id,
       |         ${dotSql.format("embedding", "q_emb")} / (nrm * q_nrm) AS cos
       |  FROM cells JOIN qp USING (cell) WHERE vec_id <> query_id),
       |r AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       |         vec_id AS neighbor_id, round(cos, 4) AS cos_r
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cos_r FROM r WHERE rank <= ${PipelineQueries.SimK}""".stripMargin
  }

  /** Mirrors [[SimilarityOps.embeddingNearDupsLsh]] end-to-end: same
   *  deterministic sign table, same bits×tables banding, distinct
   *  candidate pairs from ANY matching band — the oracle checks the
   *  OR-amplified LSH approximation itself. */
  val embedNearDupLsh: String = {
    val bits = PipelineQueries.NearDupBits
    val tables = PipelineQueries.NearDupTables
    val dim = PipelineQueries.EmbeddingDim
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |planes(p, s) AS (VALUES ${lshPlanesSql(bits * tables, dim)}),
       |proj AS (
       |  SELECT vec_id, pl.p,
       |         list_sum(list_transform(range(0, $dim),
       |           d -> CAST(embedding[d+1] AS DOUBLE) * pl.s[d+1])) AS pr
       |  FROM e CROSS JOIN planes pl),
       |bkt AS (
       |  SELECT vec_id, CAST(p // $bits AS INT) AS band,
       |         sum(CASE WHEN pr >= 0 THEN (1::BIGINT << (p % $bits)) ELSE 0 END)::BIGINT AS bucket
       |  FROM proj GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM bkt a JOIN bkt b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id1, id2,
       |       round(${dotSql.format("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 4) AS cos_r
       |FROM cand JOIN e ea ON id1 = ea.vec_id JOIN e eb ON id2 = eb.vec_id
       |WHERE ${dotSql.format("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) >= ${PipelineQueries.NearDupCos}""".stripMargin
  }

  /** Mirrors [[PipelineQueries.knnGraph]]: the embedNearDupLsh banding
   *  CTEs with candidates kept in BOTH orientations (<> instead of <),
   *  no cosine floor, and the per-node rank window as the cut. */
  val knnGraph: String = {
    val bits = PipelineQueries.NearDupBits
    val tables = PipelineQueries.NearDupTables
    val dim = PipelineQueries.EmbeddingDim
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |planes(p, s) AS (VALUES ${lshPlanesSql(bits * tables, dim)}),
       |proj AS (
       |  SELECT vec_id, pl.p,
       |         list_sum(list_transform(range(0, $dim),
       |           d -> CAST(embedding[d+1] AS DOUBLE) * pl.s[d+1])) AS pr
       |  FROM e CROSS JOIN planes pl),
       |bkt AS (
       |  SELECT vec_id, CAST(p // $bits AS INT) AS band,
       |         sum(CASE WHEN pr >= 0 THEN (1::BIGINT << (p % $bits)) ELSE 0 END)::BIGINT AS bucket
       |  FROM proj GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS nb
       |  FROM bkt a JOIN bkt b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |sc AS (
       |  SELECT src, nb,
       |         ${dotSql.format("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS cos
       |  FROM cand JOIN e ea ON src = ea.vec_id JOIN e eb ON nb = eb.vec_id),
       |r AS (
       |  SELECT src AS vec_id,
       |         CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, nb) AS BIGINT) AS rank,
       |         nb AS neighbor_id, round(cos, 4) AS cos_r
       |  FROM sc)
       |SELECT vec_id, rank, neighbor_id, cos_r FROM r
       |WHERE rank <= ${PipelineQueries.GraphK}""".stripMargin
  }

  /** Mirrors [[PipelineQueries.knnLabelEval]]: the knnGraph relation as
   *  a derived table (the dedupClusters embedding device), then an
   *  independent majority-vote rank (votes desc, label asc) and the
   *  confusion rollup. */
  val knnLabelEval: String =
    s"""WITH g AS (SELECT * FROM ($knnGraph) kg),
       |l AS (SELECT vec_id, label FROM embeddings),
       |v AS (
       |  SELECT g.vec_id, l2.label AS nb_label, count(*) AS votes
       |  FROM g JOIN l l2 ON g.neighbor_id = l2.vec_id
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT vec_id, nb_label AS label_pred FROM (
       |    SELECT vec_id, nb_label,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY votes DESC, nb_label) AS rk
       |    FROM v) rv
       |  WHERE rk = 1)
       |SELECT l.label, p.label_pred, count(*) AS n
       |FROM l JOIN p USING (vec_id)
       |GROUP BY 1, 2""".stripMargin

  /**
   * Mirrors [[SimilarityOps.ivfTopKKmeans]] end-to-end, *including the
   * k-means training*: the Lloyd iterations are unrolled as CTE blocks
   * (assign by cosine argmax → per-dimension DECIMAL-exact mean →
   * exact-sum → DOUBLE → /n → FLOAT — the same rounding chain Spark
   * executes, so the trained centroids are bit-identical), then the
   * standard IVF probe/score tail. Empty cells keep the previous
   * centroid (LEFT JOIN + coalesce, matching the Scala fold).
   */
  /** The k-means-training + cell-assignment CTE prefix shared by
   *  [[simIvfKmeans]] and [[semDedup]]: unrolled DECIMAL-exact Lloyd
   *  iterations ending in `a` (per-vector cell ranking) and `cells`
   *  (the rnk=1 assignment: vec_id, embedding, nrm, cell). */
  private def kmeansCellsPrefix(k: Int, iters: Int, dim: Int): String = {
    def cScore(ce: String) =
      s"coalesce((${dotSql.format("e.embedding", ce)}) / nullif(e.nrm * sqrt(${dotSql.format(ce, ce)}), 0), CAST('-infinity' AS DOUBLE))"
    val iterCtes = (1 to iters).map { i =>
      val p = i - 1
      s"""a$i AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cid AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cScore("c.ce")} DESC, c.cid) AS rnk
         |    FROM e CROSS JOIN c$p c) t WHERE rnk = 1),
         |s$i AS (
         |  SELECT cell, d.d AS d,
         |         CAST(CAST(sum(CAST(embedding[d.d + 1] AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS FLOAT) AS v
         |  FROM a$i CROSS JOIN (SELECT unnest(range(0, $dim)) AS d) d
         |  GROUP BY 1, 2),
         |n$i AS (SELECT cell AS cid, list(v ORDER BY d) AS ce FROM s$i GROUP BY 1),
         |c$i AS (SELECT c.cid, coalesce(n.ce, c.ce) AS ce
         |        FROM c$p c LEFT JOIN n$i n USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, embedding AS ce FROM e WHERE vec_id < $k),
       |$iterCtes,
       |a AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cScore("c.ce")} DESC, c.cid) AS rnk
       |  FROM e CROSS JOIN c$iters c),
       |cells AS (SELECT vec_id, embedding, nrm, cid AS cell FROM a WHERE rnk = 1)""".stripMargin
  }

  val simIvfKmeans: String = {
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    s"""WITH ${kmeansCellsPrefix(PipelineQueries.KmCells, PipelineQueries.KmIters,
          PipelineQueries.EmbeddingDim)},
       |qp AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, cid AS cell
       |       FROM a WHERE vec_id IN ($ids) AND rnk <= ${PipelineQueries.KmProbe}),
       |sc AS (
       |  SELECT query_id, vec_id,
       |         ${dotSql.format("embedding", "q_emb")} / (nrm * q_nrm) AS cos
       |  FROM cells JOIN qp USING (cell) WHERE vec_id <> query_id),
       |r AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       |         vec_id AS neighbor_id, round(cos, 4) AS cos_r
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cos_r FROM r WHERE rank <= ${PipelineQueries.SimK}""".stripMargin
  }

  /** The PQ index + ADC ranking as a reusable CTE prefix: everything
   *  through `r` (query_id, rank, neighbor_id-as-vec_id, score) so
   *  [[simPq]] cuts it at SimK and [[simRerank]] treats it as the
   *  candidate generator. Also binds `e` and `q` for downstream CTEs. */
  private val pqRankedCtes: String = {
    val m = PipelineQueries.PqM
    val ks = PipelineQueries.PqKs
    val iters = PipelineQueries.KmIters
    val dim = PipelineQueries.EmbeddingDim
    val sub = dim / m
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    def cScore(se: String, nrm: String, ce: String) =
      s"coalesce((${dotSql.format(se, ce)}) / nullif($nrm * sqrt(${dotSql.format(ce, ce)}), 0), CAST('-infinity' AS DOUBLE))"
    val prefixes = (0 until m).map { s =>
      val lo = s * sub
      val iterCtes = (1 to iters).map { i =>
        val p = i - 1
        s"""p${s}a$i AS (
           |  SELECT vec_id, se, cell FROM (
           |    SELECT n.vec_id, n.se, c.cid AS cell,
           |           row_number() OVER (PARTITION BY n.vec_id
           |             ORDER BY ${cScore("n.se", "n.nrm", "c.ce")} DESC, c.cid) AS rnk
           |    FROM p${s}n n CROSS JOIN p${s}c$p c) t WHERE rnk = 1),
           |p${s}s$i AS (
           |  SELECT cell, d.d AS d,
           |         CAST(CAST(sum(CAST(se[d.d + 1] AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS FLOAT) AS v
           |  FROM p${s}a$i CROSS JOIN (SELECT unnest(range(0, $sub)) AS d) d
           |  GROUP BY 1, 2),
           |p${s}m$i AS (SELECT cell AS cid, list(v ORDER BY d) AS ce FROM p${s}s$i GROUP BY 1),
           |p${s}c$i AS (SELECT c.cid, coalesce(mm.ce, c.ce) AS ce
           |             FROM p${s}c$p c LEFT JOIN p${s}m$i mm USING (cid))""".stripMargin
      }.mkString(",\n")
      s"""p${s}e AS (SELECT vec_id, embedding[${lo + 1}:${lo + sub}] AS se FROM e),
         |p${s}n AS (SELECT vec_id, se, sqrt(${dotSql.format("se", "se")}) AS nrm FROM p${s}e),
         |p${s}c0 AS (SELECT vec_id AS cid, se AS ce FROM p${s}e WHERE vec_id < $ks),
         |$iterCtes,
         |p${s}f AS (
         |  SELECT vec_id, cell AS code FROM (
         |    SELECT n.vec_id, c.cid AS cell,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY ${cScore("n.se", "n.nrm", "c.ce")} DESC, c.cid) AS rnk
         |    FROM p${s}n n CROSS JOIN p${s}c$iters c) t WHERE rnk = 1)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until m).map(s => s"JOIN p${s}f USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"p${s}f.code AS c$s").mkString(", ")
    val dsum = (0 until m).map(s =>
      s"(${dotSql.format(s"qe[${s * sub + 1}:${s * sub + sub}]", s"b$s.ce")})")
      .mkString(" + ")
    val xn2 = (0 until m).map(s =>
      s"(${dotSql.format(s"b$s.ce", s"b$s.ce")})").mkString(" + ")
    val bookJoins = (0 until m).map(s =>
      s"JOIN p${s}c$iters b$s ON codes.c$s = b$s.cid").mkString("\n  ")
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |$prefixes,
       |codes AS (SELECT p0f.vec_id, $codeCols FROM p0f $codeJoin),
       |q AS (SELECT vec_id AS query_id, embedding AS qe,
       |             sqrt(${dotSql.format("embedding", "embedding")}) AS qn
       |      FROM embeddings WHERE vec_id IN ($ids)),
       |scored AS (
       |  SELECT q.query_id, codes.vec_id,
       |         coalesce(($dsum) / nullif(q.qn * sqrt($xn2), 0),
       |                  CAST('-infinity' AS DOUBLE)) AS score
       |  FROM codes CROSS JOIN q
       |  $bookJoins
       |  WHERE codes.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
       |         vec_id AS neighbor_id, round(score, 4) AS score_r
       |  FROM scored)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.simPq]] by re-deriving the WHOLE PQ
   *  index: per-subspace decimal-exact Lloyd codebooks (the
   *  kmeansCellsPrefix device instantiated once per subspace over the
   *  embedding slices), the per-vector code assignment, and the ADC
   *  score — dot(q_m, codeword) per subspace, summed in subspace
   *  order, normalized by the reconstruction norm — all relational
   *  ([[pqRankedCtes]]); Spark's driver-precomputed ADC scalars
   *  reproduce because both sides accumulate in sequential element
   *  order. */
  val simPq: String =
    s"""$pqRankedCtes
       |SELECT query_id, rank, neighbor_id, score_r FROM r
       |WHERE rank <= ${PipelineQueries.SimK}""".stripMargin

  /** Mirrors [[PipelineQueries.simRerank]]: the shared [[pqRankedCtes]]
   *  prefix generates the candidate pool (rank <= RerankCand), then the
   *  exact stage re-scores ONLY those candidates from the full-precision
   *  `e` rows with the shared sequential-order cosine — identical
   *  arithmetic to the sim_topk oracle, restricted to the candidate
   *  join. */
  val simRerank: String =
    s"""$pqRankedCtes,
       |cand AS (SELECT query_id, neighbor_id FROM r
       |         WHERE rank <= ${PipelineQueries.RerankCand}),
       |fx AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         coalesce((${dotSql.format("e.embedding", "q.qe")})
       |             / nullif(sqrt(${dotSql.format("e.embedding", "e.embedding")}) * q.qn, 0),
       |           CAST('-infinity' AS DOUBLE)) AS score
       |  FROM cand c JOIN e ON e.vec_id = c.neighbor_id
       |  JOIN q ON q.query_id = c.query_id),
       |rr AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank,
       |         neighbor_id, round(score, 4) AS score_r
       |  FROM fx)
       |SELECT query_id, rank, neighbor_id, score_r FROM rr
       |WHERE rank <= ${PipelineQueries.SimK}""".stripMargin

  /** Mirrors [[PipelineQueries.simMatryoshka]]: per rung, the
   *  sim_topk cross-join scoring over prefix SLICES (identical
   *  sequential-order dots, vec_id tie-break), hit counts joined on
   *  id pairs against the full-width ranking, one division rounded
   *  once. The left join keeps a zero-hit rung visible. */
  val simMatryoshka: String = {
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    val k = PipelineQueries.SimK
    def cosOf(d: Int) = {
      val ee = s"e.embedding[1:$d]"
      val qe = s"q.qe[1:$d]"
      s"(${dotSql.format(ee, qe)}) / (sqrt(${dotSql.format(ee, ee)}) * sqrt(${dotSql.format(qe, qe)}))"
    }
    val rungs = PipelineQueries.MatryoshkaDims.map { d =>
      s"""t$d AS (
         |  SELECT CAST($d AS BIGINT) AS dims, query_id, vec_id FROM (
         |    SELECT q.query_id, e.vec_id,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY ${cosOf(d)} DESC, e.vec_id) AS rnk
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id) z
         |  WHERE rnk <= $k)""".stripMargin
    }.mkString(",\n")
    val union = PipelineQueries.MatryoshkaDims
      .map(d => s"SELECT * FROM t$d").mkString(" UNION ALL ")
    val dimsVals = PipelineQueries.MatryoshkaDims
      .map(d => s"($d)").mkString(",")
    val dFull = PipelineQueries.EmbeddingDim
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe
       |      FROM embeddings WHERE vec_id IN ($ids)),
       |f AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.query_id, e.vec_id,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY ${cosOf(dFull)} DESC, e.vec_id) AS rnk
       |    FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id) z
       |  WHERE rnk <= $k),
       |$rungs,
       |u AS ($union),
       |h AS (SELECT dims, CAST(count(*) AS BIGINT) AS n_hits
       |      FROM u JOIN f USING (query_id, vec_id) GROUP BY dims),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS np FROM f),
       |dv(dims) AS (SELECT CAST(d AS BIGINT) FROM (VALUES $dimsVals) t(d))
       |SELECT dv.dims, coalesce(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       |       round(coalesce(h.n_hits, 0) / np, 6) AS recall_r
       |FROM dv LEFT JOIN h USING (dims), tot""".stripMargin
  }

  /** Mirrors [[PipelineQueries.simSq8]] by re-deriving the WHOLE SQ8
   *  quantizer: per-dim min/max (EXACT float aggregates — no
   *  summation, so the model reproduces without a tolerance),
   *  clamp(floor((x−mn)·255/(mx−mn))) codes with every operand an
   *  IEEE double in the same association order, midpoint decode
   *  rounded once to FLOAT (round-to-nearest-even on both engines; a
   *  constant dim decodes to mn), then the shared sequential-order
   *  asymmetric cosine. */
  val simSq8: String = {
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    val dim = PipelineQueries.EmbeddingDim
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |st AS (
       |  SELECT d.d AS d, CAST(min(embedding[d.d + 1]) AS DOUBLE) AS mn,
       |         CAST(max(embedding[d.d + 1]) AS DOUBLE) AS mx
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $dim)) AS d) d
       |  GROUP BY 1),
       |rc AS (
       |  SELECT e.vec_id,
       |         list(CASE WHEN st.mx = st.mn THEN CAST(st.mn AS FLOAT)
       |              ELSE CAST(st.mn + ((LEAST(255, GREATEST(0,
       |                     floor((CAST(e.embedding[st.d + 1] AS DOUBLE) - st.mn)
       |                           * 255.0 / (st.mx - st.mn)))) + 0.5)
       |                   * (st.mx - st.mn)) / 255.0 AS FLOAT) END
       |              ORDER BY st.d) AS re
       |  FROM e CROSS JOIN st
       |  GROUP BY e.vec_id),
       |q AS (SELECT vec_id AS query_id, embedding AS qe,
       |             sqrt(${dotSql.format("embedding", "embedding")}) AS qn
       |      FROM embeddings WHERE vec_id IN ($ids)),
       |sc AS (
       |  SELECT q.query_id, rc.vec_id,
       |         coalesce((${dotSql.format("rc.re", "q.qe")})
       |             / nullif(sqrt(${dotSql.format("rc.re", "rc.re")}) * q.qn, 0),
       |           CAST('-infinity' AS DOUBLE)) AS score
       |  FROM rc CROSS JOIN q WHERE rc.vec_id <> q.query_id),
       |r AS (SELECT query_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
       |        vec_id AS neighbor_id, round(score, 4) AS score_r
       |      FROM sc)
       |SELECT query_id, rank, neighbor_id, score_r FROM r
       |WHERE rank <= ${PipelineQueries.SimK}""".stripMargin
  }

  /** Mirrors [[PipelineQueries.simIvfPq]] by re-deriving the WHOLE
   *  two-level IVFADC index: the shared coarse unrolled-Lloyd prefix
   *  (bit-identical centroids and cell assignment with the
   *  simIvfKmeans oracle), float32 residuals (IEEE-exact subtraction
   *  on both engines), per-subspace residual codebooks via the same
   *  unrolled-Lloyd device as [[simPq]] but sourced from residual
   *  slices, then the IVFADC score — (dot(q,c) + Σ_m ADC_m) over the
   *  reconstruction norm sqrt((‖c‖² + 2·Σ_m cross_m) + Σ_m ‖bw_m‖²) —
   *  with every Σ in subspace order and the same grouping, so Spark's
   *  driver-precomputed scalars reproduce exactly. */
  val simIvfPq: String = {
    val m = PipelineQueries.PqM
    val ks = PipelineQueries.PqKs
    val iters = PipelineQueries.KmIters
    val dim = PipelineQueries.EmbeddingDim
    val sub = dim / m
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    def cScore(se: String, nrm: String, ce: String) =
      s"coalesce((${dotSql.format(se, ce)}) / nullif($nrm * sqrt(${dotSql.format(ce, ce)}), 0), CAST('-infinity' AS DOUBLE))"
    val prefixes = (0 until m).map { s =>
      val lo = s * sub
      val iterCtes = (1 to iters).map { i =>
        val p = i - 1
        s"""r${s}a$i AS (
           |  SELECT vec_id, se, cell FROM (
           |    SELECT n.vec_id, n.se, c.cid AS cell,
           |           row_number() OVER (PARTITION BY n.vec_id
           |             ORDER BY ${cScore("n.se", "n.nrm", "c.ce")} DESC, c.cid) AS rnk
           |    FROM r${s}n n CROSS JOIN r${s}c$p c) t WHERE rnk = 1),
           |r${s}s$i AS (
           |  SELECT cell, d.d AS d,
           |         CAST(CAST(sum(CAST(se[d.d + 1] AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS FLOAT) AS v
           |  FROM r${s}a$i CROSS JOIN (SELECT unnest(range(0, $sub)) AS d) d
           |  GROUP BY 1, 2),
           |r${s}m$i AS (SELECT cell AS cid, list(v ORDER BY d) AS ce FROM r${s}s$i GROUP BY 1),
           |r${s}c$i AS (SELECT c.cid, coalesce(mm.ce, c.ce) AS ce
           |             FROM r${s}c$p c LEFT JOIN r${s}m$i mm USING (cid))""".stripMargin
      }.mkString(",\n")
      s"""r${s}e AS (SELECT vec_id, re[${lo + 1}:${lo + sub}] AS se FROM res),
         |r${s}n AS (SELECT vec_id, se, sqrt(${dotSql.format("se", "se")}) AS nrm FROM r${s}e),
         |r${s}c0 AS (SELECT vec_id AS cid, se AS ce FROM r${s}e WHERE vec_id < $ks),
         |$iterCtes,
         |r${s}f AS (
         |  SELECT vec_id, cell AS code FROM (
         |    SELECT n.vec_id, c.cid AS cell,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY ${cScore("n.se", "n.nrm", "c.ce")} DESC, c.cid) AS rnk
         |    FROM r${s}n n CROSS JOIN r${s}c$iters c) t WHERE rnk = 1)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until m).map(s => s"JOIN r${s}f USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"r${s}f.code AS c$s").mkString(", ")
    val adcSum = (0 until m).map(s =>
      s"(${dotSql.format(s"qp.qe[${s * sub + 1}:${s * sub + sub}]", s"b$s.ce")})")
      .mkString(" + ")
    val crossSum = (0 until m).map(s =>
      s"(${dotSql.format(s"ct.ce[${s * sub + 1}:${s * sub + sub}]", s"b$s.ce")})")
      .mkString(" + ")
    val bw2Sum = (0 until m).map(s =>
      s"(${dotSql.format(s"b$s.ce", s"b$s.ce")})").mkString(" + ")
    val bookJoins = (0 until m).map(s =>
      s"JOIN r${s}c$iters b$s ON codes.c$s = b$s.cid").mkString("\n  ")
    s"""WITH ${kmeansCellsPrefix(PipelineQueries.KmCells, iters, dim)},
       |res AS (
       |  SELECT cl.vec_id, cl.cell,
       |         list_transform(range(0, $dim),
       |           d -> cl.embedding[d + 1] - ct.ce[d + 1]) AS re
       |  FROM cells cl JOIN c$iters ct ON cl.cell = ct.cid),
       |$prefixes,
       |codes AS (SELECT r0f.vec_id, res.cell, $codeCols
       |          FROM r0f $codeJoin JOIN res ON r0f.vec_id = res.vec_id),
       |qp AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cid AS cell
       |       FROM a WHERE vec_id IN ($ids) AND rnk <= ${PipelineQueries.KmProbe}),
       |scored AS (
       |  SELECT qp.query_id, codes.vec_id,
       |         coalesce(
       |           ((${dotSql.format("qp.qe", "ct.ce")}) + $adcSum) /
       |           nullif(qp.qn * sqrt(((${dotSql.format("ct.ce", "ct.ce")}) +
       |             2 * ($crossSum)) + ($bw2Sum)), 0),
       |           CAST('-infinity' AS DOUBLE)) AS score
       |  FROM codes JOIN qp USING (cell)
       |    JOIN c$iters ct ON codes.cell = ct.cid
       |    $bookJoins
       |  WHERE codes.vec_id <> qp.query_id),
       |r AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
       |         vec_id AS neighbor_id, round(score, 4) AS score_r
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, score_r FROM r
       |WHERE rank <= ${PipelineQueries.SimK}""".stripMargin
  }

  /** Mirrors [[PipelineQueries.embedEval]] by re-deriving BOTH sides
   *  of the recall fraction: the anchored exact cosine pairs AND the
   *  deterministic sign-table banding (the embedNearDupLsh CTEs) — the
   *  whole candidate mechanism recomputed, not trusted. */
  val embedEval: String = {
    val bits = PipelineQueries.NearDupBits
    val tables = PipelineQueries.NearDupTables
    val dim = PipelineQueries.EmbeddingDim
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |ex AS (
       |  SELECT a.vec_id AS id1, b.vec_id AS id2,
       |         CAST(least(floor((${dotSql.format("a.embedding", "b.embedding")})
       |           / (a.nrm * b.nrm) * 10), 5) AS BIGINT) AS cos_band
       |  FROM e a JOIN e b
       |    ON a.vec_id % ${PipelineQueries.EmbEvalAnchorMod} = 0
       |   AND a.vec_id < b.vec_id
       |  WHERE (${dotSql.format("a.embedding", "b.embedding")}) / (a.nrm * b.nrm)
       |        >= ${PipelineQueries.EmbEvalMinCos}),
       |planes(p, s) AS (VALUES ${lshPlanesSql(bits * tables, dim)}),
       |proj AS (
       |  SELECT vec_id, pl.p,
       |         list_sum(list_transform(range(0, $dim),
       |           d -> CAST(embedding[d+1] AS DOUBLE) * pl.s[d+1])) AS pr
       |  FROM e CROSS JOIN planes pl),
       |bkt AS (
       |  SELECT vec_id, CAST(p // $bits AS INT) AS band,
       |         sum(CASE WHEN pr >= 0 THEN (1::BIGINT << (p % $bits)) ELSE 0 END)::BIGINT AS bucket
       |  FROM proj GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM bkt a JOIN bkt b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT ex.cos_band,
       |       count(*) AS n_pairs,
       |       CAST(sum(CASE WHEN cand.id1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
       |       round(CAST(sum(CASE WHEN cand.id1 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |             / count(*), 4) AS recall_r
       |FROM ex LEFT JOIN cand ON ex.id1 = cand.id1 AND ex.id2 = cand.id2
       |GROUP BY ex.cos_band""".stripMargin
  }

  val embedNearDup: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |       round(${dotSql.format("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 4) AS cos_r
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ${dotSql.format("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= ${PipelineQueries.NearDupCos}""".stripMargin

  /** Mirrors [[PipelineQueries.semDedup]] end-to-end including the
   *  k-means training (shared [[kmeansCellsPrefix]] — bit-identical
   *  centroids, same argmax assignment), then the within-cell pair scan
   *  and smaller-id-survivor rule. `cell` is CAST to INT (Spark's
   *  IvfProbeCells emits int cell ids; DuckDB's cid descends from the
   *  BIGINT vec_id). */
  val semDedup: String =
    s"""WITH ${kmeansCellsPrefix(PipelineQueries.KmCells, PipelineQueries.KmIters,
          PipelineQueries.EmbeddingDim)},
       |dup AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${dotSql.format("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= ${PipelineQueries.NearDupCos})
       |SELECT c.vec_id, CAST(c.cell AS INT) AS cell, d.vec_id IS NULL AS keep
       |FROM cells c LEFT JOIN dup d ON c.vec_id = d.vec_id""".stripMargin

  /** Mirrors [[PipelineQueries.embedOutliers]]: the shared unrolled-
   *  Lloyd prefix (bit-identical centroids and rnk=1 cells with the
   *  semDedup/simIvfKmeans oracles), own-cell cosine recomputed with
   *  the same guarded score expression, same 4-dp round and exact
   *  threshold compare (identical double operands both engines). */
  val embedOutliers: String = {
    val iters = PipelineQueries.KmIters
    s"""WITH ${kmeansCellsPrefix(PipelineQueries.KmCells, iters,
          PipelineQueries.EmbeddingDim)},
       |o AS (
       |  SELECT a.vec_id, a.cid AS cell,
       |         coalesce((${dotSql.format("a.embedding", "c.ce")}) /
       |           nullif(a.nrm * sqrt(${dotSql.format("c.ce", "c.ce")}), 0),
       |           CAST('-infinity' AS DOUBLE)) AS cs
       |  FROM a JOIN c$iters c ON a.cid = c.cid WHERE a.rnk = 1)
       |SELECT vec_id, CAST(cell AS INT) AS cell, round(cs, 4) AS cos_r,
       |       cs < ${PipelineQueries.OutlierCos} AS is_outlier
       |FROM o""".stripMargin
  }

  private def stopListSql(stops: Seq[String]) = stops.map(s => s"'$s'").mkString(", ")
  private val langScores = graft.ops.TextAnalyticsOps.Stopwords.map { case (lang, stops) =>
    s"len(list_filter(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0), w -> w IN (${stopListSql(stops)}))) AS s_$lang"
  }.mkString(",\n         ")

  val textLangId: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |         $langScores
       |  FROM documents)
       |SELECT doc_id,
       |  CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |       WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
       |       WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
       |       WHEN s_fr > 0 THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM s""".stripMargin

  /** The char-bigram Naive Bayes of [[PipelineQueries.textLangIdNb]]
   *  re-derived END TO END: lowercased bigram explode (lateral unnest
   *  over generate_series — empty below 2 chars, matching the Spark
   *  guard), the (lang, bigram) counts, the Laplace grid with
   *  per-lang total and V as windows, doc-count log-priors, every ln
   *  floor-quantized once to integer micro-nats (the textUnigramNll
   *  device — identical rational doubles), integer per-(doc, lang)
   *  sums, and the (score desc, lang asc) argmax. Ends with a `pred`
   *  relation (doc_id, lang_pred, score_micro). */
  private val langIdNbCtes: String = {
    val m = graft.queries.PipelineQueries.NllMicro
    s"""bgx AS (
       |  SELECT doc_id, lang, substr(lower(text), CAST(i AS INT), 2) AS bg
       |  FROM documents,
       |       unnest(generate_series(1, length(lower(text)) - 1)) AS u(i)),
       |nbc AS (SELECT lang, bg, count(*) AS cnt FROM bgx GROUP BY 1, 2),
       |nbgrid AS (
       |  SELECT v.bg, l.lang, coalesce(c.cnt, 0) AS cnt0
       |  FROM (SELECT DISTINCT bg FROM nbc) v
       |  CROSS JOIN (SELECT DISTINCT lang FROM nbc) l
       |  LEFT JOIN nbc c ON c.bg = v.bg AND c.lang = l.lang),
       |nbmodel AS (
       |  SELECT bg, lang,
       |         CAST(floor(ln(CAST(cnt0 + 1 AS DOUBLE) /
       |           CAST(sum(cnt0) OVER (PARTITION BY lang) +
       |                count(*) OVER (PARTITION BY lang) AS DOUBLE))
       |           * $m) AS BIGINT) AS lp_micro
       |  FROM nbgrid),
       |nbprior AS (
       |  SELECT lang,
       |         CAST(floor(ln(CAST(docs_l AS DOUBLE) /
       |           CAST(sum(docs_l) OVER () AS DOUBLE)) * $m) AS BIGINT)
       |           AS prior_micro
       |  FROM (SELECT lang, count(*) AS docs_l FROM documents GROUP BY 1)),
       |nbsc AS (
       |  SELECT b.doc_id, mo.lang,
       |         CAST(sum(mo.lp_micro) AS BIGINT) AS ll_micro
       |  FROM bgx b JOIN nbmodel mo USING (bg) GROUP BY 1, 2),
       |pred AS (
       |  SELECT doc_id, lang AS lang_pred, score_micro
       |  FROM (SELECT s.doc_id, s.lang,
       |          s.ll_micro + p.prior_micro AS score_micro,
       |          row_number() OVER (PARTITION BY s.doc_id
       |            ORDER BY s.ll_micro + p.prior_micro DESC, s.lang ASC)
       |            AS rn
       |        FROM nbsc s JOIN nbprior p USING (lang))
       |  WHERE rn = 1)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textLangIdNb]]: the whole Naive Bayes
   *  re-learned independently ([[langIdNbCtes]]). */
  val textLangIdNb: String =
    s"""WITH $langIdNbCtes
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang_pred,
       |       CAST(score_micro AS BIGINT) AS score_micro
       |FROM pred""".stripMargin

  /** Mirrors [[PipelineQueries.textLangIdEval]]: the [[textLangId]]
   *  per-doc prediction CTE grouped against the upstream label, UNION
   *  the independently re-learned NB confusion ([[langIdNbCtes]]). */
  val textLangIdEval: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |         $langScores
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang,
       |  CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |       WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
       |       WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
       |       WHEN s_fr > 0 THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM s),
       |$langIdNbCtes
       |SELECT 'heuristic' AS model, lang, lang_pred, count(*) AS n
       |FROM p GROUP BY 2, 3
       |UNION ALL
       |SELECT 'nb' AS model, d.lang, pr.lang_pred, count(*) AS n
       |FROM pred pr JOIN documents d USING (doc_id)
       |GROUP BY 2, 3""".stripMargin

  val textQuality: String = {
    val stops = stopListSql(graft.ops.TextAnalyticsOps.Stopwords.head._2)
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         CAST(len(ws) AS BIGINT) AS n_words,
       |         length(regexp_replace(text, '\\s+', '', 'g')) / nullif(len(ws), 0) AS mean_wlen,
       |         len(list_filter(ws, w -> w IN ($stops))) / nullif(len(ws), 0) AS stop_ratio,
       |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / nullif(length(text), 0) AS alpha_ratio
       |  FROM f)
       |SELECT doc_id, n_words, mean_wlen, stop_ratio, alpha_ratio,
       |       stop_ratio * 0.4 + alpha_ratio * 0.3 + least(mean_wlen / 10.0, 1.0) * 0.3 AS score
       |FROM g""".stripMargin
  }

  val textTokens: String =
    s"""SELECT doc_id,
       |  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '${graft.ops.TextAnalyticsOps.BpeishPattern}')) AS BIGINT) AS bpe_tokens
       |FROM documents""".stripMargin

  /** Mirrors [[PipelineQueries.textBigramNll]]: same pair expansion,
   *  same add-one conditional with V = |distinct contexts| (a scalar
   *  subquery over the bigram relation), same micro-nat floor
   *  quantization — IEEE doubles on identical rational inputs, the
   *  textUnigramNll device. */
  val textBigramNll: String =
    s"""WITH w AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, ws[i] AS a, ws[i+1] AS b
       |  FROM w, unnest(range(1, len(ws))) t(i) WHERE len(ws) >= 2),
       |bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM p GROUP BY a, b),
       |m AS (
       |  SELECT a, b,
       |    CAST(floor(-ln(CAST(c_ab + 1 AS DOUBLE) /
       |      CAST(sum(c_ab) OVER (PARTITION BY a) +
       |           (SELECT count(DISTINCT a) FROM bg) AS DOUBLE)) * ${graft.queries.PipelineQueries.NllMicro}) AS BIGINT) AS nll_micro
       |  FROM bg)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum
       |FROM p JOIN m USING (a, b) GROUP BY doc_id""".stripMargin

  /** Mirrors [[PipelineQueries.bpeLearn]] by learning INDEPENDENTLY —
   *  not by echoing the frozen table (that would be circular for a
   *  LEARN query): a generated K-level chained CTE runs the same
   *  public algorithm natively in DuckDB. Level i computes pair
   *  counts over segmentation s(i-1) (fenced '|c|h|a|r|s|' strings —
   *  the textTokensBpe device), picks rule i by (count DESC, pair
   *  ASC) LIMIT 1, and derives s(i) with a DOUBLE `replace` of
   *  '|a|b|' → '|ab|': adjacent occurrences share a fence char, so
   *  one left-to-right pass misses every second occurrence in a
   *  chain and the second pass — whose replacements restored the
   *  missing fences — catches exactly the rest; for a ≠ b two passes
   *  are provably exact (a same-symbol rule over a ≥5-run could
   *  diverge from the left-to-right fold, but no such rule is ever
   *  frequency-maximal on whitespace-split natural text and the
   *  cross-engine gate would catch it). `AS MATERIALIZED` on every
   *  level: s(i-1) is referenced twice (pairs + apply), and DuckDB's
   *  default CTE inlining would otherwise double the plan per level
   *  — 2^K. */
  val bpeLearn: String = {
    val k = graft.queries.PipelineQueries.BpeLearnK
    val parts = scala.collection.mutable.ArrayBuffer(
      """v AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |    FROM documents) GROUP BY w)""".stripMargin,
      """s0 AS MATERIALIZED (
        |  SELECT freq, '|' || array_to_string(string_split(w, ''), '|') || '|' AS s FROM v)""".stripMargin)
    for (i <- 1 to k) {
      parts += s"""p$i AS MATERIALIZED (
        |  SELECT ss[i] AS a, ss[i+1] AS b, sum(freq) AS cnt FROM (
        |    SELECT freq, list_filter(string_split(s, '|'), x -> len(x) > 0) AS ss,
        |           unnest(range(1, len(list_filter(string_split(s, '|'), x -> len(x) > 0)))) AS i
        |    FROM s${i - 1}) GROUP BY a, b)""".stripMargin
      parts += s"""r$i AS MATERIALIZED (
        |  SELECT a, b, '|'||a||'|'||b||'|' AS pat, '|'||a||b||'|' AS rep
        |  FROM p$i ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin
      if (i < k)
        parts += s"""s$i AS MATERIALIZED (
          |  SELECT freq, replace(replace(s, (SELECT pat FROM r$i), (SELECT rep FROM r$i)),
          |                       (SELECT pat FROM r$i), (SELECT rep FROM r$i)) AS s FROM s${i - 1})""".stripMargin
    }
    val union = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, a, b FROM r$i")
      .mkString(" UNION ALL ")
    "WITH " + parts.mkString(",\n") + "\n" + union
  }

  /** Mirrors [[PipelineQueries.wordpieceLearn]] by learning
   *  INDEPENDENTLY (the bpeLearn non-circularity contract): same
   *  K-level chained-CTE loop as [[bpeLearn]] but with `##`
   *  continuation prefixes baked into the seed segmentation and the
   *  WordPiece likelihood-ratio argmax — per level, pair counts AND
   *  symbol counts, score = ONE double division cnt /
   *  (cnt(a)·cnt(b)) with each count cast to DOUBLE BEFORE the
   *  multiply (exact below 2⁵³ — identical to the Spark side — and
   *  graceful past it, where a BIGINT product would error here and
   *  silently wrap there); ties (a, b). Unlike [[bpeLearn]]'s fenced
   *  '\|a\|b\|' strings (whose shared fence chars need the
   *  double-replace and carry a documented same-symbol-run bound),
   *  segmentations here are BRACKETED tokens '\|sym;' — patterns
   *  never share a character, so ONE non-overlapping left-to-right
   *  `replace` IS the Spark fold exactly, for every rule including
   *  same-symbol runs, which WordPiece's cohesion criterion (unlike
   *  raw frequency) genuinely can select. The right symbol of any
   *  adjacent pair is non-initial, so the merge replacement is
   *  a || b-minus-its-`##` — substring(b, 3). */
  val wordpieceLearn: String = {
    val k = graft.queries.PipelineQueries.WordpieceLearnK
    val toks =
      "list_transform(list_filter(string_split(s, ';'), x -> len(x) > 0), x -> x[2:])"
    val parts = scala.collection.mutable.ArrayBuffer(
      """v AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |    FROM documents) GROUP BY w)""".stripMargin,
      """s0 AS MATERIALIZED (
        |  SELECT freq, '|' || array_to_string(string_split(w, ''), ';|##') || ';' AS s FROM v)""".stripMargin)
    for (i <- 1 to k) {
      parts += s"""p$i AS MATERIALIZED (
        |  SELECT ss[i] AS a, ss[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |    SELECT freq, $toks AS ss,
        |           unnest(range(1, len($toks))) AS i
        |    FROM s${i - 1}) GROUP BY a, b)""".stripMargin
      parts += s"""y$i AS MATERIALIZED (
        |  SELECT sym, CAST(sum(freq) AS BIGINT) AS c FROM (
        |    SELECT freq, unnest($toks) AS sym
        |    FROM s${i - 1}) GROUP BY sym)""".stripMargin
      parts += s"""r$i AS MATERIALIZED (
        |  SELECT a, b, CAST(cnt AS DOUBLE) / (CAST(ya.c AS DOUBLE) * CAST(yb.c AS DOUBLE)) AS score,
        |         '|'||a||';|'||b||';' AS pat, '|'||a||substring(b, 3)||';' AS rep
        |  FROM p$i JOIN y$i ya ON ya.sym = p$i.a JOIN y$i yb ON yb.sym = p$i.b
        |  ORDER BY score DESC, a, b LIMIT 1)""".stripMargin
      if (i < k)
        parts += s"""s$i AS MATERIALIZED (
          |  SELECT freq, replace(s, (SELECT pat FROM r$i), (SELECT rep FROM r$i)) AS s FROM s${i - 1})""".stripMargin
    }
    val union = (1 to k)
      .map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, a, b, round(score, 6) AS score_r FROM r$i")
      .mkString(" UNION ALL ")
    "WITH " + parts.mkString(",\n") + "\n" + union
  }

  /** Mirrors [[PipelineQueries.unigramLearn]] by learning
   *  INDEPENDENTLY (the bpeLearn non-circularity contract — only the
   *  hyperparameters are shared): the seed substring counts and
   *  top-K selection, then for each hard-EM round an UNROLLED Viterbi
   *  DP over word positions (chained CTEs to
   *  [[PipelineQueries.UnigramMaxWordLen]] — min-cost relaxation per
   *  position, exactly the kernel's integer micro-nat DP), a
   *  longest-cost-achieving-edge backtrack reconstructing the SAME
   *  tie-broken segmentation, integer corpus-weighted counts, the
   *  add-one M-step, and the likelihood-loss prune (alt-cost DP over
   *  each piece's own string with the full-piece edge excluded).
   *  Single characters are never pruned, so every DP is feasible
   *  without UNK edges. ln parity: floor(-ln((cnt+1)/(tot+k))·1e6) on
   *  identical integer inputs — the textUnigramNll device. */
  val unigramLearn: String = {
    import graft.queries.PipelineQueries.{UnigramMaxPiece => MP,
      UnigramSeedK => SK, UnigramRounds => R, UnigramMaxWordLen => MW}
    val parts = scala.collection.mutable.ArrayBuffer(
      """v AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |    FROM documents) GROUP BY w)""".stripMargin,
      s"""subs AS MATERIALIZED (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |    SELECT freq, substring(w, i, l) AS piece
        |    FROM v, unnest(range(1, len(w) + 1)) t(i),
        |         unnest(range(1, $MP + 1)) u(l)
        |    WHERE i + l - 1 <= len(w)) GROUP BY piece)""".stripMargin,
      s"""sel0 AS MATERIALIZED (
        |  SELECT piece, cnt FROM subs WHERE len(piece) = 1
        |  UNION ALL
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt FROM subs WHERE len(piece) >= 2
        |    ORDER BY cnt DESC, piece LIMIT $SK))""".stripMargin,
      s"""m0 AS MATERIALIZED (
        |  SELECT piece, CAST(floor(-ln((cnt + 1.0) / (tot + k)) * 1000000) AS BIGINT) AS cost
        |  FROM sel0, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS k FROM sel0))""".stripMargin)
    for (r <- 1 to R) {
      val mPrev = s"m${r - 1}"
      // Viterbi DP: d{r}_p holds best cost for every position <= p
      parts += s"""d${r}_0 AS (
        |  SELECT w, freq, 0 AS pos, CAST(0 AS BIGINT) AS cost FROM v)""".stripMargin
      for (p <- 1 to MW) {
        parts += s"""d${r}_$p AS MATERIALIZED (
          |  SELECT w, freq, pos, cost FROM d${r}_${p - 1}
          |  UNION ALL
          |  SELECT d.w, d.freq, $p AS pos, min(d.cost + c.cost) AS cost
          |  FROM d${r}_${p - 1} d JOIN $mPrev c
          |    ON c.piece = substring(d.w, d.pos + 1, $p - d.pos)
          |  WHERE len(d.w) >= $p AND $p - d.pos BETWEEN 1 AND $MP
          |  GROUP BY d.w, d.freq)""".stripMargin
      }
      // per (word, end position): the LONGEST edge achieving the DP
      // optimum — the kernel's tie-break, recursively unique
      parts += s"""e$r AS MATERIALIZED (
        |  SELECT d2.w, d2.pos AS endpos, max(d2.pos - d1.pos) AS l
        |  FROM d${r}_$MW d2
        |  JOIN d${r}_$MW d1 ON d1.w = d2.w
        |    AND d2.pos - d1.pos BETWEEN 1 AND $MP
        |  JOIN $mPrev c ON c.piece = substring(d2.w, d1.pos + 1, d2.pos - d1.pos)
        |  WHERE d2.pos >= 1 AND d1.cost + c.cost = d2.cost
        |  GROUP BY d2.w, d2.pos)""".stripMargin
      parts += s"""bt${r}_0 AS (SELECT w, freq, len(w) AS pos, CAST(NULL AS VARCHAR) AS piece FROM v)"""
      for (k <- 1 to MW) {
        parts += s"""bt${r}_$k AS (
          |  SELECT b.w, b.freq, b.pos - e.l AS pos,
          |         substring(b.w, b.pos - e.l + 1, e.l) AS piece
          |  FROM bt${r}_${k - 1} b JOIN e$r e
          |    ON e.w = b.w AND e.endpos = b.pos
          |  WHERE b.pos > 0)""".stripMargin
      }
      val pieceUnion = (1 to MW)
        .map(k => s"SELECT freq, piece FROM bt${r}_$k").mkString(" UNION ALL ")
      parts += s"""c$r AS MATERIALIZED (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM ($pieceUnion) GROUP BY piece)""".stripMargin
      parts += s"""w$r AS MATERIALIZED (
        |  SELECT s.piece, coalesce(c.cnt, 0) AS cnt
        |  FROM sel${r - 1} s LEFT JOIN c$r c ON c.piece = s.piece)""".stripMargin
      if (r < R) {
        parts += s"""im$r AS MATERIALIZED (
          |  SELECT piece, cnt, CAST(floor(-ln((cnt + 1.0) / (tot + k)) * 1000000) AS BIGINT) AS cost
          |  FROM w$r, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS k FROM w$r))""".stripMargin
        // alt-cost DP over each multi piece's own string, full edge out
        parts += s"""a${r}_0 AS (
          |  SELECT piece AS p, 0 AS pos, CAST(0 AS BIGINT) AS cost
          |  FROM im$r WHERE len(piece) >= 2)""".stripMargin
        for (j <- 1 to MP) {
          parts += s"""a${r}_$j AS (
            |  SELECT p, pos, cost FROM a${r}_${j - 1}
            |  UNION ALL
            |  SELECT a.p, $j AS pos, min(a.cost + c.cost) AS cost
            |  FROM a${r}_${j - 1} a JOIN im$r c
            |    ON c.piece = substring(a.p, a.pos + 1, $j - a.pos)
            |  WHERE len(a.p) >= $j AND $j - a.pos BETWEEN 1 AND $MP
            |    AND NOT (a.pos = 0 AND $j = len(a.p))
            |  GROUP BY a.p)""".stripMargin
        }
        parts += s"""loss$r AS MATERIALIZED (
          |  SELECT im.piece, im.cnt, im.cnt * (alt.cost - im.cost) AS loss
          |  FROM im$r im JOIN (SELECT p, cost, pos FROM a${r}_$MP) alt
          |    ON alt.p = im.piece AND alt.pos = len(im.piece))""".stripMargin
        parts += s"""sel$r AS MATERIALIZED (
          |  SELECT piece, cnt FROM im$r WHERE len(piece) = 1
          |  UNION ALL
          |  SELECT piece, cnt FROM (
          |    SELECT piece, cnt, row_number() OVER (ORDER BY loss DESC, piece) AS rn,
          |           count(*) OVER () AS nm
          |    FROM loss$r)
          |  WHERE rn <= CAST(ceil(nm * 3.0 / 4) AS BIGINT))""".stripMargin
      } else {
        parts += s"""sel$r AS MATERIALIZED (SELECT piece, cnt FROM w$r)"""
      }
      parts += s"""m$r AS MATERIALIZED (
        |  SELECT piece, CAST(floor(-ln((cnt + 1.0) / (tot + k)) * 1000000) AS BIGINT) AS cost
        |  FROM sel$r, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS k FROM sel$r))""".stripMargin
    }
    // long words must fail LOUD, not silently drop from every DP round
    parts += s"""vlen AS (
      |  SELECT CASE WHEN max(len(w)) > $MW
      |              THEN error('unigram oracle: word exceeds the DP unroll depth $MW')
      |              ELSE 1 END AS ok FROM v)""".stripMargin
    "WITH " + parts.mkString(",\n") + "\n" +
      s"""SELECT s.piece, s.cnt, m.cost AS cost_micro
         |FROM sel$R s JOIN m$R m ON m.piece = s.piece, vlen
         |WHERE vlen.ok = 1""".stripMargin
  }

  /** Mirrors [[PipelineQueries.bpePairStats]]: same vocabulary agg,
   *  same adjacent char-pair expansion (DuckDB `range(1, len)` is
   *  exactly the 1..len-1 pair starts), same (count desc, pair asc)
   *  total order at the top-K boundary. */
  val bpePairStats: String = {
    val k = graft.queries.PipelineQueries.BpePairTopK
    s"""WITH tok AS (
       |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w
       |  FROM documents),
       |v AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
       |p AS (
       |  SELECT string_split(w, '')[i] AS a, string_split(w, '')[i+1] AS b, freq
       |  FROM v, unnest(range(1, len(string_split(w, '')))) t(i))
       |SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
       |FROM p GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT $k""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textUnigramNll]]: same unigram model,
   *  same micro-nat floor quantization (both engines evaluate
   *  floor(-ln(freq/tot) * 1e6) in IEEE doubles on the same rational
   *  inputs; the per-doc sum is then exact integers — aggregation
   *  order can't move it). */
  val textUnigramNll: String = {
    val m = graft.queries.PipelineQueries.NllMicro
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w
       |  FROM documents),
       |f AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
       |t AS (SELECT sum(freq) AS tot FROM f),
       |m AS (
       |  SELECT w, CAST(floor(-ln(CAST(freq AS DOUBLE) / CAST(tot AS DOUBLE)) * $m) AS BIGINT) AS nll_micro
       |  FROM f, t)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum
       |FROM tok JOIN m USING (w) GROUP BY doc_id""".stripMargin
  }

  /** Mirrors [[PipelineQueries.sampleDsir]] end-to-end including the
   *  MODEL: the same lowercase whitespace tokens, the same md5-60
   *  bucket hash ('0x'-CAST ≡ conv(hex,16,10)), the same add-one
   *  smoothed log-ratio floor-quantized to integer micro-nats once in
   *  the B-row model (ln of a ratio of exactly-representable integer
   *  products — both engines see the identical double), the same
   *  integer per-doc sums and (logw desc, doc_id) top-N cut. */
  val sampleDsir: String = {
    val b = graft.queries.PipelineQueries.DsirBuckets
    val tgt = graft.queries.PipelineQueries.DsirTargetLang
    val n = graft.queries.PipelineQueries.DsirN
    s"""WITH tok AS (
       |  SELECT doc_id, lang,
       |         CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % $b AS b
       |  FROM (SELECT doc_id, lang,
       |          unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |            x -> len(x) > 0)) AS w
       |        FROM documents) t),
       |raw AS (SELECT b, count(*) AS rcnt FROM tok GROUP BY b),
       |tg AS (SELECT b, count(*) AS tcnt FROM tok WHERE lang = '$tgt' GROUP BY b),
       |tot AS (SELECT (SELECT sum(rcnt) FROM raw) AS rtot,
       |               (SELECT coalesce(sum(tcnt), 0) FROM tg) AS ttot),
       |m AS (
       |  SELECT raw.b,
       |         CAST(floor(ln(
       |           (CAST(coalesce(tg.tcnt, 0) + 1 AS DOUBLE) * CAST(tot.rtot + $b AS DOUBLE)) /
       |           (CAST(raw.rcnt + 1 AS DOUBLE) * CAST(tot.ttot + $b AS DOUBLE)))
       |           * 1000000.0) AS BIGINT) AS lr_micro
       |  FROM raw LEFT JOIN tg ON raw.b = tg.b CROSS JOIN tot),
       |sc AS (
       |  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(m.lr_micro) AS BIGINT) AS logw_micro
       |  FROM tok JOIN m USING (b) GROUP BY tok.doc_id),
       |r AS (
       |  SELECT CAST(row_number() OVER (ORDER BY logw_micro DESC, doc_id)
       |           AS BIGINT) AS rank, doc_id, n_words, logw_micro
       |  FROM sc)
       |SELECT rank, doc_id, n_words, logw_micro FROM r WHERE rank <= $n""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textClassify]]: same lowercase
   *  whitespace tokens, same md5-prefix bucket hash (the splitAssign
   *  '0x'-CAST ≡ conv(hex,16,10) device), same pure-bigint weight
   *  formula — the weight table is arithmetic, so neither engine
   *  stores it. Empty token lists sum to 0 via coalesce (DuckDB's
   *  list_sum([]) is NULL; Spark's aggregate over [] returns the 0L
   *  init). */
  val textClassify: String = {
    val d = graft.queries.PipelineQueries.ClassifyHexDigits
    val dim = graft.queries.PipelineQueries.ClassifyDim
    val mult = graft.queries.PipelineQueries.ClassifyMult
    val m = graft.queries.PipelineQueries.ClassifyMod
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
       |         CAST(coalesce(list_sum(list_transform(ws, x ->
       |           ((CAST(('0x' || substring(md5(x), 1, $d)) AS BIGINT) % $dim)
       |             * $mult) % $m - 510)), 0) AS BIGINT) AS score_sum
       |  FROM w)
       |SELECT doc_id, n_words, score_sum, score_sum > 0 AS keep FROM s""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textPplBuckets]]: the [[textUnigramNll]]
   *  model/score CTEs verbatim, then floor-of-double mean micro-nats
   *  and quantile_cont thresholds (≡ Spark's interpolated percentile,
   *  the value_quantiles equivalence) applied in the same CASE. */
  val textPplBuckets: String = {
    val m = graft.queries.PipelineQueries.NllMicro
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w
       |  FROM documents),
       |f AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
       |t AS (SELECT sum(freq) AS tot FROM f),
       |m AS (
       |  SELECT w, CAST(floor(-ln(CAST(freq AS DOUBLE) / CAST(tot AS DOUBLE)) * $m) AS BIGINT) AS nll_micro
       |  FROM f, t),
       |sc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(floor(CAST(sum(nll_micro) AS DOUBLE) / count(*)) AS BIGINT) AS mean_nll_micro
       |  FROM tok JOIN m USING (w) GROUP BY doc_id),
       |th AS (SELECT quantile_cont(mean_nll_micro, 1.0/3) AS t1,
       |              quantile_cont(mean_nll_micro, 2.0/3) AS t2 FROM sc)
       |SELECT doc_id, n_words, mean_nll_micro,
       |  CASE WHEN mean_nll_micro < t1 THEN 'head'
       |       WHEN mean_nll_micro < t2 THEN 'middle'
       |       ELSE 'tail' END AS ppl_bucket
       |FROM sc, th""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textTokensBpe]]: REAL merge-table BPE,
   *  replayed step-for-step in SQL. The merge table (the same frozen
   *  [[graft.functions.VectorMath.BpeMerges]] the kernel uses — the
   *  sim_ann embed-the-table pattern) drives a recursive CTE over the
   *  DISTINCT words: each word starts as '|'-fenced characters
   *  ('|c|h|a|r|s|'); each step finds the lowest-rank pair whose
   *  fenced form '|a|b|' occurs, and splices its LEFTMOST occurrence
   *  (strpos) into '|ab|' — exactly the kernel's schedule, so the
   *  segmentations agree on ANY input, not just this corpus. Terminal
   *  state per word = arg_max over the step counter; token count =
   *  fence count - 1; per-doc counts re-join through the exploded
   *  word list (LEFT, so wordless docs keep bpe_tokens = 0 like the
   *  kernel). */
  // concatenated AFTER stripMargin — the BPE CTEs carry '||' string
  // concatenations at line starts whose first pipe an outer
  // stripMargin would strip (the splice trap the pre-refactor comment
  // documented)
  val textTokensBpe: String =
    "WITH RECURSIVE\n" + bpeSegCtes("text") + "\n" +
      """SELECT lw.doc_id,
        |  CAST(len(lw.lst) AS BIGINT) AS ws_tokens,
        |  CAST(coalesce(bp.bpe, 0) AS BIGINT) AS bpe_tokens
        |FROM lw LEFT JOIN bp USING (doc_id)""".stripMargin

  /** Shared frozen-merge-table BPE machinery, parameterized by the
   *  per-doc text expression (the wordpieceSegCtes convention): CTE
   *  text (m/lw/dw/it/wc/bp) re-deriving every distinct word's merge
   *  sequence; requires WITH RECURSIVE at the splice site. Ends with
   *  `lw` (doc_id, lst) and `bp` (doc_id, bpe). */
  private def bpeSegCtes(textExpr: String): String = {
    val vals = graft.functions.VectorMath.BpeMerges.zipWithIndex.map {
      case ((a, b), i) =>
        s"(${i + 1},'${a.replace("'", "''")}','${b.replace("'", "''")}')"
    }.mkString(",")
    s"""m(rk, a, b) AS (SELECT * FROM (VALUES $vals) t(rk, a, b)),
       |lw AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower($textExpr), '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents),
       |dw(w) AS (SELECT DISTINCT unnest(lst) FROM lw),
       |it(w, s, i) AS (
       |  SELECT w, '|' || array_to_string(string_split(w, ''), '|') || '|', 0 FROM dw
       |  UNION ALL
       |  SELECT x.w,
       |         substr(x.s, 1, strpos(x.s, '|'||m.a||'|'||m.b||'|') - 1)
       |           || '|' || m.a || m.b || '|'
       |           || substr(x.s, strpos(x.s, '|'||m.a||'|'||m.b||'|') + len('|'||m.a||'|'||m.b||'|')),
       |         x.i + 1
       |  FROM (SELECT w, s, i,
       |          (SELECT min(rk) FROM m WHERE contains(s, '|'||m.a||'|'||m.b||'|')) AS brk
       |        FROM it) x
       |  JOIN m ON m.rk = x.brk),
       |wc AS (
       |  SELECT w, arg_max(len(s) - len(replace(s, '|', '')) - 1, i) AS n
       |  FROM it GROUP BY w),
       |bp AS (
       |  SELECT doc_id, sum(wc.n) AS bpe
       |  FROM (SELECT doc_id, unnest(lst) AS w FROM lw) tok
       |  JOIN wc USING (w) GROUP BY doc_id)""".stripMargin
  }

  /** Shared frozen-vocab unigram segmentation machinery,
   *  parameterized by the per-doc text expression: CTE text
   *  (um/ulw/udw/DP/backtrack/useg) that re-derives every distinct
   *  word's Viterbi segmentation from the frozen
   *  [[graft.functions.VectorMath.UnigramVocab]] table with an
   *  unrolled min-cost DP and the longest-cost-achieving-edge
   *  backtrack — the unigramLearn oracle's device pointed at the
   *  frozen model. `useg` ends as (w, pieces, n). */
  private def unigramFrozenSegCtes(textExpr: String): String = {
    import graft.queries.PipelineQueries.{UnigramMaxPiece => MP,
      UnigramMaxWordLen => MW}
    val vals = graft.functions.VectorMath.UnigramVocab.map {
      case (p, c) => s"('${p.replace("'", "''")}',$c)"
    }.mkString(",")
    val parts = scala.collection.mutable.ArrayBuffer(
      s"""um(piece, cost) AS (SELECT * FROM (VALUES $vals) t(piece, cost))""",
      s"""ulw AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower($textExpr), '\\s+'), x -> len(x) > 0) AS lst
        |  FROM documents)""".stripMargin,
      """udw(w) AS (SELECT DISTINCT unnest(lst) FROM ulw)""",
      """ud_0 AS (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS cost FROM udw)""")
    val unk = graft.functions.VectorMath.UnigramUnkMicro
    for (p <- 1 to MW) {
      // LEFT join + CASE: a single character absent from the frozen
      // vocab takes the kernel's UNK edge instead of silently making
      // the word unsegmentable (which would DROP it from the piece
      // stream while the kernel emits it — a latent gate breaker on
      // any corpus whose alphabet outgrows the training one)
      parts += s"""ud_$p AS MATERIALIZED (
        |  SELECT w, pos, cost FROM ud_${p - 1}
        |  UNION ALL
        |  SELECT d.w, $p AS pos,
        |         min(d.cost + CASE WHEN c.piece IS NOT NULL THEN c.cost ELSE $unk END) AS cost
        |  FROM ud_${p - 1} d LEFT JOIN um c
        |    ON c.piece = substring(d.w, d.pos + 1, $p - d.pos)
        |  WHERE len(d.w) >= $p AND $p - d.pos BETWEEN 1 AND $MP
        |    AND (c.piece IS NOT NULL OR $p - d.pos = 1)
        |  GROUP BY d.w)""".stripMargin
    }
    parts += s"""ue AS MATERIALIZED (
      |  SELECT d2.w, d2.pos AS endpos, max(d2.pos - d1.pos) AS l
      |  FROM ud_$MW d2
      |  JOIN ud_$MW d1 ON d1.w = d2.w AND d2.pos - d1.pos BETWEEN 1 AND $MP
      |  LEFT JOIN um c ON c.piece = substring(d2.w, d1.pos + 1, d2.pos - d1.pos)
      |  WHERE d2.pos >= 1 AND (c.piece IS NOT NULL OR d2.pos - d1.pos = 1)
      |    AND d1.cost + CASE WHEN c.piece IS NOT NULL THEN c.cost ELSE $unk END = d2.cost
      |  GROUP BY d2.w, d2.pos)""".stripMargin
    // words longer than the DP unroll must fail LOUD (oracle error →
    // a visible err in the correctness gate), never silently drop
    parts += s"""ulen AS (
      |  SELECT CASE WHEN max(len(w)) > $MW
      |              THEN error('unigram oracle: word exceeds the DP unroll depth $MW')
      |              ELSE 1 END AS ok FROM udw)""".stripMargin
    parts += s"""ubt_0 AS (SELECT w, len(w) AS pos, CAST(NULL AS VARCHAR) AS piece FROM udw)"""
    for (k <- 1 to MW) {
      parts += s"""ubt_$k AS (
        |  SELECT b.w, b.pos - e.l AS pos,
        |         substring(b.w, b.pos - e.l + 1, e.l) AS piece
        |  FROM ubt_${k - 1} b JOIN ue e ON e.w = b.w AND e.endpos = b.pos
        |  WHERE b.pos > 0)""".stripMargin
    }
    val stepUnion = (1 to MW)
      .map(k => s"SELECT w, $k AS k, piece FROM ubt_$k").mkString(" UNION ALL ")
    parts += s"""useg AS MATERIALIZED (
      |  SELECT w, string_agg(piece, ' ' ORDER BY k DESC) AS pieces,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM ($stepUnion) GROUP BY w)""".stripMargin
    parts.mkString(",\n")
  }

  /** Mirrors [[PipelineQueries.textTokensUnigram]]: the frozen-table
   *  DP segmentation per distinct word ([[unigramFrozenSegCtes]]),
   *  re-assembled into each document's piece stream in word order
   *  (the textEncodeBpe reconstruction device) and md5-hashed. */
  val textTokensUnigram: String =
    s"""WITH ${unigramFrozenSegCtes("text")},
       |utok AS (
       |  SELECT doc_id, i, lst[CAST(i + 1 AS INT)] AS w
       |  FROM ulw, unnest(range(0, len(lst))) t(i)),
       |uenc AS (
       |  SELECT utok.doc_id,
       |         string_agg(useg.pieces, ' ' ORDER BY utok.i) AS e,
       |         sum(useg.n) AS n
       |  FROM utok JOIN useg USING (w) GROUP BY utok.doc_id)
       |SELECT ulw.doc_id,
       |  CAST(coalesce(uenc.n, 0) AS BIGINT) AS unigram_tokens,
       |  md5(coalesce(uenc.e, '')) AS enc_hash
       |FROM ulw LEFT JOIN uenc USING (doc_id), ulen
       |WHERE ulen.ok = 1""".stripMargin

  /** Mirrors [[PipelineQueries.textTokensWordpiece]] by re-deriving
   *  the greedy longest-match scan from the frozen vocab with
   *  UNROLLED max-munch CTEs: one state row per distinct word per
   *  step (pos, acc, n, dead); each step takes max(l) over vocab
   *  matches of the remainder (`##`-prefixed when pos > 0), advances
   *  by it, or kills the word to the whole-word '[UNK]' when nothing
   *  matches — exactly the kernel's contract. Words longer than the
   *  unroll fail LOUD (the unigram-oracle guard device); per-doc
   *  piece streams reassemble in word order and md5-gate. */
  val textTokensWordpiece: String =
    s"""WITH ${wordpieceSegCtes("text")}
       |SELECT wlw.doc_id,
       |  CAST(coalesce(wenc.n, 0) AS BIGINT) AS wordpiece_tokens,
       |  md5(coalesce(wenc.e, '')) AS enc_hash
       |FROM wlw LEFT JOIN wenc USING (doc_id), wlen
       |WHERE wlen.ok = 1""".stripMargin

  /** Mirrors [[PipelineQueries.textUnkRate]]: the deterministic
   *  domain-shift augmentation re-derived from doc_id (the
   *  engineered-fixture convention), per-doc `[UNK]` counts by the
   *  same exact substring arithmetic over the
   *  [[wordpieceSegCtes]]-reconstructed piece streams, rolled up per
   *  source with one int/int division rounded once. */
  /** SQL twin of [[PipelineQueries.unkAug]] — the one augmentation
   *  definition [[textUnkRate]] and [[tokenizerCompare]] share. */
  private val UnkAugSql: String =
    "CASE WHEN doc_id % 5 = 0 THEN text || ' emoji sort' ELSE text END"

  val textUnkRate: String =
    s"""WITH ${wordpieceSegCtes(UnkAugSql)},
       |nd AS (
       |  SELECT wlw.doc_id, CAST(len(wlw.lst) AS BIGINT) AS nw,
       |         (length(coalesce(wenc.e, ''))
       |           - length(replace(coalesce(wenc.e, ''), '[UNK]', ''))) // 5 AS nu
       |  FROM wlw LEFT JOIN wenc USING (doc_id))
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(nd.nw) AS BIGINT) AS n_words,
       |  CAST(sum(nd.nu) AS BIGINT) AS n_unk,
       |  round(CAST(sum(nd.nu) AS BIGINT)
       |    / nullif(CAST(sum(nd.nw) AS DOUBLE), 0), 6) AS unk_rate_r
       |FROM nd JOIN documents d USING (doc_id), wlen
       |WHERE wlen.ok = 1 GROUP BY d.source""".stripMargin

  /** The frozen-vocab greedy segmentation + per-doc reassembly CTE
   *  parts shared by [[textTokensWordpiece]] and [[textUnkRate]]
   *  (binds wlw, wlen, wseg, wtok, wenc), over `textExpr` — the raw
   *  column or an augmented CASE expression. */
  private def wordpieceSegCtes(textExpr: String): String = {
    val mw = graft.queries.PipelineQueries.UnigramMaxWordLen
    val mc = graft.functions.VectorMath.WordpieceMaxContent
    val vals = graft.functions.VectorMath.WordpieceVocab
      .map(p => s"('${p.replace("'", "''")}')").mkString(",")
    val parts = scala.collection.mutable.ArrayBuffer(
      s"""wv(piece) AS (SELECT * FROM (VALUES $vals) t(piece))""",
      s"""wlw AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower($textExpr), '\\s+'), x -> len(x) > 0) AS lst
        |  FROM documents)""".stripMargin,
      """wdw(w) AS (SELECT DISTINCT unnest(lst) FROM wlw)""",
      s"""wlen AS (
        |  SELECT CASE WHEN max(len(w)) > $mw
        |              THEN error('wordpiece oracle: word exceeds the greedy unroll depth $mw')
        |              ELSE 1 END AS ok FROM wdw)""".stripMargin,
      """wg_0 AS (SELECT w, CAST(0 AS BIGINT) AS pos, CAST('' AS VARCHAR) AS acc,
        |                CAST(0 AS BIGINT) AS n, 0 AS dead FROM wdw)""".stripMargin)
    for (k <- 1 to mw) {
      parts += s"""wa_$k AS (
        |  SELECT w, pos, acc, n FROM wg_${k - 1} WHERE pos < len(w) AND dead = 0)""".stripMargin
      parts += s"""wm_$k AS MATERIALIZED (
        |  SELECT a.w, a.pos, a.acc, a.n, max(t.l) AS l
        |  FROM wa_$k a
        |  JOIN (SELECT unnest(range(1, $mc + 1)) AS l) t ON t.l <= len(a.w) - a.pos
        |  JOIN wv v ON v.piece = CASE WHEN a.pos = 0 THEN substring(a.w, 1, t.l)
        |                              ELSE '##' || substring(a.w, a.pos + 1, t.l) END
        |  GROUP BY a.w, a.pos, a.acc, a.n)""".stripMargin
      parts += s"""wg_$k AS MATERIALIZED (
        |  SELECT w, pos, acc, n, dead FROM wg_${k - 1} WHERE pos >= len(w) OR dead = 1
        |  UNION ALL
        |  SELECT m.w, m.pos + m.l AS pos,
        |         CASE WHEN m.acc = '' THEN '' ELSE m.acc || ' ' END ||
        |         CASE WHEN m.pos = 0 THEN substring(m.w, 1, m.l)
        |              ELSE '##' || substring(m.w, m.pos + 1, m.l) END AS acc,
        |         m.n + 1 AS n, 0 AS dead
        |  FROM wm_$k m
        |  UNION ALL
        |  SELECT a.w, len(a.w) AS pos, '[UNK]' AS acc, CAST(1 AS BIGINT) AS n, 1 AS dead
        |  FROM wa_$k a WHERE NOT EXISTS (SELECT 1 FROM wm_$k m WHERE m.w = a.w))""".stripMargin
    }
    parts += s"""wseg AS MATERIALIZED (SELECT w, acc AS pieces, n FROM wg_$mw)"""
    parts += """wtok AS (
      |  SELECT doc_id, i, lst[CAST(i + 1 AS INT)] AS w
      |  FROM wlw, unnest(range(0, len(lst))) t(i))""".stripMargin
    parts += """wenc AS (
      |  SELECT wtok.doc_id,
      |         string_agg(wseg.pieces, ' ' ORDER BY wtok.i) AS e,
      |         sum(wseg.n) AS n
      |  FROM wtok JOIN wseg USING (w) GROUP BY wtok.doc_id)""".stripMargin
    parts.mkString(",\n")
  }

  /** Mirrors [[PipelineQueries.bpeFertility]]: the full [[textTokensBpe]]
   *  recursive-CTE machinery as a subquery (its per-doc counts are the
   *  shared contract), re-joined to the label column and rolled up per
   *  language; the fertility ratio is one division of identical bigint
   *  sums, round half-away ≡ HALF_UP for positives. */
  val bpeFertility: String =
    // the subqueries are spliced AFTER stripMargin: the inner SQL's
    // '||' concatenations at line starts would otherwise lose their
    // first pipe to the margin strip. The unigram side is its own
    // scoped WITH (the frozen-vocab DP), joined per doc_id next to
    // the BPE recursive CTE — the comparison row the two tokenizer
    // families share.
    """SELECT d.lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(t.ws_tokens) AS BIGINT) AS ws_tokens,
      |  CAST(sum(t.bpe_tokens) AS BIGINT) AS bpe_tokens,
      |  CAST(sum(u.unigram_tokens) AS BIGINT) AS unigram_tokens,
      |  CAST(sum(wp.wordpiece_tokens) AS BIGINT) AS wordpiece_tokens,
      |  round(CAST(sum(t.bpe_tokens) AS DOUBLE) / sum(t.ws_tokens), 6) AS fertility,
      |  round(CAST(sum(u.unigram_tokens) AS DOUBLE) / sum(t.ws_tokens), 6) AS unigram_fertility,
      |  round(CAST(sum(wp.wordpiece_tokens) AS DOUBLE) / sum(t.ws_tokens), 6) AS wordpiece_fertility
      |FROM (%SUB%) t JOIN (%USUB%) u USING (doc_id)
      |  JOIN (%WSUB%) wp USING (doc_id)
      |  JOIN documents d USING (doc_id)
      |GROUP BY d.lang""".stripMargin
      .replace("%SUB%", textTokensBpe)
      .replace("%USUB%", textTokensUnigram)
      .replace("%WSUB%", textTokensWordpiece)

  /** Mirrors [[PipelineQueries.tokenizerCompare]]: all three frozen
   *  tokenizer machineries ([[bpeSegCtes]], [[unigramFrozenSegCtes]],
   *  [[wordpieceSegCtes]]) re-derived over the SAME textUnkRate
   *  augmentation, per-doc counts joined once, rolled to one-row
   *  totals, and unpivoted to the four family rows. Concatenated
   *  AFTER stripMargin (the BPE splice trap). */
  val tokenizerCompare: String = {
    val aug = UnkAugSql
    "WITH RECURSIVE\n" + bpeSegCtes(aug) + ",\n" +
      unigramFrozenSegCtes(aug) + ",\n" +
      """utok AS (
        |  SELECT doc_id, i, lst[CAST(i + 1 AS INT)] AS w
        |  FROM ulw, unnest(range(0, len(lst))) t(i)),
        |uenc AS (
        |  SELECT utok.doc_id, sum(useg.n) AS n
        |  FROM utok JOIN useg USING (w) GROUP BY utok.doc_id),""".stripMargin +
      "\n" + wordpieceSegCtes(aug) + ",\n" +
      s"""byt AS (
        |  SELECT doc_id, CAST(strlen($aug) AS BIGINT) AS bytes
        |  FROM documents),
        |per AS (
        |  SELECT lw.doc_id,
        |         CAST(len(lw.lst) AS BIGINT) AS ws,
        |         CAST(coalesce(bp.bpe, 0) AS BIGINT) AS bpe,
        |         CAST(coalesce(uenc.n, 0) AS BIGINT) AS uni,
        |         CAST(coalesce(wenc.n, 0) AS BIGINT) AS wp,
        |         (length(coalesce(wenc.e, ''))
        |           - length(replace(coalesce(wenc.e, ''), '[UNK]', ''))) // 5 AS wp_unk,
        |         byt.bytes
        |  FROM lw LEFT JOIN bp USING (doc_id)
        |       LEFT JOIN uenc USING (doc_id)
        |       LEFT JOIN wenc USING (doc_id)
        |       JOIN byt USING (doc_id), ulen, wlen
        |  WHERE ulen.ok = 1 AND wlen.ok = 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(ws) AS BIGINT) AS ws,
        |         CAST(sum(bpe) AS BIGINT) AS bpe,
        |         CAST(sum(uni) AS BIGINT) AS uni,
        |         CAST(sum(wp) AS BIGINT) AS wp,
        |         CAST(sum(wp_unk) AS BIGINT) AS wp_unk,
        |         CAST(sum(bytes) AS BIGINT) AS bytes
        |  FROM per)
        |SELECT family, n_docs, ws AS n_words, n_tokens, n_unk,
        |       round(CAST(n_tokens AS DOUBLE) / ws, 6) AS fertility_r,
        |       round(CAST(n_unk AS DOUBLE) / ws, 6) AS unk_rate_r,
        |       round(CAST(bytes AS DOUBLE) / n_tokens, 6) AS bytes_per_token_r
        |FROM (
        |  SELECT 'whitespace' AS family, n_docs, ws, ws AS n_tokens,
        |         CAST(0 AS BIGINT) AS n_unk, bytes FROM tot
        |  UNION ALL SELECT 'bpe', n_docs, ws, bpe, 0, bytes FROM tot
        |  UNION ALL SELECT 'wordpiece', n_docs, ws, wp, wp_unk, bytes FROM tot
        |  UNION ALL SELECT 'unigram', n_docs, ws, uni, 0, bytes FROM tot)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.corpusReport]]: the textQuality ratio
   *  formula, the textLangId argmax CASE, and the textClassify weight
   *  fold composed in one enrichment CTE, rolled up per source. The
   *  per-doc quality score is floor-quantized to integer micro-units
   *  BEFORE the sum (the NllMicro device) — identical doubles floor to
   *  identical integers, and integer sums are order-independent where
   *  a raw double sum would hash-diverge. */
  val corpusReport: String = {
    val stops = stopListSql(graft.ops.TextAnalyticsOps.Stopwords.head._2)
    val d = graft.queries.PipelineQueries.ClassifyHexDigits
    val dim = graft.queries.PipelineQueries.ClassifyDim
    val mult = graft.queries.PipelineQueries.ClassifyMult
    val m = graft.queries.PipelineQueries.ClassifyMod
    s"""WITH f AS (
       |  SELECT source, lang, text,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS lws,
       |         $langScores
       |  FROM documents),
       |e AS (
       |  SELECT source, lang,
       |    CAST(len(ws) AS BIGINT) AS ws_tokens,
       |    len(list_filter(ws, w -> w IN ($stops))) / nullif(len(ws), 0) * 0.4
       |      + length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / nullif(length(text), 0) * 0.3
       |      + least(length(regexp_replace(text, '\\s+', '', 'g')) / nullif(len(ws), 0) / 10.0, 1.0) * 0.3
       |      AS score,
       |    CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |         WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
       |         WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
       |         WHEN s_fr > 0 THEN 'fr'
       |         ELSE 'und' END AS lang_pred,
       |    coalesce(list_sum(list_transform(lws, x ->
       |      ((CAST(('0x' || substring(md5(x), 1, $d)) AS BIGINT) % $dim)
       |        * $mult) % $m - 510)), 0) AS cls
       |  FROM f)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(ws_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(CAST(floor(score * 1000000) AS BIGINT)) AS BIGINT) AS q_micro_sum,
       |  CAST(sum(CASE WHEN lang_pred != lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_mismatch,
       |  CAST(sum(CASE WHEN cls > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
       |FROM e GROUP BY source""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textEncodeBpe]]: the [[textTokensBpe]]
   *  recursive-CTE segmentation machinery, extended to reconstruct the
   *  actual token STREAM — each distinct word's terminal fenced state
   *  becomes its space-joined pieces (trim(replace(s,'|',' '))), and
   *  the document encodes as the ordered string_agg of its words'
   *  pieces. md5 of that stream must equal the kernel's — the
   *  segmentation itself is the gated value. Same '|'-fence caveat as
   *  textTokensBpe (words containing a literal pipe would break the
   *  fencing in BOTH the oracle and nothing else — corpus-free risk). */
  val textEncodeBpe: String = {
    val vals = graft.functions.VectorMath.BpeMerges.zipWithIndex.map {
      case ((a, b), i) =>
        s"(${i + 1},'${a.replace("'", "''")}','${b.replace("'", "''")}')"
    }.mkString(",")
    s"""WITH RECURSIVE
       |m(rk, a, b) AS (SELECT * FROM (VALUES $vals) t(rk, a, b)),
       |lw AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents),
       |dw(w) AS (SELECT DISTINCT unnest(lst) FROM lw),
       |it(w, s, i) AS (
       |  SELECT w, '|' || array_to_string(string_split(w, ''), '|') || '|', 0 FROM dw
       |  UNION ALL
       |  SELECT x.w,
       |         substr(x.s, 1, strpos(x.s, '|'||m.a||'|'||m.b||'|') - 1)
       |           || '|' || m.a || m.b || '|'
       |           || substr(x.s, strpos(x.s, '|'||m.a||'|'||m.b||'|') + len('|'||m.a||'|'||m.b||'|')),
       |         x.i + 1
       |  FROM (SELECT w, s, i,
       |          (SELECT min(rk) FROM m WHERE contains(s, '|'||m.a||'|'||m.b||'|')) AS brk
       |        FROM it) x
       |  JOIN m ON m.rk = x.brk),
       |seg AS (
       |  SELECT w, trim(replace(arg_max(s, i), '|', ' ')) AS pieces,
       |         arg_max(len(s) - len(replace(s, '|', '')) - 1, i) AS n
       |  FROM it GROUP BY w),
       |tok AS (
       |  SELECT doc_id, i, lst[CAST(i + 1 AS INT)] AS w
       |  FROM lw, unnest(range(0, len(lst))) t(i)),
       |enc AS (
       |  SELECT tok.doc_id,
       |         string_agg(seg.pieces, ' ' ORDER BY tok.i) AS e,
       |         sum(seg.n) AS n
       |  FROM tok JOIN seg USING (w) GROUP BY tok.doc_id)
       |SELECT lw.doc_id,
       |  CAST(coalesce(enc.n, 0) AS BIGINT) AS bpe_tokens,
       |  md5(coalesce(enc.e, '')) AS enc_hash
       |FROM lw LEFT JOIN enc USING (doc_id)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textChunks]]: same whitespace word
   *  array, ceil(len/k) chunks per non-empty doc, 1-based clipped
   *  slices (DuckDB `lst[a:b]` is 1-based inclusive with end clipping
   *  — aligned with Spark's `slice(arr, start, length)`), md5 over the
   *  space-joined chunk. */
  val textChunks: String = {
    val k = graft.queries.PipelineQueries.ChunkTokens
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lst,
       |         unnest(range(0, CAST(ceil(len(lst) / $k.0) AS BIGINT))) AS chunk_id
       |  FROM w WHERE len(lst) > 0)
       |SELECT doc_id,
       |  CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(len(lst[chunk_id * $k + 1 : (chunk_id + 1) * $k]) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(lst[chunk_id * $k + 1 : (chunk_id + 1) * $k], ' ')) AS chunk_hash
       |FROM c""".stripMargin
  }

  /** Mirrors [[PipelineQueries.packSequences]]: same token count as
   *  textTokens' ws_tokens, same per-source cumulative cut. */
  val packSequences: String = {
    val n = graft.queries.PipelineQueries.PackTokens
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, source, n_tokens,
       |  CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens) / $n.0) AS BIGINT) AS seq_id
       |FROM t""".stripMargin
  }

  /** Mirrors [[PipelineQueries.packEval]]: the packing query's own
   *  cumulative-sum frame and seq_id assignment, the same
   *  first/last-token window test for splits, n_seqs = the packer's
   *  max assigned seq_id + 1. */
  val packEval: String = {
    val n = graft.queries.PipelineQueries.PackTokens
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT source, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
       |  FROM t),
       |s AS (
       |  SELECT source, n_tokens,
       |         CAST(floor((cum - n_tokens) / $n.0) AS BIGINT) AS seq_id,
       |         (n_tokens > 0 AND
       |          floor((cum - n_tokens) / $n.0) <> floor((cum - 1) / $n.0)) AS split
       |  FROM c),
       |g AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |         CAST(max(seq_id) + 1 AS BIGINT) AS n_seqs,
       |         CAST(sum(CASE WHEN split THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
       |  FROM s GROUP BY source)
       |SELECT source, n_docs, total_tokens, n_seqs, n_split_docs,
       |       round(CAST(total_tokens AS DOUBLE) / (n_seqs * $n), 4) AS fill_r
       |FROM g""".stripMargin
  }

  /** Mirrors [[PipelineQueries.decontaminate]]: same whitespace words,
   *  same distinct n-grams per doc (DISTINCT doc_id, ng ≡ the kernel's
   *  first-occurrence dedup), same holdout slice — joined on the gram
   *  STRING where Spark joins on its xxhash64 (equal results modulo a
   *  2^-64 collision). */
  val decontaminate: String = {
    val n = graft.queries.PipelineQueries.DecontN
    val h = graft.queries.PipelineQueries.DecontHoldout
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, array_to_string(lst[i.i : i.i + ${n - 1}], ' ') AS ng
       |  FROM w CROSS JOIN LATERAL unnest(range(1, len(lst) - $n + 2)) i(i)
       |  WHERE len(lst) >= $n),
       |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % $h = 0)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |FROM g JOIN bench USING (ng)
       |WHERE g.doc_id % $h != 0
       |GROUP BY g.doc_id""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textBm25]]: identical tf/df/avgdl
   *  relations, the same left-associated double expression order
   *  (constants interpolated from the SAME Scala vals, so both
   *  engines parse identical doubles), and the same per-term NANO
   *  floor-quantization before the per-(query, doc) integer sum. */
  val textBm25: String = {
    val qs = graft.queries.PipelineQueries.Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"('$q','$t')") }.mkString(",")
    val k1 = graft.queries.PipelineQueries.Bm25K1
    val k1p1 = graft.queries.PipelineQueries.Bm25K1Plus1
    val b = graft.queries.PipelineQueries.Bm25B
    val omb = graft.queries.PipelineQueries.Bm25OneMinusB
    val k = graft.queries.PipelineQueries.Bm25TopK
    s"""WITH q(qid, term) AS (SELECT * FROM (VALUES $qs) t(qid, term)),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS term FROM w)
       |  GROUP BY 1, 2, 3),
       |df AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
       |a AS (
       |  SELECT CAST(sum(CAST(len(ws) AS BIGINT)) AS DOUBLE) / (SELECT n FROM n) AS avgdl
       |  FROM w),
       |s AS (
       |  SELECT q.qid, tf.doc_id,
       |    CAST(floor(
       |      ln(((SELECT n FROM n) - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1.0)
       |      * ((tf.tf * $k1p1) / (tf.tf + $k1 * ($omb + $b * tf.dl / (SELECT avgdl FROM a))))
       |      * 1000000000.0) AS BIGINT) AS c
       |  FROM tf JOIN q USING (term) JOIN df USING (term)),
       |g AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_nano
       |      FROM s GROUP BY 1, 2),
       |r AS (SELECT qid, doc_id, score_nano,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY score_nano DESC, doc_id) AS rank
       |      FROM g)
       |SELECT qid, CAST(rank AS INT) AS rank, doc_id, score_nano
       |FROM r WHERE rank <= $k""".stripMargin
  }

  /** Mirrors [[PipelineQueries.simHybrid]]: BOTH rankers re-derived —
   *  the [[textBm25]] CTE chain with query terms drawn from the query
   *  documents instead of literals, and the [[simTopK]] exact-cosine
   *  chain — then the reciprocal-rank fusion arithmetic
   *  floor(1e12/(K+rank)) on exact integer ranks and the fused rank
   *  cut. NULL source ranks survive where one ranker missed a doc. */
  val simHybrid: String = {
    val ids = PipelineQueries.SimQueryIds.mkString(", ")
    val k1 = graft.queries.PipelineQueries.Bm25K1
    val k1p1 = graft.queries.PipelineQueries.Bm25K1Plus1
    val b = graft.queries.PipelineQueries.Bm25B
    val omb = graft.queries.PipelineQueries.Bm25OneMinusB
    val cand = graft.queries.PipelineQueries.HybridCand
    val topk = graft.queries.PipelineQueries.HybridTopK
    val rrfK = graft.queries.PipelineQueries.RrfK
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |eq AS (SELECT vec_id AS qid, embedding AS q_emb, nrm AS q_nrm
       |       FROM e WHERE vec_id IN ($ids)),
       |dsc AS (
       |  SELECT qid, vec_id AS doc_id,
       |         ${dotSql.format("embedding", "q_emb")} / (nrm * q_nrm) AS cos
       |  FROM e CROSS JOIN eq WHERE vec_id <> qid),
       |dr AS (
       |  SELECT qid, doc_id,
       |         CAST(row_number() OVER (PARTITION BY qid
       |           ORDER BY cos DESC, doc_id) AS BIGINT) AS dense_rank
       |  FROM dsc QUALIFY dense_rank <= $cand),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |q AS (
       |  SELECT DISTINCT doc_id AS qid, unnest(ws) AS term
       |  FROM w WHERE doc_id IN ($ids)),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS term FROM w)
       |  WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY 1, 2, 3),
       |df AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
       |a AS (
       |  SELECT CAST(sum(CAST(len(ws) AS BIGINT)) AS DOUBLE) / (SELECT n FROM n) AS avgdl
       |  FROM w),
       |s AS (
       |  SELECT q.qid, tf.doc_id,
       |    CAST(floor(
       |      ln(((SELECT n FROM n) - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1.0)
       |      * ((tf.tf * $k1p1) / (tf.tf + $k1 * ($omb + $b * tf.dl / (SELECT avgdl FROM a))))
       |      * 1000000000.0) AS BIGINT) AS c
       |  FROM tf JOIN q USING (term) JOIN df USING (term)
       |  WHERE tf.doc_id <> q.qid),
       |g AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_nano
       |      FROM s GROUP BY 1, 2),
       |lr AS (
       |  SELECT qid, doc_id,
       |         CAST(row_number() OVER (PARTITION BY qid
       |           ORDER BY score_nano DESC, doc_id) AS BIGINT) AS lex_rank
       |  FROM g QUALIFY lex_rank <= $cand),
       |fused AS (
       |  SELECT coalesce(dr.qid, lr.qid) AS qid,
       |         coalesce(dr.doc_id, lr.doc_id) AS doc_id,
       |         dr.dense_rank, lr.lex_rank,
       |         coalesce(CAST(floor(1e12 / ($rrfK + dr.dense_rank)) AS BIGINT), 0)
       |           + coalesce(CAST(floor(1e12 / ($rrfK + lr.lex_rank)) AS BIGINT), 0)
       |           AS rrf_pico
       |  FROM dr FULL JOIN lr ON dr.qid = lr.qid AND dr.doc_id = lr.doc_id)
       |SELECT qid,
       |       CAST(row_number() OVER (PARTITION BY qid
       |         ORDER BY rrf_pico DESC, doc_id) AS BIGINT) AS rank,
       |       doc_id, rrf_pico, dense_rank, lex_rank
       |FROM fused QUALIFY rank <= $topk""".stripMargin
  }

  /** Mirrors [[PipelineQueries.decontaminateRatio]]: the
   *  [[decontaminate]] gram CTEs with a LEFT join so clean docs keep
   *  n_hits = 0; grouping on the gram STRING where Spark flows its
   *  xxhash64 (the established fingerprint equivalence); the ratio is
   *  one division of identical bigints; round half-away matches
   *  Spark's HALF_UP for positives. */
  val decontaminateRatio: String = {
    val n = graft.queries.PipelineQueries.DecontN
    val h = graft.queries.PipelineQueries.DecontHoldout
    val thr = graft.queries.PipelineQueries.DecontRatioThreshold
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, array_to_string(lst[i.i : i.i + ${n - 1}], ' ') AS ng
       |  FROM w CROSS JOIN LATERAL unnest(range(1, len(lst) - $n + 2)) i(i)
       |  WHERE len(lst) >= $n),
       |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % $h = 0)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(count(b.ng) AS BIGINT) AS n_hits,
       |       round(CAST(count(b.ng) AS DOUBLE) / count(*), 6) AS contam_ratio,
       |       CAST(count(b.ng) AS DOUBLE) / count(*) >= $thr AS drop_doc
       |FROM g LEFT JOIN bench b ON g.ng = b.ng
       |WHERE g.doc_id % $h != 0
       |GROUP BY g.doc_id""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textLineFilter]]: re-derives the
   *  deterministic line augmentation byte-for-byte (the piiScrub
   *  fixture convention), splits on chr(10) via the LATERAL range
   *  device (keeping empty segments, like the kernel's manual split),
   *  classifies with the same first-match precedence dup > bullet >
   *  numeric > short (dup = row_number over (doc, line) by index), and
   *  re-joins kept lines in index order for the md5 gate. len() is
   *  codepoints in both engines (the kernel counts codePoints, not
   *  UTF-16 units). */
  val textLineFilter: String =
    s"""WITH aug AS (
       |  SELECT doc_id, text || chr(10) ||
       |    'This line is long enough to keep and ends well.' ||
       |    CASE CAST(doc_id % 4 AS INT)
       |      WHEN 0 THEN chr(10) || '- bullet item ' || CAST(doc_id AS VARCHAR)
       |      WHEN 1 THEN chr(10) || CAST(doc_id % 100 AS VARCHAR) || ' 42 / 7.5'
       |      WHEN 2 THEN chr(10) || 'ok then'
       |      ELSE chr(10) || 'This line is long enough to keep and ends well.'
       |    END AS text
       |  FROM documents),
       |s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug),
       |l AS (
       |  SELECT doc_id, i.i AS idx, ls[i.i] AS line
       |  FROM s CROSS JOIN LATERAL unnest(range(1, len(ls) + 1)) i(i)),
       |o AS (
       |  SELECT doc_id, idx, line,
       |         row_number() OVER (PARTITION BY doc_id, line ORDER BY idx) AS occ
       |  FROM l),
       |r AS (
       |  SELECT doc_id, idx, line,
       |    CASE
       |      WHEN occ > 1 THEN 'dup'
       |      WHEN line LIKE '- %' OR line LIKE '* %' OR line LIKE '• %'
       |        THEN 'bullet'
       |      WHEN regexp_full_match(line, '[0-9 .,:%/-]+')
       |           AND regexp_matches(line, '[0-9]') THEN 'numeric'
       |      WHEN len(line) < 10 THEN 'short'
       |      ELSE 'keep' END AS cls,
       |    CASE WHEN regexp_matches(line, '[.!?]$$') THEN 1 ELSE 0 END AS endp
       |  FROM o)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(count(*) FILTER (WHERE cls = 'keep') AS BIGINT) AS n_kept,
       |  CAST(count(*) FILTER (WHERE cls = 'dup') AS BIGINT) AS n_dup_line,
       |  CAST(count(*) FILTER (WHERE cls = 'bullet') AS BIGINT) AS n_bullet,
       |  CAST(count(*) FILTER (WHERE cls = 'numeric') AS BIGINT) AS n_numeric,
       |  CAST(count(*) FILTER (WHERE cls = 'short') AS BIGINT) AS n_short,
       |  round(CAST(sum(endp) AS DOUBLE) / count(*), 6) AS frac_end_punct,
       |  md5(coalesce(string_agg(line, chr(10) ORDER BY idx)
       |        FILTER (WHERE cls = 'keep'), '')) AS clean_hash
       |FROM r GROUP BY doc_id""".stripMargin

  /** The shared [[PipelineQueries.normalizeAugment]] re-derivation
   *  CTE ([[textNormalize]] + [[dedupNormalized]]) — the class-0 line
   *  carries RAW combining marks U+0301/U+0300 in this SQL string,
   *  codepoint-verified, where the Spark side spells them \\u
   *  escapes. */
  private val normalizeAugCte: String =
    s"""aug AS (
       |  SELECT doc_id, text ||
       |    CASE CAST(doc_id % 4 AS INT)
       |      WHEN 0 THEN ' Café  CRÈME du jour'
       |      WHEN 1 THEN ' Café  CRÈME du jour'
       |      WHEN 2 THEN ' tabs' || chr(9) || chr(9) || 'and  runs' || chr(9)
       |      ELSE ' MIXED Case ASCII Tail'
       |    END AS text
       |  FROM documents)""".stripMargin

  /** Mirrors [[PipelineQueries.textNormalize]]: identical augmentation
   *  literals, then lower(strip_accents(...)) — utf8proc decomposes
   *  and strips all marks, empirically verified equal to the kernel's
   *  NFD + \\p{M}-strip on both composed and decomposed input — with
   *  the same ASCII \\s collapse and trim; len() is codepoints in both
   *  engines (a combining mark counts). */
  val textNormalize: String =
    s"""WITH $normalizeAugCte,
       |n AS (
       |  SELECT doc_id, text,
       |         trim(regexp_replace(lower(strip_accents(text)),
       |                             '\\s+', ' ', 'g')) AS norm
       |  FROM aug)
       |SELECT doc_id,
       |       CAST(len(text) AS BIGINT) AS n_chars_raw,
       |       CAST(len(norm) AS BIGINT) AS n_chars_norm,
       |       norm != text AS changed,
       |       md5(norm) AS norm_hash
       |FROM n""".stripMargin

  /** Mirrors [[PipelineQueries.dedupNormalized]]: the [[textNormalize]]
   *  normalization as the [[dedupFingerprint]] group key over the same
   *  augmented corpus. */
  val dedupNormalized: String =
    s"""WITH $normalizeAugCte
       |SELECT md5(trim(regexp_replace(lower(strip_accents(text)),
       |                               '\\s+', ' ', 'g'))) AS norm_fingerprint,
       |       min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n
       |FROM aug GROUP BY 1""".stripMargin

  /** The [[decontaminate]] gram CTEs reduced to the portable md5-60
   *  hash (`'0x' || substr(md5(ng), 1, 15)` — bit-identical to the
   *  kernel's top-60-of-md5), shared by [[decontaminateBloom]] and
   *  [[decontaminateBloomEval]]: w → distinct grams → DISTINCT
   *  (doc_id, hash) — matching the kernel's dedup BY HASH VALUE — and
   *  the benchmark's distinct hash set. */
  private def bloomGramCtes(n: Int, h: Int): String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, array_to_string(lst[i.i : i.i + ${n - 1}], ' ') AS ng
       |  FROM w CROSS JOIN LATERAL unnest(range(1, len(lst) - $n + 2)) i(i)
       |  WHERE len(lst) >= $n),
       |gh AS (SELECT DISTINCT doc_id,
       |              CAST('0x' || substr(md5(ng), 1, 15) AS BIGINT) AS hh
       |       FROM g),
       |bench AS (SELECT DISTINCT hh FROM gh WHERE doc_id % $h = 0),
       |corp AS (SELECT doc_id, hh FROM gh WHERE doc_id % $h != 0)""".stripMargin

  /** The k enhanced-double-hashing bit positions of a 60-bit hash
   *  column `hh` under lateral index `i.i` — the
   *  [[graft.functions.VectorMath.bloomHits]] arithmetic verbatim:
   *  (a + i*b + C(i,2)*c) & mask over the hash's three 20-bit
   *  fields. */
  private def bloomPosExpr(mask: Long): String =
    s"((hh & $mask) + i.i * ((hh >> 20) & $mask)" +
      s" + ((i.i * (i.i - 1)) // 2) * ((hh >> 40) & $mask)) & $mask"

  /** Mirrors [[PipelineQueries.decontaminateBloom]]: RE-DERIVES the
   *  whole Bloom filter — benchmark md5-60 grams → k enhanced-double-
   *  hashing positions each → the distinct set-bit SET — then probes
   *  every training gram's k positions against it (all-k-present ≡
   *  the kernel's all-bits-set), per-doc distinct-hash counts, flagged
   *  docs only. Set-membership semantics make the bitmap word packing
   *  irrelevant to the oracle — DISTINCT positions ARE the bitmap. */
  val decontaminateBloom: String = {
    val n = graft.queries.PipelineQueries.DecontN
    val h = graft.queries.PipelineQueries.DecontHoldout
    val k = graft.queries.PipelineQueries.DecontBloomK
    val mask = (graft.queries.PipelineQueries.DecontBloomBits - 1).toLong
    s"""${bloomGramCtes(n, h)},
       |bits AS (
       |  SELECT DISTINCT ${bloomPosExpr(mask)} AS p
       |  FROM bench CROSS JOIN LATERAL unnest(range(0, $k)) i(i)),
       |probe AS (
       |  SELECT doc_id, hh, ${bloomPosExpr(mask)} AS p
       |  FROM corp CROSS JOIN LATERAL unnest(range(0, $k)) i(i)),
       |hits AS (
       |  SELECT doc_id, hh FROM probe JOIN bits USING (p)
       |  GROUP BY doc_id, hh HAVING count(*) = $k),
       |nh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |       FROM hits GROUP BY doc_id),
       |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
       |       FROM corp GROUP BY doc_id)
       |SELECT nh.doc_id, ng.n_grams, nh.n_hits
       |FROM nh JOIN ng USING (doc_id)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.decontaminateBloomEval]]: the
   *  [[decontaminateBloom]] pipeline plus the exact per-doc hit
   *  counts (corp ⋈ bench on the hash — the decontaminate
   *  equivalence), left-joined and rolled up to the same one-row
   *  audit. */
  val decontaminateBloomEval: String = {
    val n = graft.queries.PipelineQueries.DecontN
    val h = graft.queries.PipelineQueries.DecontHoldout
    val k = graft.queries.PipelineQueries.DecontBloomK
    val mask = (graft.queries.PipelineQueries.DecontBloomBits - 1).toLong
    s"""${bloomGramCtes(n, h)},
       |bits AS (
       |  SELECT DISTINCT ${bloomPosExpr(mask)} AS p
       |  FROM bench CROSS JOIN LATERAL unnest(range(0, $k)) i(i)),
       |probe AS (
       |  SELECT doc_id, hh, ${bloomPosExpr(mask)} AS p
       |  FROM corp CROSS JOIN LATERAL unnest(range(0, $k)) i(i)),
       |bl AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM (SELECT doc_id, hh FROM probe JOIN bits USING (p)
       |        GROUP BY doc_id, hh HAVING count(*) = $k)
       |  GROUP BY doc_id),
       |ex AS (
       |  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits_exact
       |  FROM corp c JOIN bench b ON c.hh = b.hh GROUP BY c.doc_id)
       |SELECT CAST(count(*) AS BIGINT) AS docs_flagged_bloom,
       |       CAST(count(ex.n_hits_exact) AS BIGINT) AS docs_flagged_exact,
       |       CAST(sum(CASE WHEN ex.n_hits_exact IS NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS docs_false_pos,
       |       CAST(sum(bl.n_hits) AS BIGINT) AS grams_flagged_bloom,
       |       CAST(sum(coalesce(ex.n_hits_exact, 0)) AS BIGINT)
       |         AS grams_flagged_exact
       |FROM bl LEFT JOIN ex USING (doc_id)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mixWeights]]: same token count as
   *  textTokens' ws_tokens, same integer quantization (floor of an
   *  IEEE-exact sqrt of identical bigints), exact integer normalizer,
   *  one identical-operand double division, round half-away matches
   *  Spark's HALF_UP for positives. */
  val mixWeights: String = {
    val s = graft.queries.PipelineQueries.MixScale
    s"""WITH t AS (
       |  SELECT source,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
       |                                   x -> len(x) > 0))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |q AS (SELECT *, CAST(floor(sqrt(n_tokens) * $s) AS BIGINT) AS scaled FROM t)
       |SELECT source, n_docs, n_tokens,
       |       round(scaled / (SELECT sum(scaled) FROM q), 6) AS weight
       |FROM q""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mixSample]]: same token kernel, same
   *  sqrt-quantized target weights (the mixWeights arithmetic), same
   *  double op sequence for the rate → identical floor-quantized
   *  thresholds (textUnigramNll's engine-stability argument), same
   *  '0x'-CAST 24-bit md5 prefix (the splitAssign device). */
  val mixSample: String = {
    val space = PipelineQueries.MixHashSpace
    val scale = PipelineQueries.MixScale
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
       |         CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT) AS h24
       |  FROM documents),
       |s AS (SELECT source, sum(n_tokens) AS src_tokens FROM d GROUP BY source),
       |x AS (SELECT source, src_tokens,
       |             CAST(floor(sqrt(src_tokens) * $scale) AS BIGINT) AS scaled
       |      FROM s),
       |y AS (SELECT source, src_tokens, scaled,
       |             sum(scaled) OVER () AS tot_scaled,
       |             sum(src_tokens) OVER () AS tot_tokens
       |      FROM x),
       |t AS (SELECT source,
       |             least($space, CAST(floor(
       |               (CAST(scaled AS DOUBLE) / tot_scaled) /
       |               (CAST(src_tokens AS DOUBLE) / tot_tokens) * $space.0)
       |               AS BIGINT)) AS thresh
       |      FROM y)
       |SELECT doc_id, source, n_tokens
       |FROM d JOIN t USING (source) WHERE h24 < thresh""".stripMargin
  }

  /** Mirrors [[PipelineQueries.splitAssign]]: DuckDB's '0x'-prefixed
   *  CAST reproduces Spark's conv(hex, 16, 10) on the same lowercase
   *  md5 prefix. */
  val splitAssign: String = {
    val d = graft.queries.PipelineQueries.SplitHexDigits
    s"""SELECT doc_id, source, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, source,
       |        CAST(('0x' || substring(md5(text), 1, $d)) AS BIGINT) % 100 AS bucket
       |      FROM documents)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textScrub]]: same word split, same
   *  in-place substitution preserving multiplicity and position.
   *  Blocklist entries are interpolated into SQL string literals, so
   *  quotes are doubled ('' is the SQL escape) — without it an entry
   *  containing a quote would silently break or skew the oracle if
   *  [[PipelineQueries.ScrubBlocklist]] ever grows toward real PII
   *  tokens (e.g. O'Brien). */
  val textScrub: String = {
    def q(s: String): String = s.replace("'", "''")
    val bl = graft.queries.PipelineQueries.ScrubBlocklist
    val tok = q(graft.queries.PipelineQueries.ScrubToken)
    val isBlocked = bl.map(b => s"x = '${q(b)}'").mkString(" OR ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(list_filter(lst, x -> $isBlocked)) AS BIGINT) AS n_redacted,
       |  md5(array_to_string(
       |    list_transform(lst, x -> CASE WHEN $isBlocked THEN '$tok' ELSE x END),
       |    ' ')) AS clean_hash
       |FROM w""".stripMargin
  }

  /** Mirrors [[PipelineQueries.piiScrub]]: the IDENTICAL augmentation
   *  arithmetic and the CHARACTER-IDENTICAL class regexes (both
   *  engines run the RE2 ∩ java.util.regex dialect, both are
   *  leftmost-first), applied progressively in the same order —
   *  per-class counts are taken on the text the earlier classes left
   *  behind, exactly like the Spark chain. DuckDB's regexp_replace
   *  needs the 'g' flag for replace-all; counts via
   *  len(regexp_extract_all). */
  val piiScrub: String = {
    val aug =
      """SELECT doc_id, text ||
        |  CASE
        |    WHEN doc_id % 4 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com today'
        |    WHEN doc_id % 4 = 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
        |    WHEN doc_id % 4 = 2 THEN ' server 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up'
        |    ELSE ' ref AB' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0') || ' ok'
        |  END AS t0
        |FROM documents""".stripMargin
    val classes = graft.queries.PipelineQueries.PiiClasses
    val stages = classes.zipWithIndex.map { case ((cls, pat), i) =>
      val tok = graft.queries.PipelineQueries.piiToken(cls)
      val carried = classes.take(i)
        .map { case (c, _) => s"n_$c, " }.mkString
      s"""s${i + 1} AS (
         |  SELECT doc_id, $carried
         |         CAST(len(regexp_extract_all(t$i, '$pat')) AS BIGINT) AS n_$cls,
         |         regexp_replace(t$i, '$pat', '$tok', 'g') AS t${i + 1}
         |  FROM ${if (i == 0) "aug" else s"s$i"})""".stripMargin
    }
    val n = classes.length
    val countCols = classes.map { case (cls, _) => s"n_$cls" }.mkString(", ")
    s"""WITH aug AS (
       |$aug
       |), ${stages.mkString(",\n")}
       |SELECT doc_id, $countCols, md5(t$n) AS clean_hash FROM s$n""".stripMargin
  }

  /** Mirrors [[PipelineQueries.shuffleShard]]: same seeded content
   *  hash, same '0x' cast for the shard bits, same (hash, doc_id)
   *  total order per shard. */
  val shuffleShard: String = {
    val seed = graft.queries.PipelineQueries.ShuffleSeed
    val s = graft.queries.PipelineQueries.ShuffleShards
    val d = graft.queries.PipelineQueries.SplitHexDigits
    s"""WITH h AS (
       |  SELECT doc_id, md5('$seed' || '|' || text) AS h FROM documents)
       |SELECT doc_id,
       |  CAST(('0x' || substring(h, 1, $d)) AS BIGINT) % $s AS shard,
       |  CAST(row_number() OVER (
       |    PARTITION BY CAST(('0x' || substring(h, 1, $d)) AS BIGINT) % $s
       |    ORDER BY h, doc_id) AS BIGINT) AS pos
       |FROM h""".stripMargin
  }

  /** Mirrors [[PipelineQueries.pipelineCurate]]: same feature math as
   *  textQuality, same lang CASE as textLangId, same fingerprint as
   *  dedupFingerprint, composed the same way. */
  val pipelineCurate: String = {
    val stops = stopListSql(graft.ops.TextAnalyticsOps.Stopwords.head._2)
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, text,
       |         CAST(len(ws) AS BIGINT) AS n_words,
       |         length(regexp_replace(text, '\\s+', '', 'g')) / nullif(len(ws), 0) AS mean_wlen,
       |         len(list_filter(ws, w -> w IN ($stops))) / nullif(len(ws), 0) AS stop_ratio,
       |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / nullif(length(text), 0) AS alpha_ratio,
       |         $langScores
       |  FROM f),
       |k AS (
       |  SELECT doc_id, text, n_words,
       |         stop_ratio * 0.4 + alpha_ratio * 0.3 + least(mean_wlen / 10.0, 1.0) * 0.3 AS score,
       |         CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |              WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
       |              WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
       |              WHEN s_fr > 0 THEN 'fr'
       |              ELSE 'und' END AS lang_pred
       |  FROM g)
       |SELECT min(doc_id) AS doc_id, n_words, score, count(*) AS n_copies
       |FROM k
       |WHERE lang_pred = 'en' AND score >= ${PipelineQueries.CurateMinScore}
       |  AND n_words >= ${PipelineQueries.CurateMinWords}
       |GROUP BY md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))), n_words, score""".stripMargin
  }

  val revenueByRegion: String =
    """SELECT r_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** Gaps-and-islands sessionization. New session when the gap from the
   *  previous event is >= 30 min (Spark's session_window end bound is
   *  exclusive). epoch_ms truncation matches Spark's micros-truncated
   *  timestamps at millisecond granularity. */
  val sessionize: String =
    """WITH e AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT CAST(epoch_ms(min(ts)) AS BIGINT) AS s_start_ms, user_id,
      |       count(*) AS n_events
      |FROM s GROUP BY sid, user_id""".stripMargin

  val saltedDistinct: String =
    "SELECT event_type, count(DISTINCT user_id) AS uniques FROM events GROUP BY event_type"

  /** As-of semantics spelled out relationally: per purchase, the click
   *  with the greatest ts_ms <= purchase.ts_ms, ties to the largest
   *  click_id — exactly the (ts, side, tiebreak) order the Spark
   *  forward-fill plan uses. Inner: unmatched purchases drop. */
  val asofClicks: String =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT event_id AS click_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
      |  FROM events WHERE event_type = 'click')
      |SELECT p.purchase_id, p.user_id, p.ts_ms, l.click_id,
      |       p.ts_ms - l.ts_ms AS lag_ms
      |FROM p CROSS JOIN LATERAL (
      |  SELECT c.click_id, c.ts_ms FROM c
      |  WHERE c.user_id = p.user_id AND c.ts_ms <= p.ts_ms
      |  ORDER BY c.ts_ms DESC, c.click_id DESC LIMIT 1) l""".stripMargin

  /** The band join's exact predicate, as a plain inequality join. */
  val rangePairs: String =
    s"""WITH c AS (
       |  SELECT event_id AS click_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS c_ms
       |  FROM events WHERE event_type = 'click'),
       |p AS (
       |  SELECT event_id AS purchase_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS p_ms
       |  FROM events WHERE event_type = 'purchase')
       |SELECT c.user_id, c.click_id, p.purchase_id, p.p_ms - c.c_ms AS gap_ms
       |FROM c JOIN p USING (user_id)
       |WHERE p.p_ms >= c.c_ms AND p.p_ms - c.c_ms <= ${AnalyticsQueries.RangeGapMs}""".stripMargin

  /** Exact interpolated percentiles (quantile_cont mirrors Spark's
   *  `percentile` lower+(upper-lower)*frac definition; rounded to absorb
   *  sub-ulp association differences). The sketch flags are literal TRUE:
   *  the accuracy contract is deterministic on this data, so the Spark
   *  side must also emit all-true — that IS the check. */
  val valueQuantiles: String =
    """SELECT event_type, count(*) AS n,
      |       round(quantile_cont(value, 0.5), 4) AS p50_r,
      |       round(quantile_cont(value, 0.95), 4) AS p95_r,
      |       true AS p50_ok, true AS p95_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** Exact windowed distinct + literal-TRUE sketch contract (see
   *  BenchQueries.uniqueVisitorApprox — the HLL estimate is deterministic,
   *  so the within-15% boolean must come out all-true on the Spark side). */
  val uvApprox: String =
    s"""WITH $pageViewSql
       |SELECT $wStart AS w_start, url, count(DISTINCT user_id) AS uniques,
       |       true AS approx_ok
       |FROM pv $slide2h GROUP BY 1, 2""".stripMargin

  val eventRollup: String =
    """SELECT event_type, day, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_v
      |FROM (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, value
      |      FROM events) t
      |GROUP BY ROLLUP (event_type, day)""".stripMargin

  /** Mirrors [[AnalyticsQueries.eventGroupingSets]]: the same three
   *  explicit sets, same grouping_id bit order (both engines number
   *  the mask over the listed group-by expressions left-to-right),
   *  same decimal-exact sum. */
  val eventGroupingSets: String =
    """SELECT event_type, day,
      |       CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_v
      |FROM (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, value
      |      FROM events) t
      |GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))""".stripMargin

  /** Mirrors [[AnalyticsQueries.skewReport]]: same per-column count
   *  frames, same hot-key tie-break (count desc, key asc), percentile
   *  ≡ quantile_cont (the valueQuantiles device), identical double
   *  operands for the skew ratio. */
  val skewReport: String = {
    def one(label: String, cte: String): String =
      s"""SELECT '$label' AS key_col,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(n) AS BIGINT) AS n_rows,
         |  CAST(max(n) AS BIGINT) AS max_n,
         |  (SELECT k FROM $cte ORDER BY n DESC, k LIMIT 1) AS hot_key,
         |  round(quantile_cont(n, 0.5), 4) AS p50_n,
         |  round(max(n) / quantile_cont(n, 0.5), 2) AS skew_r
         |FROM $cte""".stripMargin
    s"""WITH cu AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS n
       |            FROM events GROUP BY 1),
       |ce AS (SELECT CAST(event_type AS VARCHAR) AS k, count(*) AS n
       |       FROM events GROUP BY 1),
       |cs AS (SELECT CAST(source AS VARCHAR) AS k, count(*) AS n
       |       FROM documents GROUP BY 1)
       |${one("user_id", "cu")}
       |UNION ALL
       |${one("event_type", "ce")}
       |UNION ALL
       |${one("source", "cs")}""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.dqCheck]]: the same constraint
   *  battery as conditional sums in one pass per table (COALESCEd —
   *  a zero-row table must report 0 violations, not NULL, the
   *  engine-side empty-table fix mirrored) + the RI count as
   *  NOT EXISTS, which matches Spark's left_anti under NULL keys
   *  where NOT IN would collapse to zero orphans. */
  val dqCheck: String =
    """WITH oa AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS null_cust,
      |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
      |         CAST(coalesce(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS neg_price,
      |         CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END), 0) AS BIGINT) AS bad_status
      |  FROM orders),
      |la AS (SELECT CAST(count(*) AS BIGINT) AS n_li FROM lineitem),
      |orph AS (
      |  SELECT CAST(count(*) AS BIGINT) AS orphans
      |  FROM lineitem l WHERE NOT EXISTS (
      |    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |m AS (SELECT * FROM oa, la, orph),
      |r AS (
      |  SELECT 'orders_nonempty' AS check_name,
      |         CAST(CASE WHEN n = 0 THEN 1 ELSE 0 END AS BIGINT) AS violations,
      |         n AS checked FROM m
      |  UNION ALL SELECT 'o_custkey_not_null', null_cust, n FROM m
      |  UNION ALL SELECT 'o_orderkey_unique', dup_keys, n FROM m
      |  UNION ALL SELECT 'o_totalprice_nonneg', neg_price, n FROM m
      |  UNION ALL SELECT 'o_orderstatus_domain', bad_status, n FROM m
      |  UNION ALL SELECT 'lineitem_order_ri', orphans, n_li FROM m)
      |SELECT check_name, violations, checked, violations = 0 AS pass FROM r""".stripMargin

  /** Mirrors [[AnalyticsQueries.scd2Build]]: same exact
   *  integer-microsecond keys (epoch_us ≡ unix_micros), same
   *  (ts_us, event_id) total order for lag/lead, same Long.MaxValue
   *  open-interval sentinel. */
  val scd2Build: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
      |  FROM events),
      |c AS (
      |  SELECT *, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      |  FROM ev),
      |ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type),
      |iv AS (
      |  SELECT user_id, event_type AS state, ts_us AS valid_from_us,
      |         coalesce(lead(ts_us) OVER
      |           (PARTITION BY user_id ORDER BY ts_us, event_id),
      |           9223372036854775807) AS valid_to_us
      |  FROM ch)
      |SELECT user_id, state, valid_from_us, valid_to_us,
      |       valid_to_us = 9223372036854775807 AS is_current FROM iv""".stripMargin

  /** Mirrors [[AnalyticsQueries.cdcApply]]: the same deterministic
   *  change-batch derivation (mod-13 deletes, mod-7 repriced updates,
   *  mod-97 −(k+1) inserts — strictly negative, disjoint from the
   *  ≥ 0 order keyspace at every SF), one union + per-key latest-wins rank
   *  + tombstone drop, decimal-exact price sums cast once. */
  val cdcApply: String =
    """WITH snap AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS status,
      |         CAST(o_totalprice AS DECIMAL(14,2)) AS price,
      |         0 AS seq, 'U' AS op FROM orders),
      |del AS (SELECT k, status, price, 1 AS seq, 'D' AS op
      |        FROM snap WHERE k % 13 = 0),
      |upd AS (SELECT k, 'X' AS status,
      |               CAST(price + 10.00 AS DECIMAL(14,2)) AS price,
      |               1 AS seq, 'U' AS op
      |        FROM snap WHERE k % 13 <> 0 AND k % 7 = 0),
      |ins AS (SELECT -(k + 1) AS k, 'N' AS status, price,
      |               1 AS seq, 'I' AS op
      |        FROM snap WHERE k % 97 = 0),
      |a AS (SELECT * FROM snap UNION ALL SELECT * FROM del
      |      UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |m AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rk
      |    FROM a) t
      |  WHERE rk = 1 AND op <> 'D')
      |SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(k) AS BIGINT) AS key_sum,
      |       CAST(sum(price) AS DOUBLE) AS price_sum
      |FROM m GROUP BY status""".stripMargin

  /** Mirrors [[AnalyticsQueries.eventRangeFrame]]: same exact
   *  integer-microsecond frame key (epoch_us ≡ unix_micros), same
   *  bounds, same decimal-exact sum. */
  val eventRangeFrame: String =
    """SELECT event_id, user_id,
      |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |       CAST(sum(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE)
      |         AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** ROWS-frame moving average: decimal-exact frame sum, one double
   *  divide, rounded — mirrors the Spark window expression exactly. */
  val movingAvg: String =
    """SELECT event_id, user_id,
      |       round(CAST(sum(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE) /
      |             (count(*) OVER w), 4) AS ma_r
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin

  val eventCube: String =
    """SELECT event_type, day,
      |       CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INTEGER) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_v
      |FROM (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, value
      |      FROM events) t
      |GROUP BY CUBE (event_type, day)""".stripMargin

  val topBrandsPerRegion: String =
    """WITH q AS (
      |  SELECT r_name, p_brand,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |  JOIN part     ON l_partkey = p_partkey
      |  GROUP BY r_name, p_brand)
      |SELECT * FROM (
      |  SELECT r_name, p_brand, qty,
      |         CAST(dense_rank() OVER (PARTITION BY r_name
      |           ORDER BY qty DESC, p_brand) AS INTEGER) AS rk
      |  FROM q) t WHERE rk <= 2""".stripMargin

  val clickNoPurchase: String =
    """SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
      |FROM events WHERE event_type = 'click'
      |EXCEPT
      |SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  val eventPivot: String = {
    val cols = AnalyticsQueries.EventTypes.map(t =>
      s"count(*) FILTER (event_type = '$t') AS n_$t").mkString(",\n       ")
    s"""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms,
       |       $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  /** Mirrors eventUnpivot: same agg CTE, UNION ALL melt (engine-agnostic
   *  UNPIVOT); all metrics double, sum via DECIMAL. */
  val eventUnpivot: String =
    """WITH agg AS (
      |  SELECT event_type,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_v,
      |         CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
      |  FROM events GROUP BY 1)
      |SELECT event_type, 'n' AS metric, n AS val FROM agg
      |UNION ALL SELECT event_type, 'sum_v', sum_v FROM agg
      |UNION ALL SELECT event_type, 'n_users', n_users FROM agg""".stripMargin

  /** Mirrors eventJsonProps; sums re-cast from HUGEINT to BIGINT. */
  val eventJsonProps: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
      |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1""".stripMargin

  /** Mirrors eventRankFuncs: identical window order + tiebreak; rank
   *  ratios rounded to 6 in both engines; ntile is BIGINT in DuckDB. */
  val eventRankFuncs: String =
    """SELECT event_id, event_type, value,
      |       ntile(4) OVER w AS q4,
      |       round(percent_rank() OVER w, 6) AS pr,
      |       round(cume_dist() OVER w, 6) AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin

  val eventGaps: String =
    """WITH g AS (
      |  SELECT user_id,
      |         epoch_ms(ts) - lag(epoch_ms(ts)) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
      |  FROM events)
      |SELECT user_id, count(*) AS n_gaps,
      |       max(gap_ms) AS max_gap_ms, CAST(sum(gap_ms) AS BIGINT) AS sum_gap_ms
      |FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id""".stripMargin

  val clickAndPurchase: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin

  /** Mirrors [[PipelineQueries.textTfidf]] structurally: tf ->
   *  doc-frequency over the tf relation -> tf * ln(N/df) -> top-3 per
   *  doc (score DESC, term ASC). ln is the platform libm on both
   *  engines; scores rounded to 4. */
  val textTfidf: String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |s AS (
       |  SELECT doc_id, tf.term, tf * ln(CAST(n.n AS DOUBLE) / dfreq) AS score
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
       |SELECT doc_id, term, CAST(rn AS INTEGER) AS rk, round(score, 4) AS tfidf_r
       |FROM (
       |  SELECT doc_id, term, score, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, term) AS rn
       |  FROM s) t
       |WHERE rn <= ${PipelineQueries.TfidfTopTerms}""".stripMargin

  /** Mirrors [[PipelineQueries.textDocsim]]: the inverted-index
   *  self-join with the SAME df-cap prune before it, ln-parity tf-idf
   *  weights, per-term pair contributions and per-doc squared norms
   *  floor-quantized to integer nano units before their sums (exact
   *  integers ⇒ aggregation-order-free), one sqrt-divided cosine,
   *  total-order LIMIT. */
  val textDocsim: String =
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(
       |    regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |wd AS (
       |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS term
       |  FROM wl, unnest(range(1, len(ws))) t(i)),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM wd GROUP BY 1, 2),
       |n AS (SELECT count(*) AS n FROM documents),
       |dfr AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1
       |        HAVING count(*) <= (SELECT CAST(floor(CAST(n AS DOUBLE)
       |          * ${PipelineQueries.DocsimDfFrac}) AS BIGINT) FROM n)),
       |w AS (
       |  SELECT tf.term, tf.doc_id, tf * ln(CAST(n.n AS DOUBLE) / dfreq) AS w
       |  FROM tf JOIN dfr USING (term) CROSS JOIN n),
       |ss AS (
       |  SELECT doc_id,
       |         CAST(sum(CAST(floor(w * w * 1e9) AS BIGINT)) AS BIGINT) AS ss_nano
       |  FROM w GROUP BY 1),
       |p AS (
       |  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       |         CAST(sum(CAST(floor(a.w * b.w * 1e9) AS BIGINT)) AS BIGINT) AS dot_nano
       |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |s AS (
       |  SELECT p.doc1, p.doc2,
       |         dot_nano / (sqrt(s1.ss_nano) * sqrt(s2.ss_nano)) AS sim
       |  FROM p JOIN ss s1 ON s1.doc_id = p.doc1
       |         JOIN ss s2 ON s2.doc_id = p.doc2)
       |SELECT doc1, doc2, round(sim, 4) AS sim_r FROM s
       |ORDER BY sim DESC, doc1, doc2 LIMIT ${PipelineQueries.DocsimTopN}""".stripMargin

  /** Word/2-gram repetition ratios; all divisions are int/int -> double
   *  single operations, engine-exact. */
  val textRepetition: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS w
      |  FROM documents),
      |f AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
      |t AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_words FROM f GROUP BY 1),
      |g AS (
      |  SELECT doc_id,
      |         len(list_distinct(CASE WHEN len(ws) >= 2
      |           THEN list_transform(range(0, len(ws) - 1),
      |                  i -> ws[i+1] || ' ' || ws[i+2])
      |           ELSE [] END)) AS d2,
      |         len(ws) - 1 AS t2
      |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
      |                x -> len(x) > 0) AS ws
      |        FROM documents))
      |SELECT t.doc_id, top_c / n_words AS top_word_frac,
      |       CASE WHEN t2 > 0 THEN (t2 - d2) / t2 END AS dup_2gram_frac
      |FROM t JOIN g ON t.doc_id = g.doc_id""".stripMargin

  /** Mirrors [[PipelineQueries.qualityGopher]]: same whitespace words,
   *  the textQuality feature arithmetic (exact int/int double
   *  divisions), the textRepetition dominance shape (max/sum word
   *  frequency), and the same threshold constants spliced from the
   *  Scala definitions — an independent relational recomputation of
   *  every rule flag, not the Spark plan echoed back. */
  val qualityGopher: String = {
    val stops = stopListSql(graft.ops.TextAnalyticsOps.Stopwords.head._2)
    import PipelineQueries.{GopherMinWords, GopherMaxWords, GopherMinWlen,
      GopherMaxWlen, GopherMinStop, GopherMaxTopFrac}
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         CAST(len(ws) AS BIGINT) AS n_words,
       |         length(regexp_replace(text, '\\s+', '', 'g')) / nullif(len(ws), 0) AS mean_wlen,
       |         len(list_filter(ws, w -> w IN ($stops))) / nullif(len(ws), 0) AS stop_ratio
       |  FROM f),
       |e AS (SELECT doc_id, unnest(ws) AS w FROM f),
       |c AS (SELECT doc_id, w, count(*) AS c FROM e GROUP BY 1, 2),
       |d AS (SELECT doc_id, max(c) / sum(c) AS top_frac FROM c GROUP BY 1),
       |j AS (SELECT g.*, top_frac FROM g LEFT JOIN d USING (doc_id))
       |SELECT doc_id, n_words, mean_wlen, stop_ratio, top_frac,
       |       n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS r_words,
       |       coalesce(mean_wlen BETWEEN $GopherMinWlen AND $GopherMaxWlen, false) AS r_wlen,
       |       coalesce(stop_ratio >= $GopherMinStop, false) AS r_stop,
       |       coalesce(top_frac <= $GopherMaxTopFrac, false) AS r_rep,
       |       (n_words BETWEEN $GopherMinWords AND $GopherMaxWords)
       |         AND coalesce(mean_wlen BETWEEN $GopherMinWlen AND $GopherMaxWlen, false)
       |         AND coalesce(stop_ratio >= $GopherMinStop, false)
       |         AND coalesce(top_frac <= $GopherMaxTopFrac, false) AS keep
       |FROM j""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textWinnow]]: same whitespace words and
   *  gram windows, the portable md5-60 gram hash recomputed from the
   *  gram STRING (`CAST('0x' || substr(md5(g),1,15) AS BIGINT)` — the
   *  dedupSimhash family), the identical packed rightmost-min key
   *  ((h mod 2^40)·2^20 + (2^20−1−pos)), the same trailing window
   *  min, and the same short-doc single-window rule. The VALUES match
   *  bit-for-bit because the hash family is portable — a selection
   *  that orders by hash admits no count-equivalence shortcut. */
  val textWinnow: String = {
    val k = PipelineQueries.WinnowK
    val w = PipelineQueries.WinnowW
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i AS pos,
       |         CAST('0x' || substr(md5(array_to_string(ws[i+1:i+$k], ' ')), 1, 15) AS BIGINT) AS h
       |  FROM w, unnest(range(0, greatest(len(ws) - $k + 1, 0))) t(i)),
       |p AS (
       |  SELECT doc_id, pos,
       |         (h % 1099511627776) * 1048576 + (1048575 - pos) AS packed
       |  FROM g),
       |m AS (
       |  SELECT doc_id, pos,
       |         min(packed) OVER (PARTITION BY doc_id ORDER BY pos
       |                           ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mp,
       |         max(pos) OVER (PARTITION BY doc_id) AS maxpos
       |  FROM p),
       |sel AS (
       |  SELECT DISTINCT doc_id, 1048575 - (mp % 1048576) AS sel_pos, mp // 1048576 AS sel_h
       |  FROM m WHERE pos >= ${w - 1} OR pos = maxpos),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_fp, CAST(sum(sel_h) AS BIGINT) AS fp_sum
       |  FROM sel GROUP BY 1)
       |SELECT w.doc_id,
       |       CAST(greatest(len(ws) - $k + 1, 0) AS BIGINT) AS n_grams,
       |       coalesce(n_fp, 0) AS n_fp,
       |       coalesce(fp_sum, 0) AS fp_sum
       |FROM w LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.dedupWinnow]]: the textWinnow selection
   *  CTEs verbatim, then an INDEPENDENT df-cap + self-join + pair
   *  count — the near-dup semantics recomputed relationally, same
   *  portable hash values. */
  val dedupWinnow: String = {
    val k = PipelineQueries.WinnowK
    val w = PipelineQueries.WinnowW
    val cap = PipelineQueries.WinnowMaxDf
    val t = PipelineQueries.WinnowMinShared
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i AS pos,
       |         CAST('0x' || substr(md5(array_to_string(ws[i+1:i+$k], ' ')), 1, 15) AS BIGINT) AS h
       |  FROM w, unnest(range(0, greatest(len(ws) - $k + 1, 0))) t(i)),
       |p AS (
       |  SELECT doc_id, pos,
       |         (h % 1099511627776) * 1048576 + (1048575 - pos) AS packed
       |  FROM g),
       |m AS (
       |  SELECT doc_id, pos,
       |         min(packed) OVER (PARTITION BY doc_id ORDER BY pos
       |                           ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mp,
       |         max(pos) OVER (PARTITION BY doc_id) AS maxpos
       |  FROM p),
       |sel AS (
       |  SELECT DISTINCT doc_id, mp // 1048576 AS sel_h
       |  FROM m WHERE pos >= ${w - 1} OR pos = maxpos),
       |df AS (SELECT sel_h, count(*) AS df FROM sel GROUP BY 1),
       |rare AS (
       |  SELECT s.doc_id, s.sel_h FROM sel s JOIN df USING (sel_h)
       |  WHERE df.df <= $cap)
       |SELECT id1, id2, n_shared FROM (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
       |  FROM rare a JOIN rare b ON a.sel_h = b.sel_h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2) pairs
       |WHERE n_shared >= $t""".stripMargin
  }

  /** Mirrors [[PipelineQueries.sampleWeighted]]: same md5-60 content
   *  uniform, same weight, the identical ln-quotient micro-floor key
   *  (term-for-term expression shape — IEEE doubles on identical
   *  rational inputs, the textUnigramNll device), same (key desc,
   *  doc_id) order and cut. */
  val sampleWeighted: String = {
    val n = PipelineQueries.WeightedN
    s"""SELECT doc_id, n_chars,
       |       CAST(floor(ln((CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) + 1)
       |                     / 1152921504606846976.0)
       |                  / CAST(n_chars + 1 AS DOUBLE) * 1000000.0) AS BIGINT) AS key_micro
       |FROM documents
       |ORDER BY key_micro DESC, doc_id
       |LIMIT $n""".stripMargin
  }

  /** Mirrors [[PipelineQueries.sampleGroupWeighted]]: the sampleWeighted
   *  key arithmetic verbatim, cut by a per-source rank window instead
   *  of the global LIMIT. */
  val sampleGroupWeighted: String = {
    val n = PipelineQueries.GroupWeightedN
    s"""SELECT source, doc_id, n_chars, key_micro, rank FROM (
       |  SELECT source, doc_id, n_chars,
       |         CAST(floor(ln((CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) + 1)
       |                       / 1152921504606846976.0)
       |                    / CAST(n_chars + 1 AS DOUBLE) * 1000000.0) AS BIGINT) AS key_micro,
       |         CAST(row_number() OVER (PARTITION BY source
       |           ORDER BY floor(ln((CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) + 1)
       |                             / 1152921504606846976.0)
       |                          / CAST(n_chars + 1 AS DOUBLE) * 1000000.0) DESC,
       |             doc_id) AS BIGINT) AS rank
       |  FROM documents) t
       |WHERE rank <= $n""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.eventResample]]: hourly decimal-exact
   *  mean, dense per-user hour grid, LOCF via IGNORE NULLS last_value
   *  over the same running ROWS frame. */
  val eventResample: String =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |         CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS hv
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM bounds),
      |j AS (SELECT g.user_id, g.h, hv FROM grid g LEFT JOIN hourly USING (user_id, h))
      |SELECT user_id, CAST(epoch_ms(h) AS BIGINT) AS h_ms,
      |       round(last_value(hv IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY h
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_ff
      |FROM j""".stripMargin

  /** The plain join+agg the salted plan must reproduce exactly. */
  val saltedJoinRevenue: String =
    """WITH dim AS (
      |  SELECT event_type, CAST(length(event_type) AS BIGINT) AS weight
      |  FROM (SELECT DISTINCT event_type FROM events) t)
      |SELECT e.event_type,
      |       CAST(sum(CAST(e.value AS DECIMAL(14,2)) * weight) AS DOUBLE) AS wsum,
      |       count(*) AS n
      |FROM events e JOIN dim USING (event_type)
      |GROUP BY 1""".stripMargin

  /** Mirrors [[AnalyticsQueries.weeklyRetention]]: same epoch-seconds
   *  week bucket (truncation vs fractional epoch can never cross a
   *  whole-second week boundary, so the floors agree on every
   *  timestamp), same left self-join at week+1. */
  val weeklyRetention: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
      |  FROM events)
      |SELECT a.week, CAST(count(*) AS BIGINT) AS n_active,
      |       CAST(count(b.user_id) AS BIGINT) AS n_retained,
      |       round(CAST(count(b.user_id) AS DOUBLE) / count(*), 6) AS retention_r
      |FROM a LEFT JOIN a b
      |  ON a.user_id = b.user_id AND b.week = a.week + 1
      |GROUP BY a.week""".stripMargin

  /** Mirrors [[AnalyticsQueries.eventFunnel]]: each stage's qualifying
   *  first-touch CTE joins strictly after the previous stage's time —
   *  identical timestamp comparisons, counts, and lag-based
   *  conversion. */
  val eventFunnel: String = {
    val Seq(s1, s2, s3) = graft.queries.AnalyticsQueries.FunnelStages
    val w = graft.queries.AnalyticsQueries.FunnelWindowSec
    s"""WITH v AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = '$s1' GROUP BY 1),
       |c AS (
       |  SELECT e.user_id, min(e.ts) AS t0 FROM events e
       |  JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
       |    AND e.ts <= v.t0 + INTERVAL $w SECOND
       |  WHERE e.event_type = '$s2' GROUP BY 1),
       |p AS (
       |  SELECT e.user_id, min(e.ts) AS t0 FROM events e
       |  JOIN c ON e.user_id = c.user_id AND e.ts > c.t0
       |    AND e.ts <= c.t0 + INTERVAL $w SECOND
       |  WHERE e.event_type = '$s3' GROUP BY 1),
       |s AS (
       |  SELECT 1 AS stage, '$s1' AS event_type,
       |         (SELECT count(*) FROM v) AS n_users
       |  UNION ALL SELECT 2, '$s2', (SELECT count(*) FROM c)
       |  UNION ALL SELECT 3, '$s3', (SELECT count(*) FROM p))
       |SELECT stage, event_type, CAST(n_users AS BIGINT) AS n_users,
       |  round(CAST(n_users AS DOUBLE)
       |    / coalesce(lag(n_users) OVER (ORDER BY stage), n_users), 6) AS conv_r
       |FROM s""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.eventAnomalies]]: the same
   *  decimal-exact moment sums (double→DECIMAL(14,2) rounds identically
   *  in both engines away from any representable .005 boundary — the
   *  eventProfile equivalence), cast to double once, identical
   *  mean/σ/flag arithmetic; round half-away ≡ HALF_UP on both signs
   *  of z. */
  val eventAnomalies: String = {
    val k = graft.queries.AnalyticsQueries.AnomalySigma
    s"""WITH s AS (
       |  SELECT event_type, count(*) AS n,
       |         sum(CAST(value AS DECIMAL(14,2))) AS s1,
       |         sum(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2))) AS s2
       |  FROM events GROUP BY event_type),
       |m AS (
       |  SELECT event_type,
       |         CAST(s1 AS DOUBLE) / n AS m,
       |         CAST(s2 AS DOUBLE) / n AS msq
       |  FROM s),
       |t AS (SELECT event_type, m, sqrt(msq - m * m) AS sd FROM m)
       |SELECT event_id, e.event_type, value,
       |       round((value - m) / sd, 4) AS z_r
       |FROM events e JOIN t USING (event_type)
       |WHERE abs(value - m) > $k * sd""".stripMargin
  }

  /** Mirrors [[PipelineQueries.sourceOverlap]]: per-doc distinct gram
   *  STRINGS where Spark uses 64-bit hashes (the decontaminate
   *  equivalence), the same document-frequency cap, then an
   *  INDEPENDENT self-join formulation of the pair counts (Spark
   *  generates pairs row-locally from each gram's source set);
   *  Jaccard from three bigints of the same row. */
  val sourceOverlap: String = {
    val n = graft.queries.PipelineQueries.DecontN
    val cap = graft.queries.PipelineQueries.SourceOverlapMaxDf
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS lst
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, source, array_to_string(lst[i.i : i.i + ${n - 1}], ' ') AS ng
       |  FROM w CROSS JOIN LATERAL unnest(range(1, len(lst) - $n + 2)) i(i)
       |  WHERE len(lst) >= $n),
       |d AS (SELECT ng FROM g GROUP BY ng HAVING count(*) <= $cap),
       |gs AS (SELECT DISTINCT source, ng FROM g JOIN d USING (ng)),
       |sz AS (SELECT source, count(*) AS sz FROM gs GROUP BY source),
       |p AS (
       |  SELECT a.source AS src1, b.source AS src2, count(*) AS shared_grams
       |  FROM gs a JOIN gs b ON a.ng = b.ng AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src1, src2, CAST(shared_grams AS BIGINT) AS shared_grams,
       |       round(CAST(shared_grams AS DOUBLE) / (z1.sz + z2.sz - shared_grams), 6) AS jaccard_r
       |FROM p JOIN sz z1 ON src1 = z1.source JOIN sz z2 ON src2 = z2.source""".stripMargin
  }

  val eventProfile: String =
    """SELECT 'event_type' AS "column", count(*) AS n_rows,
      |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |       count(DISTINCT event_type) AS n_distinct,
      |       CAST(min(event_type) AS VARCHAR) AS min_v,
      |       CAST(max(event_type) AS VARCHAR) AS max_v
      |FROM events
      |UNION ALL
      |SELECT 'user_id', count(*),
      |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       count(DISTINCT user_id),
      |       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
      |FROM events
      |UNION ALL
      |SELECT 'value', count(*),
      |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       count(DISTINCT CAST(value AS DECIMAL(14,2))),
      |       CAST(min(CAST(value AS DECIMAL(14,2))) AS VARCHAR),
      |       CAST(max(CAST(value AS DECIMAL(14,2))) AS VARCHAR)
      |FROM events""".stripMargin

  /** Equi-width histogram with the same clamped floor arithmetic (and
   *  the same hi==lo -> bucket 0 degenerate-data guard). */
  val eventHistogram: String =
    s"""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
       |SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE
       |         least(floor((value - lo) / ((hi - lo) / ${AnalyticsQueries.HistBuckets})),
       |               ${AnalyticsQueries.HistBuckets - 1}) END AS INTEGER) AS bucket,
       |       count(*) AS n
       |FROM events CROSS JOIN b GROUP BY 1""".stripMargin

  val clickPurchaseMatrix: String =
    """WITH c AS (
      |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n_clicks
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (
      |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n_purch
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT coalesce(c.user_id, p.user_id) AS user_id,
      |       coalesce(c.day, p.day) AS day,
      |       coalesce(n_clicks, 0) AS n_clicks,
      |       coalesce(n_purch, 0) AS n_purch
      |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id AND c.day = p.day""".stripMargin

  val topBrands: String =
    """SELECT p_brand,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty,
      |       count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY qty DESC, p_brand LIMIT 10""".stripMargin

  private val blobHexSql =
    "upper(md5(text) || md5(text || '1') || md5(text || '2') || md5(text || '3'))"

  val mmMeta: String =
    s"""SELECT doc_id,
       |  CAST(octet_length(unhex(md5(text) || md5(text || '1') || md5(text || '2') || md5(text || '3'))) AS INTEGER) AS n_bytes,
       |  upper(substr(md5(text), 1, 8)) AS magic
       |FROM documents""".stripMargin

  val mmFrames: String =
    s"""WITH b AS (SELECT doc_id, $blobHexSql AS hx FROM documents)
       |SELECT doc_id, CAST(u.i AS INTEGER) AS frame_idx,
       |       substr(hx, u.i * 32 + 1, 16) AS frame_hex
       |FROM b CROSS JOIN (VALUES (0),(1),(2),(3)) u(i)""".stripMargin

  /** Nearest-neighbor 8x8 -> 4x4 byte gather, recomputed on the blob's
   *  hex form: byte p (1-based) is hex chars (p-1)*2+1..+2. */
  val mmResize: String = {
    val ps = for { r <- 0 until 8 by 2; c <- 0 until 8 by 2 } yield r * 8 + c + 1
    val slices = ps.map(p => s"substr(hx, ${(p - 1) * 2 + 1}, 2)").mkString(" || ")
    s"""WITH b AS (SELECT doc_id, $blobHexSql AS hx FROM documents)
       |SELECT doc_id, $slices AS resized_hex FROM b""".stripMargin
  }

  /** The decode stub's 16-bin high-nibble byte histogram, recomputed from
   *  the blob's hex form: byte i's high nibble is hex char 2i+1 (1-based),
   *  so collect those chars and count occurrences of each hex digit. */
  val mmFeatures: String =
    """WITH b AS (
      |  SELECT doc_id,
      |         md5(text) || md5(text || '1') || md5(text || '2') || md5(text || '3') AS hx
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, array_to_string(
      |    list_transform(range(0, 64), i -> substr(hx, CAST(2*i+1 AS INT), 1)), '') AS nib
      |  FROM b)
      |SELECT doc_id, CAST(d.i AS INTEGER) AS bin,
      |       CAST(length(nib) - length(replace(nib,
      |         substr('0123456789abcdef', CAST(d.i + 1 AS INT), 1), '')) AS BIGINT) AS cnt
      |FROM n CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
      |                          (8),(9),(10),(11),(12),(13),(14),(15)) d(i)""".stripMargin

  /** Mirrors [[PipelineQueries.mmDecodePng]]: the PNG fixture
   *  generator's raw-PIXEL statistics (`tools.PngFixture.expectedRows`
   *  — pure arithmetic over the deterministic pixel definition, no PNG
   *  bytes, no ImageIO) embedded as a VALUES literal, the sign-table
   *  device. The Spark side decodes the COMMITTED encoded bytes, so a
   *  hash match proves the real decode round-trips the generator spec
   *  — the two sides share only the pixel-function constants, never a
   *  decoded value. */
  val mmDecodePng: String = {
    val rows = graft.tools.PngFixture.expectedRows
      .map { case (id, w, h, csv) => s"($id, $w, $h, '$csv')" }
      .mkString(",\n  ")
    s"""SELECT CAST(img_id AS BIGINT) AS img_id,
       |       CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(img_id, width, height, hist_csv)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmDecodeJpeg]]: the JPEG fixture
   *  generator's raw BLOCK statistics (`tools.JpegFixture.expectedRows`
   *  — pure arithmetic over the deterministic 16×16 gray-block
   *  definition, no JPEG bytes, no ImageIO) embedded as a VALUES
   *  literal. Lossiness is absorbed by the fixture design (flat
   *  neutral-chroma blocks, mid-bin levels), so the compare stays an
   *  exact hash like every other oracle. */
  val mmDecodeJpeg: String = {
    val rows = graft.tools.JpegFixture.expectedRows
      .map { case (id, w, h, csv) => s"($id, $w, $h, '$csv')" }
      .mkString(",\n  ")
    s"""SELECT CAST(img_id AS BIGINT) AS img_id,
       |       CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(img_id, width, height, hist_csv)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmDecodeBmp]]: the remux fixture's
   *  BMP-arm raw BLOCK statistics
   *  (`tools.ImageRemuxFixture.expectedBmpDecodeRows` — pure
   *  arithmetic, no BMP bytes, no ImageIO) as VALUES literals; BMP is
   *  uncompressed, so the compare is exact with no tolerance
   *  engineering anywhere. */
  val mmDecodeBmp: String = {
    val rows = graft.tools.ImageRemuxFixture.expectedBmpDecodeRows
      .map { case (id, w, h, csv) => s"($id, $w, $h, '$csv')" }
      .mkString(",\n  ")
    s"""SELECT CAST(img_id AS BIGINT) AS img_id,
       |       CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(img_id, width, height, hist_csv)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmDecodeResize]]: the PNG fixture
   *  generator's raw-pixel statistics AT THE SAMPLED COORDINATES
   *  (`tools.PngFixture.expectedResizedRows` — nearest-neighbor
   *  arithmetic over the pixel definition, no bytes, no ImageIO) as a
   *  VALUES literal. */
  val mmDecodeResize: String = {
    val rows = graft.tools.PngFixture
      .expectedResizedRows(graft.queries.PipelineQueries.ResizeFactor)
      .map { case (id, w, h, csv) => s"($id, $w, $h, '$csv')" }
      .mkString(",\n  ")
    s"""SELECT CAST(img_id AS BIGINT) AS img_id,
       |       CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(img_id, width, height, hist_csv)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmDecodeWav]]: the WAV fixture
   *  generator's raw-SAMPLE statistics (`tools.WavFixture.expectedRows`
   *  — pure arithmetic over the deterministic sample definition, no
   *  WAV container, no AudioSystem) embedded as a VALUES literal. The
   *  Spark side decodes the COMMITTED encoded bytes, so a hash match
   *  proves the real decode round-trips the generator spec. */
  val mmDecodeWav: String = {
    val rows = graft.tools.WavFixture.expectedRows
      .map { case (id, r, c, n, csv) => s"($id, $r, $c, $n, '$csv')" }
      .mkString(",\n  ")
    s"""SELECT CAST(clip_id AS BIGINT) AS clip_id,
       |       CAST(sample_rate AS BIGINT) AS sample_rate,
       |       CAST(channels AS BIGINT) AS channels,
       |       CAST(n_samples AS BIGINT) AS n_samples,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(clip_id, sample_rate, channels, n_samples, hist_csv)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.dedupEval]] by recomputing BOTH sides
   *  of the recall fraction: the exact shingle-Jaccard pairs AND the
   *  portable md5-60 minhash signatures, bands, and candidate join —
   *  the whole banding mechanism re-derived, not trusted. Same
   *  decimal-text band-key concatenation, same floor/least band
   *  arithmetic on identical rationals. */
  val dedupEval: String = {
    val slots = graft.queries.PipelineQueries.EvalSlots
    val bands = graft.queries.PipelineQueries.EvalBands
    val rows = slots / bands
    val minJ = graft.queries.PipelineQueries.EvalMinJ
    val anchor = graft.queries.PipelineQueries.EvalAnchorMod
    def h60(e: String) = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
    val slotCols = (0 until slots)
      .map(i => s"min(${h60(s"CAST(h AS VARCHAR) || ':$i'")}) AS m$i")
      .mkString(",\n         ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rows).map(r => s"m${b * rows + r}").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, ${h60(s"$key")} AS bk FROM slots"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(ws) >= 3
       |         THEN list_transform(range(0, len(ws) - 2),
       |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
       |         ELSE [] END)) AS sh
       |  FROM w),
       |shh AS (SELECT doc_id, ${h60("sh")} AS h FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shh GROUP BY 1),
       |inter AS (
       |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS i
       |  FROM shh x JOIN shh y ON x.h = y.h AND x.doc_id < y.doc_id
       |  WHERE x.doc_id % $anchor = 0
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT id1, id2,
       |         least(CAST(floor((i / (s1.sz + s2.sz - i)) * 5) AS BIGINT), 4) AS j_band
       |  FROM inter
       |  JOIN sizes s1 ON id1 = s1.doc_id
       |  JOIN sizes s2 ON id2 = s2.doc_id
       |  WHERE i / (s1.sz + s2.sz - i) >= $minJ),
       |slots AS (
       |  SELECT doc_id,
       |         $slotCols
       |  FROM shh GROUP BY 1),
       |banded AS (
       |  $bandSelects),
       |caught AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT e.j_band,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(count(c.id1) AS BIGINT) AS n_caught,
       |       round(count(c.id1) / count(*), 4) AS recall_r
       |FROM exact e LEFT JOIN caught c USING (id1, id2)
       |GROUP BY 1""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textEntropy]] relationally: one row per
   *  CHARACTER (fine at oracle scale; the Spark side is a kernel for
   *  exactly this reason), per-(doc, char) counts, the identical
   *  floored micro-nat term — ((c/n)·ln(n/c))·1e6, left-associated —
   *  summed as BIGINT. Empty docs keep a zero row via LEFT JOIN. */
  val textEntropy: String =
    """WITH ch AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS chr
      |  FROM documents),
      |-- regexp_split_to_array('', '') yields [''] — one empty-string
      |-- element — which would give an EMPTY doc n_cp = 1; drop it so
      |-- the LEFT JOIN's zero row actually fires (non-empty docs never
      |-- produce empty chars)
      |chf AS (SELECT doc_id, chr FROM ch WHERE len(chr) > 0),
      |c AS (SELECT doc_id, chr, count(*) AS c FROM chf GROUP BY 1, 2),
      |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_cp FROM c GROUP BY 1),
      |agg AS (
      |  SELECT c.doc_id, n.n_cp,
      |         CAST(count(*) AS BIGINT) AS n_distinct_chars,
      |         CAST(sum(CAST(floor(c / CAST(n_cp AS DOUBLE)
      |                             * ln(CAST(n_cp AS DOUBLE) / c)
      |                             * 1000000.0) AS BIGINT)) AS BIGINT) AS entropy_micro
      |  FROM c JOIN n USING (doc_id) GROUP BY 1, 2)
      |SELECT d.doc_id,
      |       coalesce(a.n_cp, 0) AS n_cp,
      |       coalesce(a.n_distinct_chars, 0) AS n_distinct_chars,
      |       coalesce(a.entropy_micro, 0) AS entropy_micro
      |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Mirrors [[PipelineQueries.classifyTrain]] by training
   *  INDEPENDENTLY: the same featurization (md5-prefix buckets mod
   *  ClassifyDim over \s+ tokens of lower(text)), the same rational
   *  sigmoid and integer-micro quantization, unrolled as a
   *  [[PipelineQueries.TrainIters]]-deep CTE chain (the bpe_learn
   *  device — DuckDB runs the whole gradient-descent learner itself,
   *  so a hash match proves the LEARNER reproduces, not one scoring
   *  pass). Every cross-row sum is a BIGINT sum of floored micro
   *  terms; the only doubles are per-row expressions on identical
   *  operands. */
  /** The classifier-training CTE prefix (features + unrolled GD
   *  steps ending in `w<TrainIters>`) shared by [[classifyTrain]] and
   *  [[classifyEval]]. */
  private def classifyTrainPrefix: String = {
    val dim = graft.functions.VectorMath.ClassifyDim
    val iters = graft.queries.PipelineQueries.TrainIters
    val steps = (1 to iters).map { k =>
      val prev = s"w${k - 1}"
      s"""m$k AS (
         |  SELECT f.doc_id, f.y, f.n_words,
         |         CAST(SUM(CAST(floor(CAST(w.wm * f.c AS DOUBLE) / f.n_words) AS BIGINT)) AS BIGINT) AS mm
         |  FROM f JOIN $prev w USING (bucket) GROUP BY 1, 2, 3),
         |p$k AS (
         |  SELECT doc_id,
         |         ((0.5 + (mm / 1000000.0) / (2.0 * (1.0 + abs(mm / 1000000.0)))) - y) AS pd
         |  FROM m$k),
         |g$k AS (
         |  SELECT f.bucket,
         |         CAST(SUM(CAST(floor(p.pd * f.c * 1000000.0 / f.n_words) AS BIGINT)) AS BIGINT) AS grad
         |  FROM f JOIN p$k p USING (doc_id) GROUP BY 1),
         |w$k AS (
         |  SELECT w.bucket,
         |         CAST(w.wm - CAST(floor(CAST(coalesce(g.grad, 0) AS DOUBLE) / (SELECT nd FROM n)) AS BIGINT) AS BIGINT) AS wm
         |  FROM $prev w LEFT JOIN g$k g USING (bucket))""".stripMargin
    }.mkString(",\n")
    s"""tok AS (
       |  SELECT doc_id, CAST(lang = 'en' AS INT) AS y,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, y, CAST(len(ws) AS BIGINT) AS n_words,
       |         CAST('0x' || substr(md5(w.w), 1, 6) AS BIGINT) % $dim AS bucket,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM tok, unnest(ws) w(w)
       |  GROUP BY 1, 2, 3, 4),
       |n AS (SELECT count(DISTINCT doc_id) AS nd FROM f),
       |w0 AS (SELECT CAST(i AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS wm
       |       FROM range(0, $dim) t(i)),
       |$steps""".stripMargin
  }

  val classifyTrain: String = {
    val iters = graft.queries.PipelineQueries.TrainIters
    s"""WITH $classifyTrainPrefix
       |SELECT bucket, wm AS w_micro FROM w$iters""".stripMargin
  }

  /** Mirrors [[PipelineQueries.classifyEval]]: the FULL independent
   *  training chain (shared [[classifyTrainPrefix]] — the oracle
   *  learns its own weights), then one scoring pass with the final
   *  weight table and the (label, margin-sign) confusion rollup. */
  val classifyEval: String = {
    val iters = graft.queries.PipelineQueries.TrainIters
    s"""WITH $classifyTrainPrefix,
       |sc AS (
       |  SELECT f.doc_id, f.y,
       |         CAST(SUM(CAST(floor(CAST(w.wm * f.c AS DOUBLE) / f.n_words) AS BIGINT)) AS BIGINT) AS mm
       |  FROM f JOIN w$iters w USING (bucket) GROUP BY 1, 2)
       |SELECT CAST(y AS BIGINT) AS label_en, (mm > 0) AS pred_en,
       |       count(*) AS n
       |FROM sc GROUP BY 1, 2""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmProbeMp4]]: the MP4 fixture
   *  generator's raw-definition metadata (`tools.Mp4Fixture
   *  .expectedRows` — pure arithmetic over the clip constants, no
   *  bytes, no parser) embedded as a VALUES literal. The Spark side
   *  walks the COMMITTED box bytes, so a hash match proves the strict
   *  ISO BMFF parse round-trips the generator layout. */
  val mmProbeMp4: String = {
    val rows = graft.tools.Mp4Fixture.expectedRows
      .map { case (id, b, ts, ms, tr, md) => s"($id, '$b', $ts, $ms, $tr, $md)" }
      .mkString(",\n  ")
    s"""SELECT CAST(clip_id AS BIGINT) AS clip_id, brand,
       |       CAST(timescale AS BIGINT) AS timescale,
       |       CAST(duration_ms AS BIGINT) AS duration_ms,
       |       CAST(n_tracks AS BIGINT) AS n_tracks,
       |       CAST(mdat_bytes AS BIGINT) AS mdat_bytes
       |FROM (VALUES
       |  $rows) AS t(clip_id, brand, timescale, duration_ms, n_tracks, mdat_bytes)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmFramesMjpeg]]: the AVI fixture
   *  generator's raw BLOCK statistics (`tools.AviFixture.expectedRows`
   *  — pure arithmetic over the per-frame gray-block definition, no
   *  AVI bytes, no ImageIO) embedded as a VALUES literal. The Spark
   *  side walks the COMMITTED RIFF container and decodes every frame,
   *  so a hash match proves genuine multi-frame video decode —
   *  lossiness absorbed by the flat mid-bin fixture design, compare
   *  exact like every other oracle. */
  val mmFramesMjpeg: String = {
    val rows = graft.tools.AviFixture.expectedRows
      .map { case (id, n, w, h, us, csv) =>
        s"($id, $n, $w, $h, $us, '$csv')"
      }
      .mkString(",\n  ")
    s"""SELECT CAST(clip_id AS BIGINT) AS clip_id,
       |       CAST(n_frames AS BIGINT) AS n_frames,
       |       CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height,
       |       CAST(us_per_frame AS BIGINT) AS us_per_frame,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(clip_id, n_frames, width, height, us_per_frame, hist_csv)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmFramesMp4]]: the MP4 re-mux
   *  fixture's raw BLOCK statistics
   *  (`tools.Mp4RemuxFixture.expectedRows` — pure arithmetic over
   *  the shared per-frame gray-block definition, no MP4 bytes, no
   *  ImageIO) as VALUES literals, INCLUDING the codec decoy's
   *  quarantine sentinel row — the oracle pins the routing boundary
   *  (an 'avc1' stsd must quarantine), not just the happy path. */
  val mmFramesMp4: String = {
    val rows = graft.tools.Mp4RemuxFixture.expectedRows
      .map { case (id, n, w, h, us, csv) =>
        s"($id, $n, $w, $h, $us, '$csv')"
      }
      .mkString(",\n  ")
    s"""SELECT CAST(clip_id AS BIGINT) AS clip_id,
       |       CAST(n_frames AS BIGINT) AS n_frames,
       |       CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height,
       |       CAST(us_per_frame AS BIGINT) AS us_per_frame,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(clip_id, n_frames, width, height, us_per_frame, hist_csv)""".stripMargin
  }

  // ---- mergeable-sketch contracts (SketchQueries) --------------------------
  // Exact values recomputed relationally; the sketch estimates are
  // asserted Spark-side as within-tolerance booleans (literal TRUE
  // here), same contract pattern as uv_approx / value_quantiles.

  val hllDistinct: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS hll_ok
      |FROM events GROUP BY event_type
      |UNION ALL
      |SELECT '__all__', count(DISTINCT user_id), true FROM events""".stripMargin

  val thetaSets: String =
    """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT
      |  count(*) FILTER (WHERE c.user_id IS NOT NULL AND p.user_id IS NOT NULL)
      |    AS n_inter,
      |  count(*) AS n_union,
      |  count(*) FILTER (WHERE c.user_id IS NOT NULL AND p.user_id IS NULL)
      |    AS n_diff,
      |  true AS inter_ok, true AS union_ok, true AS diff_ok
      |FROM c FULL JOIN p ON c.user_id = p.user_id""".stripMargin

  val kllQuantiles: String =
    """SELECT event_type, count(*) AS n,
      |       round(quantile_cont(value, 0.5), 4) AS p50_r,
      |       round(quantile_cont(value, 0.95), 4) AS p95_r,
      |       true AS rank50_ok, true AS rank95_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** approx_top_k with maxItemsTracked >= distinct count never evicts:
   *  counts are exact, so the oracle is the plain relational top-k.
   *  The rank <= 5 guard mirrors the Spark side's k=5: without it the
   *  oracle returns EVERY type ranked and only agrees while the data
   *  happens to have exactly 5 types (SketchQueriesSpec proves the
   *  guard with a 7-type fixture). */
  val heavyHitters: String =
    """SELECT rank, event_type, n FROM (
      |  SELECT CAST(row_number() OVER (ORDER BY n DESC, event_type) AS BIGINT)
      |           AS rank, event_type, n
      |  FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1) t) r
      |WHERE rank <= 5""".stripMargin

  /** Item ties at the top-k boundary make returned items engine-
   *  dependent; the deterministic projection is the rank -> count
   *  sequence (items dropped on both sides). */
  val heavyUsers: String =
    """SELECT CAST(row_number() OVER (ORDER BY n DESC) AS BIGINT) AS rank, n
      |FROM (SELECT user_id, count(*) AS n FROM events GROUP BY 1
      |      ORDER BY n DESC, user_id LIMIT 10) t""".stripMargin

  /** Mirrors [[SketchQueries.countMin]]: RE-DERIVES the full d x w
   *  counter matrix — same whitespace words, same md5-60 word hash
   *  ('0x'-CAST of 15 hex chars ≡ Spark's conv(...,16,10)), same
   *  enhanced-double-hashing positions (the decontaminateBloom
   *  arithmetic), counters as sums — then probes the same exact-top-K
   *  word set and takes the same row-wise min. Deterministic end to
   *  end; no tolerance contract needed. */
  val skCountMin: String = {
    val d = graft.queries.SketchQueries.CmDepth
    val k = graft.queries.SketchQueries.CmTopK
    val mask = (graft.queries.SketchQueries.CmWidth - 1).toLong
    val pos = s"((hh & 1048575) + i.i * ((hh >> 20) & 1048575)" +
      s" + ((i.i * (i.i - 1)) // 2) * ((hh >> 40) & 1048575)) & $mask"
    s"""WITH w AS (
       |  SELECT list_filter(regexp_split_to_array(text, '\\s+'),
       |                     x -> len(x) > 0) AS lst
       |  FROM documents),
       |t AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(lst) AS word FROM w) GROUP BY 1),
       |h AS (SELECT word, c,
       |             CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS hh
       |      FROM t),
       |cells AS (
       |  SELECT i.i AS r, $pos AS p, CAST(sum(c) AS BIGINT) AS cnt
       |  FROM h CROSS JOIN LATERAL unnest(range(0, $d)) i(i)
       |  GROUP BY 1, 2),
       |top AS (SELECT word, c, hh FROM h ORDER BY c DESC, word LIMIT $k),
       |pq AS (
       |  SELECT word, c, i.i AS r, $pos AS p
       |  FROM top CROSS JOIN LATERAL unnest(range(0, $d)) i(i))
       |SELECT pq.word, pq.c AS n_exact,
       |       CAST(min(cells.cnt) AS BIGINT) AS n_est,
       |       CAST(min(cells.cnt) - pq.c AS BIGINT) AS overcount
       |FROM pq JOIN cells USING (r, p)
       |GROUP BY pq.word, pq.c""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.graphTriangles]] with the same
   *  degree-orientation construction: co-order part pairs → distinct
   *  undirected edges → lexicographic (deg, node) total order
   *  (row-value comparisons, never a packed deg·2³²+node integer —
   *  exact at any id width) → oriented wedge join closed by one
   *  equi-join. Counts are exact integers; gcc divides the two once
   *  (HUGEINT sums cast back to BIGINT). */
  val graphTriangles: String =
    """WITH mem AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM mem a JOIN mem b ON a.o = b.o AND a.p < b.p),
      |deg AS (
      |  SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges) t
      |  GROUP BY 1),
      |ori AS (
      |  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
      |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS d,
      |         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg END AS dd
      |  FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
      |tri AS (
      |  SELECT count(*) AS n_triangles
      |  FROM ori e1 JOIN ori e2 ON e1.s = e2.s AND (e1.dd, e1.d) < (e2.dd, e2.d)
      |  JOIN ori e3 ON e3.s = e1.d AND e3.d = e2.d),
      |ns AS (SELECT count(*) AS n_nodes,
      |              CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
      |       FROM deg),
      |es AS (SELECT count(*) AS n_edges FROM edges)
      |SELECT ns.n_nodes, es.n_edges, ns.n_wedges, tri.n_triangles,
      |       round(3.0 * tri.n_triangles / nullif(CAST(ns.n_wedges AS DOUBLE), 0), 6) AS gcc_r
      |FROM ns, es, tri""".stripMargin

  /** Mirrors [[AnalyticsQueries.graphKcore]] by UNROLLING the peeling
   *  to a fixed depth (chained MATERIALIZED CTEs: per level, degree
   *  agg → below-k drop set → anti-filtered edge set) and FAILING
   *  LOUD via error() if the last level still drops nodes (the
   *  unigram-DP unroll-guard device) — a corpus needing deeper
   *  peeling surfaces as an oracle error, never a silent mismatch. */
  val graphKcore: String = {
    val k = AnalyticsQueries.KCoreK
    val depth = 16
    val parts = scala.collection.mutable.ArrayBuffer(
      """mem AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)""",
      """e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM mem a JOIN mem b ON a.o = b.o AND a.p < b.p)""".stripMargin)
    for (i <- 1 to depth) {
      parts += s"""d$i AS MATERIALIZED (
        |  SELECT node FROM (
        |    SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) t
        |  GROUP BY 1 HAVING count(*) < $k)""".stripMargin
      parts += s"""e$i AS MATERIALIZED (
        |  SELECT * FROM e${i - 1}
        |  WHERE u NOT IN (SELECT node FROM d$i)
        |    AND v NOT IN (SELECT node FROM d$i))""".stripMargin
    }
    parts += s"""g AS (
      |  SELECT CASE WHEN (SELECT count(*) FROM d$depth) > 0
      |              THEN error('kcore oracle: peeling exceeds the unroll depth $depth')
      |              ELSE 1 END AS ok)""".stripMargin
    "WITH " + parts.mkString(",\n") + "\n" +
      s"""SELECT node, CAST(count(*) AS BIGINT) AS core_deg
         |FROM (SELECT u AS node FROM e$depth
         |      UNION ALL SELECT v FROM e$depth) t, g
         |WHERE g.ok = 1 GROUP BY node""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.graphPagerank]]: same node encoding,
   *  same symmetrized distinct edge set, and the damping update
   *  restated as a generated [[AnalyticsQueries.PrIters]]-level
   *  chained CTE (the bpe_learn device) — the oracle ITERATES
   *  INDEPENDENTLY rather than echoing Spark's final ranks. Every
   *  floor is a double quotient of exactly-representable ints
   *  (< 2^53), so both engines land on identical micro-unit ranks. */
  val graphPagerank: String = {
    val iters = AnalyticsQueries.PrIters
    val scale = AnalyticsQueries.PrScale
    val base = scale * 15 / 100
    val chain = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         CAST($base + floor((sum(CAST(floor(r.rank / e.outdeg) AS BIGINT)) * 85) / 100.0) AS BIGINT) AS rank
         |  FROM ed e JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN d USING (src)),
       |r0 AS (SELECT src AS node, CAST($scale AS BIGINT) AS rank FROM d),
       |$chain
       |SELECT node, rank AS rank_micro FROM r$iters""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.graphPpr]] by RECOMPUTING
   *  INDEPENDENTLY: same backbone (re-derived from lineitem — the
   *  oracle never sees the shared artifact), same seed rule, the
   *  teleport-at-seeds pagerank iteration unrolled as chained
   *  MATERIALIZED CTEs with the identical floored integer micro-unit
   *  arithmetic (the graphPagerank device). */
  val graphPpr: String = {
    val iters = AnalyticsQueries.PrIters
    val scale = AnalyticsQueries.PrScale
    val base = scale * 15 / 100
    val mod = AnalyticsQueries.BfsSeedMod
    val minW = AnalyticsQueries.LpaMinWeight
    val chain = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |         CAST(CASE WHEN e.dst % $mod = 0 THEN $base ELSE 0 END +
         |              floor((sum(CAST(floor(r.rank / e.outdeg) AS BIGINT)) * 85) / 100.0) AS BIGINT) AS rank
         |  FROM ed e JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH mem AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |be AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v
       |  FROM mem a JOIN mem b ON a.o = b.o AND a.p < b.p
       |  GROUP BY 1, 2 HAVING count(*) >= $minW),
       |e AS (SELECT u AS src, v AS dst FROM be UNION ALL SELECT v, u FROM be),
       |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |ed AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg FROM e JOIN d USING (src)),
       |r0 AS (
       |  SELECT src AS node,
       |         CAST(CASE WHEN src % $mod = 0 THEN $scale ELSE 0 END AS BIGINT) AS rank
       |  FROM d),
       |$chain
       |SELECT node, rank AS rank_micro FROM r$iters""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.graphLpa]] by PROPAGATING
   *  INDEPENDENTLY: same weight-thresholded backbone, same
   *  self-loop adjacency, the per-round most-frequent-label argmax
   *  restated as a row_number window (count DESC, label ASC —
   *  exactly the max(struct(cnt, −label)) rule), unrolled
   *  [[AnalyticsQueries.LpaIters]] levels (the graphPagerank chained
   *  CTE device; MATERIALIZED — each level is referenced by the
   *  next's join). */
  val graphLpa: String = {
    val iters = AnalyticsQueries.LpaIters
    val minW = AnalyticsQueries.LpaMinWeight
    val parts = scala.collection.mutable.ArrayBuffer(
      """mem AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)""",
      s"""e AS MATERIALIZED (
        |  SELECT a.p AS u, b.p AS v
        |  FROM mem a JOIN mem b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= $minW)""".stripMargin,
      """nd AS (SELECT DISTINCT u AS node FROM e UNION SELECT v FROM e)""",
      """adj AS MATERIALIZED (
        |  SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v, u FROM e
        |  UNION ALL SELECT node, node FROM nd)""".stripMargin,
      """l0 AS (SELECT node, node AS lbl FROM nd)""")
    for (i <- 1 to iters) {
      parts += s"""c$i AS MATERIALIZED (
        |  SELECT a.dst AS node, l.lbl, count(*) AS cnt
        |  FROM adj a JOIN l${i - 1} l ON l.node = a.src
        |  GROUP BY 1, 2)""".stripMargin
      parts += s"""l$i AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT node, lbl, row_number() OVER (
        |      PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
        |    FROM c$i) WHERE rn = 1)""".stripMargin
    }
    "WITH " + parts.mkString(",\n") +
      s"\nSELECT node, lbl AS community FROM l$iters"
  }

  /** Mirrors [[AnalyticsQueries.qMadOutliers]]: percentile ≡
   *  quantile_cont (the value_quantiles equivalence), identical
   *  filter and quotient expressions on identical doubles. */
  val qMadOutliers: String = {
    val k = AnalyticsQueries.MadK
    s"""WITH med AS (
       |  SELECT event_type, quantile_cont(value, 0.5) AS med
       |  FROM events GROUP BY 1),
       |st AS (
       |  SELECT e.event_type, med,
       |         quantile_cont(abs(e.value - med), 0.5) AS mad
       |  FROM events e JOIN med USING (event_type) GROUP BY 1, 2)
       |SELECT event_id, e.event_type, value,
       |  CAST(floor(((value - med) / mad) * 1000000.0) AS BIGINT) AS dev_micro
       |FROM events e JOIN st USING (event_type)
       |WHERE mad > 0.0 AND abs(value - med) > $k * mad""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.qMadOutliersApprox]]: the EXACT side
   *  re-derived (quantile_cont ≡ percentile), the contract booleans
   *  as literal TRUE — deterministic on this data, so the Spark
   *  side's sketch stats must flip ≤ 0.1% of flags and land within
   *  the 5% stat tolerance or the gate fails (the uv_approx /
   *  value_quantiles contract device). */
  val qMadOutliersApprox: String = {
    val k = AnalyticsQueries.MadK
    s"""WITH med AS (
       |  SELECT event_type, quantile_cont(value, 0.5) AS med
       |  FROM events GROUP BY 1),
       |st AS (
       |  SELECT e.event_type, med,
       |         quantile_cont(abs(e.value - med), 0.5) AS mad
       |  FROM events e JOIN med USING (event_type) GROUP BY 1, 2)
       |SELECT e.event_type, count(*) AS n,
       |       count(*) FILTER (WHERE mad > 0.0 AND
       |         abs(value - med) > $k * mad) AS n_flag_exact,
       |       true AS flags_close, true AS med_ok, true AS mad_ok
       |FROM events e JOIN st USING (event_type)
       |GROUP BY 1""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.graphBfs]] by SEARCHING INDEPENDENTLY:
   *  same backbone and seed rule, frontier expansion unrolled to a
   *  fixed depth as chained MATERIALIZED CTEs, FAILING LOUD via
   *  error() if the last frontier is non-empty (the kcore
   *  unroll-guard device) — measured eccentricity ≤ 7 at all SFs. */
  val graphBfs: String = {
    val depth = 16
    val mod = AnalyticsQueries.BfsSeedMod
    val minW = AnalyticsQueries.LpaMinWeight
    val parts = scala.collection.mutable.ArrayBuffer(
      """mem AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)""",
      s"""e AS MATERIALIZED (
        |  SELECT a.p AS u, b.p AS v
        |  FROM mem a JOIN mem b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= $minW)""".stripMargin,
      """adj AS MATERIALIZED (
        |  SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v, u FROM e)""".stripMargin,
      s"""k0 AS MATERIALIZED (
        |  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
        |  FROM adj WHERE src % $mod = 0)""".stripMargin)
    for (i <- 1 to depth) {
      parts += s"""f$i AS MATERIALIZED (
        |  SELECT DISTINCT a.dst AS node
        |  FROM adj a JOIN k${i - 1} k ON k.node = a.src AND k.dist = ${i - 1}
        |  WHERE a.dst NOT IN (SELECT node FROM k${i - 1}))""".stripMargin
      parts += s"""k$i AS MATERIALIZED (
        |  SELECT * FROM k${i - 1}
        |  UNION ALL SELECT node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
    }
    parts += s"""g AS (
      |  SELECT CASE WHEN (SELECT count(*) FROM f$depth) > 0
      |              THEN error('bfs oracle: frontier exceeds the unroll depth $depth')
      |              ELSE 1 END AS ok)""".stripMargin
    "WITH " + parts.mkString(",\n") +
      s"\nSELECT node, dist FROM k$depth, g WHERE g.ok = 1"
  }

  /** Mirrors [[AnalyticsQueries.qLinreg]]: same integer inputs
   *  (n_chars, whitespace token count), same DECIMAL-exact
   *  sufficient statistics, and the IDENTICAL parenthesization of
   *  every double quotient (the graphPagerank micro-unit device —
   *  IEEE ops on identical inputs in identical order). */
  val qLinreg: String =
    """WITH b AS (
      |  SELECT source,
      |         CAST(n_chars AS DECIMAL(18,0)) AS x,
      |         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
      |                w -> len(w) > 0)) AS DECIMAL(18,0)) AS y
      |  FROM documents),
      |s AS (
      |  SELECT source,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(count(*) AS DOUBLE) AS nd,
      |         CAST(sum(x) AS DOUBLE) AS sxd,
      |         CAST(sum(y) AS DOUBLE) AS syd,
      |         CAST(sum(x * x) AS DOUBLE) AS sxxd,
      |         CAST(sum(x * y) AS DOUBLE) AS sxyd,
      |         CAST(sum(y * y) AS DOUBLE) AS syyd
      |  FROM b GROUP BY 1),
      |d AS (
      |  SELECT *, ((nd * sxyd) - (sxd * syd)) AS numx,
      |         ((nd * sxxd) - (sxd * sxd)) AS denx,
      |         ((nd * syyd) - (syd * syd)) AS deny
      |  FROM s)
      |SELECT source, n,
      |  CAST(CASE WHEN denx <> 0.0
      |       THEN floor((numx / denx) * 1000000.0) END AS BIGINT) AS slope_micro,
      |  CAST(CASE WHEN denx <> 0.0
      |       THEN floor(((syd - ((numx / denx) * sxd)) / nd) * 1000000.0) END AS BIGINT) AS intercept_micro,
      |  CAST(CASE WHEN denx <> 0.0 AND deny <> 0.0
      |       THEN floor(((numx * numx) / (denx * deny)) * 1000000.0) END AS BIGINT) AS r2_micro
      |FROM d""".stripMargin

  /** Mirrors [[PipelineQueries.textBigramKn]] by RE-DERIVING the whole
   *  Kneser-Ney model: same pair expansion, the four count statistics
   *  as windows over the bigram relation, and the smoothed
   *  probability spelled with the IDENTICAL parenthesization before
   *  the shared −ln micro-nat floor (the textBigramNll device). */
  val textBigramKn: String = {
    val d = graft.queries.PipelineQueries.KnDiscount
    val micro = graft.queries.PipelineQueries.NllMicro
    s"""WITH w AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, ws[i] AS a, ws[i+1] AS b
       |  FROM w, unnest(range(1, len(ws))) t(i) WHERE len(ws) >= 2),
       |bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM p GROUP BY a, b),
       |m0 AS (
       |  SELECT a, b, c_ab,
       |    CAST(sum(c_ab) OVER (PARTITION BY a) AS BIGINT) AS c_a,
       |    CAST(count(*) OVER (PARTITION BY a) AS BIGINT) AS n1p_a,
       |    CAST(count(*) OVER (PARTITION BY b) AS BIGINT) AS cont_b,
       |    CAST(count(*) OVER () AS BIGINT) AS tt
       |  FROM bg),
       |m AS (
       |  SELECT a, b,
       |    CAST(floor(-ln((greatest(CAST(c_ab AS DOUBLE) - $d, 0.0) +
       |      (($d * n1p_a) * (CAST(cont_b AS DOUBLE) / CAST(tt AS DOUBLE)))) /
       |      CAST(c_a AS DOUBLE)) * $micro) AS BIGINT) AS nll_micro
       |  FROM m0)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       CAST(sum(nll_micro) AS BIGINT) AS kn_nll_micro_sum
       |FROM p JOIN m USING (a, b) GROUP BY doc_id""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmPhashClusters]]: the banded-pair SQL
   *  nested as a subquery (the dedupClusters device), components via
   *  WITH RECURSIVE reach from every corpus id, representative =
   *  min id. Lazy: mmPhashNeardup is declared further down this
   *  object (the dedupSurvivors initialization-order rule). */
  lazy val mmPhashClusters: String = {
    val shift = graft.queries.PipelineQueries.PhashShift
    val ids = (graft.tools.PngFixture.expectedNeardupHashes(shift) ++
        graft.tools.ImageRemuxFixture.expectedNeardupHashes(shift))
      .map { case (id, _) => s"($id)" }.mkString(", ")
    s"""WITH RECURSIVE
       |pairs AS (SELECT id1, id2 FROM ($mmPhashNeardup) np),
       |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
       |          UNION SELECT id2, id1 FROM pairs),
       |ids(id) AS (VALUES $ids),
       |reach(node, l) AS (
       |  SELECT id, id FROM ids
       |  UNION
       |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node),
       |cl AS (SELECT node, min(l) AS cluster FROM reach GROUP BY node)
       |SELECT CAST(node AS BIGINT) AS img_id,
       |       CAST(cluster AS BIGINT) AS cluster,
       |       node = cluster AS is_survivor
       |FROM cl""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textTrigramKn]] by RE-DERIVING the
   *  whole interpolated-KN trigram model: same lowercased whitespace
   *  words, trigram types + an INDEPENDENT (b,c)-type relation for
   *  the continuation counts (the Spark side tags first-rows inside
   *  one windowed frame — different derivation, same integers), and
   *  the identical fixed-shape IEEE expression floor-quantized to
   *  micro-nats. */
  val textTrigramKn: String = {
    val d = graft.queries.PipelineQueries.KnDiscount
    val micro = graft.queries.PipelineQueries.NllMicro
    s"""WITH w AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, ws[i] AS a, ws[i+1] AS b, ws[i+2] AS c
       |  FROM w, unnest(range(1, len(ws) - 1)) t(i) WHERE len(ws) >= 3),
       |tg AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS c_abc FROM t GROUP BY 1, 2, 3),
       |bc AS (SELECT b, c FROM tg GROUP BY b, c),
       |bcs AS (
       |  SELECT b, c,
       |    CAST(count(*) OVER (PARTITION BY b) AS BIGINT) AS n1p_b_dot,
       |    CAST(count(*) OVER (PARTITION BY c) AS BIGINT) AS n1p_dot_c,
       |    CAST(count(*) OVER () AS BIGINT) AS tt2
       |  FROM bc),
       |m0 AS (
       |  SELECT a, b, c, c_abc,
       |    CAST(sum(c_abc) OVER (PARTITION BY a, b) AS BIGINT) AS c_ab,
       |    CAST(count(*) OVER (PARTITION BY a, b) AS BIGINT) AS n1p_ab,
       |    CAST(count(*) OVER (PARTITION BY b, c) AS BIGINT) AS n1p_dot_bc,
       |    CAST(count(*) OVER (PARTITION BY b) AS BIGINT) AS n1p_mid_b
       |  FROM tg),
       |m AS (
       |  SELECT a, b, c,
       |    CAST(floor(-ln(
       |      (greatest(CAST(c_abc AS DOUBLE) - $d, 0.0) +
       |        (($d * n1p_ab) *
       |          ((greatest(CAST(n1p_dot_bc AS DOUBLE) - $d, 0.0) +
       |            (($d * n1p_b_dot) *
       |              (CAST(n1p_dot_c AS DOUBLE) / CAST(tt2 AS DOUBLE)))) /
       |            CAST(n1p_mid_b AS DOUBLE)))) /
       |      CAST(c_ab AS DOUBLE)) * $micro) AS BIGINT) AS nll_micro
       |  FROM m0 JOIN bcs USING (b, c))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       |       CAST(sum(nll_micro) AS BIGINT) AS kn3_nll_micro_sum
       |FROM t JOIN m USING (a, b, c) GROUP BY doc_id""".stripMargin
  }

  /** Mirrors [[PipelineQueries.textCollocations]]: same lowercased
   *  whitespace words, same pair expansion and min-count cut, the
   *  lift as ONE double quotient of integer counts in the identical
   *  order, same total-order top-K cut. */
  val textCollocations: String = {
    val minC = graft.queries.PipelineQueries.CollocMinCount
    val topK = graft.queries.PipelineQueries.CollocTopK
    s"""WITH w AS (
       |  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(ws) AS w FROM w) GROUP BY w),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ntok FROM uni),
       |bg AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS c12 FROM (
       |    SELECT ws[i] AS a, ws[i+1] AS b
       |    FROM w, unnest(range(1, len(ws))) t(i) WHERE len(ws) >= 2)
       |  GROUP BY a, b HAVING count(*) >= $minC)
       |SELECT a AS w1, b AS w2, c12,
       |  CAST(floor((CAST(ntok AS DOUBLE) * 1000000.0) /
       |    (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) * c12) AS BIGINT) AS lift_micro
       |FROM bg JOIN uni u1 ON bg.a = u1.w JOIN uni u2 ON bg.b = u2.w, tot
       |ORDER BY lift_micro DESC, w1, w2 LIMIT $topK""".stripMargin
  }

  /** Mirrors [[PipelineQueries.dedupContainment]]: the dedupNgram
   *  string-shingle recomputation with both asymmetric containment
   *  quotients (i/|S(A)|, i/|S(B)|) in place of the symmetric
   *  Jaccard, over the same re-derived wrapper augmentation. */
  val dedupContainment: String = {
    val thr = graft.queries.PipelineQueries.ContainmentThreshold
    val mod = graft.queries.PipelineQueries.ContainmentAugMod
    s"""WITH docs AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT -(doc_id + 1) AS doc_id, source,
       |         text || ' ' || array_to_string(list_reverse(
       |           list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)), ' ') AS text
       |  FROM documents
       |  WHERE doc_id % $mod = 0
       |    AND len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) >= 3),
       |w AS (
       |  SELECT doc_id, source,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM docs),
       |sh AS (
       |  SELECT doc_id, source, unnest(list_distinct(
       |    CASE WHEN len(ws) >= 3
       |         THEN list_transform(range(0, len(ws) - 2),
       |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
       |         ELSE [] END)) AS sh
       |  FROM w),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS i
       |  FROM sh x JOIN sh y
       |    ON x.sh = y.sh AND x.source = y.source AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2, i / s1.sz AS cont1, i / s2.sz AS cont2
       |FROM inter
       |JOIN sizes s1 ON id1 = s1.doc_id
       |JOIN sizes s2 ON id2 = s2.doc_id
       |WHERE greatest(i / s1.sz, i / s2.sz) >= $thr""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmPhash]]: the PNG fixture generator's
   *  raw-pixel luminance through an INDEPENDENT plain-Scala
   *  re-derivation of the pHash (`tools.PngFixture.refPhash64` via
   *  `expectedPhashRows` — no PNG bytes, no ImageIO, no shared code
   *  with MultimodalOps) as VALUES literals; a hash match proves both
   *  the decode and the DCT/median/threshold hash definition. */
  val mmPhash: String = {
    val rows = graft.tools.PngFixture
      .expectedPhashRows(graft.queries.PipelineQueries.PhashShift)
      .map { case (id, p, hv, hn) => s"($id, $p, $hv, $hn)" }
      .mkString(",\n  ")
    s"""SELECT CAST(img_id AS BIGINT) AS img_id,
       |       CAST(phash AS BIGINT) AS phash,
       |       CAST(ham_variant AS BIGINT) AS ham_variant,
       |       CAST(ham_next AS BIGINT) AS ham_next
       |FROM (VALUES
       |  $rows) AS t(img_id, phash, ham_variant, ham_next)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmPhashNeardup]]: the independent
   *  raw-pixel hashes of BOTH committed corpora (the PNG fixture and
   *  the PNG+JPEG remux fixture, via `refPhash64` — no PNG bytes, no
   *  JPEG bytes, no shared hash code; the corrupt decoy contributes
   *  no rows, mirroring the quarantine rule) as VALUES,
   *  then the banding RE-DERIVED in SQL — the same 28 C(8,2)
   *  block-pair tables as an offsets relation, packed 16-bit keys,
   *  candidate equi-join, exact `bit_count(xor(...))` verification —
   *  so the gate proves decode, hash definition, AND the
   *  banded-candidate + popcount-verify pipeline end to end.
   *  `(ph >> o) & 255` extracts bits o..o+7 identically under
   *  DuckDB's arithmetic and Spark's unsigned shift (the fill bits
   *  never reach the masked byte). */
  val mmPhashNeardup: String = {
    val shift = graft.queries.PipelineQueries.PhashShift
    val rows = (graft.tools.PngFixture.expectedNeardupHashes(shift) ++
        graft.tools.ImageRemuxFixture.expectedNeardupHashes(shift))
      .map { case (id, h) => s"($id, CAST($h AS BIGINT))" }
      .mkString(",\n  ")
    val combos = (0 until 8).combinations(2).toSeq.zipWithIndex
      .map { case (c, i) => s"($i, ${c(0) * 8}, ${c(1) * 8})" }
      .mkString(", ")
    val t = graft.queries.PipelineQueries.PhashNeardupMaxHamming
    s"""WITH h(id, ph) AS (VALUES
       |  $rows),
       |combos(tbl, o1, o2) AS (VALUES $combos),
       |keyed AS (
       |  SELECT id, ph, tbl,
       |         ((ph >> o1) & 255) * 256 + ((ph >> o2) & 255) AS key
       |  FROM h CROSS JOIN combos),
       |cand AS (
       |  SELECT DISTINCT x.id AS id1, y.id AS id2, x.ph AS h1, y.ph AS h2
       |  FROM keyed x JOIN keyed y
       |    ON x.tbl = y.tbl AND x.key = y.key AND x.id < y.id)
       |SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
       |       CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(h1, h2)) <= $t""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmFramesGif]]: the GIF fixture
   *  generator's raw PIXEL statistics (`tools.GifFixture.expectedRows`
   *  — pure arithmetic over the deterministic pixel definition, no
   *  GIF bytes, no ImageIO) embedded as a VALUES literal. The Spark
   *  side decodes the COMMITTED encoded bytes, so a hash match proves
   *  the real decode round-trips the generator spec EXACTLY (the
   *  codec is lossless — no tolerance device anywhere). */
  val mmFramesGif: String = {
    val rows = graft.tools.GifFixture.expectedRows
      .map { case (id, n, w, h, d, csv) => s"($id, $n, $w, $h, $d, '$csv')" }
      .mkString(",\n  ")
    s"""SELECT CAST(clip_id AS BIGINT) AS clip_id,
       |       CAST(n_frames AS BIGINT) AS n_frames,
       |       CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height,
       |       CAST(total_delay_cs AS BIGINT) AS total_delay_cs,
       |       hist_csv
       |FROM (VALUES
       |  $rows) AS t(clip_id, n_frames, width, height, total_delay_cs, hist_csv)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmAudioFeatures]]: the WAV fixture
   *  generator's raw-sample channel-0 statistics
   *  (`tools.WavFixture.expectedFeatureRows` — pure integer
   *  arithmetic over the deterministic sample definition, no WAV
   *  container, no AudioSystem) embedded as a VALUES literal. */
  val mmAudioFeatures: String = {
    val rows = graft.tools.WavFixture.expectedFeatureRows
      .map { case (id, nw, zc, en, pk, sil) =>
        s"($id, $nw, $zc, $en, $pk, $sil)" }
      .mkString(",\n  ")
    s"""SELECT CAST(clip_id AS BIGINT) AS clip_id,
       |       CAST(n_windows AS BIGINT) AS n_windows,
       |       CAST(zero_crossings AS BIGINT) AS zero_crossings,
       |       CAST(energy AS BIGINT) AS energy,
       |       CAST(peak_abs AS BIGINT) AS peak_abs,
       |       CAST(silent_windows AS BIGINT) AS silent_windows
       |FROM (VALUES
       |  $rows) AS t(clip_id, n_windows, zero_crossings, energy, peak_abs, silent_windows)""".stripMargin
  }

  // ---- entity resolution ---------------------------------------------------

  /** The shared linkage CTE prefix: catalog + deterministic mention
   *  derivation mirroring [[LinkageQueries.mentionsOf]] (single
   *  deletion, conditional second deletion, reversed junk), and the
   *  blocked verified candidates — the blocking predicate written as
   *  abs(len diff) ≤ 2, relationally equivalent to the Spark side's
   *  exploded (prefix, len + d) index keys, and FULL levenshtein
   *  where Spark uses the thresholded banded form (identical on every
   *  kept row: the thresholded form is exact within the budget). */
  private val erPrelude: String = {
    val h = LinkageQueries.HardMod
    val j = LinkageQueries.JunkMod
    val d = LinkageQueries.MaxDist
    def del(name: String, key: String) =
      s"substr($name, 1, 4 + $key % (length($name) - 4) - 1) || " +
        s"substr($name, 4 + $key % (length($name) - 4) + 1, 100)"
    s"""WITH ent AS (
       |  SELECT min(p_partkey) AS entity_id, p_name AS entity_name
       |  FROM part GROUP BY p_name),
       |d1 AS (
       |  SELECT p_partkey AS k, p_name AS clean,
       |         ${del("p_name", "p_partkey")} AS m1
       |  FROM part WHERE length(p_name) >= 6),
       |men AS (
       |  SELECT k AS mention_id, m1 AS mention, clean
       |  FROM d1 WHERE k % $h <> 0
       |  UNION ALL
       |  SELECT k, ${del("m1", "k")}, clean
       |  FROM d1 WHERE k % $h = 0 AND length(m1) >= 6
       |  UNION ALL
       |  SELECT -(p_partkey + 1), reverse(p_name), CAST(NULL AS VARCHAR)
       |  FROM part WHERE p_partkey % $j = 0),
       |cand AS (
       |  SELECT m.mention_id, m.mention, m.clean, e.entity_id,
       |         e.entity_name,
       |         CAST(levenshtein(m.mention, e.entity_name) AS BIGINT) AS lev
       |  FROM men m JOIN ent e
       |    ON substr(m.mention, 1, 3) = substr(e.entity_name, 1, 3)
       |   AND abs(length(e.entity_name) - length(m.mention)) <= $d
       |  WHERE levenshtein(m.mention, e.entity_name) <= $d),
       |cand2 AS (
       |  SELECT m.mention_id, m.mention, m.clean, e.entity_id,
       |         e.entity_name,
       |         CAST(levenshtein(m.mention, e.entity_name) AS BIGINT) AS lev
       |  FROM men m JOIN ent e
       |    ON (substr(m.mention, 1, 3) = substr(e.entity_name, 1, 3)
       |        OR substr(m.mention, -3, 3) = substr(e.entity_name, -3, 3))
       |   AND abs(length(e.entity_name) - length(m.mention)) <= $d
       |  WHERE levenshtein(m.mention, e.entity_name) <= $d)""".stripMargin
  }

  val erCandidates: String =
    s"""$erPrelude
       |SELECT mention_id, mention, entity_id, entity_name, lev
       |FROM cand""".stripMargin

  /** Mirrors [[LinkageQueries.erMatches]]: best per mention over the
   *  TWO-PASS candidate union (cand2 — the prefix-OR-suffix block
   *  join) via (lev, entity_id) rank — Spark's struct-min argmin has
   *  the same total order because entity_name is functionally
   *  determined by entity_id. */
  val erMatches: String =
    s"""$erPrelude,
       |best AS (
       |  SELECT mention_id, mention, entity_id, entity_name, lev,
       |         coalesce(entity_name = clean, false) AS is_correct,
       |         row_number() OVER (PARTITION BY mention_id
       |                            ORDER BY lev, entity_id) AS rk
       |  FROM cand2)
       |SELECT mention_id, mention, entity_id, entity_name, lev, is_correct
       |FROM best WHERE rk = 1""".stripMargin

  val erEval: String =
    s"""$erPrelude,
       |best AS (
       |  SELECT mention_id, clean, entity_name, lev,
       |         row_number() OVER (PARTITION BY mention_id
       |                            ORDER BY lev, entity_id) AS rk
       |  FROM cand2),
       |m AS (
       |  SELECT men.mention_id, b.entity_name, men.clean AS clean
       |  FROM men LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
       |    USING (mention_id))
       |SELECT count(*) AS n_mentions,
       |       count(entity_name) AS n_matched,
       |       count(*) FILTER (entity_name = clean) AS n_correct,
       |       CAST(count(entity_name) AS DOUBLE) / count(*) AS match_rate,
       |       CAST(count(*) FILTER (entity_name = clean) AS DOUBLE) /
       |         count(entity_name) AS precision
       |FROM m""".stripMargin

  /** Mirrors [[PipelineQueries.mmVideoNeardup]]: ALL THREE committed
   *  corpora's per-frame hashes from the raw pixel definitions
   *  ([[graft.tools.VideoDupFixture.expectedFramePhashes]] plus the
   *  mixed-container [[graft.tools.VideoRemuxFixture]]'s — through
   *  the fixtures' independent refPhash64; no GIF bytes, no JPEG
   *  bytes, no ImageIO — the AVI re-muxes' flat mid-bin mosaics
   *  round-trip the JPEG codec pixel-exactly, so raw arithmetic IS
   *  the decoded content) as VALUES literals, then the NEAR-DUP
   *  SEMANTICS re-derived
   *  relationally WITHOUT the banding device: ALL-PAIRS aligned
   *  frame join, xor + bit_count distances, a clip pair qualifies iff
   *  frame counts match and every aligned distance is within radius
   *  (max ≤ r over a complete count ≡ the Spark side's
   *  candidates-then-rollup). DuckDB's bit_count(BIGINT) counts
   *  two's-complement bits exactly like Long.bitCount (probe-checked
   *  on negatives). */
  val mmVideoNeardup: String = {
    val r = PipelineQueries.VideoFrameMaxHamming
    val rows = (graft.tools.VideoDupFixture.expectedFramePhashes ++
        graft.tools.VideoRemuxFixture.expectedFramePhashes ++
        graft.tools.Mp4RemuxFixture.expectedFramePhashes)
      .map { case (id, f, p) => s"($id, $f, CAST($p AS BIGINT))" }
      .mkString(",\n  ")
    s"""WITH fp AS (
       |  SELECT CAST(clip_id AS BIGINT) AS clip_id,
       |         CAST(frame AS BIGINT) AS frame, phash
       |  FROM (VALUES
       |  $rows) AS t(clip_id, frame, phash)),
       |cnt AS (SELECT clip_id, count(*) AS n FROM fp GROUP BY 1),
       |ali AS (
       |  SELECT x.clip_id AS id1, y.clip_id AS id2,
       |         count(*) AS n_aligned,
       |         max(bit_count(xor(x.phash, y.phash))) AS max_h,
       |         sum(bit_count(xor(x.phash, y.phash))) AS sum_h
       |  FROM fp x JOIN fp y
       |    ON x.frame = y.frame AND x.clip_id < y.clip_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2, c1.n AS n_frames,
       |       CAST(max_h AS BIGINT) AS max_hamming,
       |       CAST(sum_h AS BIGINT) AS sum_hamming
       |FROM ali
       |JOIN cnt c1 ON id1 = c1.clip_id
       |JOIN cnt c2 ON id2 = c2.clip_id
       |WHERE c1.n = c2.n AND n_aligned = c1.n AND max_h <= $r""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.graphComponents]]: backbone from
   *  lineitem, min-label closure via a recursive reachability CTE
   *  (the dedupClusters device), rolled to the size histogram. */
  val graphComponents: String = {
    val minW = AnalyticsQueries.LpaMinWeight
    s"""WITH RECURSIVE
       |mem AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v
       |  FROM mem a JOIN mem b ON a.o = b.o AND a.p < b.p
       |  GROUP BY 1, 2 HAVING count(*) >= $minW),
       |edges AS (SELECT u AS a, v AS b FROM e UNION SELECT v, u FROM e),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |reach(node, l) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT ed.a, r.l FROM edges ed JOIN reach r ON ed.b = r.node),
       |cl AS (SELECT node, min(l) AS cluster FROM reach GROUP BY node),
       |sz AS (SELECT cluster, count(*) AS s FROM cl GROUP BY cluster)
       |SELECT CAST(s AS BIGINT) AS component_size,
       |       CAST(count(*) AS BIGINT) AS n_components,
       |       CAST(s * count(*) AS BIGINT) AS n_nodes
       |FROM sz GROUP BY s""".stripMargin
  }

  /** Mirrors [[AnalyticsQueries.graphSssp]] by RE-DERIVING the
   *  weighted fixpoint: backbone + integer costs from lineitem, then
   *  FULL-relaxation Bellman–Ford rounds unrolled as MATERIALIZED
   *  CTEs (where Spark relaxes only the improved frontier — different
   *  derivation, same fixpoint), with the bfs unroll-guard device:
   *  error loud if the last round still improved any node. */
  val graphSssp: String = {
    val depth = 32
    val mod = AnalyticsQueries.BfsSeedMod
    val minW = AnalyticsQueries.LpaMinWeight
    val parts = scala.collection.mutable.ArrayBuffer(
      """mem AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)""",
      s"""e AS MATERIALIZED (
        |  SELECT a.p AS u, b.p AS v,
        |         1 + CAST(floor(100 / count(*)) AS BIGINT) AS cost
        |  FROM mem a JOIN mem b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= $minW)""".stripMargin,
      """adj AS MATERIALIZED (
        |  SELECT u AS src, v AS dst, cost FROM e
        |  UNION ALL SELECT v, u, cost FROM e)""".stripMargin,
      s"""d0 AS MATERIALIZED (
        |  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
        |  FROM adj WHERE src % $mod = 0)""".stripMargin)
    for (i <- 1 to depth) {
      parts += s"""d$i AS MATERIALIZED (
        |  SELECT coalesce(p.node, c.node) AS node,
        |         CASE WHEN p.dist IS NULL THEN c.nd
        |              WHEN c.nd IS NULL THEN p.dist
        |              ELSE least(p.dist, c.nd) END AS dist
        |  FROM d${i - 1} p FULL OUTER JOIN (
        |    SELECT a.dst AS node, min(k.dist + a.cost) AS nd
        |    FROM adj a JOIN d${i - 1} k ON k.node = a.src
        |    GROUP BY 1) c
        |  ON p.node = c.node)""".stripMargin
    }
    parts += s"""imp AS (
      |  SELECT count(*) AS n FROM d$depth x
      |  LEFT JOIN d${depth - 1} y USING (node)
      |  WHERE y.node IS NULL OR x.dist < y.dist)""".stripMargin
    parts += s"""g AS (
      |  SELECT CASE WHEN (SELECT n FROM imp) > 0
      |              THEN error('sssp oracle: still improving past the unroll depth $depth')
      |              ELSE 1 END AS ok)""".stripMargin
    "WITH " + parts.mkString(",\n") +
      s"\nSELECT node, dist FROM d$depth, g WHERE g.ok = 1"
  }

  /** Mirrors [[AnalyticsQueries.qForecast]]: same hour buckets, same
   *  DECIMAL-exact hourly sums, the identical gap-safe season join
   *  and once-per-cell double divisions. */
  val qForecast: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |         sum(CAST(value AS DECIMAL(14,2))) AS y
      |  FROM events GROUP BY 1, 2),
      |totals AS (
      |  SELECT event_type, count(*) AS n_hours FROM hourly GROUP BY 1),
      |scored AS (
      |  SELECT c.event_type, c.y - p.y AS err
      |  FROM hourly c JOIN hourly p
      |    ON c.event_type = p.event_type
      |   AND p.h = c.h - INTERVAL 24 HOURS),
      |agg AS (
      |  SELECT event_type, count(*) AS n_eval,
      |         sum(abs(err)) AS sae, sum(err) AS se
      |  FROM scored GROUP BY 1)
      |SELECT a.event_type, t.n_hours, a.n_eval,
      |       CAST(a.sae AS DOUBLE) / a.n_eval AS mae,
      |       CAST(a.se AS DOUBLE) / a.n_eval AS bias
      |FROM agg a JOIN totals t USING (event_type)""".stripMargin

  /** Mirrors [[LinkageQueries.erBlockingEval]]: the eval-specific
   *  mention mix (prefix-damaging deletions every 19th key), BOTH raw
   *  block joins with no verify (suffix pass restricted to
   *  different-prefix pairs — the engine's disjoint-union rule), and
   *  the per-pass + unioned metrics re-derived. */
  val erBlockingEval: String = {
    val pm = LinkageQueries.PrefixDamageMod
    val d = LinkageQueries.MaxDist
    def del(name: String, key: String) =
      s"substr($name, 1, 4 + $key % (length($name) - 4) - 1) || " +
        s"substr($name, 4 + $key % (length($name) - 4) + 1, 100)"
    s"""WITH men AS (
       |  SELECT p_partkey AS mention_id, p_name AS clean,
       |         CASE WHEN p_partkey % $pm = 0
       |              THEN substr(p_name, 1, 1) || substr(p_name, 3, 100)
       |              ELSE ${del("p_name", "p_partkey")} END AS mention
       |  FROM part WHERE length(p_name) >= 6),
       |ent AS (
       |  SELECT min(p_partkey) AS entity_id, p_name AS entity_name
       |  FROM part GROUP BY p_name),
       |bp AS (
       |  SELECT m.mention_id, m.clean, e.entity_name, 1 AS pass
       |  FROM men m JOIN ent e
       |    ON substr(m.mention, 1, 3) = substr(e.entity_name, 1, 3)
       |   AND abs(length(e.entity_name) - length(m.mention)) <= $d
       |  UNION ALL
       |  SELECT m.mention_id, m.clean, e.entity_name, 2
       |  FROM men m JOIN ent e
       |    ON substr(m.mention, -3, 3) = substr(e.entity_name, -3, 3)
       |   AND substr(m.mention, 1, 3) <> substr(e.entity_name, 1, 3)
       |   AND abs(length(e.entity_name) - length(m.mention)) <= $d),
       |c AS (
       |  SELECT count(*) FILTER (pass = 1) AS n_cand_prefix,
       |         count(*) FILTER (pass = 1 AND entity_name = clean)
       |           AS n_caught_prefix,
       |         count(*) AS n_cand_union,
       |         count(*) FILTER (entity_name = clean) AS n_caught_union
       |  FROM bp),
       |n AS (
       |  SELECT (SELECT count(*) FROM men) AS n_mentions,
       |         (SELECT count(*) FROM ent) AS n_entities)
       |SELECT n_mentions, n_entities,
       |       n_cand_prefix, n_caught_prefix,
       |       CAST(n_caught_prefix AS DOUBLE) / n_mentions
       |         AS completeness_prefix,
       |       n_cand_union, n_caught_union,
       |       CAST(n_caught_union AS DOUBLE) / n_mentions
       |         AS completeness_union,
       |       1.0 - CAST(n_cand_union AS DOUBLE) /
       |         (n_mentions * n_entities) AS reduction_ratio
       |FROM c, n""".stripMargin
  }

  /** Mirrors [[LinkageQueries.erSelfClusters]]: dirty records, exact
   *  surface collapse, blocked fuzzy surface pairs (full levenshtein
   *  where Spark thresholds — identical on kept rows), recursive
   *  reachability closure, record labeling — all RE-DERIVED. */
  val erSelfClusters: String = {
    val h = LinkageQueries.DupMod
    val d = LinkageQueries.MaxDist
    def del(name: String, key: String) =
      s"substr($name, 1, 4 + $key % (length($name) - 4) - 1) || " +
        s"substr($name, 4 + $key % (length($name) - 4) + 1, 100)"
    s"""WITH RECURSIVE
       |recs AS (
       |  SELECT p_partkey AS rec_id, p_name AS name FROM part
       |  UNION ALL
       |  SELECT -(p_partkey + 1), ${del("p_name", "p_partkey")}
       |  FROM part WHERE p_partkey % $h = 0 AND length(p_name) >= 6),
       |surf AS (SELECT min(rec_id) AS sid, name FROM recs GROUP BY name),
       |pairs AS (
       |  SELECT x.sid AS id1, y.sid AS id2
       |  FROM surf x JOIN surf y
       |    ON substr(x.name, 1, 3) = substr(y.name, 1, 3)
       |   AND abs(length(x.name) - length(y.name)) <= $d
       |   AND x.sid < y.sid
       |  WHERE levenshtein(x.name, y.name) BETWEEN 1 AND $d),
       |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
       |          UNION SELECT id2, id1 FROM pairs),
       |reach(node, l) AS (
       |  SELECT sid, sid FROM surf
       |  UNION
       |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node),
       |cl AS (SELECT node, min(l) AS cluster FROM reach GROUP BY node)
       |SELECT r.rec_id, CAST(cl.cluster AS BIGINT) AS cluster,
       |       r.rec_id = cl.cluster AS is_survivor
       |FROM recs r
       |JOIN surf s ON r.name = s.name
       |JOIN cl ON s.sid = cl.node""".stripMargin
  }

  /** Mirrors [[LinkageQueries.erSelfClustersCapped]]: the same
   *  re-derived closure as [[erSelfClusters]], then the SURFACE-count
   *  cap re-applied independently — components past the cap dissolve
   *  to exact-surface clusters via a CASE over the size rollup. */
  val erSelfClustersCapped: String = {
    val h = LinkageQueries.DupMod
    val d = LinkageQueries.MaxDist
    val cap = LinkageQueries.SelfClusterCap
    def del(name: String, key: String) =
      s"substr($name, 1, 4 + $key % (length($name) - 4) - 1) || " +
        s"substr($name, 4 + $key % (length($name) - 4) + 1, 100)"
    s"""WITH RECURSIVE
       |recs AS (
       |  SELECT p_partkey AS rec_id, p_name AS name FROM part
       |  UNION ALL
       |  SELECT -(p_partkey + 1), ${del("p_name", "p_partkey")}
       |  FROM part WHERE p_partkey % $h = 0 AND length(p_name) >= 6),
       |surf AS (SELECT min(rec_id) AS sid, name FROM recs GROUP BY name),
       |pairs AS (
       |  SELECT x.sid AS id1, y.sid AS id2
       |  FROM surf x JOIN surf y
       |    ON substr(x.name, 1, 3) = substr(y.name, 1, 3)
       |   AND abs(length(x.name) - length(y.name)) <= $d
       |   AND x.sid < y.sid
       |  WHERE levenshtein(x.name, y.name) BETWEEN 1 AND $d),
       |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
       |          UNION SELECT id2, id1 FROM pairs),
       |reach(node, l) AS (
       |  SELECT sid, sid FROM surf
       |  UNION
       |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node),
       |cl AS (SELECT node, min(l) AS cluster FROM reach GROUP BY node),
       |sz AS (SELECT cluster, count(*) AS s FROM cl GROUP BY cluster),
       |cc AS (
       |  SELECT cl.node,
       |         CASE WHEN sz.s > $cap THEN cl.node
       |              ELSE cl.cluster END AS cluster
       |  FROM cl JOIN sz USING (cluster))
       |SELECT r.rec_id, CAST(cc.cluster AS BIGINT) AS cluster,
       |       r.rec_id = cc.cluster AS is_survivor
       |FROM recs r
       |JOIN surf s ON r.name = s.name
       |JOIN cc ON s.sid = cc.node""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmAudioFingerprint]]: ALL THREE
   *  committed corpora's fingerprints from the raw sample definitions
   *  (incl. the 8-bit AIFF decoy's quarantine sentinel)
   *  ([[graft.tools.AudioDupFixture.refAudioFp64]] — no WAV or AU
   *  bytes, no container code; PCM is lossless in both containers)
   *  plus the known format/frame constants, as VALUES literals. */
  val mmAudioFingerprint: String = {
    val rows = (graft.tools.AudioDupFixture.expectedFingerprints
      .map { case (id, fp) =>
        (id, 8000, graft.tools.AudioDupFixture.framesOf(id.toInt), fp)
      } ++
      graft.tools.AudioRemuxFixture.expectedFingerprints
        .map { case (id, fp) =>
          (id, graft.tools.AudioRemuxFixture.Rate,
            graft.tools.AudioRemuxFixture.framesOf(
              (id - graft.tools.AudioRemuxFixture.IdBase).toInt), fp)
        } ++
      graft.tools.AiffRemuxFixture.expectedFingerprints
        .map { case (id, fp) =>
          (id, graft.tools.AudioRemuxFixture.Rate,
            graft.tools.AudioRemuxFixture.frames(
              (id - graft.tools.AiffRemuxFixture.IdBase).toInt), fp)
        } :+
      // the 8-bit AIFF decoy's QUARANTINE sentinel: the oracle pins
      // the routing boundary (non-PCM16 must route, never decode)
      ((graft.tools.AiffRemuxFixture.IdBase +
        graft.tools.AiffRemuxFixture.M, -1, -1, 0L)))
      .map { case (id, rate, n, fp) =>
        s"($id, $rate, $n, CAST($fp AS BIGINT))"
      }
      .mkString(",\n  ")
    s"""SELECT CAST(clip_id AS BIGINT) AS clip_id,
       |       CAST(sample_rate AS INT) AS sample_rate,
       |       CAST(n_samples AS BIGINT) AS n_samples, fp
       |FROM (VALUES
       |  $rows) AS t(clip_id, sample_rate, n_samples, fp)""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmAudioNeardup]]: ALL THREE corpora's
   *  independent fingerprints as VALUES, ALL-PAIRS xor + bit_count
   *  within radius in SQL — no banding echo. */
  val mmAudioNeardup: String = {
    val r = PipelineQueries.AudioNeardupMaxHamming
    val rows = (graft.tools.AudioDupFixture.expectedFingerprints ++
        graft.tools.AudioRemuxFixture.expectedFingerprints ++
        graft.tools.AiffRemuxFixture.expectedFingerprints)
      .map { case (id, fp) => s"($id, CAST($fp AS BIGINT))" }
      .mkString(",\n  ")
    s"""WITH fp AS (
       |  SELECT CAST(clip_id AS BIGINT) AS clip_id, fp
       |  FROM (VALUES
       |  $rows) AS t(clip_id, fp))
       |SELECT x.clip_id AS id1, y.clip_id AS id2,
       |       CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
       |FROM fp x JOIN fp y ON x.clip_id < y.clip_id
       |WHERE bit_count(xor(x.fp, y.fp)) <= $r""".stripMargin
  }

  /** Mirrors [[PipelineQueries.mmVideoClusters]]: connected components
   *  over the [[mmVideoNeardup]] oracle's pairs via a recursive
   *  reachability CTE (the mmPhashClusters device), nodes = every
   *  committed clip id. */
  lazy val mmVideoClusters: String = {
    val ids = ((0 until graft.tools.VideoDupFixture.Total)
        .map(_.toLong) ++
      (0 until graft.tools.VideoRemuxFixture.Total)
        .map(graft.tools.VideoRemuxFixture.IdBase + _) ++
      // the MP4 codec decoy QUARANTINES (unlike the truncated-AVI
      // decoy, which decodes) — it is not a node
      (0 until graft.tools.Mp4RemuxFixture.M)
        .map(graft.tools.Mp4RemuxFixture.IdBase + _))
      .map(i => s"($i)").mkString(", ")
    s"""WITH RECURSIVE
       |pairs AS (SELECT id1, id2 FROM ($mmVideoNeardup) np),
       |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
       |          UNION SELECT id2, id1 FROM pairs),
       |ids(id) AS (VALUES $ids),
       |reach(node, l) AS (
       |  SELECT id, id FROM ids
       |  UNION
       |  SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.node),
       |cl AS (SELECT node, min(l) AS cluster FROM reach GROUP BY node)
       |SELECT CAST(node AS BIGINT) AS clip_id,
       |       CAST(cluster AS BIGINT) AS cluster,
       |       node = cluster AS is_survivor
       |FROM cl""".stripMargin
  }
}
