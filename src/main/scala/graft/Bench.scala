package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are forced through the `noop` sink (full materialization of
  * every output column) — a bare count() would let Catalyst prune the
  * projections under test (e.g. `sol` would collapse to a rowcount scan).
  *
  * Two measurement constraints shape the output format:
  *  - a single warm pass on a shared 32-core box swings up to 3.9× per
  *    query between identical-code runs (r3 vs r4), so the reported
  *    per-query number is the MEDIAN of `SPARK_GRAFT_BENCH_ITERS`
  *    (default 3) warm passes, after one uncounted-per-query cold pass
  *    whose total is kept as a single scalar;
  *  - the harness keeps only the last ~2000 chars of stdout (and the
  *    sbt `[success]` footer eats ~75 of those), so the line must fit
  *    a ~1900-char budget. At 92+ queries a 3-decimal map no longer
  *    does (the r11 driver capture lost the line's head — parse
  *    failed), so precision degrades adaptively (3 → 2 → 1 decimals,
  *    trailing zeros stripped) until the line fits, it is printed as
  *    the very last stdout write (after spark.stop()), and the full
  *    3-decimal artifact — median map, PER-QUERY COLD map (the cold
  *    anomaly decomposition the r11 verdict asked for), and every
  *    individual warm pass — is written to BENCH_full.json alongside.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Checkpoint blocks and per-round broadcast relations are
      // released by the ContextCleaner, which only drains on a driver
      // GC; a 189-query suite (or any long-lived local-mode service)
      // accumulates them faster than the 30-minute default ever fires,
      // squeezing execution memory for UNRELATED queries (measured:
      // graph_kcore 4.4 → 14.2 s across passes of one run with
      // untouched code, while a fresh-JVM standalone probe reads a
      // stable 3.6 s). Env-parameterized; a large cluster can keep the
      // default by setting it explicitly.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "45s"))
      // The generated-code cache (static conf) defaults to 100 classes
      // — sized for a handful of repeated plans, not a many-query
      // service. 189 distinct queries hold thousands of codegen
      // fragments, so at the default every fragment is EVICTED before
      // its query runs again: each warm pass re-runs Janino and
      // re-enters HotSpot interpretation for every stage (measured:
      // warm pass totals 150-167 s at the default vs 119-125 s
      // retained, graph_pagerank 5.0 -> 2.5 s, matching its
      // fresh-JVM standalone floor — the suite floor WAS
      // recompilation). Bounded: ~5000 compiled classes, heap-resident
      // bytecode; pairs with the ReservedCodeCacheSize raise in
      // build.sbt (overflowing the JIT code cache disables
      // compilation, which showed up as a uniform tail slowdown).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (uncounted): JVM/codegen/parquet-footer machinery
    try SparkEntry.queries("wordcount")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    def timed(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = Watchdog.run(spark, "bench", name, Watchdog.timeoutSec) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      // a failed query must not report its time-to-failure as a speedup
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    def pass() = SparkEntry.queries.map { case (n, f) => n -> timed(n, f) }
    // cold pass: one-time codegen/JIT per pipeline; kept as one scalar
    val cold = pass()
    // warm passes: steady-state; median defeats shared-box noise
    val warm = (1 to iters).map(_ => pass())
    def median(xs: Seq[Double]): Double = {
      val good = xs.filter(_ >= 0).sorted
      if (good.isEmpty) -1.0 else good(good.size / 2)
    }
    val med = SparkEntry.queries.keys
      .map(n => n -> median(warm.map(_(n)))).toMap
    // JSON number at `dec` decimals, trailing zeros stripped (1.50 ->
    // 1.5, 3.00 -> 3) — valid JSON, minimal chars
    def fmt(v: Double, dec: Int): String = {
      if (v < 0) "-1"
      else new java.math.BigDecimal(v)
        .setScale(dec, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros.toPlainString
    }
    def js(m: Map[String, Double], dec: Int) =
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
    // totals sum only successful queries: adding the -1 failure
    // sentinel would make the bench look FASTER because a query failed
    val total = med.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    // full-precision artifact: adjudication needs per-query cold and
    // the raw warm passes, which the stdout budget can't carry
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "/root/repo/BENCH_full.json")
    val full =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":${js(med, 3)},"queries_cold":${js(cold, 3)},"warm_passes":[${warm.map(js(_, 3)).mkString(",")}],"iters":$iters,"value_cold":${fmt(coldTotal, 3)},"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      full.getBytes("UTF-8"))
    catch { case _: Throwable => }
    val Budget = 1880 // 2000-char tail - sbt footer (~75) - margin
    def line(dec: Int, m: Map[String, Double], omitted: Int) = {
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      s"""{"metric":"total","value":${fmt(total, dec)},"unit":"sec","queries":${js(m, dec)}$om,"value_cold":${fmt(coldTotal, dec)},"sf":"${new java.io.File(sfDir).getName}"}"""
    }
    // precision degrades 3 -> 2 -> 1 decimals; if the full map STILL
    // overflows (the map is ~20 chars/query of names alone and grows
    // every round), the smallest-median queries drop from the stdout
    // map at 2 decimals — they carry the least total information, and
    // the FULL map is always in the BENCH_full.json artifact
    val out = (3 to 1 by -1).map(line(_, med, 0)).find(_.length <= Budget)
      .getOrElse {
        val asc = med.toSeq.sortBy(_._2)
        var keep = med
        var i = 0
        var s = line(2, keep, 0)
        while (s.length > Budget && keep.size > 1) {
          keep -= asc(i)._1
          i += 1
          s = line(2, keep, i)
        }
        s
      }
    spark.stop()
    // last stdout write: nothing after this but sbt's own footer
    println(out)
  }
}
