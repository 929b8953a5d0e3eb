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
  *  - the harness keeps only the last ~2000 chars of stdout, so the
  *    line must stay well under that: seconds are rounded to 1 ms and
  *    only the median map is emitted per query (~1.4 KB for 60 queries).
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
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val med = SparkEntry.queries.keys
      .map(n => n -> median(warm.map(_(n)))).toMap
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    // totals sum only successful queries: adding the -1 failure
    // sentinel would make the bench look FASTER because a query failed
    val total = r3(med.values.filter(_ >= 0).sum)
    val coldTotal = r3(cold.values.filter(_ >= 0).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(med)},"iters":$iters,"value_cold":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
