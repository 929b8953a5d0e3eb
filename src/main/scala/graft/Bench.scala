package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are forced through the `noop` sink (full materialization of
  * every output column) — a bare count() would let Catalyst prune the
  * projections under test (e.g. `sol` would collapse to a rowcount scan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // cold pass: includes one-time codegen/JIT per pipeline (the
    // headline `value`, comparable across rounds) …
    val results = SparkEntry.queries.map { case (name, fn) => name -> timed(name, fn) }
    // … then a warm pass: steady-state per-query seconds, what a second
    // run of the same pipeline costs once the JIT noise is paid
    val warm = SparkEntry.queries.map { case (name, fn) => name -> timed(name, fn) }
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // totals sum only successful queries: adding the -1 failure
    // sentinel would make the bench look FASTER because a query failed
    val total = results.values.filter(_ >= 0).sum
    val totalWarm = warm.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results)},"value_warm":$totalWarm,"queries_warm":${js(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
