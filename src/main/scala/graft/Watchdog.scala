package graft

/** Shared per-query watchdog for the Bench/Verify mains: one
  * pathological query must fail alone, not turn the whole round into a
  * global timeout (round-2 regression: rc=124, no JSON). */
private[graft] object Watchdog {

  /** Run `body` on a daemon thread with a wall-clock cap. Returns true
    * iff the body completed (successfully) in time. On timeout the
    * thread is interrupted and running jobs cancelled — but a
    * driver-side hang (plan analysis, stringification) may ignore both,
    * keep burning a core, and contaminate LATER timings; the warning
    * says so. */
  def run(spark: org.apache.spark.sql.SparkSession, tag: String,
      name: String, timeoutSec: Long)(body: => Unit): Boolean = {
    @volatile var ok = false
    val worker = new Thread(() =>
      try { body; ok = true }
      catch { case e: Throwable =>
        System.err.println(s"[$tag] $name failed: ${e.getMessage}")
      }, s"$tag-$name")
    worker.setDaemon(true)
    worker.start()
    worker.join(timeoutSec * 1000)
    if (worker.isAlive) {
      System.err.println(s"[$tag] $name timed out after ${timeoutSec}s; " +
        "interrupting (a driver-side hang may survive and skew later timings)")
      worker.interrupt()
      spark.sparkContext.cancelAllJobs()
    }
    ok
  }

  def timeoutSec: Long =
    sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "240").toLong
}
