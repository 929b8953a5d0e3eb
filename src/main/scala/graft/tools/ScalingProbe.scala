package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: warm steady-state per-query times at two scale factors,
  * printing the 10x-data scaling ratio per query. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // all registered queries by default; pass names to probe a subset
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    def run(name: String, sf: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sf).write.format("noop").mode("overwrite").save() // warm (JIT + code cache)
      val times = (1 to 3).map { _ =>
        val t = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      times.sorted.apply(1) // median of 3
    }
    println(f"${"query"}%-22s ${"sf0.01"}%8s ${"sf0.1"}%8s ${"ratio"}%6s")
    names.foreach { n =>
      val a = run(n, "/root/testdata/sf0.01")
      val b = run(n, "/root/testdata/sf0.1")
      println(f"$n%-22s $a%8.3f $b%8.3f ${b / a}%6.2f")
    }
    spark.stop()
  }
}
