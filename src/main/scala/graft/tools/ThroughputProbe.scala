package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.ops.{AdsbOps, PageViewOps, TextOps}
import graft.sources.Generators
import graft.streaming.StreamOps

/** Dev tool: sustained streaming throughput (rows/s) per topology on
  * the rate-source generators — the reference's figure of merit
  * (BASELINE.md: broker msgs/s). The rate source is set far above
  * processing capacity, so processedRowsPerSecond reflects what the
  * pipeline actually sustains; the first triggers are dropped (codegen
  * warmup). */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val offered = 5000000 // rows/s offered; far above sustainable

    def measure(name: String, df: DataFrame, mode: OutputMode,
        sleepMs: Long = 45000): Unit = {
      val q = df.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation",
          Files.createTempDirectory(s"tp-$name").toString)
        .trigger(Trigger.ProcessingTime("5 seconds"))
        .start()
      Thread.sleep(sleepMs)
      val rps = q.recentProgress.drop(2).map(_.processedRowsPerSecond)
        .filter(v => !v.isNaN && v > 0)
      q.stop()
      val avg = if (rps.nonEmpty) rps.sum / rps.length else 0.0
      println(f"[tp] $name%-18s ${avg / 1e6}%6.2f M rows/s (${rps.length} triggers)")
    }

    val wm = "0 seconds"
    measure("wordcount", StreamOps.runningCount(
      TextOps.splitWords(
        Generators.randomMessageStream(spark, offered).toDF("ts", "value"),
        col("value")),
      col("word"), "word"), OutputMode.Update)
    measure("pageview_count", StreamOps.runningCount(
      PageViewOps.parse(
        Generators.pageViewStream(spark, offered).toDF("ts", "value"), col("value")),
      col("url"), "url"), OutputMode.Update)
    measure("rolling_count", StreamOps.slidingCount(
      Generators.pageViewStream(spark, offered).toDF("ts", "value")
        .select(col("ts"), col("value")),
      "ts", substring(col("value"), 1, 8), "key", "60 seconds", "10 seconds", wm),
      OutputMode.Update)
    // json parse per row is the heavy path: offer less so triggers
    // complete inside the measurement window
    measure("rolling_geo", StreamOps.slidingCount(
      Generators.adsbStream(spark, 1000000).toDF("ts", "value")
        .select(col("ts"), AdsbOps.zoneOfLine(col("value")).as("zone")),
      "ts", col("zone"), "zone", "60 seconds", "10 seconds", wm),
      OutputMode.Update, sleepMs = 60000)
    spark.stop()
  }
}
