package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Topology 8 composition: HashtagBolt -> RollingCountBolt means the
 *  gated query must WINDOW the hashtag counts, not total them
 *  (RollingHashtagCount.java:83-92). */
class RollingHashtagSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("rolling_hashtag emits per-hop counts whose sum is slots x global") {
    val windowed = BenchQueries.rollingHashtag(spark, sfDir)
    assert(windowed.columns.toSeq == Seq("w_start", "hashtag", "cnt"))
    // arrival times span the 4 h synthetic band -> several hourly hops
    assert(windowed.select("w_start").distinct().count() >= 4)
    // every tweet lands in exactly winLen/slide = 2 hops, so the windowed
    // counts must sum to exactly twice the global per-hashtag count
    val perTag = windowed.groupBy("hashtag").agg(sum("cnt").as("windowed_total"))
    val global = graft.ops.TextOps.extractHashtags(
        SyntheticSources.tweetLines(graft.model.Tables.documents(spark, sfDir)),
        col("tweet"))
      .groupBy("hashtag").agg(count(lit(1)).as("global_cnt"))
    val joined = perTag.join(global, "hashtag")
      .select($"hashtag", $"windowed_total", $"global_cnt" * 2)
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (tag, win, twiceGlobal) =>
      assert(win == twiceGlobal, s"$tag: $win != $twiceGlobal")
    }
  }
}
