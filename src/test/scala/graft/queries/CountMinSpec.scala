package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min against an INDEPENDENT plain-Scala sketch (md5 straight
  * from MessageDigest, its own matrix), the overestimate guarantee for
  * EVERY word (not just the emitted top-K), and the mergeable-state
  * contract: per-source cell tables summed cell-wise equal the global
  * build. */
class CountMinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val d = SketchQueries.CmDepth
  private val w = SketchQueries.CmWidth

  private def md5_60(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  private def positions(word: String): Seq[Int] = {
    val h = md5_60(word)
    val a = h & 0xFFFFFL
    val b = (h >>> 20) & 0xFFFFFL
    val c = (h >>> 40) & 0xFFFFFL
    (0 until d).map(i =>
      ((a + i * b + (i.toLong * (i - 1) / 2) * c) & (w - 1)).toInt)
  }

  private def wordCounts(): Map[String, Long] =
    graft.model.Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("sk_countmin matches the plain-Scala sketch and every word " +
      "estimate over-counts or equals (the one-sided guarantee)") {
    val counts = wordCounts()
    val matrix = Array.ofDim[Long](d, w)
    counts.foreach { case (word, c) =>
      positions(word).zipWithIndex.foreach { case (p, r) => matrix(r)(p) += c }
    }
    def est(word: String): Long =
      positions(word).zipWithIndex.map { case (p, r) => matrix(r)(p) }.min
    counts.foreach { case (word, c) =>
      assert(est(word) >= c, s"'$word' underestimated: ${est(word)} < $c")
    }
    val want = counts.toSeq.sortBy { case (word, c) => (-c, word) }
      .take(SketchQueries.CmTopK)
      .map { case (word, c) => (word, c, est(word), est(word) - c) }.toSet
    val got = SketchQueries.countMin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("the rollup of stored per-source sketches answers point queries " +
      "identically to the direct build (merge-then-probe == " +
      "build-then-probe), with more than one source contributing") {
    val direct = SketchQueries.countMin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val rolled = SketchQueries.countMinRollup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rolled == direct)
    val nSources = graft.model.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(nSources > 1, "rollup is vacuous with one source")
  }

  test("the live Complete-mode sketch snapshot equals the batch cell " +
      "build over everything seen (the state store IS the sketch)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0)).toSeq
    val in = MemoryStream[String]
    val q = graft.streaming.StreamOps.countMinStream(
      in.toDF().toDF("text")).writeStream
      .format("memory").queryName("cm_live")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()
    try {
      // two batches: the second trigger must UPDATE cells, not append
      val (a, b) = docs.splitAt(docs.length / 2)
      in.addData(a: _*); q.processAllAvailable()
      in.addData(b: _*); q.processAllAvailable()
      val live = spark.table("cm_live").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      def words(df: org.apache.spark.sql.DataFrame) =
        df.select(explode(split(col("text"), "\\s+")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy("word").agg(count(lit(1)).as("c"))
      val batch = SketchQueries.countMinCells(
        words(graft.model.Tables.documents(spark, sfDir))).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(live == batch)
    } finally q.stop()
  }

  test("per-source sketches merged by cell-wise + equal the global " +
      "build (mergeable state)") {
    val docs = graft.model.Tables.documents(spark, sfDir)
    def words(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("c"))
    val global = SketchQueries.countMinCells(words(docs)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sources = docs.select("source").distinct().collect()
      .map(_.getString(0))
    assert(sources.length > 1, "need multiple sources for a real merge")
    val merged = sources.flatMap { s =>
      SketchQueries.countMinCells(
        words(docs.filter(col("source") === s))).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == global)
  }
}
