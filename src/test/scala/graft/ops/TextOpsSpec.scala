package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("splitWords splits on whitespace runs and drops empties") {
    val df = Seq("  the quick\tbrown   fox ", "", "solo").toDF("text")
    val words = TextOps.splitWords(df, col("text")).as[String].collect().sorted
    assert(words.toSeq == Seq("brown", "fox", "quick", "solo", "the"))
  }

  test("wordCount counts per word") {
    val df = Seq("a b a", "b a").toDF("text")
    val m = TextOps.wordCount(df, col("text"))
      .as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 3L, "b" -> 2L))
  }

  test("grepCount is unanchored contains-match like Matcher.find") {
    val df = Seq("Tom and Jerry", "tomcat", "Tomorrow Tom", "nothing").toDF("s")
    val n = TextOps.grepCount(df, col("s"), "Tom").as[Long].head()
    assert(n == 2L) // per-sentence emit: "Tomorrow Tom" counts once
  }

  test("extractHashtags: 13 pipe fields, text at index 4, #-tokens len>1") {
    val good = "f0|f1|f2|f3|hello #tag1 world #x # plain|f5|f6|f7|f8|f9|f10|f11|f12"
    val skipBracket = "[status line|a|b|c|#no|d|e|f|g|h|i|j|k"
    val wrongArity = "a|b|c|d|#nope|e"
    val df = Seq(good, skipBracket, wrongArity).toDF("tweet")
    val tags = TextOps.extractHashtags(df, col("tweet"))
      .select("hashtag").as[String].collect().sorted
    assert(tags.toSeq == Seq("#tag1", "#x"))
  }

  test("constChain preserves rows and renames to message") {
    val df = Seq("m1", "m2").toDF("v")
    val out = TextOps.constChain(df, col("v"), levels = 3)
    assert(out.columns.toSeq == Seq("message"))
    assert(out.as[String].collect().sorted.toSeq == Seq("m1", "m2"))
  }
}
