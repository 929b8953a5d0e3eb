package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowPageViewSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("slidingCount: event lands in winLen/slide hops, like SlidingWindow slots") {
    val df = Seq(
      (t("2024-01-01 10:30:00"), "a"),
      (t("2024-01-01 10:45:00"), "a"),
      (t("2024-01-01 11:10:00"), "a")).toDF("ts", "k")
    val out = WindowOps.slidingCount(df, col("ts"), col("k"), "word", "2 hours", "1 hour")
      .select(date_format(col("w_start"), "HH:mm").as("w"), col("cnt"))
      .as[(String, Long)].collect().toMap
    // 10:30/10:45 in windows starting 09:00 & 10:00; 11:10 in 10:00 & 11:00
    assert(out == Map("09:00" -> 2L, "10:00" -> 3L, "11:00" -> 1L))
  }

  test("windowedDistinct counts exact distinct per key per window") {
    val df = Seq(
      (t("2024-01-01 10:10:00"), "u", 1), (t("2024-01-01 10:20:00"), "u", 1),
      (t("2024-01-01 10:30:00"), "u", 2), (t("2024-01-01 10:40:00"), "v", 9))
      .toDF("ts", "url", "user")
    val out = WindowOps.windowedDistinct(df, col("ts"), col("url"), "url",
      col("user"), "1 hour", "1 hour")
    assert(out.filter($"url" === "u").select("uniques").as[Long].head() == 2L)
  }

  test("latestPerKey: newest order col wins, tiebreaker deterministic") {
    val df = Seq(
      ("a", 100L, 1L, "stale"), ("a", 200L, 2L, "fresh"),
      ("a", 200L, 1L, "tie-lo"), ("b", 50L, 9L, "only"))
      .toDF("icao", "pos_time", "event_id", "tag")
    val out = WindowOps.latestPerKey(df, Seq("icao"), Seq("pos_time", "event_id"))
      .select("icao", "tag").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "fresh", "b" -> "only"))
  }

  test("topKPerWindow ranks ascending within tumbling window") {
    val df = Seq(
      (t("2024-01-01 10:10:00"), 5.0, 1L), (t("2024-01-01 10:20:00"), 3.0, 2L),
      (t("2024-01-01 10:30:00"), 4.0, 3L), (t("2024-01-01 11:30:00"), 9.0, 4L))
      .toDF("ts", "value", "event_id")
    val out = WindowOps.topKPerWindow(df, col("ts"), "1 hour", 2,
      Seq(col("value"), col("event_id")))
      .select("event_id", "rn").as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("PageViewOps.parse drops malformed rows, keeps envelope") {
    val df = Seq(
      (t("2024-01-01 00:00:00"), "/page/a\t200\t94709\t7"),
      (t("2024-01-01 00:00:01"), "/page/b\t404\t94117"), // 3 fields -> drop
      (t("2024-01-01 00:00:02"), "/page/c\tnotanint\t94709\t9")) // bad cast -> drop
      .toDF("ts", "page_view")
    val out = PageViewOps.parse(df, col("page_view"))
    assert(out.count() == 1)
    val r = out.select("url", "http_status", "zip_code", "user_id")
      .as[(String, Int, Int, Int)].head()
    assert(r == ("/page/a", 200, 94709, 7))
  }

  test("filterNot keeps non-matching rows only (FilterBolt inequality)") {
    val df = Seq((200, "ok"), (404, "bad"), (500, "worse")).toDF("status", "line")
    val out = PageViewOps.filterNot(df, col("status"), 200, col("line"))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("bad", "worse"))
  }

  test("lastNSorted keeps only the newest n arrivals (overwrite-oldest)") {
    // arrivals in ts order: v=9 (oldest), 1, 8, 2, 5 — ring of size 3
    // keeps {8, 2, 5}: the oldest two are overwritten, NOT the largest
    val df = Seq(
      (t("2024-01-01 10:00:00"), 1L, 9.0), (t("2024-01-01 10:01:00"), 2L, 1.0),
      (t("2024-01-01 10:02:00"), 3L, 8.0), (t("2024-01-01 10:03:00"), 4L, 2.0),
      (t("2024-01-01 10:04:00"), 5L, 5.0)).toDF("ts", "event_id", "value")
    val out = WindowOps.lastNSorted(df, Seq(col("ts"), col("event_id")),
      n = 3, Seq("value", "event_id"))
      .as[(Long, Double, Long)].collect().toSeq
    assert(out == Seq((1L, 2.0, 4L), (2L, 5.0, 5L), (3L, 8.0, 3L)))
  }

  test("lastNSorted ties on arrival ts break by tiebreaker desc") {
    val df = Seq(
      (t("2024-01-01 10:00:00"), 1L, 1.0), (t("2024-01-01 10:00:00"), 2L, 2.0),
      (t("2024-01-01 10:00:00"), 3L, 3.0)).toDF("ts", "event_id", "value")
    val out = WindowOps.lastNSorted(df, Seq(col("ts"), col("event_id")),
      n = 2, Seq("value", "event_id"))
      .as[(Long, Double, Long)].collect().toSeq
    // event_id 3 and 2 are "newest" at the tied ts
    assert(out == Seq((1L, 2.0, 2L), (2L, 3.0, 3L)))
  }
}
