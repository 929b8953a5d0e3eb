package graft.queries

import graft.SparkSpec

/** [[AnalyticsQueries.dqCheckOf]] — every violation path fires on a
  * planted-dirty fixture and every constraint passes on a clean one
  * (the shipped tables are clean, so the gated query's all-pass
  * reading is verified honest here, not assumed). */
class DqCheckSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDf(rows: Seq[(java.lang.Long, java.lang.Long, String,
      java.lang.Double)]) =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def liDf(keys: Seq[Long]) = keys.toDF("l_orderkey")

  private def run(o: org.apache.spark.sql.DataFrame,
      li: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    AnalyticsQueries.dqCheckOf(o, li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap

  test("every violation path fires with the exact count: null key, " +
      "duplicate key, negative price, off-domain status, orphan fact") {
    val o = ordersDf(Seq(
      (1L, 10L, "O", 5.0),
      (1L, 11L, "F", 6.0),      // duplicate o_orderkey
      (2L, null, "P", 7.0),     // null custkey
      (3L, 12L, "Z", -1.0),     // bad status AND negative price
      (4L, 13L, "O", 8.0)))
    val li = liDf(Seq(1L, 2L, 99L, 98L, 4L)) // two orphans
    val got = run(o, li)
    assert(got("orders_nonempty") == ((0L, 5L, true)))
    assert(got("o_custkey_not_null") == ((1L, 5L, false)))
    assert(got("o_orderkey_unique") == ((1L, 5L, false)), s"$got")
    assert(got("o_totalprice_nonneg") == ((1L, 5L, false)))
    assert(got("o_orderstatus_domain") == ((1L, 5L, false)))
    assert(got("lineitem_order_ri") == ((2L, 5L, false)))
  }

  test("a clean fixture passes every constraint; the empty-table " +
      "tripwire fires on zero rows") {
    val o = ordersDf(Seq((1L, 10L, "O", 5.0), (2L, 11L, "F", 6.0)))
    val got = run(o, liDf(Seq(1L, 2L, 2L)))
    assert(got.values.forall(_._3), s"clean fixture must pass: $got")
    val empty = run(ordersDf(Seq.empty), liDf(Seq.empty))
    assert(empty("orders_nonempty") == ((1L, 0L, false)),
      s"empty table must trip the nonempty constraint: $empty")
  }
}
