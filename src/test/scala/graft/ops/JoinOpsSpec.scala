package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temporal joins: as-of (point-in-time) and banded range join.
 *  Each is checked against a naive theta-join formulation of the same
 *  semantics on randomized data — the scalable plan must be a pure
 *  plan-shape change, never a semantics change. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Seq(
    // (pid, key, ts)
    (100L, "a", 50L), // after b1@40 -> matches b1
    (101L, "a", 40L), // exactly at b1@40 -> <= matches
    (102L, "a", 10L), // before any build -> dropped (inner)
    (103L, "b", 99L), // ties at build ts 90: largest tiebreak wins
    (104L, "c", 70L)  // key with no build rows at all -> dropped
  ).toDF("pid", "k", "ts")

  private def build = Seq(
    // (bid, key, ts)
    (1L, "a", 40L),
    (2L, "a", 45L), // later than probe 101 -> not visible to it
    (3L, "b", 90L),
    (4L, "b", 90L)  // same ts as bid=3 -> tiebreak prefers 4
  ).toDF("bid", "k", "ts")

  test("asOfJoin: <= match, tie to largest tiebreak, inner drop") {
    val got = JoinOps.asOfJoin(probe, build, Seq("k"), "ts", "bid")
      .select("pid", "asof_ts", "bid").as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (100L, 45L, 2L), // latest at-or-before 50 is b2@45
      (101L, 40L, 1L), // equal ts matches
      (103L, 90L, 4L)  // tie at 90 -> bid 4
    ))
  }

  test("asOfJoin equals the naive theta-join+argmax formulation on random data") {
    val rnd = new scala.util.Random(7)
    val p = Seq.tabulate(300)(i => (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(50).toLong))
      .toDF("pid", "k", "ts")
    val b = Seq.tabulate(200)(i => (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(50).toLong))
      .toDF("bid", "k", "ts")
    val fast = JoinOps.asOfJoin(p, b, Seq("k"), "ts", "bid")
      .select("pid", "asof_ts", "bid").as[(Long, Long, Long)].collect().toSet
    val naive = p.as("p").join(b.as("b"),
        col("p.k") === col("b.k") && col("b.ts") <= col("p.ts"))
      .groupBy(col("pid"))
      .agg(max(struct(col("b.ts"), col("bid"))).as("m"))
      .select(col("pid"), col("m.ts"), col("m.bid")).as[(Long, Long, Long)]
      .collect().toSet
    assert(fast == naive)
  }

  test("bandedRangeJoin equals the plain inequality join, incl. band edges") {
    val gap = 10L
    val rnd = new scala.util.Random(11)
    // ts values cluster around bucket boundaries to exercise the +-1 band
    val l = Seq.tabulate(250)(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", (rnd.nextInt(8) * 10 + rnd.nextInt(3) - 1).toLong))
      .toDF("lid", "k", "l_ms")
    val r = Seq.tabulate(250)(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", (rnd.nextInt(8) * 10 + rnd.nextInt(3) - 1).toLong))
      .toDF("rid", "k", "r_ms")
    val fast = JoinOps.bandedRangeJoin(l, r, Seq("k"), "l_ms", "r_ms", gap)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val naive = l.join(r, Seq("k"))
      .filter(col("r_ms") >= col("l_ms") && col("r_ms") - col("l_ms") <= gap)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // band join must produce each qualifying pair exactly once
    assert(fast.sorted == naive.sorted)
  }

  test("saltedJoin equals the plain equi-join on a skewed key") {
    val rnd = new scala.util.Random(7)
    // 80% of rows share one hot key — the distribution salting exists for
    val skewed = Seq.tabulate(500)(i =>
      (i.toLong, if (rnd.nextInt(5) < 4) "hot" else s"k${rnd.nextInt(10)}"))
      .toDF("row_id", "k")
    val dim = (Seq("hot") ++ (0 until 10).map(i => s"k$i"))
      .zipWithIndex.map { case (k, v) => (k, v.toLong) }.toDF("k", "dim_v")
    val fast = JoinOps.saltedJoin(skewed, dim, "k", salts = 8)
      .select("row_id", "dim_v").as[(Long, Long)].collect().toSeq
    val plain = skewed.join(dim, Seq("k"))
      .select("row_id", "dim_v").as[(Long, Long)].collect().toSeq
    assert(fast.sorted == plain.sorted)
  }
}
