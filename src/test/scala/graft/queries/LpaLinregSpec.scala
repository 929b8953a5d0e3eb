package graft.queries

import graft.SparkSpec

/** [[AnalyticsQueries.lpa]] (synchronous self-vote label propagation)
  * against a plain-Scala reference, and [[AnalyticsQueries.linregOf]]
  * (closed-form OLS) against exact lines and a plain-Scala reference.
  */
class LpaLinregSpec extends SparkSpec {
  import spark.implicits._

  /** Reference propagation: same self-vote, same (count DESC, label
    * ASC) argmax, synchronous rounds. */
  private def refLpa(edges: Set[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj: Map[Long, Seq[Long]] = (
      edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)) ++
        nodes.toSeq.map(n => n -> n))
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2) }
    var lbl: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(lbl).groupBy(identity)
          .map { case (l, g) => (l, g.size) }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def lpaOf(edges: Set[(Long, Long)], iters: Int)
      : Map[Long, Long] =
    AnalyticsQueries.lpa(edges.toSeq.toDF("u", "v"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles joined by one bridge resolve into two " +
      "communities labeled by each side's minimum node") {
    // triangle {1,2,3} - bridge (3,10) - triangle {10,11,12}
    val edges = Set((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val got = lpaOf(edges, 5)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L),
      s"two min-labeled communities expected: $got")
    assert(got == refLpa(edges, 5), s"diverged from reference: $got")
  }

  /** Reference personalized pagerank: identical floored integer
    * micro-unit arithmetic (rank/outdeg and s·85/100.0 as double
    * divisions floored to long) with teleport mass only at seeds. */
  private def refPpr(edges: Set[(Long, Long)], isSeed: Long => Boolean,
      iters: Int): Map[Long, Long] = {
    val scale = AnalyticsQueries.PrScale
    val base = scale * 15 / 100
    val adj: Map[Long, Seq[Long]] = edges.toSeq
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2) }
    val outdeg = adj.map { case (n, nbrs) => n -> nbrs.size.toLong }
    var rank: Map[Long, Long] =
      adj.keys.map(n => n -> (if (isSeed(n)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = adj.toSeq.flatMap { case (src, nbrs) =>
        val c = math.floor(rank(src).toDouble / outdeg(src)).toLong
        nbrs.map(dst => dst -> c)
      }.groupBy(_._1).map { case (n, g) => n -> g.map(_._2).sum }
      rank = in.map { case (n, s) =>
        n -> ((if (isSeed(n)) base else 0L) +
          math.floor((s * 85L).toDouble / 100.0).toLong)
      }
    }
    rank
  }

  test("personalized pagerank == reference on a seeded path plus a " +
      "seed-free component (mass decays from the seed, the cut-off " +
      "component reads exactly zero)") {
    import org.apache.spark.sql.functions.col
    // path 100-1-2-3 (100 is the seed under the %100 rule) and a
    // disconnected seed-free pair {5,6}
    val edges = Set((100L, 1L), (1L, 2L), (2L, 3L), (5L, 6L))
    val got = AnalyticsQueries.ppr(edges.toSeq.toDF("u", "v"),
        col("node") % AnalyticsQueries.BfsSeedMod === 0, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPpr(edges, _ % 100 == 0, 8),
      s"diverged from reference: $got")
    // the seed holds the max rank, every REACHABLE node holds positive
    // mass (node-wise hop-distance monotonicity does NOT hold in
    // general — node 2 collects from both sides of the path and
    // outranks degree-2 node 1, measured — so only the seed/reachable/
    // unreachable partition is a sound invariant)
    assert(Seq(1L, 2L, 3L).forall(n => got(n) > 0L && got(100L) > got(n)),
      s"seed must dominate and reachable nodes hold mass: $got")
    assert(got(5L) == 0L && got(6L) == 0L,
      s"a seed-free component must read exactly zero: $got")
  }

  test("personalized pagerank: randomized graphs == reference (three " +
      "seeds — pins the floored micro-unit arithmetic and the " +
      "teleport-at-seeds rule)") {
    import org.apache.spark.sql.functions.col
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      // node ids stride 50 so some are %100 seeds and some are not
      val edges = (1 to 40).map { _ =>
        val a = rnd.nextInt(12).toLong * 50
        val b = rnd.nextInt(12).toLong * 50
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).toSet
      val got = AnalyticsQueries.ppr(edges.toSeq.toDF("u", "v"),
          col("node") % AnalyticsQueries.BfsSeedMod === 0, 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPpr(edges, _ % 100 == 0, 8), s"seed $seed diverged")
    }
  }

  test("randomized graphs == reference propagation (three seeds, " +
      "5 rounds — pins the self-vote and the count/label tie-break)") {
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 50).map { _ =>
        val a = rnd.nextInt(16).toLong
        val b = rnd.nextInt(16).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).toSet
      assert(lpaOf(edges, 5) == refLpa(edges, 5), s"seed $seed diverged")
    }
  }

  private def linreg(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Long, Long, Long)] =
    AnalyticsQueries.linregOf(
      rows.toDF("k", "xi", "yi").selectExpr("k",
        "CAST(xi AS DECIMAL(18,0)) AS x", "CAST(yi AS DECIMAL(18,0)) AS y"),
      "k")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("an exact line y = 2x + 3 recovers slope 2.0, intercept 3.0, " +
      "r² = 1.0 in micro-units exactly") {
    val rows = (1L to 20L).map(x => ("g", x, 2 * x + 3))
    val got = linreg(rows)("g")
    assert(got == ((20L, 2000000L, 3000000L, 1000000L)), s"got $got")
  }

  test("degenerate groups (one row / constant x / constant y) fit as " +
      "NULL, never an ANSI divide-by-zero — a live monitor's first " +
      "tiny trigger hits this immediately") {
    val rows = Seq(("one", 5L, 7L),
      ("cx", 3L, 1L), ("cx", 3L, 9L),
      ("cy", 1L, 4L), ("cy", 2L, 4L))
    val got = AnalyticsQueries.linregOf(
      rows.toDF("k", "xi", "yi").selectExpr("k",
        "CAST(xi AS DECIMAL(18,0)) AS x", "CAST(yi AS DECIMAL(18,0)) AS y"),
      "k").collect()
      .map(r => r.getString(0) ->
        ((r.isNullAt(2), r.isNullAt(3), r.isNullAt(4)))).toMap
    assert(got("one") == ((true, true, true)), s"n=1: ${got("one")}")
    assert(got("cx") == ((true, true, true)), s"constant x: ${got("cx")}")
    // constant y: slope 0 and intercept defined, r² undefined (0/0)
    assert(got("cy") == ((false, false, true)), s"constant y: ${got("cy")}")
  }

  test("noisy groups match a plain-Scala normal-equation reference " +
      "computed with the identical floored-double-quotient order") {
    val rnd = new scala.util.Random(99)
    val rows = for {
      g <- Seq("a", "b"); i <- 1 to 40
    } yield (g, (i + rnd.nextInt(5)).toLong,
      (3 * i + rnd.nextInt(17)).toLong)
    def ref(pts: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val nd = pts.size.toDouble
      val sx = pts.map(_._1).sum.toDouble
      val sy = pts.map(_._2).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val sxy = pts.map(p => p._1 * p._2).sum.toDouble
      val syy = pts.map(p => p._2 * p._2).sum.toDouble
      val num = (nd * sxy) - (sx * sy)
      val denx = (nd * sxx) - (sx * sx)
      val deny = (nd * syy) - (sy * sy)
      (pts.size.toLong,
        math.floor((num / denx) * 1000000.0).toLong,
        math.floor(((sy - ((num / denx) * sx)) / nd) * 1000000.0).toLong,
        math.floor(((num * num) / (denx * deny)) * 1000000.0).toLong)
    }
    val got = linreg(rows)
    for (g <- Seq("a", "b"))
      assert(got(g) == ref(rows.filter(_._1 == g).map(t => (t._2, t._3))),
        s"group $g diverged")
  }
}
