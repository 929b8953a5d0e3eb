package graft.queries

import graft.SparkSpec

/** [[AnalyticsQueries.triangleCensus]] — the degree-orientation
  * triangle count: planted fixtures, the hub-orientation guarantee,
  * and a randomized cross-check against brute-force enumeration. */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference census over (order, part) memberships. */
  private def brute(mem: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Double) = {
    val byOrder = mem.distinct.groupBy(_._1).view.mapValues(_.map(_._2))
    val edges = byOrder.values.flatMap { ps =>
      val s = ps.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(n =>
      n -> edges.count(e => e._1 == n || e._2 == n).toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val ns = nodes.toSeq.sorted
    var tri = 0L
    for (i <- ns.indices; j <- (i + 1) until ns.size; k <- (j + 1) until ns.size)
      if (edges((ns(i), ns(j))) && edges((ns(j), ns(k))) &&
          edges((ns(i), ns(k)))) tri += 1
    val gcc = if (wedges == 0) Double.NaN
      else BigDecimal(3.0 * tri / wedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (nodes.size.toLong, edges.size.toLong, wedges, tri, gcc)
  }

  private def censusOf(mem: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Double) = {
    val r = AnalyticsQueries.triangleCensus(mem.toDF("o", "p")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("planted fixture: a 3-clique, a bridge, a 4-clique (duplicate " +
      "membership rows collapse) — every census field exact") {
    val mem = Seq[(Long, Long)](
      (10, 1), (10, 2), (10, 3), (10, 2), // dup membership row
      (20, 3), (20, 4),
      (30, 4), (30, 5), (30, 6), (30, 7))
    // edges: {1-2,1-3,2-3}, {3-4}, K4 on {4,5,6,7} -> 10 edges, 7 nodes
    // triangles: {1,2,3} + C(4,3) = 5; wedges = 1+1+3+6+3+3+3 = 20
    assert(censusOf(mem) == ((7L, 10L, 20L, 5L, 0.75)))
    assert(censusOf(mem) == brute(mem), "fixture must agree with brute force")
  }

  test("hub orientation: a 40-leaf star counts its single off-hub " +
      "triangle exactly once (the hub's edges all point INTO it, so " +
      "the heavy node contributes zero wedges to the join)") {
    val hub = 1000L
    val star = (1L to 40L).map(i => (i, hub)) ++ (1L to 40L).map(i => (i, i))
    val mem = star ++ Seq((5000L, 1L), (5000L, 2L)) // closes {hub, 1, 2}
    val got = censusOf(mem)
    assert(got._4 == 1L, s"expected exactly one triangle: $got")
    assert(got == brute(mem), "star census must agree with brute force")
  }

  test("randomized memberships == brute-force enumeration (all five " +
      "fields, three seeds)") {
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val mem = (1 to 30).flatMap { o =>
        val n = 2 + rnd.nextInt(4)
        Seq.fill(n)((o.toLong, rnd.nextInt(15).toLong))
      }
      assert(censusOf(mem) == brute(mem), s"seed $seed diverged")
    }
  }
}
