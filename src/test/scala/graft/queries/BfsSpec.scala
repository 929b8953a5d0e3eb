package graft.queries

import graft.SparkSpec

/** [[AnalyticsQueries.bfs]] — multi-source frontier expansion to the
  * exact fixpoint, against a plain-Scala reference on planted and
  * randomized graphs. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def refBfs(edges: Set[(Long, Long)], seeds: Set[Long])
      : Map[Long, Long] = {
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2) }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      next.foreach(n => dist += n -> d)
      frontier = next
    }
    dist
  }

  private def bfsOf(edges: Set[(Long, Long)], seeds: Set[Long])
      : Map[Long, Long] = {
    val adj = edges.toSeq.toDF("u", "v")
      .selectExpr("u AS src", "v AS dst")
      .unionAll(edges.toSeq.toDF("u", "v")
        .selectExpr("v AS src", "u AS dst"))
      .localCheckpoint()
    AnalyticsQueries.bfs(adj, seeds.toSeq.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a chain from one seed counts hops exactly; a disconnected " +
      "component stays ABSENT (not distance-NULL, not zero)") {
    val chain = Set((1L, 2L), (2L, 3L), (3L, 4L))
    val island = Set((10L, 11L))
    val got = bfsOf(chain ++ island, Set(1L))
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), s"$got")
  }

  test("multi-source: every node takes the distance to its NEAREST " +
      "seed (two seeds racing down one chain meet in the middle)") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSet
    val got = bfsOf(chain, Set(1L, 9L))
    assert(got(5L) == 4L && got(4L) == 3L && got(6L) == 3L, s"$got")
    assert(got == refBfs(chain, Set(1L, 9L)))
  }

  test("randomized graphs == reference BFS (three seeds)") {
    for (seed <- Seq(5, 55, 555)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 50).map { _ =>
        val a = rnd.nextInt(20).toLong
        val b = rnd.nextInt(20).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).toSet
      val seeds = Set(0L, 7L).filter(s =>
        edges.exists(e => e._1 == s || e._2 == s))
      if (seeds.nonEmpty)
        assert(bfsOf(edges, seeds) == refBfs(edges, seeds),
          s"seed $seed diverged")
    }
  }

  // ---- weighted SSSP (the Bellman-Ford sibling) ---------------------------

  private def refSssp(edges: Set[(Long, Long, Long)], seeds: Set[Long])
      : Map[Long, Long] = {
    val adj = edges.toSeq
      .flatMap(e => Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
      .groupBy(_._1).map { case (n, g) => n -> g.map(x => (x._2, x._3)) }
    var dist = seeds.map(_ -> 0L).toMap
    var changed = true
    while (changed) {
      changed = false
      dist.toSeq.foreach { case (n, d) =>
        adj.getOrElse(n, Nil).foreach { case (m, c) =>
          if (!dist.contains(m) || dist(m) > d + c) {
            dist += m -> (d + c); changed = true
          }
        }
      }
    }
    dist
  }

  private def ssspOf(edges: Set[(Long, Long, Long)], seeds: Set[Long])
      : Map[Long, Long] = {
    val e = edges.toSeq.toDF("u", "v", "cost")
    val adjW = e.selectExpr("u AS src", "v AS dst", "cost")
      .unionAll(e.selectExpr("v AS src", "u AS dst", "cost"))
      .localCheckpoint()
    AnalyticsQueries.sssp(adjW, seeds.toSeq.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sssp: the CHEAPEST path beats the fewest-hops path (weighted != " +
      "BFS on this graph), islands stay absent") {
    // 0 -10- 1 -10- 2 plus a direct 0 -50- 2: dist(2) = 20, not 50
    val g = Set((0L, 1L, 10L), (1L, 2L, 10L), (0L, 2L, 50L),
      (30L, 31L, 1L))
    val got = ssspOf(g, Set(0L))
    assert(got == Map(0L -> 0L, 1L -> 10L, 2L -> 20L), s"$got")
  }

  test("sssp: a later round can REVISE an already-settled node (the " +
      "Bellman-Ford re-relaxation the one-pass frontier would miss)") {
    // direct 0-3 edge costs 100; the 3-hop chain totals 3 — node 3's
    // distance must drop from 100 to 3 across rounds
    val g = Set((0L, 3L, 100L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    val got = ssspOf(g, Set(0L))
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), s"$got")
  }

  test("sssp: randomized weighted graphs == reference Bellman-Ford, " +
      "multi-seed (three seeds)") {
    for (seed <- Seq(6, 66, 666)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 60).map { _ =>
        val a = rnd.nextInt(20).toLong
        val b = rnd.nextInt(20).toLong
        (math.min(a, b), math.max(a, b), 1L + rnd.nextInt(30))
      }.filter(e => e._1 != e._2).toSet
      val seeds = Set(0L, 7L).filter(s =>
        edges.exists(e => e._1 == s || e._2 == s))
      if (seeds.nonEmpty)
        assert(ssspOf(edges, seeds) == refSssp(edges, seeds),
          s"seed $seed diverged")
    }
  }
}
