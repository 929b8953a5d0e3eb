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
}
