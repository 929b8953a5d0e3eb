package graft.queries

import graft.SparkSpec

/** [[AnalyticsQueries.kCore]] — iterative peeling: the cascading
  * deletion a single degree filter cannot express, against a
  * plain-Scala reference on planted and randomized graphs. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Reference peeling over an undirected edge set. */
  private def refCore(edges: Set[(Long, Long)], k: Int)
      : Map[Long, Long] = {
    var cur = edges
    var changed = true
    while (changed) {
      val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, g) => n -> g.size }
      val drop = deg.collect { case (n, d) if d < k => n }.toSet
      changed = drop.nonEmpty
      cur = cur.filter(e => !drop(e._1) && !drop(e._2))
    }
    cur.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, g) => n -> g.size.toLong }
  }

  private def coreOf(edges: Set[(Long, Long)], k: Int): Map[Long, Long] =
    AnalyticsQueries.kCore(edges.toSeq.toDF("u", "v"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cascading peel: a pendant chain off a 4-clique unravels link " +
      "by link at k=2 (one degree filter would only drop the tip), " +
      "the clique survives with within-core degrees") {
    // 4-clique {1,2,3,4} + chain 4-5-6-7
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val edges = (clique ++ chain).toSet
    val got = coreOf(edges, 2)
    // one filter pass drops only node 7 (deg 1); the fixpoint must
    // cascade 6 then 5 away too
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"expected the bare 4-clique: $got")
    assert(got == refCore(edges, 2))
  }

  test("empty core above the degeneracy; everything-core at k <= min " +
      "degree") {
    val clique = (for (i <- 1L to 4L; j <- (i + 1) to 4L)
      yield (i, j)).toSet
    assert(coreOf(clique, 4).isEmpty, "k above degeneracy must empty")
    assert(coreOf(clique, 3) == refCore(clique, 3))
    assert(coreOf(clique, 3).values.toSet == Set(3L))
  }

  test("randomized graphs == reference peeling (three seeds, k = 3)") {
    for (seed <- Seq(11, 77, 2026)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 60).map { _ =>
        val a = rnd.nextInt(18).toLong
        val b = rnd.nextInt(18).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).toSet
      assert(coreOf(edges, 3) == refCore(edges, 3), s"seed $seed diverged")
    }
  }

  test("rebase fallback: a tiny broadcast budget (every regime " +
      "boundary crossed — pure-broadcast, rebase-with-broadcast, " +
      "rebase-with-shuffled-anti) peels identically to the default") {
    // the pendant chain forces one-node rounds (cumulative regime) and
    // the random graphs force multi-node waves; bcCap = 1 makes EVERY
    // round past the first rebase (and any wave > 1 node take the
    // shuffled anti-join arm), bcCap = 3 mixes the regimes
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val planted = (clique ++ chain).toSet
    for (cap <- Seq(1L, 3L)) {
      def capped(edges: Set[(Long, Long)], k: Int): Map[Long, Long] =
        AnalyticsQueries.kCore(edges.toSeq.toDF("u", "v"), k, bcCap = cap)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(capped(planted, 2) == refCore(planted, 2),
        s"cap=$cap diverged on the planted cascade")
      val rnd = new scala.util.Random(42)
      val edges = (1 to 60).map { _ =>
        val a = rnd.nextInt(18).toLong
        val b = rnd.nextInt(18).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).toSet
      assert(capped(edges, 3) == refCore(edges, 3),
        s"cap=$cap diverged on the random graph")
    }
  }
}
