package graft.queries

import graft.SparkSpec

/** [[PipelineQueries.textBigramKnOf]] against a plain-Scala
  * interpolated Kneser-Ney reference (score-for-score, the LangIdNb
  * convention), and [[PipelineQueries.collocationsOf]] against exact
  * hand-computed lifts on a planted corpus. */
class KnCollocSpec extends SparkSpec {
  import spark.implicits._

  test("textBigramKnOf == plain-Scala interpolated KN, micro-nat for " +
      "micro-nat, on a planted corpus with shared and unique contexts") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a cat and a dog"),
      (4L, "the cat the cat the cat"))
    val pairs = docs.flatMap { case (id, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      ws.sliding(2).filter(_.length == 2).map(a => (id, a(0), a(1)))
    }
    val cAb = pairs.groupBy(p => (p._2, p._3))
      .map { case (k, g) => k -> g.size.toLong }
    val cA = cAb.groupBy(_._1._1).map { case (a, g) => a -> g.values.sum }
    val n1pA = cAb.groupBy(_._1._1).map { case (a, g) => a -> g.size.toLong }
    val contB = cAb.groupBy(_._1._2).map { case (b, g) => b -> g.size.toLong }
    val tt = cAb.size.toLong
    def nllMicro(a: String, b: String): Long = {
      val d = PipelineQueries.KnDiscount
      val p = (math.max(cAb((a, b)).toDouble - d, 0.0) +
        ((d * n1pA(a)) * (contB(b).toDouble / tt.toDouble))) /
        cA(a).toDouble
      math.floor(-math.log(p) * PipelineQueries.NllMicro).toLong
    }
    val want = pairs.groupBy(_._1).map { case (id, ps) =>
      id -> ((ps.size.toLong, ps.map(p => nllMicro(p._2, p._3)).sum))
    }
    val got = PipelineQueries.textBigramKnOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want, s"got $got\nwant $want")
    // the smoothing is REAL on this corpus: "the cat" (frequent, many
    // contexts) must score cheaper than "a dog" (rare continuation)
    assert(nllMicro("the", "cat") < nllMicro("a", "dog"),
      "planted corpus must exercise a non-trivial KN ordering")
  }

  test("collocationsOf ranks an always-together pair above independent " +
      "frequent pairs, with the exact integer-quotient lift") {
    // "zig zag" occurs 6x and its words occur nowhere else;
    // "foo bar" co-occur 5x but each also appears apart 15x
    val docs =
      (1 to 6).map(i => (i.toLong, "zig zag")) ++
        (10 to 14).map(i => (i.toLong, "foo bar")) ++
        (20 to 34).map(i => (i.toLong, "foo baz")) ++
        (40 to 54).map(i => (i.toLong, "qux bar"))
    val got = PipelineQueries.collocationsOf(
      docs.toDF("doc_id", "text").select(org.apache.spark.sql.functions
        .col("text")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // token total: 2 * (6 + 5 + 15 + 15) = 82
    val n = 82L
    def lift(c12: Long, c1: Long, c2: Long): Long =
      math.floor((n.toDouble * 1000000.0) /
        (c1.toDouble * c2.toDouble) * c12).toLong
    assert(got.head == (("zig", "zag", 6L, lift(6, 6, 6))),
      s"exclusive pair must top: ${got.toSeq}")
    val fooBar = got.find(t => t._1 == "foo" && t._2 == "bar").get
    assert(fooBar._4 == lift(5, 20, 20), s"foo-bar lift: $fooBar")
    assert(got.head._4 > fooBar._4,
      "always-together must out-lift partially-independent")
    // the min-count cut is live: nothing below 5 occurrences appears
    assert(got.forall(_._3 >= PipelineQueries.CollocMinCount))
  }
}
