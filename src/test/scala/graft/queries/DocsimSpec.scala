package graft.queries

import graft.SparkSpec

/** [[PipelineQueries.docsimOf]] — inverted-index tf-idf cosine doc
  * pairs over word bigrams: plain-Scala reference agreement, the
  * df-fraction stop-term prune, tf multiplicity, and the
  * single-word-doc boundary. */
class DocsimSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference of the same definition (bigram terms,
    * df ≤ frac·N prune, nano-quantized dot/norm sums, one cosine). */
  private def ref(docs: Seq[(Long, String)], frac: Double, topN: Int)
      : Seq[(Long, Long, Double)] = {
    val n = docs.size
    val cap = math.floor(n * frac).toLong
    val tf = scala.collection.mutable.Map
      .empty[(Long, String), Long].withDefaultValue(0L)
    for ((id, t) <- docs) {
      val ws = t.split("\\s+").filter(_.nonEmpty)
      ws.zip(ws.drop(1)).foreach { case (a, b) => tf((id, a + " " + b)) += 1 }
    }
    val df = tf.keys.toSeq.groupBy(_._2).map { case (t, g) =>
      t -> g.size.toLong }
    val w = tf.toSeq.collect { case ((id, t), c) if df(t) <= cap =>
      (id, t, c * math.log(n.toDouble / df(t))) }
    val ss = w.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map(r => math.floor(r._3 * r._3 * 1e9).toLong).sum }
    val dots = scala.collection.mutable.Map
      .empty[(Long, Long), Long].withDefaultValue(0L)
    for ((t, rows) <- w.groupBy(_._2);
         Seq(a, b) <- rows.sortBy(_._1).combinations(2))
      dots((a._1, b._1)) += math.floor(a._3 * b._3 * 1e9).toLong
    dots.toSeq.map { case ((d1, d2), dot) =>
      (d1, d2, dot / (math.sqrt(ss(d1).toDouble) * math.sqrt(ss(d2).toDouble)))
    }.sortBy { case (d1, d2, s) => (-s, d1, d2) }.take(topN)
      .map { case (d1, d2, s) => (d1, d2,
        BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
  }

  test("docsimOf == reference on a planted fixture; pairs sharing " +
      "ONLY a stop-fraction bigram are ABSENT (the posting guard is " +
      "semantic, not just a speedup); tf multiplicity weighs in") {
    // 'common pair' spans 3 docs > cap=2 (N=45, frac 0.05) -> pruned;
    // docs 0,1 share 'alpha beta' (kept); 3,4 share a REPEATED bigram
    val real = Seq(
      (0L, "alpha beta gamma common pair"),
      (1L, "alpha beta delta common pair"),
      (2L, "epsilon zeta common pair"),
      (3L, "rep rep rep rep"), // bigram 'rep rep' tf=3
      (4L, "rep rep theta"))
    // single-word fillers: raise N without entering the bigram space
    val fillers = (100L until 140L).map(i => (i, s"filler$i"))
    val docs = real ++ fillers
    val got = PipelineQueries.docsimOf(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = ref(docs, PipelineQueries.DocsimDfFrac,
      PipelineQueries.DocsimTopN)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((0L, 1L)), "kept-bigram pair must score")
    assert(pairs.contains((3L, 4L)), "repeated-bigram pair must score")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      s"pairs sharing only the pruned stop bigram must be absent: $pairs")
    // tf multiplicity: doc3's 'rep rep' tf=3 vs doc4's tf=1 — the
    // reference already encodes it; pin the pair really has sim < 1
    // (unequal vectors) yet > 0
    val repSim = got.find(r => (r._1, r._2) == ((3L, 4L))).get._3
    assert(repSim > 0 && repSim < 1, s"rep-pair cosine: $repSim")
  }
}
