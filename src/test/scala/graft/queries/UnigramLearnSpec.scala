package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorMath

/**
 * Gates for the unigram-LM (Kudo/SentencePiece-family) tokenizer:
 * the frozen-vocab pin at sf0.01 (the corpus [[VectorMath
 * .UnigramVocab]] was learned from — the BpeMerges convention), an
 * independent plain-Scala hard-EM learner on sf0.001 (a corpus the
 * frozen table was NOT learned from; no Spark expressions shared),
 * a brute-force Viterbi optimality check of the segmentation kernel,
 * and the fertility comparison row's invariants.
 */
class UnigramLearnSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val MP = PipelineQueries.UnigramMaxPiece

  test("unigramLearn reproduces the frozen UnigramVocab at sf0.01 " +
      "piece-for-piece with identical costs") {
    val learned = PipelineQueries.unigramLearn(spark, "/root/testdata/sf0.01")
      .orderBy("piece").collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(learned == VectorMath.UnigramVocab.toSeq,
      s"learned vocab diverges from the frozen one: " +
        s"${learned.zip(VectorMath.UnigramVocab)
          .find(p => p._1 != p._2)}")
  }

  // ---- independent plain-Scala reference learner --------------------------

  private def micro(c: Long, tot: Long, k: Int): Long =
    math.floor(-math.log((c + 1.0) / (tot + k).toDouble) * 1000000.0).toLong

  private def refSegment(w: String, cost: Map[String, Long]): Seq[String] = {
    val n = w.length
    val INF = Long.MaxValue / 4
    val dp = Array.fill(n + 1)(INF)
    val bl = Array.fill(n + 1)(0)
    dp(0) = 0L
    for (i <- 1 to n; l <- 1 to math.min(i, MP)) {
      val c = cost.get(w.substring(i - l, i))
        .orElse(if (l == 1) Some(VectorMath.UnigramUnkMicro) else None)
      c.foreach { cc =>
        if (dp(i - l) < INF) {
          val cand = dp(i - l) + cc
          if (cand < dp(i) || (cand == dp(i) && l > bl(i))) {
            dp(i) = cand; bl(i) = l
          }
        }
      }
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) { out.prepend(w.substring(p - bl(p), p)); p -= bl(p) }
    out.toList
  }

  private def refAlt(p: String, cost: Map[String, Long]): Long = {
    val n = p.length
    val INF = Long.MaxValue / 4
    val dp = Array.fill(n + 1)(INF)
    dp(0) = 0L
    for (i <- 1 to n; l <- 1 to math.min(i, MP) if !(l == n && i == n)) {
      cost.get(p.substring(i - l, i))
        .orElse(if (l == 1) Some(VectorMath.UnigramUnkMicro) else None)
        .foreach { c =>
          if (dp(i - l) < INF && dp(i - l) + c < dp(i)) dp(i) = dp(i - l) + c
        }
    }
    dp(n)
  }

  private def refLearn(docs: Seq[String]): Seq[(String, Long, Long)] = {
    val vocab = docs.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val subCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- vocab; i <- 0 until w.length;
         l <- 1 to math.min(MP, w.length - i)) {
      val p = w.substring(i, i + l)
      subCnt(p) = subCnt.getOrElse(p, 0L) + f
    }
    val singles = subCnt.toSeq.filter(_._1.length == 1)
    val multis = subCnt.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }.take(PipelineQueries.UnigramSeedK)
    def costs(cnts: Seq[(String, Long)]): Map[String, Long] = {
      val tot = cnts.map(_._2).sum
      val k = cnts.size
      cnts.map { case (p, c) => p -> micro(c, tot, k) }.toMap
    }
    var cur: Seq[(String, Long)] = singles ++ multis
    var curC = costs(cur)
    for (r <- 1 to PipelineQueries.UnigramRounds) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- vocab; piece <- refSegment(w, curC))
        counts(piece) = counts.getOrElse(piece, 0L) + f
      val withCnt = cur.map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      cur =
        if (r == PipelineQueries.UnigramRounds) withCnt
        else {
          val interimC = costs(withCnt)
          val multisCur = withCnt.filter(_._1.length >= 2)
          val nKeep = math.ceil(multisCur.size * 3.0 / 4).toInt
          val keptM = multisCur
            .map { case (p, c) => (p, c, c * (refAlt(p, interimC) - interimC(p))) }
            .sortBy { case (p, _, loss) => (-loss, p) }
            .take(nKeep).map(t => (t._1, t._2))
          withCnt.filter(_._1.length == 1) ++ keptM
        }
      curC = costs(cur)
    }
    cur.map { case (p, c) => (p, c, curC(p)) }.sortBy(_._1)
  }

  test("unigramLearn matches the independent plain-Scala hard-EM " +
      "learner on a corpus the frozen table was NOT learned from " +
      "(sf0.001)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val want = refLearn(docs)
    val got = PipelineQueries.unigramLearn(spark, sfDir)
      .orderBy("piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want,
      s"first divergence: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("unigramSegment is Viterbi-optimal with the longest-final-piece " +
      "tie-break: brute-force enumeration agrees on every corpus word " +
      "and on adversarial strings") {
    val cost = VectorMath.UnigramVocab.toMap
    def enumerate(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(MP, w.length)).flatMap { l =>
        val piece = w.substring(0, l)
        if (cost.contains(piece) || l == 1)
          enumerate(w.substring(l)).map(piece :: _)
        else Nil
      }
    def segCost(ss: List[String]): Long = ss.map(p =>
      cost.getOrElse(p, VectorMath.UnigramUnkMicro)).sum
    // the kernel's tie-break, applied recursively = compare the piece
    // LENGTH sequence from the END, longer first
    def tieKey(ss: List[String]): Seq[Int] = ss.reverse.map(-_.length)
    import scala.math.Ordering.Implicits.seqOrdering
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0)).toSeq ++
      Seq("zzz", "joinjoin", "xqx", "a", "é雪", "scanscanscan")
    words.foreach { w =>
      val all = enumerate(w)
      assert(all.nonEmpty, s"no segmentation for <$w>")
      val best = all.minBy(ss => (segCost(ss), tieKey(ss)))
      val got = VectorMath.unigramSegment(w,
        VectorMath.UnigramVocab.map(_._1).toArray,
        VectorMath.UnigramVocab.map(_._2).toArray, MP)
      assert(got == best.mkString(" "),
        s"<$w>: kernel <$got> vs brute-force <${best.mkString(" ")}>")
    }
  }

  test("textTokensUnigram is one row-local kernel projection: any " +
      "Exchange is a bug (the frozen-model-apply contract)") {
    val q = PipelineQueries.textTokensUnigram(spark, sfDir)
    assert(q.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "textTokensUnigram must not shuffle")
  }

  test("fertility comparison row: unigram_tokens covers every word at " +
      "least once and both fertilities are >= 1") {
    val rows = PipelineQueries.bpeFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getAs[Long]("ws_tokens")
      val uni = r.getAs[Long]("unigram_tokens")
      assert(uni >= ws, s"a word segments to >= 1 piece: $r")
      assert(r.getAs[Double]("fertility") >= 1.0 &&
        r.getAs[Double]("unigram_fertility") >= 1.0, s"$r")
    }
  }
}
