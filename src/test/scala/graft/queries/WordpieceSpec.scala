package graft.queries

import graft.SparkSpec
import graft.functions.VectorMath

/** The WordPiece family: [[PipelineQueries.wordpieceLearnOf]] against
  * an independent plain-Scala likelihood-ratio learner, the frozen
  * vocab's provenance (learned == frozen at sf0.01), and the greedy
  * longest-match encoder against a plain-Scala reference on
  * adversarial boundaries + fuzz. */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference learner: same public algorithm (Schuster &
    * Nakajima 2012 likelihood-ratio merges over ##-classed symbols),
    * plain Scala collections. */
  private def refLearn(words: Seq[(String, Long)], k: Int)
      : Seq[(Long, String, String, Double)] = {
    var segs: Seq[(Vector[String], Long)] = words.map { case (w, f) =>
      w.toVector.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c } -> f
    }
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Double)]
    var done = false
    while (rules.size < k && !done) {
      val pairCnt = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      val symCnt = scala.collection.mutable.Map
        .empty[String, Long].withDefaultValue(0L)
      for ((ss, f) <- segs) {
        ss.foreach(s => symCnt(s) += f)
        if (ss.size >= 2) ss.sliding(2).foreach { p =>
          pairCnt((p(0), p(1))) += f
        }
      }
      if (pairCnt.isEmpty) done = true
      else {
        val (a, b, score) = pairCnt.toSeq
          .map { case ((a, b), c) =>
            (a, b, c.toDouble / (symCnt(a) * symCnt(b)).toDouble) }
          .sortBy { case (a, b, s) => (-s, a, b) }.head
        rules += ((rules.size + 1L, a, b,
          BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
        if (rules.size < k) {
          val merged = a + b.stripPrefix("##")
          segs = segs.map { case (ss, f) =>
            ss.foldLeft(Vector.empty[String]) { (acc, t) =>
              if (acc.nonEmpty && acc.last == a && t == b)
                acc.init :+ merged
              else acc :+ t
            } -> f
          }
        }
      }
    }
    rules.toSeq
  }

  /** Independent reference encoder: greedy max-munch with ## classes
    * and whole-word [UNK]. */
  private def refGreedy(w: String, vocab: Set[String], maxC: Int): String = {
    if (w.isEmpty) return ""
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val ls = (1 to math.min(maxC, w.length - i)).reverse
      val hit = ls.map { l =>
        if (i == 0) w.substring(0, l) else "##" + w.substring(i, i + l)
      }.find(vocab.contains)
      hit match {
        case None => return VectorMath.WordpieceUnk
        case Some(p) =>
          out += p
          i += (if (p.startsWith("##")) p.length - 2 else p.length)
      }
    }
    out.mkString(" ")
  }

  test("wordpieceLearnOf == the independent reference learner on a " +
      "fixture corpus (ranks, pairs, and the one-division scores), " +
      "including the likelihood-ratio signature: a rare-but-cohesive " +
      "pair beats a frequent-but-promiscuous one") {
    // 'qu' appears 3x and q/##u appear ONLY together (score 1/…);
    // 'th' appears 9x but t and ##h are both promiscuous
    val docs = Seq(
      "the that then quiz quay queen tall hat tin",
      "the that then toll ham tap hit hop").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = PipelineQueries.wordpieceLearnOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).toSeq
      .map { case (w, g) => (w, g.length.toLong) }
    val want = refLearn(words, PipelineQueries.WordpieceLearnK)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"rule ${g._1}: got $g want $w")
    }
    // the signature: the FIRST merge is not raw-frequency BPE's.
    // Initial pair counts put (t, ##h) on top (cnt 6, but t and ##h
    // are promiscuous — score 6/(10·6) = 0.1); the likelihood ratio
    // instead picks a low-count always-co-occurring pair (score 1/3)
    val initPairs = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    for ((w, f) <- words; p <- w.toVector.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }.sliding(2))
      initPairs((p(0), p(1))) += f
    val bpePick = initPairs.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head
    assert(bpePick._1 == (("t", "##h")) && bpePick._2 == 6L,
      s"fixture drifted: raw-frequency argmax is $bpePick")
    assert((got.head._2, got.head._3) != bpePick._1 &&
      initPairs((got.head._2, got.head._3)) < bpePick._2,
      s"first merge ${got.head} must not be the raw-frequency pick")
  }

  test("same-symbol rule over a FIVE-long run: the learner's left-to-" +
      "right fold leaves the odd symbol at the END ([x,##xx,##xx,##x]) " +
      "— the exact order a fenced double-replace apply (the bpeLearn " +
      "oracle device) would get wrong, which is why the wordpiece " +
      "oracle uses bracketed '|sym;' tokens") {
    // every head pair is diluted below 4/25 = 0.16 (x heads 3 words,
    // the others 2, ##a/##b each end 4), so rule 1 IS (##x, ##x),
    // applied while the ##x run is still 5 long
    val corpus = "xxxxxx xa xb ya yb za zb wa wb"
    val docs = Seq((0L, corpus)).toDF("doc_id", "text")
    val got = PipelineQueries.wordpieceLearnOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val want = refLearn(corpus.split(" ").toSeq.map((_, 1L)),
      PipelineQueries.WordpieceLearnK)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    assert(got.head._2 == "##x" && got.head._3 == "##x",
      s"rule 1 must be the same-symbol run merge: ${got.toSeq}")
  }

  test("frozen WordpieceVocab provenance: re-learning at sf0.01 " +
      "reproduces VectorMath.WordpieceMerges row-for-row") {
    val learned = PipelineQueries
      .wordpieceLearn(spark, "/root/testdata/sf0.01")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(learned.toSeq == VectorMath.WordpieceMerges,
      "the frozen merge table drifted from what sf0.01 learns")
  }

  test("greedy encoder == reference on adversarial boundaries: full-" +
      "word piece, maximal munch, mid-word position-class miss, " +
      "unseen char, empty, [UNK] word isolation") {
    val vocab = VectorMath.WordpieceVocab.toSet
    val maxC = VectorMath.WordpieceMaxContent
    val cases = Seq(
      "column",   // one full-word piece
      "columns",  // full piece + continuation
      "agg",      // maximal munch prefers 'agg' over 'ag'+'##g'
      "aggi",     // munch then continuation
      "aft",      // 'a' then ##f MISSING (f is initial-only) -> [UNK]
      "zebra",    // unseen initial char -> [UNK]
      "a",        // single char
      "batch", "quick", "join", "wind", "window")
    cases.foreach { w =>
      val got = VectorMath.wordpieceSegment(w,
        VectorMath.WordpieceVocab.toArray, maxC)
      val want = refGreedy(w, vocab, maxC)
      assert(got == want, s"'$w': got '$got' want '$want'")
    }
    // spot-pin the semantics, not just self-consistency
    assert(VectorMath.wordpieceSegment("column",
      VectorMath.WordpieceVocab.toArray, maxC) == "column")
    assert(VectorMath.wordpieceSegment("aggi",
      VectorMath.WordpieceVocab.toArray, maxC) == "agg ##i")
    assert(VectorMath.wordpieceSegment("aft",
      VectorMath.WordpieceVocab.toArray, maxC) == "[UNK]")
    assert(VectorMath.wordpieceSegment("",
      VectorMath.WordpieceVocab.toArray, maxC) == "")
  }

  test("greedy encoder fuzz: 300 random words (alphabet chars + " +
      "occasional unseen chars) == reference; encode struct counts " +
      "match the piece streams") {
    val vocab = VectorMath.WordpieceVocab.toSet
    val maxC = VectorMath.WordpieceMaxContent
    val rnd = new scala.util.Random(20260815)
    val chars = "abcdefghijklmnopqrstuvwxyz" + "zz" // bias unseen 'z'
    (1 to 300).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(10)))
        .map(_ => chars(rnd.nextInt(chars.length))).mkString
      val got = VectorMath.wordpieceWordPieces(w)
      val want = refGreedy(w, vocab, maxC)
      assert(got == want, s"'$w': got '$got' want '$want'")
    }
    // whole-text encode: n_tokens == total pieces across words
    val txt = "the quick batch join aft zebra  column"
    val row = VectorMath.wordpieceEncode(txt)
    val enc = row.getUTF8String(1).toString
    assert(row.getLong(0) == enc.split(" ").length,
      s"n_tokens must equal the piece count: $row / '$enc'")
    assert(enc == txt.split("\\s+").filter(_.nonEmpty)
      .map(w => refGreedy(w, vocab, maxC)).mkString(" "))
  }
}
