package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Adversarial-boundary gates for [[PipelineQueries.piiProjection]]: a
 * plain java.util.regex + MessageDigest reference (no Spark
 * expressions shared with the projection) recomputes every count and
 * the clean hash over handcrafted edge cases — PII at string edges,
 * adjacent hits, class overlap (ip inside a non-email), unicode
 * neighbors — plus a deterministic fuzz corpus. The DuckDB oracle
 * covers Spark↔RE2 engine parity on the gated corpus; this spec
 * covers the CLASS DEFINITIONS themselves where redaction is easiest
 * to get wrong.
 */
class PiiScrubSpec extends SparkSpec {
  import PipelineQueries.{PiiClasses, piiToken}

  /** Reference scrub: progressive leftmost-first redaction, counts
   *  taken per stage on the text earlier classes left behind. */
  private def ref(text: String): (Seq[Long], String) = {
    var t = text
    val counts = PiiClasses.map { case (cls, pat) =>
      val p = java.util.regex.Pattern.compile(pat)
      val m = p.matcher(t)
      var c = 0L
      while (m.find()) c += 1
      t = p.matcher(t).replaceAll(
        java.util.regex.Matcher.quoteReplacement(piiToken(cls)))
      c
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    (counts, md.digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  private def run(rows: Seq[String]): Unit = {
    import spark.implicits._
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = PipelineQueries.piiProjection(df)
      .collect().map(r => r.getLong(0) ->
        ((1 to PiiClasses.length).map(r.getLong(_)), r.getString(
          PiiClasses.length + 1))).toMap
    rows.zipWithIndex.foreach { case (t, i) =>
      val (wantCounts, wantHash) = ref(t)
      val (gotCounts, gotHash) = got(i.toLong)
      assert(gotCounts == wantCounts,
        s"counts for <$t>: got $gotCounts want $wantCounts")
      assert(gotHash == wantHash, s"hash for <$t>")
    }
  }

  test("edge positions, adjacency, overlap, unicode — every handcrafted " +
      "boundary matches the plain-regex reference") {
    run(Seq(
      // PII at the very start / very end / the whole string
      "a@b.co starts it", "ends with a@b.co", "a@b.co",
      "555-123-4567", "1.2.3.4", "AB123456",
      // adjacent hits of the same and different classes
      "a@b.co c@d.co", "a@b.co,c@d.co", "1.2.3.4 5.6.7.8",
      "a@b.co 555-123-4567 1.2.3.4 AB123456",
      "x a@b.co1.2.3.4 y", // email greedily eats digits? reference decides
      // class overlap: not-an-email with an ip inside — email declines
      // (tld must be alphabetic), ipv4 claims its run
      "user@1.2.3.4", "ping 10.0.0.1 from user@host.example",
      // phone forms: paren + space, dots, hyphens; and a NON-match
      // (2-digit block) that must survive
      "(555) 123-4567", "555.123.4567", "55-123-4567 stays",
      // paren + TAB/NEWLINE match; paren + U+000B must NOT (the class
      // spells out RE2's \s = [ \t\n\f\r]; Java's \s ALSO includes
      // VT, so writing \s would diverge engine vs oracle)
      "(555)\t123-4567", "(555)\n123-4567", "(555)123-4567",
      "(555)\u000B123-4567 stays",
      // id-shaped: boundaries and a too-short non-match
      "AB123456 ok", "xAB123456 glued stays", "AB12345 short stays",
      // unicode neighbors (ASCII \\b semantics must agree)
      "é a@b.co é", "雪 1.2.3.4 雪", "☂555-123-4567☂",
      // empties and no-PII text
      "", "plain text only", "@ . - ()",
      // sentinel inertness: pre-existing sentinel text is untouched
      "<pii:email> a@b.co"))
  }

  test("deterministic fuzz corpus matches the reference") {
    val rnd = new scala.util.Random(42)
    val frags = Seq("a@b.co", "x@y.org", "1.2.3.4", "10.0.255.7",
      "555-123-4567", "(555) 987-6543", "AB123456", "ZZ9999999999",
      "word", "émot", "123", "a@b", "1.2.3", "555-12-3456", ".", "@")
    val rows = (1 to 200).map { _ =>
      (0 until rnd.nextInt(8)).map(_ => frags(rnd.nextInt(frags.length)))
        .mkString(Seq(" ", "", ",")(rnd.nextInt(3)))
    }
    run(rows)
  }
}
