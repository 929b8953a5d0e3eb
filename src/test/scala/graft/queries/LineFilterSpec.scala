package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level cleaning against an INDEPENDENT plain-Scala reference
  * (java split/regex/codePointCount — none of the kernel's devices),
  * handcrafted boundary lines, deterministic fuzz over a '\n'-heavy
  * alphabet, and the engineered-fixture contract at sf0.001. */
class LineFilterSpec extends SparkSpec {

  /** Reference implementation, written to the rule SPEC with different
    * machinery than the kernel: split(-1) keeps trailing empties,
    * classes by java regex, dup by mutable Set, first-match precedence
    * dup > bullet > numeric > short. */
  private def ref(text: String)
      : (Long, Long, Long, Long, Long, Long, Double, String) = {
    val lines = text.split("\n", -1)
    val seen = scala.collection.mutable.Set.empty[String]
    var (kept, dup, bul, num, sho, endp) = (0L, 0L, 0L, 0L, 0L, 0L)
    val keptLines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines.foreach { line =>
      if (line.nonEmpty && ".!?".contains(line.last)) endp += 1
      if (!seen.add(line)) dup += 1
      else if (Seq("- ", "* ", "• ").exists(line.startsWith)) bul += 1
      else if (line.matches("[0-9 .,:%/-]+") && line.exists(_.isDigit)) num += 1
      else if (line.codePointCount(0, line.length) < 10) sho += 1
      else { kept += 1; keptLines += line }
    }
    val frac = BigDecimal(endp.toDouble / lines.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (lines.length.toLong, kept, dup, bul, num, sho, frac,
      keptLines.mkString("\n"))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def run(texts: Seq[String]): Unit = {
    val df = spark.createDataFrame(texts.zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    }).toDF("doc_id", "text")
    val got = PipelineQueries.lineFilterProjection(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (nl, nk, nd, nb, nn, ns, fr, keptText) = ref(t)
      val r = got(i.toLong)
      val label = s"doc $i ${t.replace("\n", "\\n")}"
      assert(r.getAs[Long]("n_lines") == nl, s"$label n_lines")
      assert(r.getAs[Long]("n_kept") == nk, s"$label n_kept")
      assert(r.getAs[Long]("n_dup_line") == nd, s"$label n_dup_line")
      assert(r.getAs[Long]("n_bullet") == nb, s"$label n_bullet")
      assert(r.getAs[Long]("n_numeric") == nn, s"$label n_numeric")
      assert(r.getAs[Long]("n_short") == ns, s"$label n_short")
      assert(r.getAs[Double]("frac_end_punct") == fr, s"$label frac")
      assert(r.getAs[String]("clean_hash") == md5hex(keptText), s"$label hash")
    }
  }

  test("handcrafted boundary lines match the reference") {
    run(Seq(
      "",                         // one empty line: short
      "\n",                       // two empties: short, then DUP
      "- bulleted line here\n-not a bullet but long enough here\n* x",
      "42\n4,2: 50% / 8-9\n.\n..., ,,,",  // numeric, numeric, no-digit shorts
      "exactly 9\nexactly 10\nexactly 10", // 9 short, 10 kept, then dup
      "- same bullet\n- same bullet",      // bullet once, dup second
      "ends well.\nends badly\nhuh?!\nwhat!",
      "😀😀😀😀😀😀😀😀😀\n😀😀😀😀😀😀😀😀😀😀", // 9 codepoints short, 10 kept
      "This stays.\n\nThis stays too!\nThis stays.\n0 1 2 3 4 5"))
  }

  test("deterministic fuzz over a newline-heavy alphabet matches the " +
      "reference") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "ab -*•.!?,:%/0123456789\n"
    val texts = (0 until 200).map { _ =>
      val len = rnd.nextInt(60)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    run(texts)
  }

  test("the sf0.001 fixture trips exactly the rule its doc_id selects") {
    val rows = PipelineQueries.textLineFilter(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expect = (id % 4) match {
        case 0 => ("n_bullet", 2L)  // base + kept line + bullet
        case 1 => ("n_numeric", 2L)
        case 2 => ("n_short", 2L)
        case _ => ("n_dup_line", 2L)
      }
      assert(r.getAs[Long]("n_lines") == 3L, s"doc $id n_lines")
      assert(r.getAs[Long]("n_kept") == expect._2, s"doc $id n_kept")
      assert(r.getAs[Long](expect._1) == 1L, s"doc $id ${expect._1}")
    }
  }

  test("lineFilterStream is the batch projection (same rows on the " +
      "same frame)") {
    val df = PipelineQueries.lineAugment(
      graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("text")))
    val batch = PipelineQueries.lineFilterProjection(df).collect().toSet
    val live = graft.streaming.StreamOps.lineFilterStream(df).collect().toSet
    assert(batch == live)
  }
}
