package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup-key normalization against an INDEPENDENT char-table
  * reference (no java.text.Normalizer anywhere in the expected side),
  * the decomposed == precomposed fold pin, idempotence, and the
  * engineered-fixture contract at sf0.001. */
class NormalizeSpec extends SparkSpec {

  private def kernel(texts: Seq[String]): Seq[(Long, Long, Boolean, String)] = {
    val df = spark.createDataFrame(texts.zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    }).toDF("id", "text")
    df.select(col("id"),
      graft.functions.native.normalize_text(col("text")).as("st"))
      .select(col("id"), col("st.n_chars_raw"), col("st.n_chars_norm"),
        col("st.changed"), col("st.norm"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))
      .toSeq
  }

  test("known values: accents fold, case folds, whitespace collapses") {
    val cases = Seq(
      // decomposed e+U+0301 and precomposed U+00E9 land on one string
      "Cafe\u0301" -> "cafe",
      "Caf\u00e9" -> "cafe",
      "CR\u00c8ME br\u00fbl\u00e9e" -> "creme brulee",
      "\u00d1and\u00fa" -> "nandu",
      "  A\t\tB  " -> "a b",
      "" -> "",
      " \t " -> "",
      "already clean" -> "already clean",
      // U+000B: RE2's \s excludes it (empirically verified in DuckDB),
      // so the kernel must pass it through as a regular character
      "a\u000Bb" -> "a\u000Bb",
      "MIXED Case!" -> "mixed case!")
    val got = kernel(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), (_, _, changed, norm)) =>
      assert(norm == want, s"'$in' -> '$norm', want '$want'")
      assert(changed == (in != want), s"'$in' changed flag")
    }
  }

  test("decomposed and precomposed augment classes fold to the same " +
      "bytes; codepoint counts differ before, agree after") {
    val dec = " Cafe\u0301  CRE\u0300ME du jour"
    val pre = " Caf\u00e9  CR\u00c8ME du jour"
    val Seq((rawD, normD, _, nD), (rawP, normP, _, nP)) = kernel(Seq(dec, pre))
    assert(nD == nP && nD == "cafe creme du jour")
    assert(rawD == rawP + 2, "combining marks must count as codepoints")
    assert(normD == normP)
  }

  test("normalization is idempotent over the fixture corpus and fuzz") {
    val docs = PipelineQueries.normalizeAugment(
      graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("text")))
      .collect().map(_.getString(1)).toSeq
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "aA \u00e9\u00c9\u0301\u00f1\u00d1\t.!Zz "
    val fuzz = (0 until 150).map { _ =>
      (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val all = docs ++ fuzz
    val once = kernel(all).map(_._4)
    val twice = kernel(once)
    once.zip(twice).foreach { case (n1, (_, _, changed, n2)) =>
      assert(n1 == n2, s"not idempotent: '$n1' -> '$n2'")
      assert(!changed)
    }
  }

  test("fuzz matches an independent char-table reference (no " +
      "Normalizer in the expected side)") {
    val fold = Map('\u00e9' -> "e", '\u00c9' -> "e",
      '\u00f1' -> "n", '\u00d1' -> "n",
      '\u0301' -> "", '\u0300' -> "")
    def ref(s: String): String = {
      val folded = s.flatMap(c => fold.get(c).getOrElse(
        if (c == '\t') " " else c.toLower.toString))
      folded.split(" +", -1).filter(_.nonEmpty).mkString(" ")
    }
    val rnd = new scala.util.Random(42L)
    val alphabet = "aA \u00e9\u00c9\u0301\u00f1\u00d1\t.!Zz "
    val fuzz = (0 until 200).map { _ =>
      (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    kernel(fuzz).zip(fuzz).foreach { case ((_, _, _, norm), in) =>
      assert(norm == ref(in), s"'$in': '$norm' != '${ref(in)}'")
    }
  }

  test("dedup_normalized merges decomposed/precomposed surface " +
      "variants the whitespace-only fingerprint keeps apart") {
    val aug = PipelineQueries.normalizeAugment(spark.createDataFrame(Seq(
      (0L, "same base words"), (1L, "same base words"),
      (2L, "same base words"))).toDF("doc_id", "text"))
    def groups(key: org.apache.spark.sql.Column): Map[String, Set[Long]] =
      aug.groupBy(key.as("k"))
        .agg(collect_list(col("doc_id")).as("ids")).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val norm = groups(md5(graft.functions.native
      .normalize_text(col("text")).getField("norm")))
    val plain = groups(graft.ops.TextAnalyticsOps.fingerprint(col("text")))
    assert(norm.values.toSet.contains(Set(0L, 1L)),
      s"accent variants did not merge under normalization: $norm")
    assert(plain.values.forall(_.size == 1),
      s"whitespace-only fingerprint should keep all three apart: $plain")
    val sf = PipelineQueries.dedupNormalized(spark, "/root/testdata/sf0.001")
      .collect()
    assert(sf.map(_.getAs[Long]("n")).sum == 500, "groups must partition")
  }

  test("every doc in the engineered fixture changes under " +
      "normalization (each class trips a fold)") {
    val rows = PipelineQueries.textNormalize(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("changed"),
        s"doc ${r.getAs[Long]("doc_id")} unchanged")
      assert(r.getAs[Long]("n_chars_norm") <= r.getAs[Long]("n_chars_raw"))
    }
  }
}
