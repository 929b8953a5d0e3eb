package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination against an INDEPENDENT plain-Scala
  * reference (md5 straight from MessageDigest, its own gram windows and
  * position arithmetic — no VectorMath call anywhere), plus the Bloom
  * contract itself: exact-flagged ⊆ bloom-flagged (no false
  * negatives), and a deliberately saturated small filter where false
  * positives MUST appear and must match the reference exactly. */
class BloomDecontSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val n = PipelineQueries.DecontN
  private val k = PipelineQueries.DecontBloomK

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  private def gramHashes(text: String): Seq[Long] = {
    val ws = text.split("\\s+").filter(_.nonEmpty)
    (0 to ws.length - n).map(i => md5_60(ws.slice(i, i + n).mkString(" ")))
      .distinct
  }

  private def positions(h: Long, mBits: Int): Seq[Long] = {
    val mask = (mBits - 1).toLong
    val a = h & 0xFFFFFL
    val b = (h >>> 20) & 0xFFFFFL
    val c = (h >>> 40) & 0xFFFFFL
    (0 until k).map(i => (a + i * b + (i.toLong * (i - 1) / 2) * c) & mask)
  }

  /** Reference: per non-holdout doc, (n_grams, bloom hits, exact hits)
    * from scratch at bitmap size `mBits`. */
  private def reference(docs: Seq[(Long, String)], mBits: Int)
      : Map[Long, (Long, Long, Long)] = {
    val bench = docs.filter(_._1 % PipelineQueries.DecontHoldout == 0)
      .flatMap(d => gramHashes(d._2)).toSet
    val bits = bench.flatMap(positions(_, mBits))
    docs.filterNot(_._1 % PipelineQueries.DecontHoldout == 0).map {
      case (id, text) =>
        val gs = gramHashes(text)
        val bloom = gs.count(h => positions(h, mBits).forall(bits.contains))
        val exact = gs.count(bench.contains)
        id -> (gs.size.toLong, bloom.toLong, exact.toLong)
    }.toMap
  }

  private def corpus(): Seq[(Long, String)] =
    graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq

  test("decontaminate_bloom matches the plain-Scala reference exactly " +
      "and contains the exact flags (no false negatives)") {
    val ref = reference(corpus(), PipelineQueries.DecontBloomBits)
    val got = PipelineQueries.decontaminateBloom(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wantFlagged = ref.collect { case (id, (ng, bl, _)) if bl > 0 =>
      id -> (ng, bl) }
    assert(got == wantFlagged)
    // Bloom guarantee, pinned from the reference's exact counts
    ref.foreach { case (id, (_, bl, ex)) =>
      assert(bl >= ex, s"doc $id: bloom $bl < exact $ex")
      if (ex > 0) assert(got.contains(id), s"exact-flagged doc $id missed")
    }
    val exact = PipelineQueries.decontaminate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (id, ex) =>
      assert(got.contains(id) && got(id)._2 >= ex,
        s"doc $id: bloom misses/undercounts the exact query's $ex hits")
    }
  }

  test("a saturated 512-bit filter produces false positives that match " +
      "the reference exactly (the one-sided error is real and derived, " +
      "not tuned away)") {
    val mBits = 1 << 9
    // bench: 300 docs of disjoint vocabulary -> ~1.5k distinct grams
    // into 512 bits saturates the filter; corpus: novel-vocab docs
    // whose grams are NOT in the bench set
    val docs: Seq[(Long, String)] =
      (0L until 6000L by 20L).map(id =>
        id -> (0 until 8).map(w => s"b${id}w$w").mkString(" ")) ++
      (1L to 79L by 2).map(id => // odd ids: disjoint from the holdout
        id -> (0 until 8).map(w => s"c${id}w$w").mkString(" "))
    val ref = reference(docs, mBits)
    val bench = spark.createDataFrame(
      docs.filter(_._1 % PipelineQueries.DecontHoldout == 0))
      .toDF("doc_id", "text")
    val bits = PipelineQueries.bloomBitsOf(bench, n, k, mBits)
    val bc = spark.sparkContext.broadcast(bits)
    val got = spark.createDataFrame(
      docs.filterNot(_._1 % PipelineQueries.DecontHoldout == 0))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.native.bloom_probe(
        col("text"), n, k, bc).as("st"))
      .select(col("doc_id"), col("st.n_grams"), col("st.n_hits"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == ref.map { case (id, (ng, bl, _)) => id -> (ng, bl) })
    val falsePos = ref.values.map { case (_, bl, ex) => bl - ex }.sum
    assert(falsePos > 0,
      "saturated filter produced no false positives - probe inert?")
    assert(ref.values.forall { case (_, _, ex) => ex == 0 },
      "corpus vocabulary leaked into the bench set - test is vacuous")
  }

  test("the kernel memo never cross-hits between different gram widths " +
      "or probe counts on one bitmap (same thread, same text)") {
    val bits = Array.fill(16)(-1L) // all bits set: every probe hits
    val text = "w1 w2 w3 w4 w5 w6"
    def probe(n: Int, k: Int): (Long, Long) = {
      val r = graft.functions.VectorMath.bloomHits(text, n, k, bits)
      (r.getLong(0), r.getLong(1))
    }
    assert(probe(4, 5) == ((3L, 3L))) // 3 distinct 4-grams, all hit
    assert(probe(3, 5) == ((4L, 4L)), "n=3 after n=4 must recompute")
    assert(probe(4, 5) == ((3L, 3L)), "and back")
  }

  test("decontaminate_bloom_eval audit equals the frames it audits") {
    val r = PipelineQueries.decontaminateBloomEval(spark, sfDir).head()
    val bloom = PipelineQueries.decontaminateBloom(spark, sfDir).collect()
    val exact = PipelineQueries.decontaminate(spark, sfDir).collect()
    assert(r.getAs[Long]("docs_flagged_bloom") == bloom.length)
    assert(r.getAs[Long]("docs_flagged_exact") == exact.length)
    assert(r.getAs[Long]("docs_false_pos") == bloom.length - exact.length)
    assert(r.getAs[Long]("grams_flagged_bloom") ==
      bloom.map(_.getAs[Long]("n_hits")).sum)
    assert(r.getAs[Long]("grams_flagged_exact") ==
      exact.map(_.getAs[Long]("n_hits")).sum)
  }

  test("dedup_incremental_bloom equals dedup_incremental row-for-row " +
      "(the pre-filter is output-invariant)") {
    val base = PipelineQueries.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = PipelineQueries.dedupIncrementalBloom(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bloom == base)
    assert(base.nonEmpty)
  }

  test("a saturated 64-bit fingerprint filter routes EVERY fresh doc " +
      "through the exact path and still resolves identically") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val h60 = conv(substring(col("fp"), 1, 15), 16, 10).cast("bigint")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    val bits = PipelineQueries.bloomBitsOfHashes(
      hist.select(h60.as("h")).distinct(), k, 64)
    assert(bits.forall(_ == -1L),
      "64-bit filter over hundreds of fingerprints should saturate")
    val bc = spark.sparkContext.broadcast(bits)
    val probed = fresh.withColumn("maybe",
      graft.functions.native.bloom_hash_probe(h60, k, bc))
    assert(probed.filter(!col("maybe")).count() == 0,
      "saturated filter must flag everything as possibly-present")
    val viaExact = probed.filter(col("maybe")).drop("maybe")
      .join(hist.select(col("fp")), Seq("fp"), "left_anti")
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .collect().map(r => (r.getLong(1), r.getString(0))).toSet
    val base = PipelineQueries.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaExact == base)
  }

  test("bloomGateStream admits exactly the complement of the batch " +
      "bloom flags on the same frame") {
    val docs = graft.model.Tables.documents(spark, sfDir)
    val bench = docs
      .filter(col("doc_id") % PipelineQueries.DecontHoldout === 0)
      .select(col("text"))
    val nonHoldout = docs
      .filter(col("doc_id") % PipelineQueries.DecontHoldout =!= 0)
      .select(col("doc_id"), col("text"))
    val admitted = graft.streaming.StreamOps
      .bloomGateStream(nonHoldout, bench)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val flagged = PipelineQueries.decontaminateBloom(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val all = nonHoldout.collect().map(_.getLong(0)).toSet
    assert(admitted == all -- flagged)
  }
}
