package graft.queries

import graft.SparkSpec
import graft.ops.{DedupOps, MultimodalOps}
import graft.tools.VideoDupFixture
import org.apache.spark.sql.functions._

/** mm_video_neardup end to end: the per-frame hash decode against the
  * fixture's INDEPENDENT raw-pixel reference, the clip-level verdict
  * against brute force (variants qualify; permuted and truncated
  * decoys must not), alignment as a join key, and the quarantine
  * rule. */
class VideoNeardupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = spark.read.parquet(VideoDupFixture.Path)

  test("decoded per-frame hashes == the fixture's refPhash64 rows " +
      "(proves GIF decode AND the DCT hash against the independent " +
      "reference, every committed clip)") {
    val got = MultimodalOps.gifFramePhashesPartitioned(
        corpus, "clip_id", "gif", brightShift = 0)
      .collect().map(r => (r.id, r.frame, r.phash)).toSet
    val want = VideoDupFixture.expectedFramePhashes.toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("shift 0 collapses the control channel to the base hash " +
      "(single DCT per frame)") {
    val rows = MultimodalOps.gifFramePhashesPartitioned(
      corpus.limit(3), "clip_id", "gif", brightShift = 0).collect()
    assert(rows.nonEmpty && rows.forall(r => r.phash_shifted == r.phash))
  }

  test("clip verdicts == brute force: exactly the 10 (base, variant) " +
      "pairs qualify; frame-PERMUTED decoys fail alignment; the " +
      "TRUNCATED decoy (all aligned distances ZERO) fails the count " +
      "check") {
    val got = PipelineQueries.mmVideoNeardupOf(corpus)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val want = (0 until VideoDupFixture.N)
      .map(i => (i.toLong, (i + VideoDupFixture.N).toLong)).toSet
    assert(got == want, got)
    // the truncated decoy is the sharp edge: its aligned prefix is
    // IDENTICAL to base 0 (hamming 0 on every shared frame) — only
    // the frame-count equality rejects it
    val truncId = 2L * VideoDupFixture.N + VideoDupFixture.PermN
    val pre = VideoDupFixture.expectedFramePhashes
      .filter(r => r._1 == 0L || r._1 == truncId)
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(pre(0L).take(pre(truncId).length) == pre(truncId),
      "fixture drifted: the truncated decoy must share base 0's prefix")
  }

  test("mm_video_clusters labels the 10 (base, variant) pairs as " +
      "two-member clusters and leaves the 3 decoys singletons, " +
      "min-id survivors") {
    val got = PipelineQueries.mmVideoClustersOf(corpus)
      .select("clip_id", "cluster", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    val want =
      (0 until VideoDupFixture.N).flatMap { i =>
        Seq((i.toLong, i.toLong, true),
          ((i + VideoDupFixture.N).toLong, i.toLong, false))
      }.toSet ++
        (2 * VideoDupFixture.N until VideoDupFixture.Total)
          .map(i => (i.toLong, i.toLong, true)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("temporal alignment is a JOIN KEY: identical hashes at " +
      "DIFFERENT frame indexes never become candidates") {
    val df = Seq((1L, 0L, 12345L), (2L, 1L, 12345L), (3L, 0L, 12345L))
      .toDF("id", "frame", "h")
    val pairs = DedupOps.hammingNearDups64Aligned(
        df, col("id"), col("frame"), col("h"), maxHamming = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L)), pairs) // 2 aligns with neither
  }

  test("quarantined clips are routed (one sentinel row) and never " +
      "enter the dedup join") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val mixed = Seq(
      (100L, VideoDupFixture.gifBytes(0)),
      (110L, VideoDupFixture.gifBytes(VideoDupFixture.N)),
      (99L, garbage))
      .toDF("clip_id", "gif")
    val hashed = MultimodalOps.gifFramePhashesPartitioned(
      mixed, "clip_id", "gif", brightShift = 0).collect()
    assert(hashed.count(r => r.id == 99L) == 1 &&
      hashed.filter(_.id == 99L).forall(_.width == -1))
    val got = PipelineQueries.mmVideoNeardupOf(mixed)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 110L)), got)
  }
}
