package graft.queries

import graft.SparkSpec
import graft.ops.MultimodalOps
import graft.tools.{Mp4RemuxFixture, VideoRemuxFixture}
import org.apache.spark.sql.functions._

/** MJPEG-in-MP4, the third video container: the strict ISO BMFF
  * sample-table walk must decode the committed re-muxes to the exact
  * raw-definition hashes and stats, quarantine the 'avc1' codec decoy
  * (the transcode-farm routing boundary), stay total under an
  * adversarial byte zoo, and interoperate with the live gate. The
  * registered mixed-union dedup queries are pinned in
  * [[VideoRemuxSpec]] (three-container triangle). */
class Mp4RemuxSpec extends SparkSpec {
  import spark.implicits._

  private val M = Mp4RemuxFixture.M
  private val B = Mp4RemuxFixture.IdBase
  private lazy val remux = spark.read.parquet(Mp4RemuxFixture.Path)

  test("decoded per-frame hashes of EVERY committed MP4 clip == the " +
      "raw-definition refPhash64 rows — proves the ftyp sniffing " +
      "dispatch, the stsc×stco sample expansion (both the one-chunk " +
      "and one-sample-per-chunk layouts), and the shared pixel-exact " +
      "JPEG round-trip; the codec decoy emits ONE sentinel row") {
    val got = MultimodalOps.videoFramePhashesPartitioned(
        remux, "clip_id", "video", brightShift = 0)
      .collect()
    val want = Mp4RemuxFixture.expectedFramePhashes.toSet
    val gotGood = got.filter(_.width != -1).map(r => (r.id, r.frame, r.phash)).toSet
    assert(gotGood == want,
      s"missing=${(want -- gotGood).take(3)} extra=${(gotGood -- want).take(3)}")
    val decoy = got.filter(_.id == B + M)
    assert(decoy.length == 1 && decoy.head.width == -1,
      s"codec decoy must quarantine with one sentinel row: ${decoy.toSeq}")
  }

  test("registered mm_frames_mp4 == the raw block-definition rows " +
      "INCLUDING the decoy's quarantine sentinel (the oracle pins the " +
      "routing boundary, not just the happy path)") {
    val got = PipelineQueries.mmFramesMp4(spark, "unused")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    val want = Mp4RemuxFixture.expectedRows
      .map { case (id, n, w, h, us, csv) =>
        (id, n, w.toLong, h.toLong, us, csv)
      }.toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("adversarial zoo: every malformed variant QUARANTINES (total, " +
      "no task kill) — truncation, trailing junk, double mdat, " +
      "sample range escaping mdat, a second video track, a variable " +
      "frame clock, 64-bit largesize, and garbage") {
    val good = Mp4RemuxFixture.mp4Bytes(0)
    def patched(f: Array[Byte] => Array[Byte]): Array[Byte] =
      f(good.clone())
    // locate moov to craft targeted corruption: stts entry_count at
    // +12 from the 'stts' fourcc, stco first offset at +16
    def indexOf(pat: String): Int = {
      val p = pat.getBytes("US-ASCII")
      (0 to good.length - p.length)
        .find(i => p.indices.forall(j => good(i + j) == p(j))).get
    }
    val zoo: Seq[(String, Array[Byte])] = Seq(
      "truncated" -> good.take(good.length / 2),
      "trailing junk" -> (good ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
      "garbage with ftyp magic" ->
        (good.take(8) ++ Array.tabulate[Byte](64)(i => (i * 37).toByte)),
      "stts two runs (variable clock)" -> patched { b =>
        b(indexOf("stts") + 11) = 2; b // entry_count 1 -> 2
      },
      "stco offset escaping mdat" -> patched { b =>
        val p = indexOf("stco") + 12
        b(p) = 0x7F.toByte; b // first chunk offset -> huge
      },
      "empty" -> Array.empty[Byte],
      "null" -> null.asInstanceOf[Array[Byte]])
    val rows = MultimodalOps.videoFramePhashesPartitioned(
      zoo.zipWithIndex.map { case ((_, b), i) => (900L + i, b) }
        .toDF("clip_id", "video"),
      "clip_id", "video", brightShift = 0).collect()
    zoo.zipWithIndex.foreach { case ((name, _), i) =>
      val r = rows.filter(_.id == 900L + i)
      assert(r.length == 1 && r.head.width == -1,
        s"zoo '$name' must quarantine: ${r.toSeq}")
    }
    // and the control: the unpatched clip still decodes
    val ctrl = MultimodalOps.videoFramePhashesPartitioned(
      Seq((0L, good)).toDF("clip_id", "video"),
      "clip_id", "video", brightShift = 0).collect()
    assert(ctrl.forall(_.width != -1) &&
      ctrl.length == VideoRemuxFixture.frames(0))
  }

  test("live video gate is MP4-general too: an MP4 probe against the " +
      "GIF corpus lands neardup on its GIF sibling at max_hamming 0, " +
      "and the codec decoy probe quarantines") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val gifCorpus = spark.read.parquet(VideoRemuxFixture.Path)
      .filter(col("clip_id") < VideoRemuxFixture.IdBase + M)
    val in = MemoryStream[(Long, Array[Byte])]
    val gated = StreamOps.videoGateStream(
      in.toDF().toDF("clip_id", "video"), gifCorpus, bytesCol = "video",
      corpusBytesCol = "video")
    val q = StreamOps.toMemory(
      gated.select("clip_id", "decision", "matched_id", "max_hamming"),
      "video_gate_mp4_test", OutputMode.Append,
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    try {
      in.addData((0 to M).map(i =>
        (6000L + i, Mp4RemuxFixture.mp4Bytes(i))).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("video_gate_mp4_test").collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
      (0 until M).foreach { i =>
        assert(got(6000L + i) ==
          (("neardup", VideoRemuxFixture.IdBase + i, 0L)), got(6000L + i))
      }
      assert(got(6000L + M)._1 == "quarantine", got(6000L + M))
    } finally q.stop()
  }
}
