package graft.queries

import graft.SparkSpec
import graft.ops.MultimodalOps
import graft.tools.AudioDupFixture
import org.apache.spark.sql.functions._

/** mm_audio_fingerprint / mm_audio_neardup end to end: the decoded
  * fingerprints against the fixture's INDEPENDENT raw-sample
  * reference, the pair verdicts against brute force (variants pair;
  * reversed decoys must not), the scale-invariance contract, and the
  * quarantine rules. */
class AudioNeardupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = spark.read.parquet(AudioDupFixture.Path)

  test("decoded fingerprints == the fixture's refAudioFp64 rows " +
      "(proves WAV decode AND the envelope-DCT definition against the " +
      "independent reference, every committed clip)") {
    val got = MultimodalOps.audioFingerprintPartitioned(
        corpus, "clip_id", "wav")
      .collect().map(r => (r.id, r.fp)).toSet
    val want = AudioDupFixture.expectedFingerprints.toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("pair verdicts == brute force: exactly the 10 (base, variant) " +
      "pairs qualify — amplitude scaling + dither stays within radius, " +
      "REVERSED decoys (same energy multiset, wrong order) do not") {
    val got = PipelineQueries.mmAudioNeardupOf(corpus)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val want = (0 until AudioDupFixture.N)
      .map(i => (i.toLong, (i + AudioDupFixture.N).toLong)).toSet
    assert(got == want, got)
    // non-vacuity: the decoys sit FAR outside radius, not just past it
    val fp = AudioDupFixture.expectedFingerprints.toMap
    (0 until AudioDupFixture.RevN).foreach { j =>
      val d = java.lang.Long.bitCount(
        fp(j.toLong) ^ fp((2 * AudioDupFixture.N + j).toLong))
      assert(d > 2 * PipelineQueries.AudioNeardupMaxHamming,
        s"reversed decoy $j drifted to distance $d")
    }
  }

  test("pure amplitude scaling (no dither) is EXACTLY invariant: " +
      "every energy, coefficient, and the median scale together") {
    val n = AudioDupFixture.frames(0)
    val base = AudioDupFixture.refAudioFp64(AudioDupFixture.sample(0, _), n)
    val scaled = AudioDupFixture.refAudioFp64(
      t => (AudioDupFixture.sample(0, t) * 3) / 4, n)
    // 3/4 of the alternating carrier scales every |sample| uniformly
    // (amp is even-ish but integer division is sign-symmetric on the
    // +/- pair), so the hash must not move more than the rounding
    assert(java.lang.Long.bitCount(base ^ scaled) <= 1,
      "scale invariance broke")
  }

  test("audioGateStream: gate decisions == the batch mm_audio_neardup " +
      "verdicts — variants land neardup on their base (the brute-force " +
      "argmin), reversed decoys admit, corrupt bytes quarantine; empty " +
      "corpus and the cap refuse loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val N = AudioDupFixture.N
    // corpus = the BASE clips only, so a variant's neardup verdict is
    // exactly its batch pair (base i) — the mm_audio_neardup agreement
    val bases = corpus.filter(col("clip_id") < N)
    val in = MemoryStream[(Long, Array[Byte])]
    val gated = StreamOps.audioGateStream(
      in.toDF().toDF("clip_id", "wav"), bases)
    val q = StreamOps.toMemory(
      gated.select("clip_id", "decision", "matched_id", "hamming"),
      "audio_gate_test", OutputMode.Append,
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    try {
      in.addData(
        (0 until N).map(i =>
          (3000L + i, AudioDupFixture.wavBytes(N + i))) ++
        (0 until AudioDupFixture.RevN).map(j =>
          (4000L + j, AudioDupFixture.wavBytes(2 * N + j))) :+
        ((5000L, Array.tabulate[Byte](32)(i => (i * 31).toByte))))
      q.processAllAvailable()
      val got = spark.table("audio_gate_test").collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))))
        .toMap
      val fp = AudioDupFixture.expectedFingerprints.toMap
      (0 until N).foreach { i =>
        val d = java.lang.Long.bitCount(fp(i.toLong) ^ fp((N + i).toLong))
        assert(got(3000L + i) == (("neardup", Some((i.toLong, d.toLong)))),
          s"variant $i: ${got(3000L + i)} want base $i at $d")
      }
      (0 until AudioDupFixture.RevN).foreach { j =>
        assert(got(4000L + j) == (("admit", None)), got(4000L + j))
      }
      assert(got(5000L) == (("quarantine", None)), got(5000L))
    } finally q.stop()
    val e1 = intercept[IllegalArgumentException] {
      StreamOps.audioGateStream(
        in.toDF().toDF("clip_id", "wav"), bases, maxCorpus = 2)
    }
    assert(e1.getMessage.contains("mmAudioNeardup"), e1.getMessage)
    val junk = Seq((900L, Array[Byte](1, 2))).toDF("clip_id", "wav")
    val e2 = intercept[IllegalArgumentException] {
      StreamOps.audioGateStream(in.toDF().toDF("clip_id", "wav"), junk)
    }
    assert(e2.getMessage.contains("EMPTY"), e2.getMessage)
  }

  test("quarantine: corrupt bytes and too-short clips emit the " +
      "sentinel and never enter the dedup join") {
    val garbage = Array.tabulate[Byte](32)(i => (i * 31).toByte)
    val mixed = Seq(
      (100L, AudioDupFixture.wavBytes(0)),
      (110L, AudioDupFixture.wavBytes(AudioDupFixture.N)),
      (99L, garbage))
      .toDF("clip_id", "wav")
    val rows = MultimodalOps.audioFingerprintPartitioned(
      mixed, "clip_id", "wav").collect()
    assert(rows.count(_.id == 99L) == 1 &&
      rows.filter(_.id == 99L).forall(_.sample_rate == -1))
    val got = PipelineQueries.mmAudioNeardupOf(mixed)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 110L)), got)
  }
}
