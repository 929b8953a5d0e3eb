package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, plus decode / feature-extract /
 * frame-sample stages.
 *
 * The actual media decode is STUBBED (no codec libraries in this
 * environment) behind [[decodeStub]] — a deterministic fake with the
 * real Spark-side shape: binary in, fixed-size feature vector out,
 * executed per-partition batch like a real decoder UDF would be. All
 * surrounding plumbing (schema, slicing, metadata, partitioning) is
 * real column expressions.
 */
object MultimodalOps {

  /** Deterministic synthetic 64-byte blob derived from text — stands in
   *  for a fetched image payload (testdata ships no binary column). */
  def synthBlob(text: Column): Column =
    unhex(concat(md5(text), md5(concat(text, lit("1"))),
      md5(concat(text, lit("2"))), md5(concat(text, lit("3")))))

  /** Typed metadata for an opaque binary payload: byte length + leading
   *  magic bytes (hex). This is the "catalog row" for a media object. */
  def binaryMeta(bytes: Column): Column = struct(
    length(bytes).cast("int").as("n_bytes"),
    hex(substring(bytes, 1, 4)).as("magic"))

  /** Frame sampling: `frames` fixed-length slices at `stride` intervals,
   *  as hex strings (video keyframe-grid analog, row-local). */
  def frameSample(bytes: Column, frames: Int, frameLen: Int, stride: Int): Column =
    array((0 until frames).map(i =>
      hex(substring(bytes, i * stride + 1, frameLen))): _*)

  /** Nearest-neighbor resize of a `w`x`h` single-channel byte image by
   *  integer `factor`: keep the byte at every factor-th row/col
   *  (top-left anchor). Row-local substring gather — no decode library
   *  needed for this sampling step; a real codec pipeline would resize
   *  post-decode inside [[decodePartitioned]]. Output hex, like
   *  [[frameSample]]. */
  def resizeNearest(bytes: Column, w: Int, h: Int, factor: Int): Column =
    hex(concat((for {
      r <- 0 until h by factor
      c <- 0 until w by factor
    } yield substring(bytes, r * w + c + 1, 1)): _*))

  /**
   * STUB decode: 16-bin byte-value histogram as the "extracted feature
   * vector". In production this is the image/audio decoder (???) —
   * the signature, null handling, and per-batch execution shape are
   * what the pipeline depends on, and those are real.
   */
  val decodeStub: UserDefinedFunction = udf { bytes: Array[Byte] =>
    if (bytes == null) null
    else {
      val h = new Array[Long](16)
      bytes.foreach(b => h((b & 0xFF) >> 4) += 1L)
      h.toSeq
    }
  }

  /** Full pipeline stage: blob -> (meta, frames, features). */
  def enrich(df: DataFrame, bytes: Column): DataFrame =
    df.withColumn("meta", binaryMeta(bytes))
      .withColumn("frames", frameSample(bytes, frames = 4, frameLen = 8, stride = 16))
      .withColumn("features", decodeStub(bytes))

  /**
   * Partition-batched decode — the Scala analog of `mapInPandas`: the
   * decoder sees a whole partition iterator, so a real implementation
   * can amortize per-batch setup (codec contexts, model sessions, GPU
   * transfer) across rows instead of paying it per record. The decode
   * itself is the same deterministic stub as [[decodeStub]].
   */
  def decodePartitioned(df: DataFrame, idCol: String, bytesCol: String)
      : org.apache.spark.sql.Dataset[(Long, Seq[Long])] = {
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup happens HERE, once (??? in production:
        // open the codec / load the model)
        rows.map { case (id, bytes) =>
          val h = new Array[Long](16)
          if (bytes != null) bytes.foreach(b => h((b & 0xFF) >> 4) += 1L)
          (id, h.toSeq)
        }
      }
  }

  /**
   * REAL image decode in the [[decodePartitioned]] shape — the one
   * media path this environment CAN decode honestly: `javax.imageio`
   * is JDK-public, so PNG/GIF/BMP/JPEG payloads become pixel
   * dimensions + a 16-bin luminance histogram with no external codec.
   * The partition hook does real setup work here (disable ImageIO's
   * per-read disk cache once for the partition); decode stays
   * `ImageIO.read` per row because payload FORMAT may vary row to row
   * — a single-format corpus would hoist one `ImageReader` and
   * `setInput` per row, which is exactly what this shape is for.
   * Undecodable bytes yield `width = -1` rather than dropping the row
   * or killing the task — curation filters on it downstream. The gated
   * `mm_*` queries keep the synthetic-blob contract (testdata ships no
   * real binaries); TextMultimodalSpec drives this path with an actual
   * encoded PNG.
   */
  def decodeImagePartitioned(df: DataFrame, idCol: String, bytesCol: String)
      : org.apache.spark.sql.Dataset[graft.model.ImageFeatures] =
    // one decode body for the plain and resized paths: factor 1 IS the
    // identity transform (spec-pinned), so any fix to the decode or
    // quarantine handling lands in both
    decodeImageResized(df, idCol, bytesCol, factor = 1)

  /**
   * REAL audio decode in the [[decodePartitioned]] shape — the audio
   * sibling of [[decodeImagePartitioned]]: the CONTAINER-GENERAL
   * [[pcm16Frames]] dispatch (strict lock-free RIFF/WAVE or Sun AU
   * walk — the public layouts, zero external codecs) turns PCM
   * payloads into format metadata (sample rate, channels, frame
   * count) + a 16-bin amplitude histogram. Scope is deliberately
   * 16-bit signed linear PCM in either container; anything else
   * (compressed encodings, 8/24-bit, float, μ-law)
   * quarantines as `sample_rate = -1` like undecodable bytes, because
   * a curation pipeline wants those ROUTED (to a transcode stage or a
   * reject table), not silently misread. Undecodable payloads likewise
   * yield -1 rather than dropping the row or killing the task.
   */
  def decodeWavPartitioned(df: DataFrame, idCol: String, bytesCol: String)
      : org.apache.spark.sql.Dataset[graft.model.AudioFeatures] = {
    import df.sparkSession.implicits._
    val bad = graft.model.AudioFeatures(_: Long, -1, -1, -1L, Nil)
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          pcm16Frames(bytes) match {
            case None => bad(id)
            case Some((rate, ch, data, from, len, be)) =>
              val frames = len / (2 * ch)
              val hist = new Array[Long](16)
              var p = from
              val end = from + frames * ch * 2
              while (p < end) {
                val s =
                  (if (be) (data(p) << 8) | (data(p + 1) & 0xFF)
                   else (data(p) & 0xFF) | (data(p + 1) << 8))
                    .toShort.toInt
                hist((s + 32768) >> 12) += 1L
                p += 2
              }
              graft.model.AudioFeatures(id, rate, ch, frames.toLong,
                hist.toSeq)
          }
        }
      }
  }

  /**
   * Strict RIFF/WAVE PCM16LE parse — the ONE audio container walk
   * every audio op shares (decode stats, frame features, fingerprint,
   * live gate), and a LOCK-FREE replacement for
   * `AudioSystem.getAudioInputStream`: the JDK provider registry
   * SYNCHRONIZES, and a 32-thread executor decoding small clips
   * through it scales NEGATIVELY (measured standalone: 38.7 k clips/s
   * on ONE thread, 23.6 k TOTAL on 32 — contention, not CPU; the live
   * audio gate sustained 7.4 k rows/s before this walk, 10× under the
   * single-thread decode rate). The WAV layout is public and tiny —
   * the AVI walker precedent: `RIFF` size `WAVE`, then even-padded
   * chunks of which `fmt ` (PCM format 1, 16-bit, LE by definition)
   * and `data` matter; other standard chunks (`LIST`, `fact`,
   * `cue `…) interleave legally and are skipped.
   *
   * Strict and total: magic + in-bounds RIFF size required (bytes
   * past riffEnd beyond one pad byte are a truncation/concat lie —
   * quarantine), every chunk must sit inside the RIFF bound, both
   * `fmt ` and `data` must be present (FIRST of each wins — the
   * stream readers' contract; later duplicates are untrusted),
   * channels/rate positive. Accepted formats: PCM (tag 1) at 16 bits,
   * plus WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) whose SubFormat GUID is
   * KSDATAFORMAT_SUBTYPE_PCM at 16 container bits — the standard
   * header for multichannel/tooling-produced PCM, which the JDK's
   * extensible reader also decoded. Everything else (compressed
   * encodings, 8/24-bit, float) quarantines for ROUTING; the old
   * AudioSystem path parsed AIFF/AU containers too, but those are
   * big-endian PCM at best, so its PCM16LE guard quarantined them
   * anyway — same accepted class. Returns
   * (sampleRate, channels, bytes, dataFrom, dataLen) — a range into
   * the input, no copy.
   */
  /** KSDATAFORMAT_SUBTYPE_PCM, little-endian GUID bytes — hoisted off
   *  the per-clip decode path (the AfpCos convention). */
  private val PcmGuid = Array[Byte](0x01, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x10, 0x00, 0x80.toByte, 0x00, 0x00, 0xAA.toByte, 0x00,
    0x38, 0x9B.toByte, 0x71)

  private[graft] def wavPcm16le(b: Array[Byte])
      : Option[(Int, Int, Array[Byte], Int, Int)] = {
    try {
      if (b == null || b.length < 44) return None
      def u32(p: Int): Long = (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
      def u16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      def fourcc(p: Int): String = new String(b, p, 4, "US-ASCII")
      val riffEnd = 8L + u32(4)
      if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE" ||
          riffEnd > b.length || b.length - riffEnd > (u32(4) & 1L))
        return None
      var rate = -1
      var ch = -1
      var fmtSeen = false
      var fmtOk = false
      var dataFrom = -1L
      var dataLen = -1L
      var p = 12L
      while (p + 8 <= riffEnd) {
        val ck = fourcc(p.toInt)
        val sz = u32(p.toInt + 4)
        val body = p + 8
        if (body + sz > riffEnd) return None // escapes RIFF
        if (ck == "fmt " && !fmtSeen) {
          // FIRST fmt wins (like data below) — and it wins even when
          // UNDERSIZED: a truncated first header leaves fmtOk false
          // (quarantine), rather than letting a later duplicate
          // header the stream readers would never reach decode the
          // file
          fmtSeen = true
          if (sz >= 16) {
            val tag = u16(body.toInt)
            val extensiblePcm = tag == 0xFFFE && sz >= 40 &&
              u16(body.toInt + 14) == 16 /* container bits */ && {
                var i = 0
                var eq = true
                while (eq && i < 16) {
                  eq = b(body.toInt + 24 + i) == PcmGuid(i)
                  i += 1
                }
                eq
              }
            fmtOk = (tag == 1 /* PCM */ &&
              u16(body.toInt + 14) == 16 /* bits */) || extensiblePcm
            ch = u16(body.toInt + 2)
            rate = u32(body.toInt + 4).toInt
          }
        } else if (ck == "data") {
          // a SECOND data chunk would silently drop samples — keep
          // the first, matching the stream readers' contract
          if (dataFrom < 0) { dataFrom = body; dataLen = sz }
        } // other standard chunks (LIST, fact, cue , …) skip legally
        p = body + sz + (sz & 1L) // even-byte padding
      }
      if (!fmtOk || ch <= 0 || rate <= 0 || dataFrom < 0) None
      else Some((rate, ch, b, dataFrom.toInt, dataLen.toInt))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Fingerprint window count (and DCT length) for
   *  [[audioFingerprintPartitioned]]. */
  private val AfpW = 64

  /** The constant 64×64 DCT basis — hoisted so the transcendental
   *  evaluations run once per JVM (the PhashCos device). */
  private lazy val AfpCos: Array[Array[Double]] =
    Array.tabulate(AfpW, AfpW)((u, x) =>
      StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * AfpW)))

  /**
   * REAL decode → 64-bit AUDIO FINGERPRINT — the clip-dedup
   * fingerprint for sound (the audio rung of the perceptual-hash
   * family: simhash for text, [[phash64]] for images/frames): decode
   * via the CONTAINER-GENERAL [[pcm16Frames]] dispatch (RIFF/WAVE or
   * Sun AU, magic-sniffed; lock-free — the executor-thread contention
   * note at [[wavPcm16le]]), fold
   * CHANNEL 0 into [[AfpW]] equal-window energies (Σ s², exact longs,
   * floor boundaries k·n/64 — a time-scale-free envelope, the
   * Haitsma–Kalker band-energy idea collapsed to one band),
   * unnormalized 1-D DCT-II of the envelope via `StrictMath` cosines
   * (fdlibm-exact, platform-independent doubles), every coefficient
   * thresholded against the median (middle pair averaged). Amplitude
   * scaling multiplies every energy — and so every coefficient AND
   * the median — by the same factor, leaving the bits invariant: the
   * robustness class the near-dup consumer relies on (gated by the
   * committed [[graft.tools.AudioDupFixture]] variants). Clips
   * shorter than [[AfpW]] samples, non-PCM16LE, or undecodable
   * quarantine as sample_rate = -1 (routed, never dropped). One
   * partition-batched pass; decode, energy fold, and DCT fuse per
   * row.
   */
  def audioFingerprintPartitioned(df: DataFrame, idCol: String,
      bytesCol: String)
      : org.apache.spark.sql.Dataset[graft.model.AudioFingerprint] = {
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        audioClipFingerprint(id, bytes)
      })
  }

  /** CONTAINER-GENERAL audio PCM parse — magic-sniffed dispatch over
   *  every audio container this engine decodes (the [[clipPhashes]]
   *  convention on sound): RIFF/WAVE → [[wavPcm16le]]
   *  (little-endian), `.snd` → [[auPcm16be]] (Sun AU, big-endian),
   *  `FORM…AIFF` → [[aiffPcm16be]] (big-endian, r20) —
   *  an audio-dedup pass must fingerprint whatever containers the
   *  corpus carries, and all routes feed the SAME sample fold, so a
   *  clip and its re-master in another container fingerprints
   *  identically (lossless PCM throughout — no tolerance needed).
   *  Returns (rate, channels, bytes, from, len, bigEndian). */
  private[graft] def pcm16Frames(b: Array[Byte])
      : Option[(Int, Int, Array[Byte], Int, Int, Boolean)] = {
    val isWav = b != null && b.length >= 12 &&
      new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE"
    val isAu = b != null && b.length >= 24 &&
      new String(b, 0, 4, "US-ASCII") == ".snd"
    val isAiff = b != null && b.length >= 12 &&
      new String(b, 0, 4, "US-ASCII") == "FORM" &&
      new String(b, 8, 4, "US-ASCII") == "AIFF"
    if (isWav)
      wavPcm16le(b).map { case (r, c, d, f, l) => (r, c, d, f, l, false) }
    else if (isAu)
      auPcm16be(b).map { case (r, c, d, f, l) => (r, c, d, f, l, true) }
    else if (isAiff)
      aiffPcm16be(b).map { case (r, c, d, f, l) => (r, c, d, f, l, true) }
    else None
  }

  /**
   * Strict AIFF 16-bit linear-PCM parse — the third audio container
   * rung (Apple's public EA-IFF-85 layout: a big-endian `FORM` …
   * `AIFF` group whose `COMM` chunk carries channels / frame count /
   * sample size / an 80-bit IEEE-754 EXTENDED sample rate, and whose
   * `SSND` chunk carries offset + blockSize + big-endian frames).
   * Strict and total, the RIFF rules transplanted: the FORM bound is
   * checked both ways (a size escaping the buffer is a truncation
   * lie; bytes past it beyond one pad byte are a concat/append lie),
   * chunks walk with even-byte padding, a SECOND `COMM` or `SSND`
   * quarantines (it would silently redefine the first's samples),
   * unknown chunks (MARK, INST, annotations) skip legally, sample
   * size must be 16 and blockSize 0 (block-aligned and non-16-bit
   * forms quarantine for ROUTING like μ-law AU), and the frame count
   * must exactly fill the SSND data past its offset. The 80-bit rate
   * is decoded exactly for integral rates (sign bit or a rate
   * overflowing Int quarantines).
   */
  private[graft] def aiffPcm16be(b: Array[Byte])
      : Option[(Int, Int, Array[Byte], Int, Int)] = {
    try {
      if (b == null || b.length < 12) return None
      def u32(p: Int): Long = ((b(p) & 0xFFL) << 24) |
        ((b(p + 1) & 0xFFL) << 16) | ((b(p + 2) & 0xFFL) << 8) |
        (b(p + 3) & 0xFFL)
      def u16(p: Int): Int = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
      def fourcc(p: Int): String = new String(b, p, 4, "US-ASCII")
      if (fourcc(0) != "FORM" || fourcc(8) != "AIFF") return None
      val formEnd = 8L + u32(4)
      if (formEnd > b.length || b.length - formEnd > (u32(4) & 1L))
        return None
      /** 80-bit extended → integral sample rate (-1 = unusable). */
      def ext80(p: Int): Long = {
        val se = u16(p)
        if ((se & 0x8000) != 0) return -1L // negative rate
        val exp = (se & 0x7FFF) - 16383
        var mant = 0L
        var i = 0
        while (i < 8) { mant = (mant << 8) | (b(p + 2 + i) & 0xFFL); i += 1 }
        if (mant == 0L) return 0L
        val shift = exp - 63 // mantissa carries 2^63 at the top bit
        if (shift >= 0) return -1L // ≥ 2^63 Hz — nonsense
        if (shift < -63) return 0L // < 1 Hz floors to 0 → rejected
        // fractional rates quarantine (the scaladoc's "decoded exactly
        // for integral rates" contract): a nonzero truncated-mantissa
        // remainder would otherwise FLOOR silently and declare a wrong
        // rate — reject instead of mis-decoding
        if ((mant & ((1L << -shift) - 1)) != 0L) return -1L
        mant >>> -shift
      }
      var ch = -1
      var nFrames = -1L
      var bits = -1
      var rate = -1L
      var dataFrom = -1L
      var dataLen = -1L
      var ok = true
      var p = 12L
      while (ok && p + 8 <= formEnd) {
        val ck = fourcc(p.toInt)
        val sz = u32(p.toInt + 4)
        val body = p + 8
        if (body + sz > formEnd) ok = false
        else {
          if (ck == "COMM") {
            if (sz < 18 || ch != -1) ok = false // short or SECOND COMM
            else {
              ch = u16(body.toInt)
              nFrames = u32(body.toInt + 2)
              bits = u16(body.toInt + 6)
              rate = ext80(body.toInt + 8)
            }
          } else if (ck == "SSND") {
            if (sz < 8 || dataFrom != -1L) ok = false // SECOND SSND
            else {
              val off = u32(body.toInt)
              val blockSize = u32(body.toInt + 4)
              if (blockSize != 0L || 8L + off > sz) ok = false
              else {
                dataFrom = body + 8 + off
                dataLen = sz - 8 - off
              }
            }
          } // other standard chunks (MARK, INST, NAME, …) skip legally
          p = body + sz + (sz & 1L)
        }
      }
      if (!ok || ch <= 0 || ch > 0xFFFF || bits != 16 ||
          rate <= 0 || rate > Int.MaxValue ||
          nFrames < 0 || dataFrom < 0 ||
          nFrames * 2L * ch != dataLen) // frames must exactly fill SSND
        return None
      Some((rate.toInt, ch, b, dataFrom.toInt, dataLen.toInt))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /**
   * Strict Sun AU (`.snd`) 16-bit linear-PCM parse — the second audio
   * container rung beside [[wavPcm16le]] (the public header: six
   * BIG-ENDIAN u32 fields — magic, data offset, data size, encoding,
   * sample rate, channels — then big-endian PCM frames). Strict and
   * total: magic + offset ≥ 24 and in-bounds required; data size
   * 0xFFFFFFFF (the legal "unknown" marker streaming writers emit)
   * resolves to the rest of the payload, any other size must fit;
   * only encoding 3 (16-bit linear PCM) is accepted — μ-law/A-law/
   * float quarantine for ROUTING like every other non-PCM16 format.
   */
  private[graft] def auPcm16be(b: Array[Byte])
      : Option[(Int, Int, Array[Byte], Int, Int)] = {
    try {
      if (b == null || b.length < 24) return None
      def u32(p: Int): Long = ((b(p) & 0xFFL) << 24) |
        ((b(p + 1) & 0xFFL) << 16) | ((b(p + 2) & 0xFFL) << 8) |
        (b(p + 3) & 0xFFL)
      if (new String(b, 0, 4, "US-ASCII") != ".snd") return None
      val off = u32(4)
      val sz = u32(8)
      val enc = u32(12)
      val rate = u32(16)
      val ch = u32(20)
      if (off < 24 || off > b.length || enc != 3 /* 16-bit PCM */ ||
          rate <= 0 || rate > Int.MaxValue ||
          ch <= 0 || ch > 0xFFFF /* the WAV u16 class — same bound */)
        return None
      val len =
        if (sz == 0xFFFFFFFFL) b.length - off
        else if (off + sz > b.length) return None
        else sz
      // bytes past the data segment are a concat/append lie — the
      // wavPcm16le trailing-bytes rule (AU annotations live BEFORE
      // the data offset, never after the samples)
      if (off + len != b.length) return None
      Some((rate.toInt, ch.toInt, b, off.toInt, len.toInt))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** One clip's fingerprint row — the ONE decode+hash definition
   *  [[audioFingerprintPartitioned]] and the live audio gate share
   *  (the phashGrid convention: batch and live hash the same samples
   *  by construction), container-general via [[pcm16Frames]].
   *  Quarantine = sample_rate -1. */
  private[graft] def audioClipFingerprint(id: Long, bytes: Array[Byte])
      : graft.model.AudioFingerprint = {
    def bad(i: Long) = graft.model.AudioFingerprint(i, -1, -1L, 0L)
    try pcm16Frames(bytes) match {
      case None => bad(id)
      case Some((rate, ch, data, from, len, be)) =>
        val n = len / (2 * ch)
        if (n < AfpW) bad(id) // too short to window
        else {
          val W = AfpW
          val e = new Array[Double](W)
          var w = 0
          while (w < W) {
            var acc = 0L
            // LONG window bounds: w * n wraps Int past ~34M samples
            // (a legal ~13-minute mono clip) — negative index at best,
            // a silently skipped window at worst
            var t = (w.toLong * n / W).toInt
            val end = ((w + 1).toLong * n / W).toInt
            while (t < end) {
              val p = from + t * 2 * ch // channel 0 of frame t
              val s =
                (if (be) (data(p) << 8) | (data(p + 1) & 0xFF)
                 else (data(p) & 0xFF) | (data(p + 1) << 8))
                  .toShort.toLong
              acc += s * s
              t += 1
            }
            e(w) = acc.toDouble
            w += 1
          }
          val co = AfpCos
          val fq = new Array[Double](W)
          var u = 0
          while (u < W) {
            var s = 0.0
            var x = 0
            while (x < W) { s += e(x) * co(u)(x); x += 1 }
            fq(u) = s
            u += 1
          }
          val sorted = fq.clone()
          java.util.Arrays.sort(sorted)
          val med = (sorted(W / 2 - 1) + sorted(W / 2)) / 2.0
          var bits = 0L
          var k = 0
          while (k < W) {
            if (fq(k) > med) bits |= (1L << k)
            k += 1
          }
          graft.model.AudioFingerprint(id, rate, n.toLong, bits)
        }
    } catch {
      // the family contract: malformed payloads are ROUTED, never a
      // task kill (the walker catches its own, but the fold must not
      // be the one unguarded stretch)
      case scala.util.control.NonFatal(_) => bad(id)
    }
  }

  /**
   * Partition-batched decode → fingerprint → banded corpus probe —
   * the live half of the AUDIO admission gate (the
   * [[phashGatePartitioned]] contract on sound): per row the SHARED
   * [[audioClipFingerprint]] decode (batch and live hash the same
   * samples), then ONE [[PhashBandIndex.probe]] against the broadcast
   * corpus fingerprints — the index is hash-agnostic (any 64-bit
   * fingerprint bands into the same C(8,2) block pairs), so the
   * envelope-DCT hash rides the image gate's exact-by-pigeonhole
   * search unchanged. Row-merge passthrough plus (n_samples, fp,
   * matched_id, hamming, decision): 'quarantine' (undecodable /
   * non-PCM16LE / shorter than one window — never admitted silently,
   * never matched on the sentinel fingerprint), 'neardup' (a corpus
   * clip within the radius), or 'admit'.
   */
  def audioGatePartitioned(df: DataFrame, bytesCol: String,
      idx: org.apache.spark.broadcast.Broadcast[PhashBandIndex],
      maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = df.schema
      .add("n_samples", LongType, nullable = false)
      .add("fp", LongType, nullable = false)
      .add("matched_id", LongType, nullable = true)
      .add("hamming", LongType, nullable = true)
      .add("decision", StringType, nullable = false)
    val iBytes = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val fp = audioClipFingerprint(0L, r.getAs[Array[Byte]](iBytes))
        if (fp.sample_rate == -1)
          org.apache.spark.sql.Row.merge(r,
            org.apache.spark.sql.Row(-1L, 0L, null, null, "quarantine"))
        else idx.value.probe(fp.fp, maxHamming) match {
          case null =>
            org.apache.spark.sql.Row.merge(r,
              org.apache.spark.sql.Row(fp.n_samples, fp.fp, null, null,
                "admit"))
          case (mid, d) =>
            org.apache.spark.sql.Row.merge(r,
              org.apache.spark.sql.Row(fp.n_samples, fp.fp, mid,
                d.toLong, "neardup"))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * REAL decode → windowed FRAME FEATURES — the audio analysis stage
   * above [[decodeWavPartitioned]]'s whole-clip histogram (the
   * VAD-ish statistics a speech-curation pass gates on): decode via
   * the SHARED container-general [[pcm16Frames]] dispatch exactly
   * like the histogram op, then over
   * CHANNEL 0 compute zero-crossing count / total energy / peak
   * amplitude (whole clip, exact integer arithmetic — no floats, so
   * the oracle is pure sample-definition arithmetic) plus
   * fixed-`win`-sample window stats: full-window count and how many
   * windows stay entirely below `silenceThr` in |amplitude| (digital
   * silence / leading dead air). The ragged tail past the last full
   * window contributes to the whole-clip stats only. Same quarantine
   * contract as the sibling decoders (all counters -1: routed, never
   * dropped, never a task kill). One partition-batched pass; decode
   * and feature fold fuse in one iterator, so raw PCM never
   * materializes outside the decoder.
   */
  def audioFrameFeaturesPartitioned(df: DataFrame, idCol: String,
      bytesCol: String, win: Int, silenceThr: Int)
      : org.apache.spark.sql.Dataset[graft.model.AudioFrameFeatures] = {
    import df.sparkSession.implicits._
    require(win > 0 && silenceThr > 0)
    val bad =
      graft.model.AudioFrameFeatures(_: Long, -1L, -1L, -1L, -1L, -1L)
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          pcm16Frames(bytes) match {
            case None => bad(id)
            case Some((_, ch, data, from, len, be)) =>
              val frames = len / (2 * ch)
              val stride = 2 * ch // channel 0 = first sample per frame
              var t = 0
              var prevNeg = false
              var zc = 0L
              var energy = 0L
              var peak = 0L
              var winMax = 0L
              var nWin = 0L
              var silent = 0L
              while (t < frames) {
                val p = from + t * stride
                val s =
                  (if (be) (data(p) << 8) | (data(p + 1) & 0xFF)
                   else (data(p) & 0xFF) | (data(p + 1) << 8))
                    .toShort.toInt
                val neg = s < 0
                if (t > 0 && neg != prevNeg) zc += 1L
                prevNeg = neg
                energy += s.toLong * s
                val a = math.abs(s.toLong)
                if (a > peak) peak = a
                if (a > winMax) winMax = a
                if (t % win == win - 1) { // a full window closed
                  nWin += 1L
                  if (winMax < silenceThr) silent += 1L
                  winMax = 0L
                }
                t += 1
              }
              graft.model.AudioFrameFeatures(id, nWin, zc, energy,
                peak, silent)
          }
        }
      }
  }

  /**
   * REAL decode → RESIZE stage — the post-decode transform a media
   * pipeline actually runs ([[resizeNearest]] operates on raw bytes
   * because the stub path has no pixels; this one resizes DECODED
   * pixels): decode via `javax.imageio` exactly like
   * [[decodeImagePartitioned]], then nearest-neighbor downsample by
   * integer `factor` (top-left anchor — pixel (x, y) of the output is
   * input (x·factor, y·factor)) and emit the RESIZED dimensions +
   * 16-bin luminance histogram of the sampled pixels. Same quarantine
   * contract (width = -1). One partition-batched pass; decode and
   * transform fuse in the same iterator, so full-resolution pixels
   * never materialize outside the decoder.
   */
  def decodeImageResized(df: DataFrame, idCol: String, bytesCol: String,
      factor: Int): org.apache.spark.sql.Dataset[graft.model.ImageFeatures] = {
    require(factor >= 1, "resize factor must be >= 1")
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img =
            try {
              if (bytes == null || bytes.isEmpty) null
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
            } catch {
              // ImageIO plugin readers throw unchecked exceptions
              // (IllegalArgument, IndexOutOfBounds, CMMException, ...)
              // on truncated payloads whose magic matches a known
              // format — those must quarantine as width = -1 too, not
              // kill the task.
              case scala.util.control.NonFatal(_) => null
            }
          if (img == null) graft.model.ImageFeatures(id, -1, -1, Nil)
          else {
            val w = (img.getWidth + factor - 1) / factor
            val h = (img.getHeight + factor - 1) / factor
            val hist = new Array[Long](16)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x * factor, y * factor)
                val lum =
                  (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
                hist(lum >> 4) += 1L
                x += 1
              }
              y += 1
            }
            graft.model.ImageFeatures(id, w, h, hist.toSeq)
          }
        }
      }
  }

  /**
   * ISO BMFF (MP4) container PROBE in the [[decodePartitioned]] shape —
   * the routing rung for inter-frame video, which has no JDK decoder
   * (intra-frame MJPEG does — see [[decodeMjpegAviPartitioned]]): the
   * container layout (ISO/IEC 14496-12,
   * public spec) is plain big-endian byte structure, and container
   * metadata is exactly what a curation pipeline needs BEFORE routing
   * payloads to a transcode/decode farm: brand, movie timescale +
   * duration, track count, media payload size. The walk is strict —
   * box sizes must nest exactly (size ≥ header, never past the parent
   * bound), ftyp + moov + mvhd must be present, timescale positive;
   * anything else quarantines as brand = "corrupt" with -1 fields
   * (the WAV/PNG convention: malformed media routes, never drops rows
   * or kills tasks). mvhd versions 0 and 1 are both parsed (u32 vs
   * u64 times). `duration_ms` floors to integer milliseconds —
   * engine-stable arithmetic for the oracle gate.
   */
  def probeMp4Partitioned(df: DataFrame, idCol: String, bytesCol: String)
      : org.apache.spark.sql.Dataset[graft.model.ContainerMeta] = {
    import df.sparkSession.implicits._
    val bad = graft.model.ContainerMeta(_: Long, "corrupt", -1L, -1L, -1L, -1L)
    def u32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
        ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
    def u64(b: Array[Byte], p: Int): Long = (u32(b, p) << 32) | u32(b, p + 4)
    def tpe(b: Array[Byte], p: Int): String =
      new String(b, p + 4, 4, "US-ASCII")
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            if (bytes == null || bytes.length < 8) bad(id)
            else {
              var brand: String = null
              var timescale = -1L
              var duration = -1L
              var nTracks = 0L
              var mdatBytes = 0L
              var ok = true
              /** Walk boxes in [from, to); `f` sees (type, payload
               *  start, payload end). Returns false on malformed
               *  sizes. */
              def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Boolean = {
                var p = from
                while (p < to) {
                  if (p + 8 > to) return false
                  val sz = u32(bytes, p)
                  val (header, end) =
                    if (sz == 1L) {
                      if (p + 16 > to) return false
                      (16, p + u64(bytes, p + 8))
                    } else if (sz == 0L) (8, to.toLong) // box runs to parent end
                    else (8, p + sz)
                  if (end < p + header || end > to) return false
                  f(tpe(bytes, p), p + header, end.toInt)
                  p = end.toInt
                }
                true
              }
              ok = walk(0, bytes.length) { (t, s, e) =>
                t match {
                  case "ftyp" if e - s >= 4 =>
                    brand = new String(bytes, s, 4, "US-ASCII")
                  case "moov" =>
                    ok = walk(s, e) { (ct, cs, ce) =>
                      ct match {
                        case "mvhd" if ce - cs >= 24 =>
                          val v = bytes(cs) & 0xFF
                          // strict per version: a truncated v1 payload
                          // must NOT fall back to reading its 64-bit
                          // time fields with v0 offsets (that parses
                          // the modification-time words as timescale/
                          // duration — accepted garbage); reserved
                          // versions quarantine too
                          if (v == 1) {
                            if (ce - cs >= 32) {
                              timescale = u32(bytes, cs + 20)
                              duration = u64(bytes, cs + 24)
                            } else ok = false
                          } else if (v == 0) {
                            timescale = u32(bytes, cs + 12)
                            duration = u32(bytes, cs + 16)
                          } else ok = false
                        case "trak" => nTracks += 1L
                        case _ => ()
                      }
                    } && ok
                  case "mdat" => mdatBytes += (e - s).toLong
                  case _ => ()
                }
              } && ok
              // duration * 1000 must not wrap: a u64 mvhd-v1 duration
              // past Long.MaxValue/1000 ticks would emit a NEGATIVE
              // duration_ms on an accepted row — quarantine instead
              if (!ok || brand == null || timescale <= 0L || duration < 0L ||
                  duration > Long.MaxValue / 1000L)
                bad(id)
              else graft.model.ContainerMeta(id, brand, timescale,
                duration * 1000L / timescale, nTracks, mdatBytes)
            }
          } catch {
            // defensive: an index miscalculation on adversarial bytes
            // must quarantine, not kill the task
            case scala.util.control.NonFatal(_) => bad(id)
          }
        }
      }
  }

  /** 64-bit PERCEPTUAL hash (the DCT pHash — Zauner 2010's canonical
   *  construction): nearest-neighbor resample of the luminance plane
   *  to 32×32 (integer index map — deterministic), unnormalized 2-D
   *  DCT-II via `StrictMath` cosines (fdlibm-exact, so the doubles
   *  are platform-independent, not merely JVM-reproducible), then the
   *  top-left 8×8 coefficient block thresholded against its own
   *  median (middle pair averaged). A pure function of the pixels —
   *  SHARED by the decode operator and the fixture's expected rows by
   *  design: the oracle gate proves the DECODE (pixels from committed
   *  bytes vs pixels from the generator definition); the hash
   *  arithmetic is one definition, like the histogram binning. */
  private val PhashS = 32
  private val PhashK = 8

  /** The constant 8×32 DCT basis — hoisted so the 256 transcendental
   *  evaluations run once per JVM, not twice per image. */
  private lazy val PhashCos: Array[Array[Double]] =
    Array.tabulate(PhashK, PhashS)((u, x) =>
      StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * PhashS)))

  private[graft] def phash64(lum: (Int, Int) => Int, w: Int, h: Int)
      : Long = {
    val S = PhashS
    val K = PhashK
    val g = Array.tabulate(S, S)((y, x) =>
      lum(x * w / S, y * h / S).toDouble)
    val co = PhashCos
    val f = new Array[Double](K * K)
    var u = 0
    while (u < K) {
      var v = 0
      while (v < K) {
        var s = 0.0
        var y = 0
        while (y < S) {
          var x = 0
          while (x < S) { s += g(y)(x) * co(u)(x) * co(v)(y); x += 1 }
          y += 1
        }
        f(u * K + v) = s
        v += 1
      }
      u += 1
    }
    val sorted = f.sorted
    val med = (sorted(K * K / 2 - 1) + sorted(K * K / 2)) / 2.0
    var bits = 0L
    var k = 0
    while (k < K * K) { if (f(k) > med) bits |= (1L << k); k += 1 }
    bits
  }

  /**
   * REAL decode → PERCEPTUAL HASH — the fingerprint an image-dedup
   * pass stores (the multimodal sibling of the text simhash): decode
   * via `javax.imageio` like the histogram ops, take integer
   * luminance (r+g+b)/3, and emit [[phash64]] of the image PLUS the
   * hash of a `brightShift`-brightened copy (each luminance +shift,
   * clamped at 255 — the classic perturbation a robust perceptual
   * hash must survive, and the built-in near-duplicate ground truth
   * that makes the operator's robustness a queryable, non-vacuous
   * artifact). Quarantine convention: width = -1. One
   * partition-batched pass; decode and both hashes fuse per row.
   */
  /** Decode `bytes` and sample the ≤ 32×32 luminance grid both hash
   *  forms consume — reads ONLY the sampled coordinates (a full
   *  luminance plane would cost w·h getRGB calls and a frame-sized
   *  allocation per row for the same 1024 samples; identical values:
   *  a pre-sampled 32×32 grid makes phash64's index map the identity,
   *  and a pointwise brightness shift commutes with sampling).
   *  None = quarantine (null/empty/corrupt/unreadable bytes). ONE
   *  definition shared by [[phashPartitioned]] and
   *  [[phashGatePartitioned]] so batch and live hash the same
   *  pixels. */
  private def phashGrid(bytes: Array[Byte])
      : Option[(Int, Int, Array[Array[Int]])] =
    try {
      val img =
        if (bytes == null || bytes.isEmpty) null
        else javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val grid = Array.tabulate(PhashS, PhashS) { (y, x) =>
          val rgb = img.getRGB(x * w / PhashS, y * h / PhashS)
          (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
            (rgb & 0xFF)) / 3
        }
        Some((w, h, grid))
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  def phashPartitioned(df: DataFrame, idCol: String, bytesCol: String,
      brightShift: Int)
      : org.apache.spark.sql.Dataset[graft.model.PhashFeatures] = {
    import df.sparkSession.implicits._
    val bad = graft.model.PhashFeatures(_: Long, -1, -1, 0L, 0L)
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          phashGrid(bytes) match {
            case None => bad(id)
            case Some((w, h, grid)) =>
              val base = phash64((x, y) => grid(y)(x), PhashS, PhashS)
              val shifted = phash64(
                (x, y) => math.min(255, grid(y)(x) + brightShift),
                PhashS, PhashS)
              graft.model.PhashFeatures(id, w, h, base, shifted)
          }
        }
      }
  }

  /**
   * Broadcastable banded corpus fingerprint index — the offline-model
   * half of the live image admission gate
   * (`StreamOps.phashGateStream`): the corpus hashes bucketed by the
   * SAME C(8,2) = 28 block-pair keys `DedupOps.hammingNearDups64`
   * joins on, so a probe enumerates 28 map lookups and popcount-
   * verifies only same-bucket candidates — by the pigeonhole, every
   * corpus hash within Hamming ≤ 6 of the probe shares at least one
   * intact block pair, so the banded search finds the EXACT global
   * minimum over the radius (never a miss, never all-pairs). Ties
   * break to the smaller corpus id — deterministic. ~28 index
   * entries per corpus hash, ints only.
   */
  final class PhashBandIndex(val hashes: Array[Long],
      val ids: Array[Long],
      val bands: java.util.HashMap[Integer, Array[Int]])
      extends Serializable {
    /** (matched corpus id, hamming) of the nearest within-radius
     *  corpus hash, or null — exact over the radius by pigeonhole. */
    def probe(h: Long, maxHamming: Int): (Long, Int) = {
      var bestId = Long.MaxValue
      var bestD = maxHamming + 1
      var t = 0
      while (t < PhashBandIndex.Combos.length) {
        val c = PhashBandIndex.Combos(t)
        val key = (t << 16) |
          ((((h >>> (c(0) * 8)) & 0xFF) << 8) |
            ((h >>> (c(1) * 8)) & 0xFF)).toInt
        val cand = bands.get(key)
        if (cand != null) {
          var i = 0
          while (i < cand.length) {
            val d = java.lang.Long.bitCount(h ^ hashes(cand(i)))
            if (d < bestD || (d == bestD && ids(cand(i)) < bestId)) {
              bestD = d
              bestId = ids(cand(i))
            }
            i += 1
          }
        }
        t += 1
      }
      if (bestD > maxHamming) null else (bestId, bestD)
    }

    /** EVERY within-radius corpus entry (id → distance) — the
     *  multi-candidate form [[VideoBandIndex]] intersects across frame
     *  positions (where [[probe]] keeps only the argmin); complete
     *  over the radius by the same pigeonhole, deduplicated across
     *  band tables by the map. */
    def probeAll(h: Long, maxHamming: Int)
        : java.util.HashMap[java.lang.Long, Integer] = {
      val out = new java.util.HashMap[java.lang.Long, Integer]
      var t = 0
      while (t < PhashBandIndex.Combos.length) {
        val c = PhashBandIndex.Combos(t)
        val key = (t << 16) |
          ((((h >>> (c(0) * 8)) & 0xFF) << 8) |
            ((h >>> (c(1) * 8)) & 0xFF)).toInt
        val cand = bands.get(key)
        if (cand != null) {
          var i = 0
          while (i < cand.length) {
            val d = java.lang.Long.bitCount(h ^ hashes(cand(i)))
            if (d <= maxHamming) out.put(ids(cand(i)), d)
            i += 1
          }
        }
        t += 1
      }
      out
    }
  }

  object PhashBandIndex {
    /** The 28 block pairs, in [[graft.ops.DedupOps.hammingNearDups64]]'s
     *  enumeration order. */
    private[MultimodalOps] val Combos: Array[Array[Int]] =
      (0 until 8).combinations(2).map(_.toArray).toArray

    /** Build from (id, hash) pairs (any order; dedup'd buckets). */
    def apply(rows: Seq[(Long, Long)]): PhashBandIndex = {
      val sorted = rows.sortBy(_._1).toArray
      val ids = sorted.map(_._1)
      val hashes = sorted.map(_._2)
      val buckets = new java.util.HashMap[Integer,
        scala.collection.mutable.ArrayBuffer[Int]]
      var i = 0
      while (i < hashes.length) {
        val h = hashes(i)
        var t = 0
        while (t < Combos.length) {
          val c = Combos(t)
          val key = (t << 16) |
            ((((h >>> (c(0) * 8)) & 0xFF) << 8) |
              ((h >>> (c(1) * 8)) & 0xFF)).toInt
          var b = buckets.get(key)
          if (b == null) {
            b = new scala.collection.mutable.ArrayBuffer[Int]
            buckets.put(key, b)
          }
          b += i
          t += 1
        }
        i += 1
      }
      val bands = new java.util.HashMap[Integer, Array[Int]](
        buckets.size() * 2)
      buckets.forEach((k, v) => { bands.put(k, v.toArray); () })
      new PhashBandIndex(hashes, ids, bands)
    }
  }

  /**
   * Partition-batched decode → hash → banded corpus probe — the live
   * half of the image admission gate: per row, the [[phashGrid]]
   * decode (shared with the batch hash), [[phash64]], then ONE
   * [[PhashBandIndex.probe]] against the broadcast corpus index.
   * Emits EVERY input column (Row-merge passthrough — the text gates'
   * contract, which a typed mapPartitions would drop) plus (width,
   * height, phash, matched_id, hamming, decision): decision =
   * 'quarantine' (undecodable bytes — never admitted silently,
   * never near-dup'd on the sentinel hash), 'neardup' (a corpus hash
   * within the radius; matched_id/hamming say which and how far) or
   * 'admit'. The admission filter is `decision = 'admit'`; emitting
   * decisions instead of filtering is the mm-family observability
   * convention (quarantine routing matters).
   */
  def phashGatePartitioned(df: DataFrame, bytesCol: String,
      idx: org.apache.spark.broadcast.Broadcast[PhashBandIndex],
      maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = df.schema
      .add("width", IntegerType, nullable = false)
      .add("height", IntegerType, nullable = false)
      .add("phash", LongType, nullable = false)
      .add("matched_id", LongType, nullable = true)
      .add("hamming", LongType, nullable = true)
      .add("decision", StringType, nullable = false)
    val iBytes = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](iBytes)
        phashGrid(bytes) match {
          case None =>
            org.apache.spark.sql.Row.merge(r,
              org.apache.spark.sql.Row(-1, -1, 0L, null, null,
                "quarantine"))
          case Some((w, h, grid)) =>
            val ph = phash64((x, y) => grid(y)(x), PhashS, PhashS)
            idx.value.probe(ph, maxHamming) match {
              case null =>
                org.apache.spark.sql.Row.merge(r,
                  org.apache.spark.sql.Row(w, h, ph, null, null,
                    "admit"))
              case (mid, d) =>
                org.apache.spark.sql.Row.merge(r,
                  org.apache.spark.sql.Row(w, h, ph, mid, d.toLong,
                    "neardup"))
            }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * REAL animated-GIF frame decode — the LOSSLESS multi-frame rung
   * beside [[decodeMjpegAviPartitioned]]: GIF's indexed color
   * round-trips grayscale pixels exactly through the JDK
   * writer/reader pair, so this is the one decode gate in the family
   * that is exact by construction, not by engineered margin. Emits
   * frame count + constant frame dimensions + the summed
   * GraphicControlExtension delay (centiseconds, the GIF wire unit —
   * variable per-frame delays sum honestly) + a 16-bin luminance
   * histogram over EVERY frame's pixels. Strict and total via the
   * [[gifStructure]] walk cross-checked against the decoded count:
   * non-GIF magic, truncated payloads (which the ImageIO reader would
   * otherwise decode as a silently-partial prefix — measured), bytes
   * past the trailer, zero frames, or a mid-clip dimension change
   * quarantine the CLIP (all counters -1 — routed, never dropped,
   * never a task kill). One partition-batched pass; ImageIO's disk
   * cache is disabled once per partition.
   */
  /** Strict GIF structural walk: Some(imageDescriptorCount) iff the
   *  block stream runs header → blocks → trailer with the trailer's
   *  0x3B landing EXACTLY at end-of-buffer. The ImageIO reader
   *  happily decodes the complete PREFIX of a truncated payload
   *  (measured: a half-cut 2-frame clip reads as 1 frame) — the
   *  silently-partial class the AVI walker quarantines — so the
   *  decode gate cross-checks this walk against the decoded frame
   *  count. Sub-blocks are length-prefixed, so the walk skips pixel
   *  data without LZW decoding. */
  private[graft] def gifStructure(b: Array[Byte]): Option[Int] = {
    def u8(p: Int): Int = b(p) & 0xFF
    var p = 6 + 7 // header + logical screen descriptor
    if (b.length < p) return None
    if ((u8(10) & 0x80) != 0) p += 3 * (1 << ((u8(10) & 7) + 1))
    var frames = 0
    def subBlocks(q0: Int): Int = { // returns pos after the 0 terminator
      var q = q0
      while (q < b.length && u8(q) != 0) q += 1 + u8(q)
      if (q >= b.length) -1 else q + 1
    }
    while (p < b.length) {
      u8(p) match {
        case 0x2C => // image descriptor
          if (p + 10 > b.length) return None
          val flags = u8(p + 9)
          p += 10
          if ((flags & 0x80) != 0) p += 3 * (1 << ((flags & 7) + 1))
          if (p + 1 > b.length) return None
          p = subBlocks(p + 1) // LZW min-code byte, then data sub-blocks
          if (p < 0) return None
          frames += 1
        case 0x21 => // extension: label byte + sub-blocks
          if (p + 2 > b.length) return None
          p = subBlocks(p + 2)
          if (p < 0) return None
        case 0x3B =>
          // trailer must close the buffer exactly — trailing bytes are
          // untrusted structure
          return if (p == b.length - 1 && frames > 0) Some(frames)
                 else None
        case _ => return None
      }
    }
    None // ran off the end without a trailer (truncation)
  }

  def decodeGifFramesPartitioned(df: DataFrame, idCol: String,
      bytesCol: String)
      : org.apache.spark.sql.Dataset[graft.model.GifFeatures] = {
    import df.sparkSession.implicits._
    val bad = graft.model.GifFeatures(_: Long, -1L, -1, -1, -1L, Nil)
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, b) =>
          try {
            val magicOk = b != null && b.length > 6 && {
              val m = new String(b, 0, 6, "US-ASCII")
              m == "GIF87a" || m == "GIF89a"
            }
            val structure = if (magicOk) gifStructure(b) else None
            if (structure.isEmpty) bad(id)
            else {
              val reader = javax.imageio.ImageIO
                .getImageReadersByFormatName("gif").next()
              // reader.dispose() does NOT close its input stream —
              // close it explicitly or its cache buffers live to GC
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(b))
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                // the reader decodes the complete PREFIX of a truncated
                // stream — the structural walk's count is the whole-file
                // truth, and a mismatch is a silently-partial decode
                var ok = n > 0 && structure.contains(n)
                var w = -1
                var h = -1
                var delay = 0L
                val hist = new Array[Long](16)
                var f = 0
                while (ok && f < n) {
                  val img = reader.read(f)
                  if (w == -1 || (w == img.getWidth &&
                      h == img.getHeight)) {
                    w = img.getWidth; h = img.getHeight
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val rgb = img.getRGB(x, y)
                        val lum = (((rgb >> 16) & 0xFF) +
                          ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
                        hist(lum >> 4) += 1L
                        x += 1
                      }
                      y += 1
                    }
                    val md = reader.getImageMetadata(f)
                    val root = md.getAsTree(md.getNativeMetadataFormatName)
                      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
                    val gces = root
                      .getElementsByTagName("GraphicControlExtension")
                    if (gces.getLength > 0)
                      delay += gces.item(0)
                        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
                        .getAttribute("delayTime").toLong
                    f += 1
                  } else ok = false // dimension change mid-clip
                }
                if (!ok) bad(id)
                else graft.model.GifFeatures(id, n.toLong, w, h, delay,
                  hist.toSeq)
              } finally {
                reader.dispose()
                iis.close()
              }
            }
          } catch {
            // the GIF plugin throws unchecked on truncated/adversarial
            // bytes — quarantine, don't kill
            case scala.util.control.NonFatal(_) => bad(id)
          }
        }
      }
  }

  /**
   * Per-FRAME perceptual hashes of an animated GIF — the video
   * fingerprint a clip-dedup pass stores (the multimodal sibling of
   * per-chunk text fingerprints): decode every frame like
   * [[decodeGifFramesPartitioned]] (same magic + structural-walk
   * cross-check against ImageIO's silent prefix-decode, same
   * constant-dims requirement), sample each frame's ≤ 32×32 luminance
   * grid (only the sampled coordinates are read — the phashGrid
   * rationale), and emit [[phash64]] of the frame PLUS the hash of a
   * `brightShift`-brightened copy (the built-in near-duplicate ground
   * truth, the [[phashPartitioned]] device lifted to sequences). One
   * row per frame; a quarantined clip emits ONE sentinel row
   * (frame = -1, width = -1) so it is routed, never silently dropped,
   * and never enters a dedup join. One partition-batched pass; decode
   * and both hashes fuse per frame.
   */
  def gifFramePhashesPartitioned(df: DataFrame, idCol: String,
      bytesCol: String, brightShift: Int)
      : org.apache.spark.sql.Dataset[graft.model.GifFramePhash] = {
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, b) => gifClipPhashes(id, b, brightShift) }
      }
  }

  /** One clip's per-frame hash rows — the ONE decode+hash definition
   *  [[gifFramePhashesPartitioned]] and [[videoGatePartitioned]]
   *  share (the phashGrid convention: batch and live hash the same
   *  pixels by construction). A quarantined clip yields the single
   *  sentinel row. */
  private def gifClipPhashes(id: Long, b: Array[Byte], brightShift: Int)
      : Seq[graft.model.GifFramePhash] = {
    val bad = graft.model.GifFramePhash(_: Long, -1L, -1, -1, 0L, 0L)
    try {
      val magicOk = b != null && b.length > 6 && {
        val m = new String(b, 0, 6, "US-ASCII")
        m == "GIF87a" || m == "GIF89a"
      }
      val structure = if (magicOk) gifStructure(b) else None
      if (structure.isEmpty) Seq(bad(id))
      else {
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          var ok = n > 0 && structure.contains(n)
          var w = -1
          var h = -1
          val out = Seq.newBuilder[graft.model.GifFramePhash]
          var f = 0
          while (ok && f < n) {
            val img = reader.read(f)
            if (w == -1 || (w == img.getWidth &&
                h == img.getHeight)) {
              w = img.getWidth; h = img.getHeight
              val (base, shifted) = framePhashes(img, brightShift)
              out += graft.model.GifFramePhash(id, f.toLong, w, h,
                base, shifted)
              f += 1
            } else ok = false // dimension change mid-clip
          }
          if (!ok) Seq(bad(id)) else out.result()
        } finally {
          reader.dispose()
          iis.close()
        }
      }
    } catch {
      // the GIF plugin throws unchecked on truncated/adversarial
      // bytes — quarantine, don't kill
      case scala.util.control.NonFatal(_) => Seq(bad(id))
    }
  }

  /** The ONE sampled-grid DCT hash every video container shares (the
   *  phashGrid convention lifted across codecs: GIF frames, MJPEG-AVI
   *  frames, and the live gates all hash these exact pixels): ≤ 32×32
   *  luminance samples of the decoded frame — only the sampled
   *  coordinates are read — then [[phash64]], plus the
   *  `brightShift`-brightened control hash (shift 0 skips the second
   *  DCT; consumers that only dedup pay one transform per frame). */
  private def framePhashes(img: java.awt.image.BufferedImage,
      brightShift: Int): (Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val S = PhashS
    val grid = Array.tabulate(S, S) { (yy, xx) =>
      val rgb = img.getRGB(xx * w / S, yy * h / S)
      (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
        (rgb & 0xFF)) / 3
    }
    val base = phash64((x, y) => grid(y)(x), S, S)
    val shifted =
      if (brightShift == 0) base
      else phash64((x, y) =>
        math.min(255, grid(y)(x) + brightShift), S, S)
    (base, shifted)
  }

  /** Per-FRAME perceptual hashes of an MJPEG-in-AVI clip — the AVI
   *  rung of [[gifClipPhashes]], built on the SHARED strict RIFF walk
   *  [[mjpegAviFrames]] (same structural guarantees as
   *  [[decodeMjpegAviPartitioned]]: bounded chunks, single video
   *  stream, constant dims, rec-interleave descent) and the SHARED
   *  [[framePhashes]] grid, so a clip's fingerprint is identical no
   *  matter which container carried its pixels. Quarantine emits the
   *  single sentinel row (frame = -1, width = -1). */
  private def aviClipPhashes(id: Long, b: Array[Byte], brightShift: Int)
      : Seq[graft.model.GifFramePhash] = {
    val bad = graft.model.GifFramePhash(_: Long, -1L, -1, -1, 0L, 0L)
    try {
      val out = Seq.newBuilder[graft.model.GifFramePhash]
      var f = 0L
      mjpegAviFrames(b) { img =>
        val (base, shifted) = framePhashes(img, brightShift)
        out += graft.model.GifFramePhash(id, f, img.getWidth,
          img.getHeight, base, shifted)
        f += 1
      } match {
        case Some(_) => out.result()
        case None => Seq(bad(id))
      }
    } catch {
      // ImageIO plugins and index arithmetic both throw unchecked on
      // adversarial bytes — quarantine, don't kill
      case scala.util.control.NonFatal(_) => Seq(bad(id))
    }
  }

  /** CONTAINER-GENERAL per-frame clip hashing — magic-sniffed
   *  dispatch over every container this engine decodes to pixels
   *  (GIF87a/GIF89a → [[gifClipPhashes]], RIFF AVI → MJPEG
   *  [[aviClipPhashes]], ISO BMFF `ftyp` → photo-JPEG sample tables
   *  [[mp4ClipPhashes]]); a video-dedup pass must hash whatever
   *  containers the corpus carries, and all routes share
   *  [[framePhashes]], so a clip and its re-mux in another container
   *  fingerprint identically. Unknown magic — and MP4s whose stsd
   *  names an inter-frame codec (no JDK decoder; the walk inside the
   *  MP4 route quarantines those for the transcode farm) —
   *  quarantines with the single sentinel row: routed, never
   *  silently dropped, never a dedup-join participant. */
  private[graft] def clipPhashes(id: Long, b: Array[Byte],
      brightShift: Int): Seq[graft.model.GifFramePhash] = {
    val isGif = b != null && b.length > 6 && {
      val m = new String(b, 0, 6, "US-ASCII")
      m == "GIF87a" || m == "GIF89a"
    }
    val isAvi = b != null && b.length >= 12 &&
      new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "AVI "
    val isMp4 = b != null && b.length >= 12 &&
      new String(b, 4, 4, "US-ASCII") == "ftyp"
    if (isGif) gifClipPhashes(id, b, brightShift)
    else if (isAvi) aviClipPhashes(id, b, brightShift)
    else if (isMp4) mp4ClipPhashes(id, b, brightShift)
    else Seq(graft.model.GifFramePhash(id, -1L, -1, -1, 0L, 0L))
  }

  /**
   * Per-FRAME perceptual hashes of ANY supported video container —
   * [[gifFramePhashesPartitioned]] generalized through the
   * magic-sniffing [[clipPhashes]] dispatch, the corpus pass
   * `mm_video_neardup` and the live video gate build on: one row per
   * decoded frame, one sentinel row per quarantined clip, one
   * partition-batched pass with decode and hash fused per frame.
   */
  def videoFramePhashesPartitioned(df: DataFrame, idCol: String,
      bytesCol: String, brightShift: Int)
      : org.apache.spark.sql.Dataset[graft.model.GifFramePhash] = {
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, b) => clipPhashes(id, b, brightShift) }
      }
  }

  /**
   * Broadcastable per-frame-position banded VIDEO fingerprint index —
   * the [[PhashBandIndex]] device lifted to frame sequences, the
   * offline-model half of the live video admission gate: one banded
   * image index PER FRAME POSITION plus each corpus clip's frame
   * count. A probe clip's candidates start as frame 0's within-radius
   * clips (pigeonhole-complete), immediately restricted to EQUAL
   * frame counts (the truncated-decoy rule), then INTERSECTED with
   * each later frame's candidate set while tracking the max aligned
   * distance — exact by the batch operator's own qualification rule
   * (same count + every aligned frame within radius), so the gate and
   * `mm_video_neardup` agree clip for clip. Ties break to the
   * smaller corpus id on (max distance, id).
   */
  final class VideoBandIndex(
      val counts: java.util.HashMap[java.lang.Long, Integer],
      val perFrame: Array[PhashBandIndex]) extends Serializable {
    /** (matched corpus clip, max aligned hamming) or null. */
    def probe(frames: Array[Long], maxHamming: Int): (Long, Int) = {
      if (frames.isEmpty || frames.length > perFrame.length) return null
      val live = perFrame(0).probeAll(frames(0), maxHamming)
      val it0 = live.entrySet().iterator()
      while (it0.hasNext) {
        val e = it0.next()
        val c = counts.get(e.getKey)
        if (c == null || c.intValue() != frames.length) it0.remove()
      }
      var f = 1
      while (f < frames.length && !live.isEmpty) {
        val cand = perFrame(f).probeAll(frames(f), maxHamming)
        val it = live.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val d = cand.get(e.getKey)
          if (d == null) it.remove()
          else if (d.intValue() > e.getValue.intValue())
            e.setValue(d)
        }
        f += 1
      }
      var bestId = Long.MaxValue
      var bestD = Int.MaxValue
      live.forEach { (id, d) =>
        if (d < bestD || (d == bestD && id < bestId)) {
          bestD = d; bestId = id
        }
      }
      if (bestD == Int.MaxValue) null else (bestId, bestD)
    }
  }

  object VideoBandIndex {
    /** Build from (clip_id, frame, hash) rows (any order). */
    def apply(rows: Seq[(Long, Long, Long)]): VideoBandIndex = {
      val counts = new java.util.HashMap[java.lang.Long, Integer]
      rows.groupBy(_._1).foreach { case (id, fs) =>
        counts.put(id, fs.length); ()
      }
      val maxFrame =
        if (rows.isEmpty) -1L else rows.iterator.map(_._2).max
      // grouped ONCE: a per-position filter scan would be
      // O(rows × maxFrame) at build time on long clips
      val byFrame = rows.groupBy(_._2)
      val perFrame = Array.tabulate(maxFrame.toInt + 1) { f =>
        PhashBandIndex(byFrame.getOrElse(f.toLong, Nil)
          .map(r => (r._1, r._3)))
      }
      new VideoBandIndex(counts, perFrame)
    }
  }

  /**
   * Partition-batched decode → per-frame hashes → banded sequence
   * probe — the live half of the VIDEO admission gate (the
   * [[phashGatePartitioned]] contract on clips): per row the SHARED
   * container-sniffing [[clipPhashes]] decode (batch and live hash
   * the same pixels, GIF or MJPEG-AVI alike), then ONE
   * [[VideoBandIndex.probe]]. Row-merge passthrough plus
   * (n_frames, matched_id, max_hamming, decision): 'quarantine'
   * (undecodable/malformed clip — never admitted silently, never
   * matched on sentinel hashes), 'neardup' (a corpus clip with the
   * SAME frame count and EVERY aligned frame within the radius), or
   * 'admit'.
   */
  def videoGatePartitioned(df: DataFrame, bytesCol: String,
      idx: org.apache.spark.broadcast.Broadcast[VideoBandIndex],
      maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = df.schema
      .add("n_frames", LongType, nullable = false)
      .add("matched_id", LongType, nullable = true)
      .add("max_hamming", LongType, nullable = true)
      .add("decision", StringType, nullable = false)
    val iBytes = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](iBytes)
        val hashed = clipPhashes(0L, bytes, brightShift = 0)
        if (hashed.exists(_.width == -1))
          org.apache.spark.sql.Row.merge(r,
            org.apache.spark.sql.Row(-1L, null, null, "quarantine"))
        else {
          val frames = hashed.sortBy(_.frame).map(_.phash).toArray
          idx.value.probe(frames, maxHamming) match {
            case null =>
              org.apache.spark.sql.Row.merge(r,
                org.apache.spark.sql.Row(frames.length.toLong, null,
                  null, "admit"))
            case (mid, d) =>
              org.apache.spark.sql.Row.merge(r,
                org.apache.spark.sql.Row(frames.length.toLong, mid,
                  d.toLong, "neardup"))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * REAL video frame decode — MJPEG-in-AVI, the decoded-pixels rung
   * [[probeMp4Partitioned]]'s scaladoc points at: MJPEG frames are
   * independent baseline JPEGs, so a strict RIFF walk (little-endian
   * sizes, even-byte chunk padding, the public MS AVI layout) plus
   * per-frame `javax.imageio` decode turns genuine video into frame
   * count + constant frame dimensions + the container's
   * microseconds-per-frame + a 16-bin luminance histogram over EVERY
   * frame's pixels — all JDK-public, zero external codecs. Inter-frame
   * codecs stay behind the probe/transcode routing boundary.
   *
   * The walk is strict and total: RIFF/AVI magic required, every
   * chunk must sit inside its parent (a size escaping the RIFF bound
   * or a desynced `movi` chunk quarantines the CLIP — a mid-stream
   * desync means every later "frame boundary" is untrusted),
   * `LIST hdrl` must open with `avih` (the frame clock), frame chunks
   * are `##dc`/`##db` of ONE video stream (STREAM-SCOPED: the first
   * video stream encountered is the clip's video — audio-first muxes
   * legally number it 01 — and a `##dc`/`##db` chunk from any OTHER
   * stream number is a second video stream whose frames must not
   * merge into one histogram, so the clip quarantines; non-video
   * stream data — `##wb` audio, `##pc` palette — and OpenDML `ix##`
   * indexes / `JUNK` padding interleave legally and are skipped; any
   * OTHER chunk id inside `movi` is untrusted structure and
   * quarantines) — at `movi`
   * top level or one `LIST 'rec '` interleave grouping down (the
   * standard CD-ROM layout); any OTHER grouping inside `movi`
   * quarantines rather than being silently skipped with its frames —
   * frames must decode and agree on dimensions, and a clip with zero
   * frames is malformed. Quarantine emits
   * n_frames = -1 with -1 fields (the PNG/WAV/MP4 convention: routed,
   * never dropped, never a task kill). One partition-batched pass;
   * ImageIO's disk cache is disabled once per partition.
   */
  def decodeMjpegAviPartitioned(df: DataFrame, idCol: String,
      bytesCol: String)
      : org.apache.spark.sql.Dataset[graft.model.VideoFeatures] = {
    import df.sparkSession.implicits._
    val bad = graft.model.VideoFeatures(_: Long, -1L, -1, -1, -1L, Nil)
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, b) =>
          try {
            val hist = new Array[Long](16)
            mjpegAviFrames(b) { img =>
              val hh = img.getHeight
              val ww = img.getWidth
              var y = 0
              while (y < hh) {
                var x = 0
                while (x < ww) {
                  val rgb = img.getRGB(x, y)
                  val lum = (((rgb >> 16) & 0xFF) +
                    ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
                  hist(lum >> 4) += 1L
                  x += 1
                }
                y += 1
              }
            } match {
              case Some((usPerFrame, n, w, h)) =>
                graft.model.VideoFeatures(id, n, w, h, usPerFrame,
                  hist.toSeq)
              case None => bad(id)
            }
          } catch {
            // ImageIO plugins and index arithmetic both throw
            // unchecked on adversarial bytes — quarantine, don't kill
            case scala.util.control.NonFatal(_) => bad(id)
          }
        }
      }
  }

  /** The ONE strict per-clip MJPEG-AVI walk
   *  [[decodeMjpegAviPartitioned]] (histogram consumer) and
   *  [[aviClipPhashes]] (fingerprint consumer) share — decode and
   *  structural guarantees can never drift between the stats query
   *  and the dedup fingerprint: invokes `onFrame` for every decoded
   *  frame in container order (constant dims enforced inside the
   *  walk), returns Some((usPerFrame, nFrames, width, height)) or
   *  None for quarantine. Callers supply the NonFatal catch (ImageIO
   *  plugins and index arithmetic throw unchecked on adversarial
   *  bytes) and the once-per-partition ImageIO cache disable. */
  private def mjpegAviFrames(b: Array[Byte])(
      onFrame: java.awt.image.BufferedImage => Unit)
      : Option[(Long, Long, Int, Int)] = {
            if (b == null || b.length < 24) None
            else {
              def u32(p: Int): Long = (b(p) & 0xFFL) |
                ((b(p + 1) & 0xFFL) << 8) | ((b(p + 2) & 0xFFL) << 16) |
                ((b(p + 3) & 0xFFL) << 24)
              def fourcc(p: Int): String = new String(b, p, 4, "US-ASCII")
              val riffEnd = 8L + u32(4)
              // STRICT bound both ways: riffEnd past the buffer is a
              // truncation lie, and bytes PAST riffEnd (beyond one
              // RIFF pad byte) are an OpenDML 'RIFF AVIX' extension
              // segment or junk — walking only the first segment
              // would emit silently partial frame stats, so the >1GB
              // multi-segment layout quarantines for ROUTING like
              // inter-frame codecs do
              if (fourcc(0) != "RIFF" || fourcc(8) != "AVI " ||
                  riffEnd > b.length ||
                  b.length - riffEnd > (u32(4) & 1L)) None
              else {
                // top-level chunk walk: find the frame clock and the
                // movi payload bounds
                var usPerFrame = -1L
                var moviFrom = -1L
                var moviTo = -1L
                var ok = true
                var p = 12L
                while (ok && p + 8 <= riffEnd) {
                  val ck = fourcc(p.toInt)
                  val sz = u32(p.toInt + 4)
                  val body = p + 8
                  if (body + sz > riffEnd) ok = false // escapes RIFF
                  else {
                    if (ck == "LIST" && sz >= 4) {
                      val lt = fourcc(body.toInt)
                      if (lt == "hdrl") {
                        // avih leads hdrl per the layout — it carries
                        // the frame clock
                        if (sz >= 24 && fourcc(body.toInt + 4) == "avih")
                          usPerFrame = u32(body.toInt + 12)
                        else ok = false
                      } else if (lt == "movi") {
                        // a SECOND movi would overwrite the first's
                        // bounds and silently drop its frames —
                        // quarantine instead (single-movi scope; the
                        // multi-movi form rides OpenDML, handled above)
                        if (moviFrom >= 0) ok = false
                        else { moviFrom = body + 4; moviTo = body + sz }
                      }
                    }
                    p = body + sz + (sz & 1L) // even-byte padding
                  }
                }
                if (!ok || usPerFrame < 0L || moviFrom < 0L) None
                else {
                  // frame chunks: ##dc (compressed video) / ##db
                  // (uncompressed DIB — same JPEG payload contract
                  // under MJPG handlers that mislabel); LIST 'rec '
                  // groupings (the standard CD-ROM interleave layout)
                  // walk one level down — any OTHER grouping inside
                  // movi is untrusted structure and quarantines
                  var n = 0L
                  var w = -1
                  var h = -1
                  var vidStream = -1 // the ONE video stream we decode
                  def walkFrames(from: Long, to: Long,
                      allowRec: Boolean): Unit = {
                    var q = from
                    while (ok && q + 8 <= to) {
                      val ck = fourcc(q.toInt)
                      val sz = u32(q.toInt + 4)
                      val body = q + 8
                      if (body + sz > to) ok = false // desynced
                      else {
                        def isStream = ck.length == 4 &&
                          ck(0) >= '0' && ck(0) <= '9' &&
                          ck(1) >= '0' && ck(1) <= '9'
                        def streamNo = (ck(0) - '0') * 10 + (ck(1) - '0')
                        if (ck == "LIST") {
                          if (allowRec && sz >= 4 &&
                              fourcc(body.toInt) == "rec ")
                            walkFrames(body + 4, body + sz, false)
                          else ok = false
                        } else if (isStream && vidStream >= 0 &&
                            streamNo != vidStream &&
                            (ck.endsWith("dc") || ck.endsWith("db"))) {
                          // a SECOND video stream's frames — merging
                          // them into one histogram would be silently
                          // wrong; this decoder is single-video-stream
                          // scoped (whatever its number — audio-first
                          // muxes legally put video at 01), so the
                          // clip quarantines whole
                          ok = false
                        } else if (isStream &&
                            (ck.endsWith("wb") || ck.endsWith("pc"))) {
                          () // audio samples / palette change: non-video
                             // stream data interleaves legally — skip
                        } else if ((ck.startsWith("ix") &&
                            ck(2) >= '0' && ck(2) <= '9' &&
                            ck(3) >= '0' && ck(3) <= '9') || ck == "JUNK") {
                          () // OpenDML in-movi ix## index / padding —
                             // 'ix' + two NON-digits is unknown
                             // structure and falls to quarantine below
                        } else if (isStream &&
                            (ck.endsWith("dc") || ck.endsWith("db"))) {
                          vidStream = streamNo
                          val img = javax.imageio.ImageIO.read(
                            new java.io.ByteArrayInputStream(
                              b, body.toInt, sz.toInt))
                          if (img == null) ok = false
                          else if (w == -1 || (w == img.getWidth &&
                              h == img.getHeight)) {
                            w = img.getWidth; h = img.getHeight
                            onFrame(img)
                            n += 1L
                          } else ok = false // dimension change mid-clip
                        } else {
                          // any OTHER chunk id inside movi is untrusted
                          // structure — quarantine, matching the
                          // strict-and-total contract (never silently
                          // skip bytes whose meaning is unknown)
                          ok = false
                        }
                        q = body + sz + (sz & 1L)
                      }
                    }
                  }
                  walkFrames(moviFrom, moviTo, allowRec = true)
                  if (!ok || n == 0L) None
                  else Some((usPerFrame, n, w, h))
                }
              }
            }
  }

  /**
   * REAL video frame decode — MJPEG-in-MP4, closing the third
   * ingested video container (the [[probeMp4Partitioned]] scaladoc's
   * routing boundary moves: a photo-JPEG ('jpeg') sample table needs
   * no inter-frame codec, so it decodes HERE with the exact per-frame
   * JPEG machinery the AVI walk already owns; every other codec
   * fourcc still quarantines for the transcode farm):
   * [[mjpegMp4Frames]] + per-frame `javax.imageio`, partition-batched,
   * the [[decodeMjpegAviPartitioned]] contract (frame count, constant
   * dims, container frame clock, 16-bin luminance histogram over
   * EVERY frame; quarantine = n_frames −1, routed never dropped).
   */
  def decodeMjpegMp4Partitioned(df: DataFrame, idCol: String,
      bytesCol: String)
      : org.apache.spark.sql.Dataset[graft.model.VideoFeatures] = {
    import df.sparkSession.implicits._
    val bad = graft.model.VideoFeatures(_: Long, -1L, -1, -1, -1L, Nil)
    df.select(col(idCol), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, b) =>
          try {
            val hist = new Array[Long](16)
            mjpegMp4Frames(b) { img =>
              val hh = img.getHeight
              val ww = img.getWidth
              var y = 0
              while (y < hh) {
                var x = 0
                while (x < ww) {
                  val rgb = img.getRGB(x, y)
                  val lum = (((rgb >> 16) & 0xFF) +
                    ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
                  hist(lum >> 4) += 1L
                  x += 1
                }
                y += 1
              }
            } match {
              case Some((usPerFrame, n, w, h)) =>
                graft.model.VideoFeatures(id, n, w, h, usPerFrame,
                  hist.toSeq)
              case None => bad(id)
            }
          } catch {
            case scala.util.control.NonFatal(_) => bad(id)
          }
        }
      }
  }

  /** Per-FRAME perceptual hashes of an MJPEG-in-MP4 clip — the MP4
   *  rung of [[gifClipPhashes]]/[[aviClipPhashes]], built on the
   *  SHARED strict sample-table walk [[mjpegMp4Frames]] and the
   *  SHARED [[framePhashes]] grid, so a clip's fingerprint is
   *  identical no matter which container carried its pixels. */
  private def mp4ClipPhashes(id: Long, b: Array[Byte], brightShift: Int)
      : Seq[graft.model.GifFramePhash] = {
    val bad = graft.model.GifFramePhash(_: Long, -1L, -1, -1, 0L, 0L)
    try {
      val out = Seq.newBuilder[graft.model.GifFramePhash]
      var f = 0L
      mjpegMp4Frames(b) { img =>
        val (base, shifted) = framePhashes(img, brightShift)
        out += graft.model.GifFramePhash(id, f, img.getWidth,
          img.getHeight, base, shifted)
        f += 1
      } match {
        case Some(_) => out.result()
        case None => Seq(bad(id))
      }
    } catch {
      case scala.util.control.NonFatal(_) => Seq(bad(id))
    }
  }

  /** The ONE strict per-clip MJPEG-MP4 sample-table walk
   *  [[decodeMjpegMp4Partitioned]] (histogram consumer) and
   *  [[mp4ClipPhashes]] (fingerprint consumer) share — ISO/IEC
   *  14496-12's public layout: top level must open with `ftyp` and
   *  tile exactly into boxes (ONE `moov`, ONE `mdat` — trailing junk
   *  or a second of either quarantines; 64-bit `largesize` and
   *  run-to-end sizes quarantine for routing, the >4 GB segmented
   *  class); `moov` must carry exactly ONE `vide`-handler track
   *  (audio tracks interleave legally and are skipped WHOLE — their
   *  sample tables are theirs; a second video track's frames must
   *  not merge into one histogram, the AVI single-stream rule) whose
   *  `stsd` holds exactly one 'jpeg' (photo-JPEG) entry — any other
   *  codec fourcc is the transcode-farm routing boundary; `stts`
   *  must be a single run (the re-mux class has a constant frame
   *  clock; a variable-rate edit list is routing, not decode) agreeing
   *  with `stsz` on the sample count; samples map to file offsets
   *  through the standard stsc×stco(/co64) expansion with every
   *  sample byte-range inside `mdat`'s payload (an offset escaping
   *  mdat is a desync lie — quarantine, never a partial walk).
   *  UNLIKE the AVI movi walk, unknown boxes inside moov/trak/stbl
   *  are SKIPPED, not quarantined: ISO BMFF sizes are
   *  self-describing, so an unknown box cannot desync its siblings
   *  (the risk the AVI rule guards), and the spec defines skipping
   *  as the conforming behavior. Frames must decode as JPEG with
   *  constant dims; zero frames is malformed. Returns
   *  Some((usPerFrame, nFrames, width, height)) or None for
   *  quarantine. Callers supply the NonFatal catch and the
   *  once-per-partition ImageIO cache disable. */
  private def mjpegMp4Frames(b: Array[Byte])(
      onFrame: java.awt.image.BufferedImage => Unit)
      : Option[(Long, Long, Int, Int)] = {
    if (b == null || b.length < 16) return None
    def u32(p: Long): Long =
      ((b(p.toInt) & 0xFFL) << 24) | ((b(p.toInt + 1) & 0xFFL) << 16) |
        ((b(p.toInt + 2) & 0xFFL) << 8) | (b(p.toInt + 3) & 0xFFL)
    def fourcc(p: Long): String = new String(b, p.toInt, 4, "US-ASCII")
    /** Child boxes tiling [from, to) exactly — null on malformed
     *  sizes (< header, escaping the parent, 0/1 sentinels, or a
     *  gap at the end). */
    def kids(from: Long, to: Long): Seq[(String, Long, Long)] = {
      val out = Seq.newBuilder[(String, Long, Long)]
      var q = from
      while (q + 8 <= to) {
        val sz = u32(q)
        if (sz < 8 || q + sz > to) return null
        out += ((fourcc(q + 4), q + 8, q + sz))
        q += sz
      }
      if (q != to) null else out.result()
    }
    val top = kids(0, b.length.toLong)
    if (top == null || top.isEmpty || top.head._1 != "ftyp") return None
    val moovs = top.filter(_._1 == "moov")
    val mdats = top.filter(_._1 == "mdat")
    if (moovs.length != 1 || mdats.length != 1) return None
    val (_, mdatFrom, mdatTo) = mdats.head
    val moovKids = kids(moovs.head._2, moovs.head._3)
    if (moovKids == null) return None
    // exactly ONE video track: find its mdia
    var vidMdia: (Long, Long) = null
    for ((t, f0, t0) <- moovKids if t == "trak") {
      val trakKids = kids(f0, t0)
      if (trakKids == null) return None
      trakKids.find(_._1 == "mdia") match {
        case None => return None // a track without media structure
        case Some((_, mf, mt)) =>
          val mdiaKids = kids(mf, mt)
          if (mdiaKids == null) return None
          mdiaKids.find(_._1 == "hdlr") match {
            case None => return None
            case Some((_, hf, ht)) =>
              if (ht - hf < 12) return None
              if (fourcc(hf + 8) == "vide") {
                if (vidMdia != null) return None // second video track
                vidMdia = (mf, mt)
              }
          }
      }
    }
    if (vidMdia == null) return None
    val mdiaKids = kids(vidMdia._1, vidMdia._2)
    // media timescale (mdhd v0/v1 — the probe's version handling)
    val timescale = mdiaKids.find(_._1 == "mdhd") match {
      case Some((_, f0, t0)) if t0 - f0 >= 16 =>
        if ((b(f0.toInt) & 0xFF) == 1) {
          if (t0 - f0 < 28) return None
          u32(f0 + 20)
        } else u32(f0 + 12)
      case _ => return None
    }
    if (timescale <= 0L) return None
    val stbl = (for {
      (t, f0, t0) <- mdiaKids if t == "minf"
      mk = kids(f0, t0) if mk != null
      s <- mk.find(_._1 == "stbl")
    } yield s).headOption.getOrElse(return None)
    val stblKids = kids(stbl._2, stbl._3)
    if (stblKids == null) return None
    def tbl(name: String): (Long, Long) =
      stblKids.find(_._1 == name) match {
        case Some((_, f0, t0)) => (f0, t0)
        case None => (-1L, -1L)
      }
    // stsd: exactly one entry, photo-JPEG — the codec routing gate
    val (sdF, sdT) = tbl("stsd")
    if (sdF < 0 || sdT - sdF < 16 || u32(sdF + 4) != 1L ||
        fourcc(sdF + 12) != "jpeg") return None
    // stts: one run = constant frame clock
    val (ttF, ttT) = tbl("stts")
    if (ttF < 0 || ttT - ttF < 16 || u32(ttF + 4) != 1L) return None
    val sttsCount = u32(ttF + 8)
    val delta = u32(ttF + 12)
    if (delta <= 0L) return None
    // stsz: per-sample sizes (or the uniform-size shortcut)
    val (szF, szT) = tbl("stsz")
    if (szF < 0 || szT - szF < 12) return None
    val uniform = u32(szF + 4)
    val nSamples = u32(szF + 8)
    if (nSamples <= 0L || nSamples != sttsCount) return None
    if (uniform == 0L && szT - szF < 12 + 4 * nSamples) return None
    def sampleSize(s: Long): Long =
      if (uniform != 0L) uniform else u32(szF + 12 + 4 * s)
    // stsc runs + stco/co64 chunk offsets
    val (scF, scT) = tbl("stsc")
    if (scF < 0 || scT - scF < 8) return None
    val nRuns = u32(scF + 4)
    if (nRuns <= 0L || scT - scF < 8 + 12 * nRuns) return None
    val (coF, coT) = tbl("stco")
    val (co64F, co64T) = tbl("co64")
    if ((coF < 0) == (co64F < 0)) return None // exactly one of the two
    val wide = coF < 0
    val (cF, cT) = if (wide) (co64F, co64T) else (coF, coT)
    if (cT - cF < 8) return None
    val nChunks = u32(cF + 4)
    val width = if (wide) 8L else 4L
    if (nChunks <= 0L || cT - cF < 8 + width * nChunks) return None
    def chunkOffset(c: Long): Long = {
      val p = cF + 8 + width * c
      if (wide) (u32(p) << 32) | u32(p + 4) else u32(p)
    }
    def runFirstChunk(r: Long): Long = u32(scF + 8 + 12 * r)
    def runPerChunk(r: Long): Long = u32(scF + 8 + 12 * r + 4)
    def runDesc(r: Long): Long = u32(scF + 8 + 12 * r + 8)
    if (runFirstChunk(0) != 1L) return None
    var r = 0L
    while (r < nRuns) {
      if (runDesc(r) != 1L || runPerChunk(r) <= 0L ||
          (r > 0 && runFirstChunk(r) <= runFirstChunk(r - 1)))
        return None
      r += 1
    }
    // walk chunks in order, expanding the stsc runs; decode samples
    var n = 0L
    var w = -1
    var h = -1
    var run = 0L
    var chunk = 0L
    while (chunk < nChunks && n < nSamples) {
      if (run + 1 < nRuns && chunk + 1 >= runFirstChunk(run + 1)) run += 1
      var off = chunkOffset(chunk)
      var s = 0L
      val per = runPerChunk(run)
      while (s < per && n < nSamples) {
        val size = sampleSize(n)
        if (size <= 0L || off < mdatFrom || off + size > mdatTo)
          return None // sample range escapes mdat — desync lie
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b, off.toInt, size.toInt))
        if (img == null) return None
        if (w != -1 && (w != img.getWidth || h != img.getHeight))
          return None // dimension change mid-clip
        w = img.getWidth; h = img.getHeight
        onFrame(img)
        n += 1L
        off += size
        s += 1L
      }
      chunk += 1L
    }
    if (n != nSamples) return None // tables promised more samples
    // symmetric strictness: stco/stsc chunks the samples never fill
    // are the same class of table lie as too-few samples — quarantine
    // (matches the trailing-junk rule applied at top level)
    if (chunk != nChunks) return None
    Some((delta * 1000000L / timescale, n, w, h))
  }
}
