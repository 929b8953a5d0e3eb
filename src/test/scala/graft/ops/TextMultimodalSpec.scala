package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("resizeNearest gathers the factor-strided bytes, top-left anchor") {
    import spark.implicits._
    // 2x2 from a 4x4 byte "image" 00..0F: keep rows 0,2 cols 0,2 ->
    // bytes 0x00, 0x02, 0x08, 0x0A
    val img = Seq(Tuple1((0 until 16).map(_.toByte).toArray)).toDF("bytes")
    val out = img.select(
      MultimodalOps.resizeNearest(col("bytes"), w = 4, h = 4, factor = 2))
      .as[String].head()
    assert(out == "0002080A")
  }

  test("langId: stopword argmax with precedence, und when no hits") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "el perro y la casa de los gatos"),
      (3L, "der hund und die katze ist nicht da"),
      (4L, "xyzzy plugh qwerty")).toDF("id", "text")
    val m = df.select(col("id"), TextAnalyticsOps.langId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "und"))
  }

  test("quality features: exact ratios") {
    val df = Seq("the cat sat").toDF("text") // 3 words, 9 letters, 11 chars
    val q = df.select(TextAnalyticsOps.qualityFeatures(col("text")).as("q"))
      .select($"q.n_words", $"q.mean_wlen", $"q.stop_ratio", $"q.alpha_ratio")
      .as[(Long, Double, Double, Double)].head()
    assert(q._1 == 3L)
    assert(q._2 == 3.0) // 9 non-space chars / 3 words
    assert(q._3 == 1.0 / 3.0)
    assert(q._4 == 9.0 / 11.0)
  }

  test("quality features on empty/whitespace-only text yield nulls, not errors") {
    // ANSI mode turns a bare /0 into DIVIDE_BY_ZERO; degenerate docs must
    // not kill a 100TB quality-scoring job — divisors are nullif-guarded
    val df = Seq("", "   ").toDF("text")
    val rows = df.select(TextAnalyticsOps.qualityFeatures(col("text")).as("q"))
      .select($"q.n_words", $"q.mean_wlen", $"q.score").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(0) == 0L))
    assert(rows.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq("Hello world-42!").toDF("text")
    val t = df.select(
      TextAnalyticsOps.wsTokenCount(col("text")),
      TextAnalyticsOps.bpeishTokenCount(col("text"))).as[(Long, Long)].head()
    assert(t._1 == 2L)
    // hello, world, -, 4, 2, ! -> 6
    assert(t._2 == 6L)
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("a", "The  Quick   Fox"), ("b", "the quick fox")).toDF("id", "text")
    val fps = df.select(TextAnalyticsOps.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0).matches("[0-9a-f]{32}"))
  }

  test("multimodal: blob synth, meta, frames, stub decode shapes") {
    val df = Seq((7L, "some document text")).toDF("doc_id", "text")
    val out = MultimodalOps.enrich(
      df.withColumn("bytes", MultimodalOps.synthBlob(col("text"))), col("bytes"))
    val row = out.select($"meta.n_bytes", $"meta.magic", size($"frames"),
      element_at($"frames", 1), size($"features"),
      aggregate($"features", lit(0L), (a, b) => a + b)).head()
    assert(row.getInt(0) == 64) // 4 x md5 = 64 bytes
    assert(row.getString(1).matches("[0-9A-F]{8}"))
    assert(row.getInt(2) == 4) // 4 frames
    assert(row.getString(3).matches("[0-9A-F]{16}")) // 8-byte frame hex
    assert(row.getInt(4) == 16) // 16 histogram bins
    assert(row.getLong(5) == 64L) // histogram sums to blob length
  }

  test("partition-batched decode matches the scalar stub") {
    val df = Seq((1L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "text")
      .withColumn("bytes", MultimodalOps.synthBlob(col("text")))
    val scalar = df.select(col("doc_id"), MultimodalOps.decodeStub(col("bytes")))
      .as[(Long, Seq[Long])].collect().toMap
    val batched = MultimodalOps.decodePartitioned(df, "doc_id", "bytes")
      .collect().toMap
    assert(scalar == batched)
  }

  test("stub decode handles null payloads") {
    val df = Seq((1L, null: Array[Byte])).toDF("id", "bytes")
    val out = df.select(MultimodalOps.decodeStub(col("bytes")).as("f"))
    assert(out.filter(col("f").isNull).count() == 1)
  }

  test("decodeImagePartitioned decodes a REAL encoded PNG (javax.imageio) " +
      "and quarantines undecodable bytes as width = -1") {
    // build an actual 8x6 PNG in memory: left half black, right half
    // white — known dimensions, known luminance histogram
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray
    val junk = Array[Byte](1, 2, 3, 4)
    val df = Seq((1L, png), (2L, junk), (3L, null: Array[Byte]))
      .toDF("doc_id", "bytes")
    val out = MultimodalOps.decodeImagePartitioned(df, "doc_id", "bytes")
      .collect().map(f => f.id -> f).toMap
    val ok = out(1L)
    assert(ok.width == 8 && ok.height == 6)
    assert(ok.lum_hist.length == 16)
    assert(ok.lum_hist.head == 24L, "24 black pixels land in bin 0")
    assert(ok.lum_hist.last == 24L, "24 white pixels land in bin 15")
    assert(ok.lum_hist.sum == 48L, "every pixel binned exactly once")
    assert(out(2L).width == -1 && out(3L).width == -1,
      "undecodable payloads are quarantined, not dropped")
  }

  test("decodeImagePartitioned quarantines malformed payloads whose magic " +
      "MATCHES a known format (plugin readers throw unchecked exceptions)") {
    // Junk with no matching magic makes ImageIO.read return null — the
    // easy path. The dangerous path is a payload that selects a real
    // plugin reader and then blows up inside it: PNG/GIF readers throw
    // IIOException but also unchecked IllegalArgumentException /
    // IndexOutOfBounds on truncated or field-corrupted input. Feed a
    // deterministic zoo of such payloads; every one must come back as
    // width = -1, never a task kill.
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray
    val truncations = // valid 8-byte PNG signature, cut mid-structure
      (9 until png.length by 7).map(n => png.take(n))
    val ihdrCorrupt = Seq( // patch IHDR fields to invalid values
      { val b = png.clone(); b(16) = 0x80.toByte; b }, // width sign bit
      { val b = png.clone(); java.util.Arrays.fill(b, 16, 24, 0.toByte); b }, // w=h=0
      { val b = png.clone(); b(24) = 3; b(25) = 9; b }, // bad depth/color combo
      { val b = png.clone(); java.util.Arrays.fill(b, 29, b.length, 0x41.toByte); b }) // body garbage
    val gifGarbage = Seq( // valid GIF magic, garbage descriptor/body
      "GIF89a".getBytes("US-ASCII") ++ Array.tabulate[Byte](20)(i => (i * 37).toByte),
      "GIF87a".getBytes("US-ASCII"))
    val zoo = (truncations ++ ihdrCorrupt ++ gifGarbage).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }
    val df = zoo.toDF("doc_id", "bytes")
    val out = MultimodalOps.decodeImagePartitioned(df, "doc_id", "bytes")
      .collect().map(f => f.id -> f).toMap
    // THE contract under test: a malformed matching-magic payload must
    // never kill the task or drop its row — it either quarantines
    // (width = -1) or, for a truncation cut past the header, the
    // reader may salvage a partial image (Java's PNG reader tolerates
    // a missing IEND/short IDAT); both are rows, never exceptions.
    assert(out.size == zoo.length, "no row dropped, no task killed")
    val nTrunc = truncations.length
    zoo.foreach { case (id, _) =>
      val f = out(id)
      if (id < nTrunc) // truncation: quarantined or salvaged at true dims
        assert(f.width == -1 || (f.width == 8 && f.height == 6),
          s"truncation #$id neither quarantined nor salvaged: $f")
      else // field-corrupted IHDR / GIF garbage: must quarantine
        assert(f.width == -1, s"corrupted payload #$id not quarantined: $f")
    }
    assert(zoo.take(nTrunc).map(t => out(t._1)).exists(_.width == -1),
      "at least one truncation must exercise the in-reader failure path")
  }

  test("mm_decode_png: the COMMITTED PNG fixture decodes to the " +
      "generator's raw-pixel statistics (real end-to-end decode gate)") {
    import graft.tools.PngFixture
    val got = graft.queries.PipelineQueries.mmDecodePng(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val want = PngFixture.expectedRows
      .map { case (id, w, h, csv) => (id, w.toLong, h.toLong, csv) }.toSet
    assert(got.size == PngFixture.N, s"fixture must carry ${PngFixture.N} images")
    assert(got == want,
      "decoded stats must equal the pre-encode pixel arithmetic")
    // the fixture is non-degenerate: every luminance bin is hit somewhere
    val allBins = PngFixture.expectedRows
      .flatMap(_._4.split(",").zipWithIndex.collect {
        case (c, b) if c.toLong > 0 => b }).toSet
    assert(allBins == (0 until 16).toSet,
      s"fixture must sweep all 16 luminance bins, hit: $allBins")
    // ...and the committed bytes are REAL PNGs, not regenerated ones:
    // magic must match on-disk
    val firstBytes = spark.read.parquet(PngFixture.Path)
      .orderBy("img_id").select("png").head().getAs[Array[Byte]](0)
    assert(firstBytes.take(4).map(_ & 0xFF).sameElements(
      Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)), "not a PNG payload")
  }

  test("mm_decode_jpeg: the COMMITTED JPEG fixture decodes to the " +
      "generator's raw block statistics (second codec path, lossiness " +
      "absorbed by the flat-gray mid-bin fixture design)") {
    import graft.tools.JpegFixture
    val got = graft.queries.PipelineQueries.mmDecodeJpeg(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val want = JpegFixture.expectedRows
      .map { case (id, w, h, csv) => (id, w.toLong, h.toLong, csv) }.toSet
    assert(got.size == JpegFixture.N, s"fixture must carry ${JpegFixture.N} images")
    assert(got == want,
      "decoded stats must equal the pre-encode block arithmetic")
    // the fixture is non-degenerate: every luminance bin is hit somewhere
    val allBins = JpegFixture.expectedRows
      .flatMap(_._4.split(",").zipWithIndex.collect {
        case (c, b) if c.toLong > 0 => b }).toSet
    assert(allBins == (0 until 16).toSet,
      s"fixture must sweep all 16 luminance bins, hit: $allBins")
    // the committed bytes are REAL JPEGs (SOI marker), and the
    // progressive ids genuinely carry a progressive scan header
    // (SOF2, 0xFFC2) so the multi-scan decode path is exercised
    val byId = spark.read.parquet(JpegFixture.Path)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    byId.values.foreach(b =>
      assert((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8, "not a JPEG payload"))
    def hasSof2(b: Array[Byte]): Boolean =
      b.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2)
    (0 until JpegFixture.N).foreach { i =>
      assert(hasSof2(byId(i.toLong)) == (i % 4 == 3),
        s"image $i progressive-scan marker mismatch")
    }
  }

  test("decodeImagePartitioned quarantines malformed JPEG payloads whose " +
      "SOI magic matches (truncated scans, garbage entropy data, bare " +
      "markers) — rows, never task kills") {
    import graft.tools.JpegFixture
    val jpeg = JpegFixture.jpegBytes(0)
    val truncations = // valid SOI, cut mid-structure (headers AND scan)
      (3 until jpeg.length by 97).map(n => jpeg.take(n))
    val corrupted = Seq(
      Array[Byte](0xFF.toByte, 0xD8.toByte), // bare SOI, nothing else
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte), // dangling marker
      jpeg.take(2) ++ Array.tabulate[Byte](64)(i => (i * 41).toByte), // garbage after SOI
      { val b = jpeg.clone() // zero the entropy-coded tail: decodable headers, broken scan
        java.util.Arrays.fill(b, b.length - b.length / 3, b.length, 0.toByte); b })
    val zoo = (truncations ++ corrupted).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }
    val df = zoo.toDF("doc_id", "bytes")
    val out = MultimodalOps.decodeImagePartitioned(df, "doc_id", "bytes")
      .collect().map(f => f.id -> f).toMap
    assert(out.size == zoo.length, "no row dropped, no task killed")
    val (w0, h0) = JpegFixture.dims(0)
    zoo.foreach { case (id, _) =>
      val f = out(id)
      // quarantined, or (for cuts/corruption past the frame header)
      // salvaged at the true dimensions — never other dims, never a kill
      assert(f.width == -1 || (f.width == w0 && f.height == h0),
        s"payload #$id neither quarantined nor salvaged at true dims: $f")
    }
    assert(out.values.exists(_.width == -1),
      "at least one payload must exercise the in-reader failure path")
  }

  test("decodeWavPartitioned decodes a REAL encoded WAV " +
      "(javax.sound.sampled) and quarantines undecodable, truncated, " +
      "and non-16-bit-PCM payloads as sample_rate = -1") {
    import graft.tools.WavFixture
    val wav = WavFixture.wavBytes(0) // known-good 16-bit PCM clip
    // an 8-bit unsigned PCM WAV: decodes as a container but is OUT of
    // the 16-bit scope — must route to quarantine, not misread
    val fmt8 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array.tabulate[Byte](40)(_.toByte)),
        fmt8, 40L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    val zoo = Seq(
      (0L, wav),
      (1L, Array[Byte](1, 2, 3, 4)), // no RIFF magic
      (2L, null: Array[Byte]),
      (3L, wav.take(30)), // RIFF magic, truncated mid-header
      (4L, bos8.toByteArray)) // real WAV, wrong sample format
    val out = MultimodalOps.decodeWavPartitioned(
      zoo.toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(f => f.id -> f).toMap
    assert(out.size == zoo.length, "no row dropped, no task killed")
    val (_, rate, ch, frames, csv) = WavFixture.expectedRows.head
    val ok = out(0L)
    assert(ok.sample_rate == rate && ok.channels == ch &&
      ok.n_samples == frames && ok.amp_hist.mkString(",") == csv,
      s"good clip decoded wrong: $ok")
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id).sample_rate == -1, s"payload #$id not quarantined: ${out(id)}")
    }
  }

  test("decodeImageResized at factor 1 equals the plain decode, and at " +
      "factor 2 samples exactly the even-coordinate pixels (generator " +
      "arithmetic); undecodable bytes quarantine") {
    import graft.tools.PngFixture
    val df = Seq((0L, PngFixture.pngBytes(0)), (1L, Array[Byte](9, 9)),
      (2L, null: Array[Byte])).toDF("doc_id", "bytes")
    val plain = MultimodalOps.decodeImagePartitioned(df, "doc_id", "bytes")
      .collect().map(f => f.id -> f).toMap
    val f1 = MultimodalOps.decodeImageResized(df, "doc_id", "bytes", 1)
      .collect().map(f => f.id -> f).toMap
    assert(f1 == plain, "factor 1 must be the identity transform")
    val f2 = MultimodalOps.decodeImageResized(df, "doc_id", "bytes", 2)
      .collect().map(f => f.id -> f).toMap
    val (_, w, h, csv) = PngFixture.expectedResizedRows(2).head
    assert(f2(0L).width == w && f2(0L).height == h &&
      f2(0L).lum_hist.mkString(",") == csv,
      s"factor-2 sample mismatch: ${f2(0L)}")
    assert(f2(1L).width == -1 && f2(2L).width == -1,
      "undecodable payloads must quarantine through the resize path")
  }

  test("probeMp4Partitioned parses a REAL ISO BMFF layout (strict box " +
      "walk, mvhd v0+v1) and quarantines truncated, size-corrupted, " +
      "and non-MP4 payloads as brand = corrupt") {
    import graft.tools.Mp4Fixture
    val good = Mp4Fixture.mp4Bytes(0)
    // size-field corruptions: box size past the buffer, size < header,
    // and a child size escaping its parent moov bound
    val sizeOver = { val b = good.clone(); b(0) = 0x7F.toByte; b }
    val sizeTiny = { val b = good.clone(); b(3) = 4.toByte; b }
    val ftypOff = good.indexOfSlice("ftyp".getBytes("US-ASCII")) - 4
    val moovOff = good.indexOfSlice("moov".getBytes("US-ASCII")) - 4
    val childOver = { val b = good.clone(); b(moovOff + 8) = 0x7F.toByte; b }
    val zoo = Seq(
      (0L, good),
      (1L, good.take(20)), // truncated mid-ftyp
      (2L, good.take(moovOff + 12)), // truncated mid-moov header
      (3L, sizeOver), (4L, sizeTiny), (5L, childOver),
      (6L, Array[Byte](1, 2, 3, 4)), // junk
      (7L, null: Array[Byte]),
      (8L, graft.tools.WavFixture.wavBytes(0))) // RIFF, not BMFF
    val out = MultimodalOps.probeMp4Partitioned(
      zoo.toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(f => f.id -> f).toMap
    assert(out.size == zoo.length, "no row dropped, no task killed")
    val (_, brand, ts, ms, tracks, mdat) = Mp4Fixture.expectedRows.head
    val ok = out(0L)
    assert(ok.brand == brand && ok.timescale == ts && ok.duration_ms == ms &&
      ok.n_tracks == tracks && ok.mdat_bytes == mdat,
      s"good container parsed wrong: $ok")
    (1L to 8L).foreach { id =>
      assert(out(id).brand == "corrupt" && out(id).timescale == -1L,
        s"payload #$id not quarantined: ${out(id)}")
    }
    assert(ftypOff == 0, "fixture layout: ftyp must be the first box")
    // mvhd version 1 (u64 times) parses too — hand-build one
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def bx(t: String, p: Array[Byte]) =
      be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    val mvhd1 = bx("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ // v1, creation, modification
        be32(1000) ++ be64(2500) ++ Array.fill(80)(0.toByte))
    val v1clip = bx("ftyp", "mp42isom".getBytes("US-ASCII")) ++
      bx("moov", mvhd1 ++ bx("trak", Array.fill(84)(0.toByte)))
    val v1 = MultimodalOps.probeMp4Partitioned(
      Seq((9L, v1clip)).toDF("doc_id", "bytes"), "doc_id", "bytes").collect().head
    assert(v1.brand == "mp42" && v1.timescale == 1000L &&
      v1.duration_ms == 2500L && v1.n_tracks == 1L, s"mvhd v1 parse: $v1")
    // mvhd edge zoo (code-review findings): a TRUNCATED v1 payload must
    // not fall back to v0 offsets (that reads the modification-time
    // words as timescale/duration — accepted garbage); a u64 duration
    // past Long.MaxValue/1000 must not wrap to a negative duration_ms
    // on an accepted row; a reserved version must quarantine
    val mvhdTruncV1 = bx("mvhd", Array[Byte](1, 0, 0, 0) ++ Array.fill(20)(1.toByte))
    val mvhdHuge = bx("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(1000) ++ be64(Long.MaxValue / 500L) ++ Array.fill(80)(0.toByte))
    val mvhdV2 = bx("mvhd", Array[Byte](2, 0, 0, 0) ++ Array.fill(96)(0.toByte))
    val edge = Seq(mvhdTruncV1, mvhdHuge, mvhdV2).zipWithIndex.map {
      case (mv, i) =>
        (20L + i, bx("ftyp", "isomisom".getBytes("US-ASCII")) ++
          bx("moov", mv ++ bx("trak", Array.fill(84)(0.toByte))))
    }
    val edgeOut = MultimodalOps.probeMp4Partitioned(
      edge.toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(f => f.id -> f).toMap
    edge.foreach { case (id, _) =>
      assert(edgeOut(id).brand == "corrupt" && edgeOut(id).duration_ms == -1L,
        s"mvhd edge #$id not quarantined: ${edgeOut(id)}")
    }
  }

  test("mm_probe_mp4: the COMMITTED MP4 fixture parses to the " +
      "generator's raw-definition metadata (real end-to-end parse gate)") {
    import graft.tools.Mp4Fixture
    val got = graft.queries.PipelineQueries.mmProbeMp4(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    val want = Mp4Fixture.expectedRows.toSet
    assert(got.size == Mp4Fixture.N, s"fixture must carry ${Mp4Fixture.N} clips")
    assert(got == want, "probed metadata must equal the pre-layout arithmetic")
    // non-degenerate: all three brands, track counts 1-3, and at least
    // one non-integer-second duration (the floor arithmetic is real)
    assert(Mp4Fixture.expectedRows.map(_._2).toSet.size == 3)
    assert(Mp4Fixture.expectedRows.map(_._5).toSet == Set(1L, 2L, 3L))
    assert(Mp4Fixture.expectedRows.exists(_._4 % 1000L != 0L))
    // ...and the committed bytes really lead with an ftyp box
    val firstBytes = spark.read.parquet(Mp4Fixture.Path)
      .orderBy("clip_id").select("mp4").head().getAs[Array[Byte]](0)
    assert(new String(firstBytes.slice(4, 8), "US-ASCII") == "ftyp",
      "not an ISO BMFF payload")
  }

  test("mm_decode_wav: the COMMITTED WAV fixture decodes to the " +
      "generator's raw-sample statistics (real end-to-end decode gate)") {
    import graft.tools.WavFixture
    val got = graft.queries.PipelineQueries.mmDecodeWav(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .toSet
    val want = WavFixture.expectedRows
      .map { case (id, r, c, n, csv) => (id, r.toLong, c.toLong, n, csv) }.toSet
    assert(got.size == WavFixture.N, s"fixture must carry ${WavFixture.N} clips")
    assert(got == want,
      "decoded stats must equal the pre-encode sample arithmetic")
    // non-degenerate: every amplitude bin hit, both channel counts and
    // all three sample rates present
    val allBins = WavFixture.expectedRows
      .flatMap(_._5.split(",").zipWithIndex.collect {
        case (c, b) if c.toLong > 0 => b }).toSet
    assert(allBins == (0 until 16).toSet,
      s"fixture must sweep all 16 amplitude bins, hit: $allBins")
    assert(WavFixture.expectedRows.map(_._3).toSet == Set(1, 2))
    assert(WavFixture.expectedRows.map(_._2).toSet.size == 3)
    // ...and the committed bytes are REAL RIFF/WAVE containers
    val firstBytes = spark.read.parquet(WavFixture.Path)
      .orderBy("clip_id").select("wav").head().getAs[Array[Byte]](0)
    assert(new String(firstBytes.take(4), "US-ASCII") == "RIFF" &&
      new String(firstBytes.slice(8, 12), "US-ASCII") == "WAVE",
      "not a RIFF/WAVE payload")
  }

  test("mm_phash: perceptual hashes over the COMMITTED PNGs equal the " +
      "raw-pixel definition, the brightness-shifted near-dup stays " +
      "STRICTLY closer than every unrelated image, and corrupt " +
      "payloads quarantine") {
    import graft.tools.PngFixture
    val got = graft.queries.PipelineQueries.mmPhash(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = PngFixture
      .expectedPhashRows(graft.queries.PipelineQueries.PhashShift).toSet
    assert(got == want, "decoded hashes must equal the pixel definition")
    // the operator's reason to exist: the perturbed copy is closer
    // than ANY unrelated image, corpus-wide (measured 0–19 vs 20–42
    // on the committed fixture — a deterministic separation)
    val maxVariant = got.map(_._3).max
    val minNext = got.map(_._4).min
    assert(maxVariant < minNext,
      s"near-dup separation collapsed: max ham_variant $maxVariant " +
        s">= min ham_next $minNext")
    // quarantine contract
    import spark.implicits._
    val zoo = Seq((100L, Array[Byte](1, 2, 3)),
      (101L, null.asInstanceOf[Array[Byte]]))
    val bad = MultimodalOps.phashPartitioned(
      zoo.toDF("img_id", "png"), "img_id", "png",
      graft.queries.PipelineQueries.PhashShift)
      .collect().map(f => f.id -> f).toMap
    Seq(100L, 101L).foreach(id => assert(bad(id).width == -1,
      s"corrupt payload must quarantine: ${bad(id)}"))
  }

  test("mm_phash_neardup: the banded hamming join over the decoded " +
      "MIXED corpus equals the brute-force pair set from the " +
      "independent raw-pixel hashes — the PNG half contributes its 46 " +
      "of 48 (base, variant) self-pairs within radius 6 with ZERO " +
      "accidental cross pairs (measured fixture separation: base-base " +
      "distances start at 10); the remux half's cross-container pairs " +
      "are pinned in ImageRemuxSpec") {
    import graft.queries.PipelineQueries
    val got = PipelineQueries.mmPhashNeardup(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    def brute(corpus: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
      (for {
        (a, ha) <- corpus; (b, hb) <- corpus if a < b
        d = java.lang.Long.bitCount(ha ^ hb)
        if d <= PipelineQueries.PhashNeardupMaxHamming
      } yield (a, b, d.toLong)).toSet
    val pngCorpus = graft.tools.PngFixture
      .expectedNeardupHashes(PipelineQueries.PhashShift)
    val want = brute(pngCorpus ++ graft.tools.ImageRemuxFixture
      .expectedNeardupHashes(PipelineQueries.PhashShift))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // non-vacuity + purity on the PNG half: every pair there is a
    // (base, variant) self-pair (id2 = -(id1+1) under the id1 < id2
    // canonical order, since variants sit on the negative keyspace)
    val B = graft.tools.ImageRemuxFixture.IdBase
    val gotPng = got.filter(p => p._1 > -B && p._2 < B)
    assert(gotPng.size == 46, s"expected 46 self-pairs, got ${gotPng.size}")
    assert(gotPng.forall { case (id1, id2, _) => id1 == -(id2 + 1) },
      "an accidental non-self pair crossed the radius")
    // QUARANTINE purity: corrupt payloads carry the sentinel hash 0 —
    // pooled unfiltered, two broken images would "near-dup" each
    // other at hamming 0 and a dedup consumer would drop one broken
    // file for another. The pair set must be unchanged by corrupt rows.
    import spark.implicits._
    val zoo = Seq((900L, Array[Byte](9, 9, 9)),
      (901L, Array[Byte](8, 8)),
      (902L, null.asInstanceOf[Array[Byte]])).toDF("img_id", "png")
    val withCorrupt = PipelineQueries.mmPhashNeardupOf(
        spark.read.parquet(graft.tools.PngFixture.Path).unionByName(zoo))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(withCorrupt == brute(pngCorpus),
      s"corrupt images changed the pair set: " +
        s"${(withCorrupt -- brute(pngCorpus)).take(5)}")
  }

  test("mm_phash_clusters: components over the banded MIXED-union " +
      "pairs — the PNG half keeps its 46 (base, variant) two-member " +
      "clusters plus 4 singletons (the two beyond-radius variants and " +
      "their bases), representative = min id, every decoded hash " +
      "labeled (remux components pinned in ImageRemuxSpec)") {
    import graft.queries.PipelineQueries
    import graft.tools.ImageRemuxFixture
    val all = PipelineQueries.mmPhashClusters(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // every decodable hash labeled: PNG 2·48 + remux 2·(3M) (the
    // corrupt decoy quarantines and must be absent)
    assert(all.length == 96 + 6 * ImageRemuxFixture.M,
      s"every hash labeled: ${all.length}")
    // exactly one survivor per cluster, and it is the representative
    all.filter(_._3).foreach { case (id, cl, _) =>
      assert(id == cl, s"survivor $id != representative $cl")
    }
    assert(all.count(_._3) == all.map(_._2).distinct.length)
    // the PNG half keeps its r19 layout untouched
    val B = ImageRemuxFixture.IdBase
    val rows = all.filter(r => r._1 < B && r._1 > -B)
    val byCluster = rows.groupBy(_._2)
    val pairsC = byCluster.filter(_._2.length == 2)
    val singles = byCluster.filter(_._2.length == 1)
    assert(pairsC.size == 46 && singles.size == 4,
      s"want 46 pairs + 4 singletons, got ${pairsC.size}/${singles.size}")
    // every two-member cluster is a (base, ITS-OWN variant) pair,
    // labeled by the variant (the min id — variants are negative)
    pairsC.foreach { case (cl, members) =>
      val ids = members.map(_._1).sorted
      assert(ids(1) == -(ids(0) + 1) && cl == ids(0),
        s"cluster $cl is not a self-pair: ${ids.toSeq}")
    }
    assert(rows.count(_._3) == 50)
  }

  test("mm_frames_gif: the COMMITTED animated GIFs decode EXACTLY to " +
      "the raw pixel arithmetic (lossless codec — no tolerance " +
      "device) and the corruption zoo quarantines") {
    import graft.tools.GifFixture
    val got = graft.queries.PipelineQueries.mmFramesGif(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSet
    val want = GifFixture.expectedRows
      .map { case (id, n, w, h, d, csv) =>
        (id, n, w.toLong, h.toLong, d, csv) }.toSet
    assert(got == want, "decoded stats must equal the pixel definition")
    assert(got.size == GifFixture.N)
    // multi-frame is real: every clip has >= 2 frames and frames
    // DIFFER (a first-frame-times-n decoder shifts the histogram)
    assert(GifFixture.expectedRows.forall(_._2 >= 2L))
    assert((0 until GifFixture.N).exists { i =>
      GifFixture.grayLevel(i, 0, 0, 0) != GifFixture.grayLevel(i, 1, 0, 0)
    })
    // ...and the committed bytes are REAL GIF89a containers
    val firstBytes = spark.read.parquet(GifFixture.Path)
      .orderBy("clip_id").select("gif").head().getAs[Array[Byte]](0)
    assert(new String(firstBytes.take(6), "US-ASCII") == "GIF89a",
      "not a GIF payload")
    // zoo: truncation, wrong magic, empty, null all quarantine whole
    import spark.implicits._
    val good = GifFixture.gifBytes(1)
    val notGif = good.clone(); "JUNK89".getBytes("US-ASCII")
      .copyToArray(notGif, 0)
    // the half-cut clip is the SILENTLY-PARTIAL shape: the ImageIO
    // reader alone decodes its complete prefix as 1 frame (measured) —
    // the structural walk must quarantine it whole. Trailing bytes
    // after the trailer are untrusted structure likewise.
    val zoo = Seq((0L, good), (1L, good.take(good.length / 2)),
      (2L, notGif), (3L, Array.empty[Byte]),
      (4L, null.asInstanceOf[Array[Byte]]),
      (5L, good ++ Array[Byte](7, 7, 7)))
    val out = MultimodalOps.decodeGifFramesPartitioned(
      zoo.toDF("clip_id", "gif"), "clip_id", "gif")
      .collect().map(v => v.id -> v).toMap
    assert(out(0L).n_frames == GifFixture.frames(1).toLong,
      s"good clip must decode: ${out(0L)}")
    (1L to 5L).foreach(i => assert(out(i).n_frames == -1L &&
      out(i).lum_hist.isEmpty,
      s"zoo clip $i must quarantine whole: ${out(i)}"))
  }

  test("mm_audio_features: channel-0 windowed frame features over the " +
      "COMMITTED fixture equal the raw-sample arithmetic, the silence " +
      "detector is NON-VACUOUS both ways, and corrupt payloads " +
      "quarantine") {
    import graft.tools.WavFixture
    val got = graft.queries.PipelineQueries.mmAudioFeatures(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == WavFixture.expectedFeatureRows.toSet,
      "decoded features must equal the pre-encode sample arithmetic")
    // non-vacuous BOTH ways: the silent-lead clips detect real digital
    // silence, the sweep clips detect none — and both classes appear
    val silent = got.filter(_._6 > 0).map(_._1)
    assert(silent.nonEmpty && silent.forall(_ >= WavFixture.SilentFrom),
      s"silence only in the silent-lead clips: $silent")
    assert(got.exists(r => r._1 >= WavFixture.SilentFrom && r._6 >= 2L),
      "a 50-frame silent lead spans two full 25-sample windows")
    assert(got.filter(_._1 < WavFixture.SilentFrom).forall(_._6 == 0L),
      "full-range sweep clips must detect zero silent windows")
    // the stereo clips prove channel-0 EXTRACTION (stride 4), not a
    // flattened interleave: a wrong stride would shift every feature
    assert(WavFixture.expectedFeatureRows.exists { case (id, _, _, _, _, _) =>
      WavFixture.fmt(id.toInt)._2 == 2 }, "fixture must carry stereo clips")
    // quarantine contract
    val zoo = Seq((100L, Array[Byte](9, 9, 9)),
      (101L, null: Array[Byte]))
    import spark.implicits._
    val bad = MultimodalOps.audioFrameFeaturesPartitioned(
      zoo.toDF("clip_id", "wav"), "clip_id", "wav",
      WavFixture.FrameWin, WavFixture.SilenceThr)
      .collect().map(f => f.id -> f).toMap
    Seq(100L, 101L).foreach(id => assert(
      bad(id).n_windows == -1L && bad(id).energy == -1L,
      s"corrupt payload must quarantine whole: ${bad(id)}"))
  }

  test("decodeMjpegAviPartitioned decodes a REAL MJPEG AVI (RIFF walk + " +
      "per-frame javax.imageio) and quarantines the corruption zoo") {
    import graft.tools.AviFixture
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val good = AviFixture.aviBytes(1)
    // the zoo: every malformed shape must quarantine (n_frames = -1),
    // never decode partially and never kill the task
    def truncated(n: Int) = good.take(good.length - n)
    val notRiff = good.clone(); "JUNK".getBytes("US-ASCII")
      .copyToArray(notRiff, 0)
    // a movi chunk whose size escapes the list: find the first 00dc
    // and inflate its size field
    val desynced = good.clone()
    val dcAt = (0 until good.length - 4).find(p =>
      new String(good, p, 4, "US-ASCII") == "00dc").get
    desynced(dcAt + 4) = 0xFF.toByte; desynced(dcAt + 5) = 0xFF.toByte
    // a frame whose JPEG payload is garbage (container intact)
    val badFrame = good.clone()
    java.util.Arrays.fill(badFrame, dcAt + 8, dcAt + 48, 0x55.toByte)
    // a RIFF size past the buffer (outer truncation lie)
    val lyingSize = good.clone()
    lyingSize(4) = 0xFF.toByte; lyingSize(5) = 0xFF.toByte
    // an UNKNOWN grouping inside movi must quarantine, not silently
    // skip its frames: clip 2 of the fixture is rec-wrapped — rewrite
    // the grouping fourcc to something else
    val recClip = AviFixture.aviBytes(2)
    val recAt = (0 until recClip.length - 4).find(p =>
      new String(recClip, p, 4, "US-ASCII") == "rec ").get
    val badGroup = recClip.clone()
    "seg ".getBytes("US-ASCII").copyToArray(badGroup, recAt)
    // an OpenDML multi-segment file: a second 'RIFF AVIX' segment
    // trails the first RIFF — walking only segment one would emit
    // silently PARTIAL stats, so the layout must quarantine whole
    val avix = good ++ AviFixture.fcc("RIFF") ++
      AviFixture.le32(12L) ++ AviFixture.fcc("AVIX") ++
      AviFixture.list("movi", Array.empty[Byte])
    // two movi lists inside ONE RIFF: the second would overwrite the
    // first's bounds and silently drop its frames — quarantine
    val secondMovi = AviFixture.list("movi",
      AviFixture.chunk("00dc", AviFixture.jpegFrame(1, 0)))
    val doubleMovi = {
      val payload = good.slice(8, good.length) ++ secondMovi
      AviFixture.fcc("RIFF") ++
        AviFixture.le32(payload.length.toLong) ++ payload
    }
    // a SECOND video stream's frames must quarantine — merging two
    // streams into one histogram is silently wrong. Rewriting only the
    // FIRST frame to 01dc makes the clip carry streams 01 AND 00
    val secondStream = good.clone()
    "01dc".getBytes("US-ASCII").copyToArray(secondStream, dcAt)
    // an unknown chunk id inside movi is untrusted structure
    def spliceIntoMovi(src: Array[Byte], ins: Array[Byte]): Array[Byte] = {
      val moviAt = (0 until src.length - 4).find(p =>
        new String(src, p, 4, "US-ASCII") == "movi").get
      def bump(b: Array[Byte], off: Int): Unit = {
        val v = (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
          ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
        AviFixture.le32(v + ins.length).copyToArray(b, off)
      }
      val out = src.take(moviAt + 4) ++ ins ++ src.drop(moviAt + 4)
      bump(out, 4)          // outer RIFF size
      bump(out, moviAt - 4) // the movi LIST size
      out
    }
    val unknownChunk = spliceIntoMovi(good,
      AviFixture.chunk("abcd", Array[Byte](1, 2)))
    val rows = Seq(
      (0L, good), (1L, truncated(64)), (2L, notRiff), (3L, desynced),
      (4L, badFrame), (5L, lyingSize), (6L, Array.empty[Byte]),
      (7L, null.asInstanceOf[Array[Byte]]), (8L, badGroup),
      (9L, avix), (10L, doubleMovi), (11L, secondStream),
      (12L, unknownChunk))
    val out = MultimodalOps.decodeMjpegAviPartitioned(
      rows.toDF("clip_id", "avi"), "clip_id", "avi")
      .collect().map(v => v.id -> v).toMap
    val want = AviFixture.expectedRows(1)
    val g = out(0L)
    assert((g.n_frames, g.width, g.height, g.us_per_frame,
      g.lum_hist.mkString(",")) ==
      (want._2, want._3, want._4, want._5, want._6),
      s"good clip must decode to the block arithmetic: $g")
    (1L to 12L).foreach(i => assert(out(i).n_frames == -1L &&
      out(i).width == -1 && out(i).lum_hist.isEmpty,
      s"zoo clip $i must quarantine whole: ${out(i)}"))
    // ...and the rec-wrapped ORIGINAL decodes (positive control for
    // the badGroup case; the committed-fixture gate covers it too)
    import spark.implicits._
    val recOk = MultimodalOps.decodeMjpegAviPartitioned(
      Seq((2L, recClip)).toDF("clip_id", "avi"), "clip_id", "avi")
      .collect().head
    assert(recOk.n_frames == AviFixture.expectedRows(2)._2,
      s"rec-grouped frames must decode: $recOk")
    // positive control for the audio-first mux layout: a clip whose
    // ONLY video stream is numbered 01 decodes identically (the
    // stream scope binds to the first video stream, not to "00")
    val vidAt01 = {
      val c = good.clone()
      var p = 0
      while (p < c.length - 4) {
        if (new String(c, p, 4, "US-ASCII") == "00dc") c(p + 1) = '1'
        p += 1
      }
      c
    }
    val ok01 = MultimodalOps.decodeMjpegAviPartitioned(
      Seq((1L, vidAt01)).toDF("clip_id", "avi"), "clip_id", "avi")
      .collect().head
    assert((ok01.n_frames, ok01.lum_hist.mkString(",")) ==
      (want._2, want._6),
      s"single video stream at 01 must decode: $ok01")
    // ...and 'ix' + non-digits is unknown structure, not an index
    val ixBad = spliceIntoMovi(good,
      AviFixture.chunk("ixzz", Array[Byte](1, 2)))
    assert(MultimodalOps.decodeMjpegAviPartitioned(
      Seq((9L, ixBad)).toDF("clip_id", "avi"), "clip_id", "avi")
      .collect().head.n_frames == -1L,
      "ix + non-digit stream chars must quarantine")
    // positive controls for the LEGAL interleave set: audio samples
    // (01wb), a palette change (00pc), an OpenDML in-movi index (ix00)
    // and JUNK padding all skip — the video stats are unchanged
    val interleaved = spliceIntoMovi(good,
      AviFixture.chunk("01wb", Array[Byte](9, 9, 9, 9)) ++
        AviFixture.chunk("00pc", Array[Byte](0, 1, 2, 3)) ++
        AviFixture.chunk("ix00", Array[Byte](7, 7)) ++
        AviFixture.chunk("JUNK", Array[Byte](0, 0)))
    val mixedOk = MultimodalOps.decodeMjpegAviPartitioned(
      Seq((1L, interleaved)).toDF("clip_id", "avi"), "clip_id", "avi")
      .collect().head
    assert((mixedOk.n_frames, mixedOk.width, mixedOk.height,
      mixedOk.lum_hist.mkString(",")) ==
      (want._2, want._3, want._4, want._6),
      s"legal non-video interleave must not change stats: $mixedOk")
  }

  test("mm_frames_mjpeg: the COMMITTED AVI fixture decodes to the " +
      "generator's raw block statistics (real multi-frame decode gate)") {
    import graft.tools.AviFixture
    val got = graft.queries.PipelineQueries.mmFramesMjpeg(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSet
    val want = AviFixture.expectedRows
      .map { case (id, n, w, h, us, csv) =>
        (id, n, w.toLong, h.toLong, us, csv) }.toSet
    assert(got.size == AviFixture.N, s"fixture must carry ${AviFixture.N} clips")
    assert(got == want,
      "decoded stats must equal the pre-encode block arithmetic")
    // non-degenerate: frame counts 2-5, every luminance bin hit
    // somewhere, and frames DIFFER within a clip (the per-frame sweep
    // means a first-frame-times-n decoder cannot pass)
    assert(AviFixture.expectedRows.map(_._2).toSet == Set(2L, 3L, 4L, 5L))
    val allBins = AviFixture.expectedRows
      .flatMap(_._6.split(",").zipWithIndex.collect {
        case (c, b) if c.toLong > 0 => b }).toSet
    assert(allBins == (0 until 16).toSet,
      s"fixture must sweep all 16 luminance bins, hit: $allBins")
    assert((0 until AviFixture.N).exists { i =>
      val f0 = (0 until AviFixture.dims(i)._1 / AviFixture.Block).map(bx =>
        AviFixture.grayLevel(i, 0, bx, 0))
      val f1 = f0.indices.map(bx => AviFixture.grayLevel(i, 1, bx, 0))
      f0 != f1
    }, "frames must differ within a clip")
    // ...and the committed bytes are REAL RIFF AVI containers
    val firstBytes = spark.read.parquet(AviFixture.Path)
      .orderBy("clip_id").select("avi").head().getAs[Array[Byte]](0)
    assert(new String(firstBytes.take(4), "US-ASCII") == "RIFF" &&
      new String(firstBytes.slice(8, 12), "US-ASCII") == "AVI ",
      "not a RIFF/AVI payload")
  }
}
