package graft.tools

import java.util.concurrent.atomic.LongAdder

/** Dev tool: STANDALONE `ImageIO.read` thread-scaling probe — the
  * AudioSystem lesson applied to images. r19 measured
  * `AudioSystem.getAudioInputStream`'s provider registry SYNCHRONIZING
  * across executor threads (38.7 k clips/s on ONE thread vs 23.6 k
  * TOTAL on 32 — negative scaling), which cost audio_gate 363× until
  * the decode moved to the engine's own container walk. `ImageIO.read`
  * sits on the same provider-registry pattern and is on the per-row
  * hot path of every image/video op (`MultimodalOps.phashGrid`,
  * `decodeImagePartitioned`, the MJPEG frame decodes), so the question
  * must be MEASURED, not assumed.
  *
  * No Spark: plain JVM threads over in-memory fixture bytes, so the
  * number isolates the codec + registry (the audio probe's protocol).
  * For each container (PNG / baseline JPEG / progressive JPEG) it
  * decodes for a fixed wall window on 1 thread and on 32 and prints
  * decodes/s plus the scaling ratio — ≥ ~20× = registry clean on this
  * JDK, ≤ ~1× = the audio failure mode. Findings land in SCALE.md.
  */
object ImageDecodeProbe {
  private def decode(bytes: Array[Byte]): Int = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    img.getWidth // consume — keep the JIT honest
  }

  /** Total decodes/s across `threads` workers round-robining the
    * payload pool for `windowMs` (after a shared warmup). */
  private def measure(pool: IndexedSeq[Array[Byte]], threads: Int,
      windowMs: Long): Double = {
    val done = new LongAdder
    val deadline = System.nanoTime() + windowMs * 1000000L
    val ws = (0 until threads).map { t =>
      new Thread(() => {
        var i = t
        var sink = 0
        while (System.nanoTime() < deadline) {
          sink ^= decode(pool(i % pool.length))
          done.increment()
          i += 1
        }
        if (sink == Int.MinValue) println(sink) // defeat DCE
      })
    }
    ws.foreach(_.start()); ws.foreach(_.join())
    done.sum().toDouble * 1000.0 / windowMs
  }

  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val windowMs = args.headOption.map(_.toLong).getOrElse(10000L)
    val pools: Seq[(String, IndexedSeq[Array[Byte]])] = Seq(
      "png" -> (0 until PngFixture.N).map(PngFixture.pngBytes),
      "png-mosaic" -> (0 until ImageRemuxFixture.M)
        .map(ImageRemuxFixture.imageBytes),
      "jpeg-baseline" -> (0 until JpegFixture.N)
        .filter(_ % 4 != 3).map(JpegFixture.jpegBytes),
      "jpeg-progressive" -> (0 until JpegFixture.N)
        .filter(_ % 4 == 3).map(JpegFixture.jpegBytes))
    pools.foreach { case (name, pool) =>
      measure(pool, 1, 2000) // warmup: classloading + JIT
      val one = measure(pool, 1, windowMs)
      val many = measure(pool, 32, windowMs)
      println(f"[img-scaling] $name%-17s 1-thread ${one / 1000}%8.1f k/s   " +
        f"32-thread ${many / 1000}%8.1f k/s   ratio ${many / one}%5.2fx")
    }
  }
}
