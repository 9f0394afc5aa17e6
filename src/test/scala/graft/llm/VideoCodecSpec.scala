package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The real AVI video path ([[Multimodal.AviCodec]]): lossless DIB
  * round-trip pixel-for-pixel, MJPEG within lossy tolerance, and the
  * container walker's fallback behavior on garbage. */
class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def expectedRgb(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = (
    ((7L * x + 13L * y + 5L * f + id) % 256L).toInt,
    ((3L * x + 5L * y + 7L * f + 2L * id) % 256L).toInt,
    ((11L * x + 17L * y + 19L * f + 3L * id) % 256L).toInt)

  test("uncompressed DIB frames round-trip pixel-for-pixel") {
    val id = 3L; val w = 8; val h = 6; val n = 4
    val frames = Multimodal.AviCodec.readFrames(
      Multimodal.syntheticAvi(id, n, w, h))
    assert(frames.map(_._1) === (0 until n))
    frames.foreach { case (f, img) =>
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val got = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        assert(got === expectedRgb(id, f, x, y), s"frame $f pixel ($x,$y)")
      }
    }
  }

  test("MJPEG frames decode with the right geometry and near-exact stats") {
    val id = 2L; val w = 8; val h = 6; val n = 3
    val frames = Multimodal.AviCodec.readFrames(
      Multimodal.syntheticAvi(id, n, w, h, mjpeg = true))
    assert(frames.map(_._1) === (0 until n))
    frames.foreach { case (f, img) =>
      assert(img.getWidth === w && img.getHeight === h)
      // the synthetic gradient never wraps mod 256 at these sizes, so
      // JPEG sees a smooth ramp — per-channel mean error stays small
      var errR = 0L; var errG = 0L; var errB = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val (er, eg, eb) = expectedRgb(id, f, x, y)
        errR += math.abs(((rgb >> 16) & 0xff) - er)
        errG += math.abs(((rgb >> 8) & 0xff) - eg)
        errB += math.abs((rgb & 0xff) - eb)
      }
      val px = (w * h).toLong
      assert(errR / px < 15 && errG / px < 15 && errB / px < 15,
        s"frame $f mean abs error (${errR / px}, ${errG / px}, ${errB / px})")
    }
  }

  test("garbage and truncated payloads yield no frames, never throw") {
    assert(Multimodal.AviCodec.readFrames(Array[Byte](1, 2, 3)) === Nil)
    assert(Multimodal.AviCodec.readFrames("RIFFxxxxWAVE".getBytes) === Nil)
    val good = Multimodal.syntheticAvi(1L, 3, 8, 6)
    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length / 2)
    // a cleanly-truncated container decodes the frames that fit
    assert(Multimodal.AviCodec.readFrames(truncated).size < 3)
  }

  test("corrupt chunk sizes terminate: negative and zero-advance chunks") {
    val good = Multimodal.syntheticAvi(1L, 3, 8, 6)
    // corrupt the first movi-chunk size field to -8: body+size wraps
    // below `to` and the offset would stall forever without the guard
    def rd32(a: Array[Byte], o: Int): Int =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
        ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
    def findChunk(a: Array[Byte], id: String): Int = {
      val pat = id.getBytes("US-ASCII")
      (0 until a.length - 4).find(i => pat.indices.forall(j => a(i + j) == pat(j))).get
    }
    for (bad <- Seq(-8, -1, Int.MinValue)) {
      val corrupt = good.clone()
      val at = findChunk(corrupt, "00db") + 4
      corrupt(at) = (bad & 0xff).toByte
      corrupt(at + 1) = ((bad >> 8) & 0xff).toByte
      corrupt(at + 2) = ((bad >> 16) & 0xff).toByte
      corrupt(at + 3) = ((bad >> 24) & 0xff).toByte
      assert(rd32(corrupt, at) === bad)
      // must return (frames before the corruption at most), not hang/throw
      val frames = Multimodal.AviCodec.readFrames(corrupt)
      assert(frames.size < 3)
    }
  }

  test("videoFrameStats: distributed per-frame stats with stride, non-AVI rows drop out") {
    import spark.implicits._
    val media = spark.range(3).map { id =>
      if (id == 2L) Multimodal.MediaRow(id, Array[Byte](9, 9, 9), "text/plain", 0, 0)
      else Multimodal.MediaRow(id, Multimodal.syntheticAvi(id, 4, 8, 6), "video/avi", 8, 6)
    }
    val stats = Multimodal.videoFrameStats(media, stride = 2).collect()
    // videos 0 and 1, frames 0 and 2 each; the text row contributes none
    assert(stats.map(s => (s.media_id, s.frame_no)).sorted.toSeq ===
      Seq((0L, 0), (0L, 2), (1L, 0), (1L, 2)))
    stats.foreach { s =>
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 6; x <- 0 until 8) {
        val (r, g, b) = expectedRgb(s.media_id, s.frame_no, x, y)
        sr += r; sg += g; sb += b
      }
      assert((s.sum_r, s.sum_g, s.sum_b) === ((sr, sg, sb)))
      assert(s.width === 8 && s.height === 6)
    }
  }
}
