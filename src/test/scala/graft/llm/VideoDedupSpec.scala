package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the video frame-hash dedup: banded-vs-brute
  * equality, the equal-frame-count rule, and the drop rules. */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The q_media_vhash fixture. */
  private def corpus = spark.range(48).map { id =>
    val pid = (id % 12).toInt
    val (w, h) =
      if (id < 24) (8 + pid % 9, 8 + (pid * 3) % 7)
      else (9 + (id % 8).toInt, 8 + (id % 6).toInt)
    Multimodal.MediaRow(id,
      Multimodal.syntheticAviBlocks(pid, nFrames = 5, w, h), "video/avi", w, h)
  }

  test("exact copies surface with max_frame_hamming 0 across all frames") {
    val pairs = VideoDedup.nearDuplicates(VideoDedup.frameHashes(corpus))
      .filter(col("max_frame_hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    (0L until 12L).foreach(id => assert(pairs.contains((id, id + 12, 5L)),
      s"exact duplicate clip pair ($id, ${id + 12}) must be found with 5 frames"))
  }

  test("banded candidates + verify equal the brute-force frame-aligned scan") {
    val fh = VideoDedup.frameHashes(corpus)
    val got = VideoDedup.nearDuplicates(fh, maxPerFrameHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val h = fh.collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        Seq(r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val ids = h.keys.map(_._1).toSeq.distinct.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      fhs = (0 until 5).map(f => h((a, f)).zip(h((b, f)))
        .map { case (x, y) => Integer.bitCount(x ^ y) }.sum)
      if fhs.max <= 3
    } yield (a, b, 5L, fhs.max.toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("clips with different frame counts never pair, even when frames match") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, Multimodal.syntheticAviBlocks(3, 5, 10, 9), "video/avi", 10, 9),
      Multimodal.MediaRow(1L, Multimodal.syntheticAviBlocks(3, 4, 10, 9), "video/avi", 10, 9)))
    // the 4 shared frames are bit-identical, but the cut differs
    assert(VideoDedup.nearDuplicates(VideoDedup.frameHashes(media)).count() === 0L)
  }

  test("an MJPEG re-encode of the same cut reads as a near-duplicate") {
    // the real-world duplicate class the operator exists for: same
    // frames, lossy re-encode. At realistic frame sizes the 9x8 cells
    // average ~40 pixels each, absorbing the JPEG artifacts (at tiny
    // 14x12 frames there is ~1 pixel per cell to average and the
    // drift measured ~19 bits — size matters, which is itself part of
    // the operator's documented contract). Assert closeness well
    // under the cross-pattern floor (~9 on the tiny fixture, higher
    // here), not bit equality.
    def mjpegOf(pid: Int, w: Int, h: Int): Array[Byte] = {
      val frames = Multimodal.AviCodec.readFrames(
        Multimodal.syntheticAviBlocks(pid, nFrames = 5, w, h)).map { case (_, img) =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      Multimodal.AviCodec.write(frames, w, h, "MJPG",
        "MJPG".getBytes("US-ASCII"), compressed = true)
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, Multimodal.syntheticAviBlocks(7, 5, 64, 48), "video/avi", 64, 48),
      Multimodal.MediaRow(1L, mjpegOf(7, 64, 48), "video/avi", 64, 48)))
    val fh = VideoDedup.frameHashes(media)
    assert(fh.count() === 10L, "both containers must decode all 5 frames")
    val h = fh.collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        Seq(r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val perFrame = (0 until 5).map(f => h((0L, f)).zip(h((1L, f)))
      .map { case (x, y) => Integer.bitCount(x ^ y) }.sum)
    assert(perFrame.max <= 3,
      s"lossy re-encode drifted too far from the original: $perFrame")
  }

  test("unparseable payloads are dropped; keepTable drops the exact copies") {
    val withJunk = corpus.union(spark.createDataset(Seq(
      Multimodal.MediaRow(99L, Array[Byte](1, 2, 3, 4), "video/avi", 8, 8))))
    val fh = VideoDedup.frameHashes(withJunk)
    assert(fh.select("media_id").distinct().count() === 48L)
    val keep = VideoDedup.keepTable(fh, VideoDedup.nearDuplicates(fh))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    (0L until 12L).foreach(id => assert(!keep(id + 12), s"copy ${id + 12} must drop"))
  }

  /** The q_media_vhash_offset fixture: full cuts + two trims. */
  private def trimmedCorpus = spark.range(24).map { id =>
    val pid = (id % 8).toInt
    val (start, n) = if (id < 8) (0, 6) else if (id < 16) (2, 4) else (1, 4)
    Multimodal.MediaRow(id,
      Multimodal.syntheticAviBlocks(pid, start, n, 12, 10), "video/avi", 12, 10)
  }

  test("trimmed copies of the same cut align at their trim offset, Hamming 0") {
    val got = VideoDedup.nearDuplicatesAligned(
      VideoDedup.frameHashes(trimmedCorpus), maxPerFrameHamming = 3, minOverlap = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    (0L until 8L).foreach { p =>
      assert(got((p, p + 8, 2L)) === ((4L, 0L)),
        s"full vs trim-at-2 of pattern $p must align at offset +2 over 4 frames")
      assert(got((p, p + 16, 1L)) === ((4L, 0L)),
        s"full vs trim-at-1 of pattern $p must align at offset +1 over 4 frames")
      assert(got((p + 8, p + 16, -1L)) === ((3L, 0L)),
        s"trim-at-2 vs trim-at-1 of pattern $p must align at offset -1 over 3 frames")
    }
    assert(got.size === 24, s"no other alignment qualifies, got ${got.keys.toSeq.sorted}")
  }

  test("keepTableAligned collapses a cut and both its trims into one class") {
    val fh = VideoDedup.frameHashes(trimmedCorpus)
    val keep = VideoDedup.keepTableAligned(fh,
      VideoDedup.nearDuplicatesAligned(fh, maxPerFrameHamming = 3, minOverlap = 3))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    (0L until 8L).foreach { p =>
      assert(keep(p) === ((p, true)), s"the full cut $p is the smallest id: kept")
      assert(keep(p + 8) === ((p, false)), s"trim ${p + 8} joins cluster $p: dropped")
      assert(keep(p + 16) === ((p, false)), s"trim ${p + 16} joins cluster $p: dropped")
    }
  }

  test("the same-frame-count contract misses exactly what the aligned join finds") {
    val fh = VideoDedup.frameHashes(trimmedCorpus)
    // nearDuplicates requires equal counts AND offset-0 alignment:
    // the full-vs-trim pairs fail both, the two trims share a count
    // but not an alignment at offset 0
    assert(VideoDedup.nearDuplicates(fh, maxPerFrameHamming = 3).count() === 0L)
  }

  test("aligned join equals the brute-force offset scan (exactness with offsets)") {
    val fh = VideoDedup.frameHashes(trimmedCorpus)
    val got = VideoDedup.nearDuplicatesAligned(fh, maxPerFrameHamming = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val h = fh.collect().map(r => (r.getLong(0), r.getInt(1)) ->
      Seq(r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val ids = h.keys.map(_._1).toSeq.distinct.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      off <- -5L to 5L
      pairs = h.keys.filter(_._1 == a).map(_._2)
        .flatMap(fa => h.get((b, (fa - off).toInt)).map(bb => (h((a, fa)), bb)))
      if pairs.size >= 2
      maxFh = pairs.map { case (x, y) =>
        x.zip(y).map { case (u, v) => Integer.bitCount(u ^ v) }.sum }.max
      if maxFh <= 3
    } yield (a, b, off, pairs.size.toLong, maxFh.toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  /** The wide fixture: the trim recipe at 34×33 so every 17×16-grid
    * cell owns pixels. */
  private def trimmedCorpusWide = spark.range(24).map { id =>
    val pid = (id % 8).toInt
    val (start, n) = if (id < 8) (0, 6) else if (id < 16) (2, 4) else (1, 4)
    Multimodal.MediaRow(id,
      Multimodal.syntheticAviBlocks(pid, start, n, 34, 33), "video/avi", 34, 33)
  }

  test("wide aligned join equals the brute-force 256-bit offset scan") {
    val fh = VideoDedup.frameHashesWide(trimmedCorpusWide)
    val got = VideoDedup.nearDuplicatesAlignedWide(fh,
      maxPerFrameHamming = 7, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val h = fh.collect().map(r => (r.getLong(0), r.getInt(1)) ->
      (2 to 9).map(r.getLong)).toMap
    val ids = h.keys.map(_._1).toSeq.distinct.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      off <- -5L to 5L
      pairs = h.keys.filter(_._1 == a).map(_._2)
        .flatMap(fa => h.get((b, (fa - off).toInt)).map(bb => (h((a, fa)), bb)))
      if pairs.size >= 2
      maxFh = pairs.map { case (x, y) =>
        x.zip(y).map { case (u, v) => java.lang.Long.bitCount(u ^ v) }.sum }.max
      if maxFh <= 7
    } yield (a, b, off, pairs.size.toLong, maxFh.toLong)).toSet
    assert(got === brute)
    // the planted trims must all surface (full-vs-trim2 at +2,
    // full-vs-trim1 at +1, trim2-vs-trim1 at −1, per pattern)
    (0L until 8L).foreach { p =>
      assert(brute.contains((p, p + 8, 2L, 4L, 0L)))
      assert(brute.contains((p, p + 16, 1L, 4L, 0L)))
      assert(brute.contains((p + 8, p + 16, -1L, 3L, 0L)))
    }
  }
}
