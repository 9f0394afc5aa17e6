package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the audio envelope-hash dedup that the hash
  * oracle cannot express: gain invariance, banded-vs-brute equality,
  * and the drop rules. */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The q_media_ahash fixture. */
  private def corpus = spark.range(96).map { id =>
    val pid = (id % 24).toInt
    val n = if (id < 48) 160 + 16 * (pid % 10) else 130 + 13 * (id % 10).toInt
    Multimodal.MediaRow(id, Multimodal.syntheticWavBlocks(pid, n), "audio/wav", n, 1)
  }

  test("exact copies hash identically and surface as Hamming-0 pairs") {
    val pairs = AudioDedup.nearDuplicates(AudioDedup.envelopeHash(corpus))
      .filter(col("hamming") === 0)
      .select("media_id_a", "media_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 24L).foreach(id => assert(pairs.contains((id, id + 24)),
      s"exact duplicate pair ($id, ${id + 24}) must be found at Hamming 0"))
  }

  test("banded LSH equals the brute-force Hamming scan") {
    val hashes = AudioDedup.envelopeHash(corpus)
    val got = AudioDedup.nearDuplicates(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h = hashes.collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val brute = (for {
      (ia, ba) <- h; (ib, bb) <- h if ia < ib
      d = ba.zip(bb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("envelope hash is invariant to uniform gain") {
    def wav(gain: Int): Array[Byte] = {
      val n = 200
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (((31 * i) % 2001) / 2 + (if ((i * 16 / n) % 3 == 0) 3000 else 0)) * gain
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, wav(1), "audio/wav", 200, 1),
      Multimodal.MediaRow(1L, wav(2), "audio/wav", 200, 1)))
    val rows = AudioDedup.envelopeHash(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(rows(0L) === rows(1L), "envelope gradients must ignore uniform gain")
  }

  test("too-short and undecodable clips are dropped, not hashed") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, Multimodal.syntheticWavBlocks(1, 130), "audio/wav", 130, 1),
      Multimodal.MediaRow(2L, Multimodal.syntheticWavBlocks(2, 64), "audio/wav", 64, 1),
      Multimodal.MediaRow(3L, Array[Byte](9, 9, 9), "audio/wav", 3, 1)))
    assert(AudioDedup.envelopeHash(media).select("media_id").as[Long].collect().toSeq
      === Seq(1L))
  }

  /** The q_media_ahash_offset fixture: full 6-frame recordings + two
    * trims at stride multiples (absolute-index content). */
  private def trimmedCorpus = spark.range(24).map { id =>
    val pid = (id % 8).toInt
    val (start, n) = if (id < 8) (0, 780) else if (id < 16) (260, 520) else (130, 520)
    Multimodal.MediaRow(id, Multimodal.syntheticWavAbs(pid, start, n), "audio/wav", n, 1)
  }

  test("trimmed recordings align at their trim offset with Hamming 0") {
    val got = AudioDedup.nearDuplicatesAligned(
      AudioDedup.frameHashes(trimmedCorpus, frameSamples = 130),
      maxPerFrameHamming = 3, minOverlap = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    (0L until 8L).foreach { p =>
      assert(got((p, p + 8, 2L)) === ((4L, 0L)),
        s"full vs trim-at-260 of pattern $p must align at offset +2 over 4 frames")
      assert(got((p, p + 16, 1L)) === ((4L, 0L)),
        s"full vs trim-at-130 of pattern $p must align at offset +1 over 4 frames")
      assert(got((p + 8, p + 16, -1L)) === ((3L, 0L)),
        s"the two trims of pattern $p must align at offset -1 over 3 frames")
    }
  }

  test("the whole-clip envelope hash cannot see trims (length-relative windows)") {
    // the full clip and its trim hash to DIFFERENT whole-clip values:
    // trimming changes n, so every window re-maps — the gap
    // frameHashes + the aligned join exist to close
    val h = AudioDedup.envelopeHash(trimmedCorpus).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    val same = (0L until 8L).count(p => h(p) == h(p + 8))
    assert(same <= 2, s"trims should rarely collide with their source whole-clip hash")
  }

  /** The wide fixture: stride 260 ≥ 257 windows — full 4-frame clips
    * plus trims at 260.. and 520.. (stride multiples). */
  private def trimmedCorpusWide = spark.range(24).map { id =>
    val pid = (id % 8).toInt
    val (start, n) = if (id < 8) (0, 1040) else if (id < 16) (260, 780) else (520, 520)
    Multimodal.MediaRow(id, Multimodal.syntheticWavAbs(pid, start, n), "audio/wav", n, 1)
  }

  test("wide (8×32-bit) aligned join equals the brute-force 256-bit offset scan") {
    val fh = AudioDedup.frameHashesWide(trimmedCorpusWide, frameSamples = 260)
    val got = AudioDedup.nearDuplicatesAlignedWide(fh,
      maxPerFrameHamming = 7, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val h = fh.collect().map(r => (r.getLong(0), r.getInt(1)) ->
      (2 to 9).map(r.getLong)).toMap
    val ids = h.keys.map(_._1).toSeq.distinct.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      off <- -3L to 3L
      pairs = h.keys.filter(_._1 == a).map(_._2)
        .flatMap(fa => h.get((b, (fa - off).toInt)).map(bb => (h((a, fa)), bb)))
      if pairs.size >= 2
      maxFh = pairs.map { case (x, y) =>
        x.zip(y).map { case (u, v) => java.lang.Long.bitCount(u ^ v) }.sum }.max
      if maxFh <= 7
    } yield (a, b, off, pairs.size.toLong, maxFh.toLong)).toSet
    assert(got === brute)
    (0L until 8L).foreach { p =>
      assert(brute.contains((p, p + 8, 1L, 3L, 0L)),
        s"full vs trim-at-260 of pattern $p aligns at +1 over 3 frames")
      assert(brute.contains((p, p + 16, 2L, 2L, 0L)),
        s"full vs trim-at-520 of pattern $p aligns at +2 over 2 frames")
      assert(brute.contains((p + 8, p + 16, 1L, 2L, 0L)),
        s"the two trims of pattern $p align at +1 over 2 frames")
    }
  }
}
