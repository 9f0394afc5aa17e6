package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate detection for audio columns — the audio
  * analog of [[ImageDedup]], closing the multimodal dedup family
  * (text → [[MinHash]], embeddings → [[Similarity]], images →
  * [[ImageDedup]], audio → here). The same recording re-encoded,
  * re-trimmed or re-leveled is the duplicate class a web-scale audio
  * corpus carries.
  *
  * The fingerprint is an energy-envelope hash (the dHash idea on the
  * time axis): decode → 65 LENGTH-relative windows (sample i belongs
  * to window `(i·65)/n`, integer division — the same pinned floor
  * mapping family as [[ImageDedup]]) → per-window absolute-amplitude
  * sum (integer) → bit j is `e(j) < e(j+1)`. Every step is
  * integer-exact over lossless PCM, so the hash of a synthetic WAV is
  * closed-form replayable in DuckDB from the sample formula — no
  * audio library. Envelope GRADIENTS are invariant to uniform gain
  * (scaling all samples scales every window sum) and, by the
  * length-relative windows, robust to resampling.
  *
  * Pairing reuses [[BandedHamming]]: 4×16-bit bands, exact for
  * Hamming ≤ 3, `maxBucket` guard, the only shuffle on (band, key16).
  * Decode is partition-local — payload bytes never shuffle.
  */
object AudioDedup {

  /** 65 windows → 64 comparison bits, like the image grid. */
  val Windows = 65

  /** Per-clip envelope hash as four 16-bit band values
    * `(media_id, b0, b1, b2, b3)` — band k packs bits `j ∈ [16k,
    * 16k+16)` with weight `2^(j mod 16)`. Clips that fail to decode
    * as 16-bit PCM WAV, or are shorter than [[Windows]] samples (too
    * short for every window to own a sample), are dropped. */
  def envelopeHash(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        envelopeBandsOf(r.payload).map(b => (r.media_id, b(0), b(1), b(2), b(3)))
      }
    }.toDF("media_id", "b0", "b1", "b2", "b3")
  }

  /** The per-clip hash kernel (shared with
    * [[graft.streaming.StreamingMediaDedup]]): None for non-PCM-WAV
    * payloads or clips shorter than [[Windows]] samples. */
  private[graft] def envelopeBandsOf(payload: Array[Byte]): Option[Array[Int]] = {
    val samples = decodePcm(payload)
    if (samples == null || samples.length < Windows) None
    else {
      val n = samples.length
      val e = new Array[Long](Windows)
      var i = 0
      while (i < n) {
        e(((i.toLong * Windows) / n).toInt) += math.abs(samples(i).toLong)
        i += 1
      }
      val bands = new Array[Int](4)
      var j = 0
      while (j < Windows - 1) {
        if (e(j) < e(j + 1)) bands(j / 16) |= 1 << (j % 16)
        j += 1
      }
      Some(bands)
    }
  }

  /** Near-duplicate pairs over an [[envelopeHash]] table — see
    * [[BandedHamming.nearDuplicates]]. */
  def nearDuplicates(
      hashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicates(hashes, maxHamming, maxBucket)

  /** Per-FRAME envelope hashes at a fixed stride — the offset-capable
    * fingerprint [[envelopeHash]] cannot be: its 65 windows are
    * LENGTH-relative, so a trimmed copy re-maps every window and the
    * whole-clip hash diverges. Here the PCM stream is cut into
    * consecutive `frameSamples`-sample frames (trailing partial frame
    * dropped), each hashed with the same 65-window kernel —
    * `(media_id, frame_no, b0..b3)`, the exact shape
    * [[nearDuplicatesAligned]] consumes. A copy trimmed by a MULTIPLE
    * of the stride aligns frame-for-frame (the pinned granularity —
    * real pipelines pick a small stride for fine alignment; arbitrary
    * sub-stride trims are out of this rule's scope, stated honestly).
    * Clips shorter than one frame are dropped. Partition-local. */
  def frameHashes(
      media: Dataset[Multimodal.MediaRow],
      frameSamples: Int = 1024): DataFrame = {
    require(frameSamples >= Windows,
      s"frameSamples must be >= $Windows (one sample per window), got $frameSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val samples = decodePcm(r.payload)
        if (samples == null || samples.length < frameSamples) Iterator.empty
        else (0 until samples.length / frameSamples).iterator.map { f =>
          val e = new Array[Long](Windows)
          var j = 0
          while (j < frameSamples) {
            e(((j.toLong * Windows) / frameSamples).toInt) +=
              math.abs(samples(f * frameSamples + j).toLong)
            j += 1
          }
          val bands = new Array[Int](4)
          var w = 0
          while (w < Windows - 1) {
            if (e(w) < e(w + 1)) bands(w / 16) |= 1 << (w % 16)
            w += 1
          }
          (r.media_id, f, bands(0), bands(1), bands(2), bands(3))
        }
      }
    }.toDF("media_id", "frame_no", "b0", "b1", "b2", "b3")
  }

  /** Offset-tolerant near-duplicate pairs over a [[frameHashes]]
    * table — trimmed copies of the same recording; see
    * [[BandedHamming.nearDuplicatesAligned]]. */
  def nearDuplicatesAligned(
      frames: DataFrame,
      maxPerFrameHamming: Int = 3,
      minOverlap: Int = 2,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicatesAligned(frames, maxPerFrameHamming, minOverlap, maxBucket)

  /** 257 windows → 256 comparison bits — the wide layout's window
    * count. */
  val WindowsWide = 257

  /** WIDE per-frame envelope hashes — [[frameHashes]] with the
    * 257-window kernel packed as 8 × 32-bit bands
    * `(media_id, frame_no, w0..w7)`, the audio twin of
    * [[ImageDedup.dHashWide]]. The aligned (offset-tolerant) join
    * drops frame_no from its collision key, so its buckets widen
    * nFrames× and the 16-bit keyspace saturates nFrames× sooner than
    * the still-image bound — this layout is the remedy: 2^32 keys per
    * band, and the 8-band pigeonhole makes the aligned verify exact
    * per overlapping window for per-frame Hamming ≤ 7. Needs
    * `frameSamples >= 257` (one sample per window). Partition-local. */
  def frameHashesWide(
      media: Dataset[Multimodal.MediaRow],
      frameSamples: Int = 1024): DataFrame = {
    require(frameSamples >= WindowsWide,
      s"frameSamples must be >= $WindowsWide (one sample per window), got $frameSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val samples = decodePcm(r.payload)
        if (samples == null || samples.length < frameSamples) Iterator.empty
        else (0 until samples.length / frameSamples).iterator.map { f =>
          val e = new Array[Long](WindowsWide)
          var j = 0
          while (j < frameSamples) {
            e(((j.toLong * WindowsWide) / frameSamples).toInt) +=
              math.abs(samples(f * frameSamples + j).toLong)
            j += 1
          }
          val bands = new Array[Long](8)
          var w = 0
          while (w < WindowsWide - 1) {
            if (e(w) < e(w + 1)) bands(w / 32) |= 1L << (w % 32)
            w += 1
          }
          (r.media_id, f, bands(0), bands(1), bands(2), bands(3),
            bands(4), bands(5), bands(6), bands(7))
        }
      }
    }.toDF("media_id" +: "frame_no" +: BandedHamming.WideBands: _*)
  }

  /** Offset-tolerant near-duplicates over a [[frameHashesWide]] table
    * — exact per overlapping window for per-frame Hamming ≤ 7, band
    * keys in a 2^32 space (the saturation remedy for the widened
    * aligned buckets). */
  def nearDuplicatesAlignedWide(
      frames: DataFrame,
      maxPerFrameHamming: Int = 7,
      minOverlap: Int = 2,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicatesAlignedOver(frames, BandedHamming.WideBands,
      maxPerFrameHamming, minOverlap, maxBucket)

  /** Keep/drop decision per clip over [[nearDuplicates]] pairs — see
    * [[ImageDedup.keepTable]] (same clustering machinery). */
  def keepTable(hashes: DataFrame, pairs: DataFrame): DataFrame =
    DedupClusters.keepTable(hashes, pairs, "media_id", "media_id_a", "media_id_b")

  /** Keep/drop decision per clip over [[nearDuplicatesAligned]] pairs
    * — see [[VideoDedup.keepTableAligned]] (same machinery: any
    * qualifying alignment links two recordings into one transitive
    * duplicate class, smallest id kept). */
  def keepTableAligned(frames: DataFrame, alignedPairs: DataFrame): DataFrame =
    DedupClusters.keepTable(frames.select(col("media_id")).distinct(),
      alignedPairs.select(col("media_id_a"), col("media_id_b")).distinct(),
      "media_id", "media_id_a", "media_id_b")

  /** 16-bit signed PCM samples of a WAV payload, or null when the
    * container/encoding is anything else (same decode path as
    * [[Multimodal.WavDecoder]], kept raw instead of reduced). */
  private def decodePcm(payload: Array[Byte]): Array[Short] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 ||
          f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (f.isBigEndian)
                ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
              else
                ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
            i += 1
          }
          out
        }
      } finally ais.close()
    } catch {
      case _: java.io.IOException => null
      case _: javax.sound.sampled.UnsupportedAudioFileException => null
    }

  // ----- DuckDB mirror fragment (used by the oracle SQL) -----

  /** The envelope-hash band values recomputed from a closed-form
    * sample formula: given a relation `(media_id, n)` named `dims`
    * and a SQL expression for the integer sample value at index `i`
    * of clip `media_id` (`n` also in scope), emits CTEs ending in
    * `hx(media_id, b0, b1, b2, b3)` — the same window mapping, energy
    * sum, bit order and band packing as [[envelopeHash]]. */
  def hashSql(sampleExpr: String): String =
    s"""sm AS (
       |  SELECT d.media_id, d.n, s.i, ($sampleExpr) AS v
       |  FROM dims d
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(n) FROM dims) - 1)) AS i) s
       |    ON s.i < d.n),
       |env AS (
       |  SELECT media_id, (i * $Windows) // n AS w, sum(abs(v)) AS e
       |  FROM sm GROUP BY media_id, (i * $Windows) // n),
       |bits AS (
       |  SELECT a.media_id, a.w AS j,
       |         CASE WHEN a.e < b.e THEN 1 ELSE 0 END AS bit
       |  FROM env a JOIN env b ON a.media_id = b.media_id AND b.w = a.w + 1
       |  WHERE a.w < ${Windows - 1}),
       |hx AS (
       |  SELECT media_id,
       |         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
       |         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
       |         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
       |         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
       |  FROM bits GROUP BY media_id)""".stripMargin
}
