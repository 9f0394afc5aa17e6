package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque BINARY
  * columns with typed metadata; decode/feature-extraction runs as a
  * partition-local batch transform.
  *
  * The Spark-side mechanics are real and tested — schema, encoders,
  * batch shape, partition-local execution (one decoder instance per
  * partition, amortized across its rows, exactly how a JNI/FFmpeg/PIL
  * decoder would be held). The actual byte decoding is pluggable via
  * [[Decoder]]: [[ImageIoDecoder]] (PNG/JPEG), [[WavDecoder]]
  * (RIFF/PCM) and [[AviCodec]] (AVI video — MJPEG + uncompressed DIB
  * frames) are REAL JDK-only decoders covering all three modalities;
  * [[DeterministicFakeDecoder]] remains only as the clearly-marked
  * fallback for formats the JDK truly cannot touch, deriving a stable
  * feature vector from the payload bytes. Swapping decoders changes
  * zero lines of pipeline code.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is
  * a map over the source partitioning; `spark.sql.files.maxPartitionBytes`
  * bounds per-task memory for large media files, and wide binary scans
  * prune to (id, payload) via ordinary column pruning.
  */
object Multimodal {

  /** One media row: payload plus typed metadata. */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Per-partition media decoder. Implementations must be serializable
    * and cheap to construct (one instance per partition). */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], format: String): Array[Float]
  }

  /** STUB decoder — NOT a real media decode. Emits 8 deterministic
    * features from payload bytes so pipelines are testable end-to-end
    * without image/audio libraries. Features are integer byte sums
    * (strided by position mod 8), exactly representable in Float, so
    * results are engine-comparable bit-for-bit. */
  object DeterministicFakeDecoder extends Decoder {
    override def decode(payload: Array[Byte], format: String): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xff).toFloat
        i += 1
      }
      out
    }
  }

  /** REAL image decode via the JDK's `javax.imageio` — PNG and JPEG
    * with zero added dependencies. Features (all integer-valued, so
    * exact in Float for images under ~2^24 total channel sum — any
    * fixture-sized image):
    * `[width, height, sumR, sumG, sumB, minLuma, maxLuma, nPixels]`
    * where luma = (299·R + 587·G + 114·B) / 1000 in integer math.
    * Unknown formats and undecodable payloads fall back to
    * [[DeterministicFakeDecoder]] so mixed-format tables keep flowing.
    * PNG being lossless, the features of a synthetic PNG are
    * closed-form replayable — `q_media_image_decode` recomputes them
    * in DuckDB from the pixel formula without any image library. */
  object ImageIoDecoder extends Decoder {
    override def decode(payload: Array[Byte], format: String): Array[Float] =
      format match {
        case "image/png" | "image/jpeg" =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          if (img == null) DeterministicFakeDecoder.decode(payload, format)
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var minL = 255L; var maxL = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                sr += r; sg += g; sb += b
                val l = (r * 299L + g * 587L + b * 114L) / 1000L
                if (l < minL) minL = l
                if (l > maxL) maxL = l
                x += 1
              }
              y += 1
            }
            Array(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat,
              minL.toFloat, maxL.toFloat, (w.toLong * h).toFloat)
          }
        case _ => DeterministicFakeDecoder.decode(payload, format)
      }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` — WAV
    * (RIFF) containers with 16-bit signed PCM payloads, zero added
    * dependencies. Features (all integer-valued, so exact in Float for
    * clips whose absolute-sample sum stays under 2^24 — any
    * fixture-sized clip):
    * `[channels, sampleRate, nSamples, sumAbs, minSample, maxSample,
    *   zeroCrossings, nLoud]`
    * where zeroCrossings counts sign flips of the `>= 0` predicate
    * between consecutive samples and nLoud counts samples with
    * `|v| >= 500`. Non-WAV formats, undecodable payloads, and PCM
    * widths other than 16-bit fall back to
    * [[DeterministicFakeDecoder]] so mixed-format tables keep flowing.
    * WAV being lossless PCM, the features of a synthetic clip are
    * closed-form replayable — `q_media_audio_decode` recomputes them
    * in DuckDB from the sample formula without any audio library. */
  object WavDecoder extends Decoder {
    override def decode(payload: Array[Byte], format: String): Array[Float] =
      format match {
        case "audio/wav" | "audio/x-wav" =>
          val decoded =
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
                  var sumAbs = 0L; var minS = Long.MaxValue; var maxS = Long.MinValue
                  var zc = 0L; var loud = 0L
                  var prevNonNeg = false
                  var i = 0
                  while (i < n) {
                    val v: Int =
                      if (f.isBigEndian)
                        ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort.toInt
                      else
                        ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toInt
                    sumAbs += math.abs(v)
                    if (v < minS) minS = v
                    if (v > maxS) maxS = v
                    if (i > 0 && (v >= 0) != prevNonNeg) zc += 1
                    if (math.abs(v) >= 500) loud += 1
                    prevNonNeg = v >= 0
                    i += 1
                  }
                  if (n == 0) null
                  else Array(f.getChannels.toFloat, f.getSampleRate,
                    n.toFloat, sumAbs.toFloat, minS.toFloat, maxS.toFloat,
                    zc.toFloat, loud.toFloat)
                }
              } finally ais.close()
            } catch {
              case _: java.io.IOException => null
              case _: javax.sound.sampled.UnsupportedAudioFileException => null
            }
          if (decoded == null) DeterministicFakeDecoder.decode(payload, format)
          else decoded
        case _ => DeterministicFakeDecoder.decode(payload, format)
      }
  }

  /** Deterministic synthetic WAV: sample i of clip `id` is
    * `((31·i + 17·id) mod 2001) − 1000` — a closed-form pattern any
    * engine can recompute, written as mono 16-bit little-endian PCM at
    * 8 kHz through the REAL RIFF/WAVE encoder so [[WavDecoder]]
    * exercises a real container parse + PCM decode. A fixture
    * generator (tests + the audio-decode oracle query). */
  def syntheticWav(id: Long, nSamples: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((31L * i + 17L * id) % 2001L) - 1000L).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PNG: pixel (x, y) of image `id` is
    * `R=(7x+13y+id)%256, G=(3x+5y+2id)%256, B=(11x+17y+3id)%256` —
    * a closed-form pattern any engine can recompute, encoded through a
    * REAL PNG encoder so [[ImageIoDecoder]] exercises a real decode.
    * A fixture generator (tests + the image-decode oracle query). */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((7L * x + 13L * y + id) % 256L).toInt
        val g = ((3L * x + 5L * y + 2L * id) % 256L).toInt
        val b = ((11L * x + 17L * y + 3L * id) % 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic WAV with pid-keyed loud segments — the
    * audio-dedup fixture (see [[AudioDedup]] / `q_media_ahash`).
    * Sample i of a clip with pattern seed `pid`:
    * `((31·i + 17·pid) mod 2001) + (4000 when segment m = (i·16)/n is
    * loud: (m·7 + pid) mod 16 < 5)`. The 16 segments are
    * LENGTH-relative, so re-rendering the same pid at another length
    * keeps the loudness envelope (the "same clip resampled" duplicate
    * an envelope fingerprint exists to catch), while different pids
    * light different segments. Non-negative and ≤ 6000, so 16-bit PCM
    * never clips and the closed form replays exactly. Written through
    * the real RIFF/WAVE encoder (mono, 8 kHz, 16-bit LE). */
  def syntheticWavBlocks(pid: Long, nSamples: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val m = (i.toLong * 16L) / nSamples
      val loud = if ((m * 7L + pid) % 16L < 5L) 4000 else 0
      val v = (((31L * i + 17L * pid) % 2001L) + loud).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** [[syntheticWavBlocks]] with ABSOLUTE-index content starting at
    * sample `startSample` — a TRIMMED copy of the same synthetic
    * recording (file-local sample i carries the content of absolute
    * sample startSample + i; loud blocks are 64 absolute samples
    * wide, not length-relative), the fixture shape the
    * offset-tolerant audio dedup exists for. */
  def syntheticWavAbs(pid: Long, startSample: Int, nSamples: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val a = (startSample + i).toLong
      // pattern-keyed slope AND block layout: distinct pids differ in
      // envelope GRADIENTS, not just offsets, so the fixture
      // discriminates (the hash bits are gradient signs)
      val loud = if (((a / 64L) * 7L + 5L * pid) % 16L < 5L) 12000 else 0
      val v = ((((31L + 2L * pid) * a + 17L * pid) % 2001L) + loud).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PNG with pid-keyed bright blocks — the
    * perceptual-dedup fixture (see [[ImageDedup]] / `q_media_dhash`).
    * Pixel (x, y): half-intensity gradient base
    * `R=((7x+13y+pid)%256)/2` (G, B likewise with the [[syntheticPng]]
    * coefficients) plus +128 on all channels when the pixel's
    * NORMALIZED 4×4 cell `(4x/w) + 4·(4y/h)` satisfies
    * `(cell·7 + pid) % 16 < 5`. The cell grid is resolution-relative,
    * so re-rendering the same pid at other dimensions keeps the block
    * layout (a perceptual near-duplicate), while different pids light
    * different cells (perceptually far). No channel wraps (≤ 255), so
    * the closed form replays exactly. */
  def syntheticPngBlocks(pid: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = (x * 4) / w + 4 * ((y * 4) / h)
        val add = if ((cell * 7 + pid) % 16 < 5) 128 else 0
        val r = ((7L * x + 13L * y + pid) % 256L).toInt / 2 + add
        val g = ((3L * x + 5L * y + 2L * pid) % 256L).toInt / 2 + add
        val b = ((11L * x + 17L * y + 3L * pid) % 256L).toInt / 2 + add
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batch feature extraction: partition-local, one decoder per
    * partition, no shuffle. */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: Decoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map(r => MediaFeatures(r.media_id, decoder.decode(r.payload, r.format)))
    }
  }

  /** Synthesizes a media table from the documents table (text bytes as
    * payload) — the test substrate: real BINARY column, real metadata. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("format"),
      length(col(textCol)).cast("int").as("width"),
      lit(1).as("height"))
      .as[MediaRow]
  }

  /** Per-partition resizer. A real implementation wraps an image
    * library; the contract is payload→payload with updated metadata. */
  trait Resizer extends Serializable {
    def resize(payload: Array[Byte], w0: Int, h0: Int, w1: Int, h1: Int): Array[Byte]
  }

  /** STUB resizer — NOT a real image resample. Nearest-neighbor byte
    * selection along the width axis, so output size tracks the target
    * dimensions deterministically and the plumbing (metadata update,
    * partition-local batch transform, no shuffle) is real. */
  object DeterministicFakeResizer extends Resizer {
    override def resize(payload: Array[Byte], w0: Int, h0: Int, w1: Int, h1: Int): Array[Byte] = {
      if (payload.isEmpty || w1 <= 0) Array.emptyByteArray
      else Array.tabulate(math.min(w1, payload.length))(i =>
        payload(((i.toLong * payload.length) / math.max(w1, 1)).toInt))
    }
  }

  /** REAL image resample: decode via `javax.imageio`, nearest-neighbor
    * resample with the explicit floor mapping
    * `src(x) = x·w0 / w1` (integer division, likewise for y), re-encode
    * as PNG. The mapping is pinned in code rather than delegated to
    * AWT's scaling ops so the resampled pixels of a closed-form source
    * image are themselves closed-form — `q_media_image_resize` replays
    * decode→resample→encode→decode in DuckDB from the pixel formula
    * alone. Source dimensions come from the DECODED image, not the
    * metadata columns. Undecodable payloads fall back to
    * [[DeterministicFakeResizer]]. */
  object ImageIoResizer extends Resizer {
    override def resize(payload: Array[Byte], w0: Int, h0: Int, w1: Int, h1: Int): Array[Byte] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null || w1 <= 0 || h1 <= 0)
        DeterministicFakeResizer.resize(payload, w0, h0, w1, h1)
      else {
        val out = new java.awt.image.BufferedImage(
          w1, h1, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val sw = img.getWidth.toLong
        val sh = img.getHeight.toLong
        var y = 0
        while (y < h1) {
          val sy = ((y * sh) / h1).toInt
          var x = 0
          while (x < w1) {
            out.setRGB(x, y, img.getRGB(((x * sw) / w1).toInt, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** Batch resize: partition-local map, metadata updated alongside the
    * payload — the `resize` step of a media pipeline. */
  def resize(
      media: Dataset[MediaRow],
      targetWidth: Int,
      targetHeight: Int,
      resizer: Resizer = DeterministicFakeResizer): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map(r => MediaRow(r.media_id,
        resizer.resize(r.payload, r.width, r.height, targetWidth, targetHeight),
        r.format, targetWidth, targetHeight))
    }
  }

  // ------------------------------------------------------------ video (AVI)

  /** REAL video container decode via a JDK-only RIFF/AVI parser —
    * the last modality to shed its deterministic fake. Two codecs:
    *
    *  - uncompressed DIB (`00db` chunks, BI_RGB bottom-up BGR rows,
    *    4-byte row stride): fully lossless, so the per-frame pixel
    *    stats of a closed-form synthetic video replay in DuckDB from
    *    the pixel formula alone (`q_media_video_frames`);
    *  - MJPEG (`00dc` chunks, one JPEG per frame through the existing
    *    `javax.imageio` path): the common capture codec; lossy, so
    *    pinned by spec tolerance against the closed-form source
    *    rather than by exact oracle.
    *
    * The parser is a genuine chunk walker (RIFF header, LIST
    * recursion into `hdrl`/`strl` for the `strf` BITMAPINFOHEADER,
    * `movi` traversal with odd-size padding), not a fixture-offset
    * reader — it reads any single-video-stream AVI within these two
    * codecs. [[DeterministicFakeDecoder]] now stands in only for
    * formats the JDK truly cannot touch. */
  object AviCodec {

    private def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    private def rd32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def cc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      fourcc(id) ++ le32(body.length.toLong) ++ body ++ pad
    }
    private def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ body)

    /** Writes a single-stream AVI. `frames` are already-encoded chunk
      * payloads; `compressed` selects `00dc` (MJPEG) vs `00db` (DIB). */
    def write(
        frames: Seq[Array[Byte]],
        w: Int,
        h: Int,
        handler: String,
        biCompression: Array[Byte],
        compressed: Boolean): Array[Byte] = {
      val avih = le32(40000L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
        le32(frames.length.toLong) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
        le32(w.toLong) ++ le32(h.toLong) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
      val strh = fourcc("vids") ++ fourcc(handler) ++ le32(0L) ++ le32(0L) ++
        le32(0L) ++ le32(1L) ++ le32(25L) ++ le32(0L) ++
        le32(frames.length.toLong) ++ le32(0L) ++ le32(-1L & 0xffffffffL) ++
        le32(0L) ++ le32(0L) ++ le32(0L)
      val strf = le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ biCompression ++
        le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        frames.flatMap(f => chunk(if (compressed) "00dc" else "00db", f)).toArray)
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length.toLong) ++ body
    }

    /** Encodes a BufferedImage as a bottom-up BI_RGB DIB frame
      * (BGR byte order, rows padded to 4 bytes) — the standard
      * uncompressed AVI frame layout. */
    def dibFrame(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val stride = ((w * 3 + 3) / 4) * 4
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(row + x * 3) = (rgb & 0xff).toByte // B
          out(row + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte // G
          out(row + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte // R
          x += 1
        }
        y += 1
      }
      out
    }

    private def decodeDib(
        body: Array[Byte], w: Int, h: Int): java.awt.image.BufferedImage = {
      val stride = ((w * 3 + 3) / 4) * 4
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val b = body(row + x * 3) & 0xff
          val g = body(row + x * 3 + 1) & 0xff
          val r = body(row + x * 3 + 2) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }

    /** Walks the RIFF tree and decodes every video frame of stream 0.
      * Returns frames in stream order; empty for payloads that are not
      * a parseable AVI (callers fall back like the other decoders). */
    def readFrames(payload: Array[Byte]): Seq[(Int, java.awt.image.BufferedImage)] = {
      if (payload.length < 12 || cc(payload, 0) != "RIFF" || cc(payload, 8) != "AVI ")
        return Nil
      var biW = 0; var biH = 0; var compression = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, java.awt.image.BufferedImage)]
      var frameNo = 0
      def walk(from: Int, to: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = cc(payload, o)
          val size = rd32(payload, o + 4)
          val body = o + 8
          // a negative size (sign bit set in the little-endian u32) is a
          // corrupt chunk: it would wrap `body + size` below `to` and stall
          // the offset, so treat it like truncation and stop cleanly
          if (size < 0 || body + size > to) return
          id match {
            case "LIST" =>
              walk(body + 4, body + size) // skip the list-kind fourcc
            case "strf" if size >= 40 =>
              biW = rd32(payload, body + 4)
              biH = rd32(payload, body + 8)
              compression = rd32(payload, body + 16)
            case _ if id.length == 4 && id.endsWith("db") =>
              if (biW > 0 && biH > 0) {
                frames += ((frameNo, decodeDib(
                  java.util.Arrays.copyOfRange(payload, body, body + size), biW, biH)))
                frameNo += 1
              }
            case _ if id.length == 4 && id.endsWith("dc") =>
              val img =
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
                  payload, body, size))
                catch { case _: java.io.IOException => null }
              if (img != null) { frames += ((frameNo, img)); frameNo += 1 }
            case _ => ()
          }
          val next = body + size + (size % 2) // odd sizes carry a pad byte
          if (next <= o) return // defensive: never stall on a zero advance
          o = next
        }
      }
      try walk(12, math.min(payload.length, 8 + rd32(payload, 4)))
      catch { case scala.util.control.NonFatal(_) => return Nil }
      frames.toSeq
    }
  }

  /** Closed-form synthetic video: pixel (x, y) of frame f of video
    * `id` is `R=(7x+13y+5f+id)%256, G=(3x+5y+7f+2id)%256,
    * B=(11x+17y+19f+3id)%256` — the [[syntheticPng]] formula family
    * extended by the frame index. `mjpeg = false` writes lossless
    * uncompressed DIB frames (oracle-replayable); `true` writes real
    * JPEG frames through `javax.imageio`. */
  def syntheticAvi(
      id: Long, nFrames: Int, w: Int, h: Int, mjpeg: Boolean = false): Array[Byte] = {
    val imgs = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((7L * x + 13L * y + 5L * f + id) % 256L).toInt
          val g = ((3L * x + 5L * y + 7L * f + 2L * id) % 256L).toInt
          val b = ((11L * x + 17L * y + 19L * f + 3L * id) % 256L).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }
    if (mjpeg) {
      val frames = imgs.map { img =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      AviCodec.write(frames, w, h, "MJPG", "MJPG".getBytes("US-ASCII"), compressed = true)
    } else {
      AviCodec.write(imgs.map(AviCodec.dibFrame), w, h, "DIB ",
        Array(0, 0, 0, 0), compressed = false)
    }
  }

  /** Deterministic synthetic AVI with pid-keyed bright blocks — the
    * video-dedup fixture (see [[VideoDedup]] / `q_media_vhash`): the
    * [[syntheticPngBlocks]] pattern per frame, with the bright-cell
    * selection rotated by the frame index (`(cell·7 + pid + f) mod 16
    * < 5`) so the clip has real temporal structure. Lossless DIB
    * frames, so every pixel replays from the closed form. */
  def syntheticAviBlocks(pid: Long, nFrames: Int, w: Int, h: Int): Array[Byte] =
    syntheticAviBlocks(pid, 0, nFrames, w, h)

  /** [[syntheticAviBlocks]] starting at content frame `startFrame` —
    * a TRIMMED copy of the same synthetic cut (file-local frame j
    * carries the content of absolute frame startFrame + j), the
    * fixture shape the offset-tolerant video dedup exists for. */
  def syntheticAviBlocks(
      pid: Long, startFrame: Int, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val imgs = (startFrame until startFrame + nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val cell = (x * 4) / w + 4 * ((y * 4) / h)
          val add = if ((cell * 7 + pid + f) % 16 < 5) 128 else 0
          val r = ((7L * x + 13L * y + 5L * f + pid) % 256L).toInt / 2 + add
          val g = ((3L * x + 5L * y + 7L * f + 2L * pid) % 256L).toInt / 2 + add
          val b = ((11L * x + 17L * y + 19L * f + 3L * pid) % 256L).toInt / 2 + add
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }
    AviCodec.write(imgs.map(AviCodec.dibFrame), w, h, "DIB ",
      Array(0, 0, 0, 0), compressed = false)
  }

  final case class VideoFrameStats(
      media_id: Long,
      frame_no: Int,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      min_luma: Long,
      max_luma: Long)

  private def frameStats(
      mediaId: Long, frameNo: Int,
      img: java.awt.image.BufferedImage): VideoFrameStats = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = 255L; var maxL = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val l = (r * 299L + g * 587L + b * 114L) / 1000L
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        x += 1
      }
      y += 1
    }
    VideoFrameStats(mediaId, frameNo, w, h, sr, sg, sb, minL, maxL)
  }

  /** REAL per-frame video feature extraction: walks each payload's AVI
    * container, decodes every frame (DIB exactly, MJPEG via ImageIO),
    * emits one integer-stat row per sampled frame. Partition-local,
    * payloads never shuffle — the same scale shape as
    * [[extractFeatures]]. Non-AVI payloads yield no rows. */
  def videoFrameStats(
      media: Dataset[MediaRow], stride: Int = 1): Dataset[VideoFrameStats] = {
    implicit val enc = Encoders.product[VideoFrameStats]
    media.flatMap { r =>
      AviCodec.readFrames(r.payload).iterator
        .filter(_._1 % stride == 0)
        .map { case (f, img) => frameStats(r.media_id, f, img) }
    }
  }

  final case class FrameFeatures(media_id: Long, frame_no: Int, value: Double)

  /** Frame sampling: every `stride`-th frame of a (fake-)video payload,
    * one feature row per sampled frame. Frames are fixed-size payload
    * windows (`frameBytes` per frame) — the Spark shape (explode to
    * frame rows, partition-local decode, no payload shuffle) is exactly
    * the real video pipeline's; only the in-frame decode is the
    * deterministic stand-in (byte sum). */
  def sampleFrames(
      media: Dataset[MediaRow],
      frameBytes: Int = 16,
      stride: Int = 2): Dataset[FrameFeatures] = {
    implicit val enc = Encoders.product[FrameFeatures]
    media.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).iterator.map { f =>
        var s = 0L
        var i = f * frameBytes
        val end = i + frameBytes
        while (i < end) { s += (r.payload(i) & 0xff); i += 1 }
        FrameFeatures(r.media_id, f, s.toDouble)
      }
    }
  }
}
