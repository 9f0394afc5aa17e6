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
  * [[Decoder]]; this container has no media libraries, so the default
  * is [[DeterministicFakeDecoder]], a clearly-marked stand-in that
  * derives a stable feature vector from the payload bytes. Swapping in
  * a real decoder changes zero lines of pipeline code.
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
