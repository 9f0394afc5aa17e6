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
}
