package graft.streaming

import graft.llm.{AudioDedup, ImageDedup, Multimodal, PHashDct}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Streaming perceptual deduplication for media columns — the
  * continuous-ingest form of [[graft.llm.ImageDedup]] /
  * [[graft.llm.AudioDedup]] / [[graft.llm.VideoDedup]], completing the
  * streaming×multimodal intersection the same way [[StreamingDedup]]
  * does for text.
  *
  * The key is the PERCEPTUAL hash (not a byte hash), so a re-encoded /
  * re-leveled copy arriving later in the stream deduplicates against
  * the original even when the payload bytes differ — as long as the
  * hashes are bit-equal. Bounded state comes from
  * `dropDuplicatesWithinWatermark` on the hash: exactly the
  * fingerprints inside the lateness horizon are retained. Hamming>0
  * near-duplicates are OUT of scope in-flight by design — banded LSH
  * needs a corpus-side join, so (exactly like the text family, where
  * MinHash/LSH runs in batch behind [[StreamingDedup]]'s exact pass)
  * the batch `nearDuplicates`/`keepTable` journey handles cross-copy
  * drift and cross-horizon duplicates.
  *
  * Scale shape: decode is a stateless partition-local map (payload
  * bytes never shuffle and never enter state — only the 4×16-bit hash
  * and the event time do); the dedup state is keyed on the hash, so it
  * routes through whatever state store [[StateBackends]] scopes in —
  * RocksDB for unbounded keyspaces. */
object StreamingMediaDedup {

  /** A media event on the stream: [[Multimodal.MediaRow]] plus
    * micros-since-epoch event time. */
  final case class MediaEvent(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      ts: Long)

  /** Internal hashed-event row (public: Dataset encoders generate
    * bytecode that must construct it). */
  final case class Hashed(
      media_id: Long, ts: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Perceptual-dedup an image stream: first arrival of each dHash
    * wins inside the watermark horizon; undecodable payloads are
    * dropped (no perceptual identity). Output: (media_id, b0..b3). */
  def imageDedupStream(
      media: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    dedupStream(media, horizon) { e =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(e.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) None
      else {
        val b = ImageDedup.dHashBands(img)
        Some(Hashed(e.media_id, e.ts, b(0), b(1), b(2), b(3)))
      }
    }

  /** [[imageDedupStream]] on the DCT pHash ([[PHashDct]]) instead of
    * dHash — first arrival of each frequency-domain hash wins, so
    * brightness/contrast-edited re-posts of the same image
    * deduplicate in-flight (the invariances the gradient hash lacks). */
  def imagePHashDedupStream(
      media: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    dedupStream(media, horizon) { e =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(e.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) None
      else {
        val b = PHashDct.hashBands(img)
        Some(Hashed(e.media_id, e.ts, b(0), b(1), b(2), b(3)))
      }
    }

  /** Perceptual-dedup an audio stream on the gain-invariant envelope
    * hash ([[AudioDedup.envelopeHash]] semantics). */
  def audioDedupStream(
      media: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    dedupStream(media, horizon) { e =>
      AudioDedup.envelopeBandsOf(e.payload).map(b =>
        Hashed(e.media_id, e.ts, b(0), b(1), b(2), b(3)))
    }

  private def dedupStream(media: DataFrame, horizon: String)(
      hash: MediaEvent => Option[Hashed]): DataFrame = {
    implicit val inEnc = Encoders.product[MediaEvent]
    implicit val outEnc = Encoders.product[Hashed]
    media.as[MediaEvent]
      .mapPartitions(_.flatMap(hash(_)))
      .withColumn("__event_time", timestamp_micros(col("ts")))
      .withWatermark("__event_time", horizon)
      .dropDuplicatesWithinWatermark("b0", "b1", "b2", "b3")
      .select(col("media_id"), col("b0"), col("b1"), col("b2"), col("b3"))
  }
}
