package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate detection for video columns — the last
  * modality of the dedup family (text → [[MinHash]], embeddings →
  * [[Similarity]], images → [[ImageDedup]], audio → [[AudioDedup]]).
  * A clip is fingerprinted as the SEQUENCE of its frames' dHashes
  * ([[ImageDedup.dHashBands]], one 64-bit hash per frame), and two
  * clips are near-duplicates when they have the same frame count and
  * EVERY aligned frame pair is within `maxPerFrameHamming` — the
  * re-encoded/re-scaled-same-cut duplicate class.
  *
  * Exactness carries over from the single-image guarantee: a
  * qualifying pair has, in EVERY frame, at least one of the 4 bands
  * untouched (per-frame Hamming ≤ 3 < 4 bands), so candidate
  * generation on (frame_no, band, key16) — which only needs SOME
  * frame to collide — finds a superset; the exact per-frame verify
  * then keeps precisely the qualifying pairs. Never an all-pairs
  * product.
  *
  * Scale shape: frame decode is partition-local (the AVI payload
  * never shuffles; one container walk per clip); candidate
  * generation shuffles on (frame_no, band, key16) — the frame axis
  * widens the keyspace 4·nFrames× over the single-image join, which
  * DELAYS the 16-bit band-saturation bound [[ImageDedup]] documents;
  * the `maxBucket` guard still bounds any single hot key. The verify
  * joins the two clips' frame-hash rows on frame_no — per-pair work
  * is O(nFrames), never O(pixels).
  */
object VideoDedup {

  /** Per-frame dHash table `(media_id, frame_no, b0, b1, b2, b3)` via
    * the REAL RIFF/AVI walk ([[Multimodal.AviCodec.readFrames]]: DIB
    * frames decode losslessly; MJPEG frames through javax.imageio).
    * Unparseable payloads and clips with no decodable frames are
    * dropped. Partition-local — no shuffle. */
  def frameHashes(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        Multimodal.AviCodec.readFrames(r.payload).iterator.map { case (f, img) =>
          val b = ImageDedup.dHashBands(img)
          (r.media_id, f, b(0), b(1), b(2), b(3))
        }
      }
    }.toDF("media_id", "frame_no", "b0", "b1", "b2", "b3")
  }

  /** Near-duplicate clip pairs
    * `(media_id_a, media_id_b, n_frames, max_frame_hamming)` with
    * `media_id_a < media_id_b`: same frame count, every aligned frame
    * within `maxPerFrameHamming`. EXACT for thresholds ≤ 3 (see
    * object doc); `maxBucket` caps any hot (frame, band, key) bucket
    * before pairing. */
  def nearDuplicates(
      frames: DataFrame,
      maxPerFrameHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    require(maxPerFrameHamming >= 0 && maxPerFrameHamming <= 3,
      s"maxPerFrameHamming must be in 0..3 for the 4-band exactness guarantee, " +
        s"got $maxPerFrameHamming")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    val h = frames.select(col("media_id") +: col("frame_no") +: bandCols.map(col): _*)
    val counts = h.groupBy(col("media_id")).agg(count(lit(1)).as("__nf"))
    val keyed = h.select(col("media_id"), col("frame_no"),
      explode(array(bandCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("band"), col(c).as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("frame_no"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val guarded = BandedHamming.dropOverCap(keyed,
      Seq("frame_no", "band", "key"), maxBucket)
    val cand = guarded.as("l")
      .join(guarded.as("r"),
        col("l.frame_no") === col("r.frame_no") && col("l.band") === col("r.band") &&
          col("l.key") === col("r.key") && col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("media_id_a"), col("r.media_id").as("media_id_b"))
      .distinct()
    val ham = bandCols.map(c =>
      bit_count(col(s"ha.$c").bitwiseXOR(col(s"hb.$c")))).reduce(_ + _)
    val perFrame = cand
      .join(h.as("ha"), col("media_id_a") === col("ha.media_id"))
      .join(h.as("hb"),
        col("media_id_b") === col("hb.media_id") &&
          col("ha.frame_no") === col("hb.frame_no"))
      .select(col("media_id_a"), col("media_id_b"), ham.cast("long").as("__fh"))
    perFrame.groupBy(col("media_id_a"), col("media_id_b"))
      .agg(count(lit(1)).as("__common"), max(col("__fh")).as("max_frame_hamming"))
      .join(counts.select(col("media_id").as("media_id_a"), col("__nf").as("__na")),
        Seq("media_id_a"))
      .join(counts.select(col("media_id").as("media_id_b"), col("__nf").as("__nb")),
        Seq("media_id_b"))
      .filter(col("__common") === col("__na") && col("__common") === col("__nb") &&
        col("max_frame_hamming") <= maxPerFrameHamming)
      .select(col("media_id_a"), col("media_id_b"),
        col("__common").as("n_frames"), col("max_frame_hamming"))
  }

  /** OFFSET-TOLERANT near-duplicate clip pairs — the trimmed-copy
    * duplicate class [[nearDuplicates]]'s same-frame-count contract
    * misses: a clip cut from the same source a few frames later is
    * the SAME cut, just shifted. Candidates come from (band, key)
    * collisions across ANY frame pair, each carrying its alignment
    * `offset = frame_no_a − frame_no_b`; the verify then aligns the
    * two clips under that offset and keeps pairs whose overlapping
    * window has ≥ `minOverlap` frames, EVERY one within
    * `maxPerFrameHamming`.
    *
    * Exactness carries over: for a qualifying (a, b, offset) every
    * overlapping aligned frame pair has Hamming ≤ 3, so each leaves
    * ≥ 1 of the 4 bands untouched — SOME collision carries exactly
    * that offset, the candidate superset contains it, and the aligned
    * verify keeps precisely the qualifying triples.
    *
    * Scale shape: dropping frame_no from the collision key widens
    * buckets nFrames× versus the aligned join (the price of offset
    * tolerance — the [[ImageDedup]] saturation bound arrives
    * nFrames× sooner; `maxBucket` still bounds any hot key), and the
    * verify joins the two clips' frame rows under the offset equality
    * — per-candidate work O(overlap), never O(pixels).
    *
    * Output: (media_id_a, media_id_b, offset, n_overlap,
    * max_frame_hamming) with media_id_a < media_id_b; one row per
    * qualifying alignment (a pair repeating at two offsets — e.g. a
    * static-screen clip — reports both). */
  def nearDuplicatesAligned(
      frames: DataFrame,
      maxPerFrameHamming: Int = 3,
      minOverlap: Int = 2,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicatesAligned(frames, maxPerFrameHamming, minOverlap, maxBucket)

  /** WIDE per-frame hashes: [[ImageDedup.dHashWide]]'s 17×16-grid
    * 256-bit hash per frame, `(media_id, frame_no, w0..w7)` — the
    * layout the offset-tolerant join wants at scale: dropping
    * frame_no from its collision key widens buckets nFrames×, so the
    * 16-bit band keyspace saturates nFrames× sooner than the
    * still-image bound, and the 2^32-per-band wide layout is the
    * remedy (plus per-frame exactness to Hamming ≤ 7 from the 8-band
    * pigeonhole). Frames need ≥ 17×16 px for every grid cell to own a
    * pixel. Partition-local — the AVI payload never shuffles. */
  def frameHashesWide(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        Multimodal.AviCodec.readFrames(r.payload).iterator.map { case (f, img) =>
          val b = ImageDedup.dHashWideBands(img)
          (r.media_id, f, b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7))
        }
      }
    }.toDF("media_id" +: "frame_no" +: BandedHamming.WideBands: _*)
  }

  /** Offset-tolerant near-duplicates over a [[frameHashesWide]] table
    * — exact per overlapping window for per-frame Hamming ≤ 7, band
    * keys in a 2^32 space. */
  def nearDuplicatesAlignedWide(
      frames: DataFrame,
      maxPerFrameHamming: Int = 7,
      minOverlap: Int = 2,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicatesAlignedOver(frames, BandedHamming.WideBands,
      maxPerFrameHamming, minOverlap, maxBucket)

  /** Keep/drop decision per clip over [[nearDuplicates]] pairs — see
    * [[ImageDedup.keepTable]] (same clustering machinery; the id
    * universe is the distinct clip set of the frame-hash table). */
  def keepTable(frames: DataFrame, pairs: DataFrame): DataFrame =
    DedupClusters.keepTable(frames.select(col("media_id")).distinct(), pairs,
      "media_id", "media_id_a", "media_id_b")

  /** Keep/drop decision per clip over [[nearDuplicatesAligned]] pairs
    * — ANY qualifying alignment links two clips into one duplicate
    * class (a full cut and both its trims collapse together even when
    * the trims only align with each other at a different offset), and
    * the smallest id per transitive class is kept. Same
    * [[DedupClusters.keepTable]] machinery as every dedup journey
    * here; the id universe is the frame-hash table's clip set. */
  def keepTableAligned(frames: DataFrame, alignedPairs: DataFrame): DataFrame =
    DedupClusters.keepTable(frames.select(col("media_id")).distinct(),
      alignedPairs.select(col("media_id_a"), col("media_id_b")).distinct(),
      "media_id", "media_id_a", "media_id_b")

  /** Truncation telemetry for a [[nearDuplicates]] cap on a
    * [[frameHashes]] table — the video analog of
    * [[BandedHamming.bucketCost]], keyed on (frame_no, band, key) like
    * the production join: one row of (candidate_pairs, capped_pairs,
    * capped_buckets, max_bucket_sz). The guard's drop is silent;
    * `capped_pairs > 0` voids the per-frame exactness statement for
    * pairs living only in dropped buckets. */
  def bucketCost(frames: DataFrame, maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    frames.select(col("media_id"), col("frame_no"),
      explode(array(bandCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("band"), col(c).as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("frame_no"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .groupBy(col("frame_no"), col("band"), col("key"))
      .agg(count(lit(1)).as("sz"))
      .agg(
        coalesce(sum(expr("(sz * (sz - 1)) div 2")), lit(0L)).as("candidate_pairs"),
        coalesce(sum(when(col("sz") > maxBucket, expr("(sz * (sz - 1)) div 2"))
          .otherwise(lit(0L))), lit(0L)).as("capped_pairs"),
        coalesce(sum(when(col("sz") > maxBucket, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("capped_buckets"),
        coalesce(max(col("sz")), lit(0L)).as("max_bucket_sz"))
  }

  // ----- DuckDB mirror fragment (used by the oracle SQL) -----

  /** Per-frame dHash bands recomputed from a closed-form pixel
    * formula: given a relation `(media_id, w, h)` named `dims`, a
    * frame count, and channel expressions over (sx, sy, f, media_id,
    * w, h), emits CTEs ending in `fhx(media_id, f, b0, b1, b2, b3)` —
    * the same area-averaged cells and cross-multiplied mean compares
    * as [[ImageDedup.dHashBands]], per frame. */
  def hashSql(nFrames: Int, rExpr: String, gExpr: String, bExpr: String): String =
    s"""g AS (
       |  SELECT d.media_id, d.w, d.h, fr.f,
       |         CAST(xs.sx AS BIGINT) AS sx, CAST(ys.sy AS BIGINT) AS sy
       |  FROM dims d
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${nFrames - 1})) AS f) fr
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(w) FROM dims) - 1)) AS sx) xs
       |    ON xs.sx < d.w
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(h) FROM dims) - 1)) AS sy) ys
       |    ON ys.sy < d.h),
       |cells AS (
       |  SELECT media_id, f,
       |         (sx * ${ImageDedup.GridW + 1}) // w AS cx, (sy * ${ImageDedup.GridH}) // h AS cy,
       |         sum((($rExpr) * 299 + ($gExpr) * 587 + ($bExpr) * 114) // 1000) AS s,
       |         count(*) AS n
       |  FROM g GROUP BY media_id, f,
       |           (sx * ${ImageDedup.GridW + 1}) // w, (sy * ${ImageDedup.GridH}) // h),
       |bits AS (
       |  SELECT a.media_id, a.f, a.cy * ${ImageDedup.GridW} + a.cx AS j,
       |         CASE WHEN a.s * b.n < b.s * a.n THEN 1 ELSE 0 END AS bit
       |  FROM cells a JOIN cells b
       |    ON a.media_id = b.media_id AND a.f = b.f AND a.cy = b.cy
       |       AND b.cx = a.cx + 1
       |  WHERE a.cx < ${ImageDedup.GridW}),
       |fhx AS (
       |  SELECT media_id, f,
       |         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
       |         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
       |         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
       |         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
       |  FROM bits GROUP BY media_id, f)""".stripMargin
}
