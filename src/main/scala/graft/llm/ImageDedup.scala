package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual-hash near-duplicate detection for image columns — the
  * multimodal analog of [[MinHash]]'s text dedup, the step a
  * LAION-style image corpus runs before training (the reference's
  * pipeline has no image dedup; this extends the curation family the
  * same way the text dedup operators do).
  *
  * The hash is dHash (difference hash): decode → nearest-neighbor
  * resample to a (gw+1)×gh grid with the SAME pinned floor mapping as
  * [[Multimodal.ImageIoResizer]] (`src(x) = x·w / (gw+1)`, integer
  * division) → integer luma `(299R + 587G + 114B) / 1000` → bit
  * `j = y·gw + x` is `luma(x, y) < luma(x+1, y)`. Every step is
  * integer-exact, so the hash of a losslessly-coded (PNG) image is
  * closed-form replayable from its pixel values — `q_media_dhash`
  * recomputes it in DuckDB with no image library. dHash is gradient-
  * based: invariant to uniform brightness shifts and (by the resample)
  * to resolution changes, which is exactly what survives the re-encode
  * /rescale transformations that produce web-corpus duplicates.
  *
  * Candidate generation is banded Hamming LSH over the 64-bit hash
  * split into 4 × 16-bit bands: pairs collide if ANY band matches
  * exactly. Pigeonhole guarantee: a pair within Hamming distance d < 4
  * differs in at most d bands, so at least one band matches — with
  * `maxHamming <= 3` the output is EXACT (all qualifying pairs found),
  * not approximate. Never an all-pairs product.
  *
  * Scale shape: the hash is a partition-local map over the binary
  * column (decode cost stays where the bytes live; no shuffle). The
  * only shuffle keys on (band, key16). Honest 100 TB caveat: a 16-bit
  * band keyspace saturates at web scale — 1B images put ~15k images in
  * every bucket, so candidate pairs go quadratic no matter how good
  * the hash is. The [[nearDuplicates]] `maxBucket` guard (same pattern
  * as [[MinHash.candidatePairs]] / the embedding near-dup) bounds that
  * blowup and reports truncation; past ~10M images, widen the hash
  * (pHash-256) or prefilter by exact content hash before the banded
  * join.
  */
object ImageDedup {

  /** Grid width of the default 64-bit dHash: 8×8 comparison bits from
    * a 9×8 luma grid. */
  val GridW = 8
  val GridH = 8

  /** Per-image dHash as four 16-bit band values
    * `(media_id, b0, b1, b2, b3)` — band k packs bits `j ∈ [16k, 16k+16)`
    * with weight `2^(j mod 16)` (bit j = y·8+x set iff
    * `luma(x,y) < luma(x+1,y)` on the 9×8 resampled grid). Keeping the
    * hash as 4 positive ints (not one signed long) makes the band keys
    * directly joinable and the oracle replay sign-free. Undecodable
    * payloads are dropped (a corrupt image has no perceptual identity;
    * counting them is [[Multimodal]] telemetry's job). Partition-local
    * — no shuffle. */
  def dHash(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: java.io.IOException => null }
        if (img == null) Iterator.empty
        else {
          val bands = dHashBands(img)
          Iterator((r.media_id, bands(0), bands(1), bands(2), bands(3)))
        }
      }
    }.toDF("media_id", "b0", "b1", "b2", "b3")
  }

  /** The per-image hash kernel (shared with [[VideoDedup]]'s per-frame
    * hashing): pinned floor resample to the (GridW+1)×GridH luma grid,
    * 64 gradient bits packed as 4×16-bit band values. */
  private[llm] def dHashBands(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth.toLong
    val h = img.getHeight.toLong
    val luma = Array.ofDim[Long](GridH, GridW + 1)
    var gy = 0
    while (gy < GridH) {
      val sy = ((gy * h) / GridH).toInt
      var gx = 0
      while (gx <= GridW) {
        val sx = ((gx * w) / (GridW + 1)).toInt
        val rgb = img.getRGB(sx, sy)
        val rr = (rgb >> 16) & 0xff
        val gg = (rgb >> 8) & 0xff
        val bb = rgb & 0xff
        luma(gy)(gx) = (rr * 299L + gg * 587L + bb * 114L) / 1000L
        gx += 1
      }
      gy += 1
    }
    val bands = new Array[Int](4)
    var j = 0
    while (j < GridW * GridH) {
      val x = j % GridW
      val y = j / GridW
      if (luma(y)(x) < luma(y)(x + 1)) bands(j / 16) |= 1 << (j % 16)
      j += 1
    }
    bands
  }

  /** Near-duplicate pairs `(media_id_a, media_id_b, hamming)` with
    * `media_id_a < media_id_b` and `hamming <= maxHamming`, via the
    * banded join over a [[dHash]] table. EXACT for `maxHamming <= 3`
    * (4-band pigeonhole; see object doc); for larger thresholds the
    * band collision is a recall-lossy prefilter and the require below
    * refuses rather than silently under-reporting. `maxBucket` drops
    * band buckets larger than the cap before pairing (the quadratic-
    * blowup guard; at the default the corpus sizes this library is
    * soak-tested at never truncate). */
  def nearDuplicates(
      hashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicates(hashes, maxHamming, maxBucket)

  /** Keep/drop decision per image: connected components over the
    * [[nearDuplicates]] pairs (transitive closure — A≈B≈C is ONE
    * duplicate class even when A and C's hashes differ by more than
    * the threshold), smallest id per cluster kept. Same
    * [[DedupClusters.keepTable]] machinery as the text dedup journey;
    * the id universe is the [[dHash]] table, so undecodable images
    * (which have no perceptual identity) get no row. */
  def keepTable(hashes: DataFrame, pairs: DataFrame): DataFrame =
    DedupClusters.keepTable(hashes, pairs, "media_id", "media_id_a", "media_id_b")

  // ----- DuckDB mirror fragments (used by the oracle SQL) -----

  /** The dHash band values recomputed from a closed-form pixel
    * formula: given a relation `(media_id, w, h)` named `dims` and SQL
    * expressions for the integer channel values at source pixel
    * (sx, sy) of image `media_id` (w/h also in scope), emits CTEs
    * ending in `hx(media_id, b0, b1, b2, b3)` — the same pinned
    * resample, luma, bit order and band packing as [[dHash]]. */
  def hashSql(rExpr: String, gExpr: String, bExpr: String): String =
    s"""g AS (
       |  SELECT d.media_id, d.w, d.h, gs.gx, gs2.gy,
       |         CAST((gs.gx * d.w) // ${GridW + 1} AS BIGINT) AS sx,
       |         CAST((gs2.gy * d.h) // $GridH AS BIGINT) AS sy
       |  FROM dims d
       |  CROSS JOIN (SELECT unnest(generate_series(0, $GridW)) AS gx) gs
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${GridH - 1})) AS gy) gs2),
       |lum AS (
       |  SELECT media_id, gx, gy,
       |         (($rExpr) * 299 + ($gExpr) * 587 + ($bExpr) * 114) // 1000 AS l
       |  FROM g),
       |bits AS (
       |  SELECT a.media_id, a.gy * $GridW + a.gx AS j,
       |         CASE WHEN a.l < b.l THEN 1 ELSE 0 END AS bit
       |  FROM lum a JOIN lum b
       |    ON a.media_id = b.media_id AND a.gy = b.gy AND b.gx = a.gx + 1
       |  WHERE a.gx < $GridW),
       |hx AS (
       |  SELECT media_id,
       |         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
       |         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
       |         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
       |         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
       |  FROM bits GROUP BY media_id)""".stripMargin
}
