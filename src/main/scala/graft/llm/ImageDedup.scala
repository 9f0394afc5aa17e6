package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual-hash near-duplicate detection for image columns — the
  * multimodal analog of [[MinHash]]'s text dedup, the step a
  * LAION-style image corpus runs before training (the reference's
  * pipeline has no image dedup; this extends the curation family the
  * same way the text dedup operators do).
  *
  * The hash is dHash (difference hash) with AREA-AVERAGED cells:
  * decode → assign every source pixel to a (gw+1)×gh grid cell
  * (`cell(x) = x·(gw+1) / w`, integer division — the inverse of
  * [[Multimodal.ImageIoResizer]]'s floor mapping) → per-cell integer
  * luma SUM + pixel COUNT → bit `j = y·gw + x` compares adjacent cell
  * MEANS division-free by cross-multiplication
  * (`S(x,y)·N(x+1,y) < S(x+1,y)·N(x,y)`). Every step is
  * integer-exact, so the hash of a losslessly-coded (PNG) image is
  * closed-form replayable from its pixel values — `q_media_dhash`
  * recomputes it in DuckDB with no image library. dHash is gradient-
  * based: invariant to uniform brightness shifts (+c adds c·N to S,
  * which cancels in the cross-multiplied compare) and, by the
  * area-averaged cells, robust to resolution changes AND lossy
  * re-encodes (a point-sampled variant measured ~20 flipped bits per
  * frame under MJPEG; averaging absorbs the artifacts — see
  * VideoDedupSpec) — exactly the transformations that produce
  * web-corpus duplicates.
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
  * the hash is. The [[nearDuplicates]] `maxBucket` guard bounds that
  * blowup by dropping over-cap buckets — SILENTLY, like any per-row
  * filter: audit a production cap with [[bucketCost]] (the
  * [[MinHash.bandCostTable]] pattern) before trusting the exactness
  * statement, because qualifying pairs whose every matching band sits
  * in a dropped bucket simply vanish. Past ~10M images, widen the hash
  * ([[dHashWide]], 256-bit / 32-bit band keys) or prefilter by exact
  * content hash before the banded join.
  */
object ImageDedup {

  /** Grid width of the default 64-bit dHash: 8×8 comparison bits from
    * a 9×8 luma grid. */
  val GridW = 8
  val GridH = 8

  /** Per-image dHash as four 16-bit band values
    * `(media_id, b0, b1, b2, b3)` — band k packs bits `j ∈ [16k, 16k+16)`
    * with weight `2^(j mod 16)` (bit j = y·8+x set iff the mean luma of
    * cell (x,y) is below cell (x+1,y) on the 9×8 area-averaged grid,
    * compared by cross-multiplication). Keeping the
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
    * hashing): AREA-AVERAGED cell luma on the (GridW+1)×GridH grid —
    * source pixel (x, y) belongs to cell `((x·9)/w, (y·8)/h)` (integer
    * division), each cell carries its luma SUM and pixel COUNT, and
    * bit j compares adjacent cell MEANS by cross-multiplication
    * (`S₁·N₂ < S₂·N₁` — division-free, so the hash stays
    * integer-exact and DuckDB-replayable). Averaging over the whole
    * cell, rather than point-sampling one pixel per cell, is what
    * production perceptual hashes do — it is what absorbs JPEG
    * artifacts and resampling noise (VideoDedupSpec measures an MJPEG
    * re-encode staying within the near-dup threshold; the
    * point-sampled variant drifted ~20 bits/frame). Uniform
    * brightness +c shifts S by c·N, which cancels in the
    * cross-multiplied compare, so brightness invariance is preserved
    * exactly. */
  private[graft] def dHashBands(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val s = Array.ofDim[Long](GridH, GridW + 1)
    val n = Array.ofDim[Long](GridH, GridW + 1)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * GridH / h).toInt
      var x = 0
      while (x < w) {
        val cx = (x.toLong * (GridW + 1) / w).toInt
        val rgb = img.getRGB(x, y)
        val rr = (rgb >> 16) & 0xff
        val gg = (rgb >> 8) & 0xff
        val bb = rgb & 0xff
        s(cy)(cx) += (rr * 299L + gg * 587L + bb * 114L) / 1000L
        n(cy)(cx) += 1L
        x += 1
      }
      y += 1
    }
    val bands = new Array[Int](4)
    var j = 0
    while (j < GridW * GridH) {
      val x = j % GridW
      val y2 = j / GridW
      if (s(y2)(x) * n(y2)(x + 1) < s(y2)(x + 1) * n(y2)(x)) bands(j / 16) |= 1 << (j % 16)
      j += 1
    }
    bands
  }

  /** Grid width of the wide 256-bit dHash: 16×16 comparison bits from
    * a 17×16 luma grid — the post-saturation remedy the object doc
    * names: 8 × 32-bit bands give a 2^32 keyspace per band (vs 2^16),
    * pushing the bucket-saturation corpus size from ~10^5 to ~10^9
    * images, and the 8-band pigeonhole widens exactness to
    * Hamming ≤ 7. */
  val WideGridW = 16
  val WideGridH = 16

  /** Per-image 256-bit wide dHash as eight 32-bit band values
    * `(media_id, w0..w7)` (kept as BIGINT so band keys stay
    * sign-free) — same area-averaged cells and cross-multiplied mean
    * compares as [[dHash]], on the 17×16 grid; bit `j = y·16 + x`,
    * band k packs bits `[32k, 32k+32)` with weight `2^(j mod 32)`.
    * Cells that receive no source pixel (images narrower than the
    * grid) carry S=0, N=0, and the strict compare makes both adjacent
    * bits 0 — pinned so the closed-form replay agrees. Undecodable
    * payloads are dropped. Partition-local — no shuffle. */
  def dHashWide(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: java.io.IOException => null }
        if (img == null) Iterator.empty
        else {
          val b = dHashWideBands(img)
          Iterator((r.media_id, b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7)))
        }
      }
    }.toDF("media_id" +: BandedHamming.WideBands: _*)
  }

  private[graft] def dHashWideBands(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val s = Array.ofDim[Long](WideGridH, WideGridW + 1)
    val n = Array.ofDim[Long](WideGridH, WideGridW + 1)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * WideGridH / h).toInt
      var x = 0
      while (x < w) {
        val cx = (x.toLong * (WideGridW + 1) / w).toInt
        val rgb = img.getRGB(x, y)
        val rr = (rgb >> 16) & 0xff
        val gg = (rgb >> 8) & 0xff
        val bb = rgb & 0xff
        s(cy)(cx) += (rr * 299L + gg * 587L + bb * 114L) / 1000L
        n(cy)(cx) += 1L
        x += 1
      }
      y += 1
    }
    val bands = new Array[Long](8)
    var j = 0
    while (j < WideGridW * WideGridH) {
      val x = j % WideGridW
      val y2 = j / WideGridW
      if (s(y2)(x) * n(y2)(x + 1) < s(y2)(x + 1) * n(y2)(x))
        bands(j / 32) |= 1L << (j % 32)
      j += 1
    }
    bands
  }

  /** Near-duplicate pairs over a [[dHashWide]] table — EXACT for
    * `maxHamming <= 7` (8-band pigeonhole), band keys in a 2^32
    * space. */
  def nearDuplicatesWide(
      hashes: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicatesOver(hashes, BandedHamming.WideBands,
      maxHamming, maxBucket)

  /** [[BandedHamming.bucketCostOver]] for the wide layout. */
  def bucketCostWide(hashes: DataFrame, maxBucket: Int): DataFrame =
    BandedHamming.bucketCostOver(hashes, BandedHamming.WideBands, maxBucket)

  /** Near-duplicate pairs `(media_id_a, media_id_b, hamming)` with
    * `media_id_a < media_id_b` and `hamming <= maxHamming`, via the
    * banded join over a [[dHash]] table. EXACT for `maxHamming <= 3`
    * (4-band pigeonhole; see object doc); for larger thresholds the
    * band collision is a recall-lossy prefilter and the require below
    * refuses rather than silently under-reporting. `maxBucket` drops
    * band buckets larger than the cap before pairing (the quadratic-
    * blowup guard; at the default the corpus sizes this library is
    * soak-tested at never truncate) — the drop is silent; audit the
    * cap with [[bucketCost]]. */
  def nearDuplicates(
      hashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicates(hashes, maxHamming, maxBucket)

  /** Truncation telemetry for a [[nearDuplicates]] cap on a [[dHash]]
    * table — see [[BandedHamming.bucketCost]]: one row of
    * (candidate_pairs, capped_pairs, capped_buckets, max_bucket_sz);
    * `capped_pairs > 0` means the cap is deleting candidate pairs and
    * the Hamming-≤3 exactness guarantee no longer holds in full. */
  def bucketCost(hashes: DataFrame, maxBucket: Int): DataFrame =
    BandedHamming.bucketCost(hashes, maxBucket)

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
    * ending in `hx(media_id, b0, b1, b2, b3)` — the same cell
    * assignment, luma sums, cross-multiplied mean compare, bit order
    * and band packing as [[dHash]]. Walks EVERY source pixel (the
    * area average needs them all). */
  def hashSql(rExpr: String, gExpr: String, bExpr: String): String =
    s"""g AS (
       |  SELECT d.media_id, d.w, d.h,
       |         CAST(xs.sx AS BIGINT) AS sx, CAST(ys.sy AS BIGINT) AS sy
       |  FROM dims d
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(w) FROM dims) - 1)) AS sx) xs
       |    ON xs.sx < d.w
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(h) FROM dims) - 1)) AS sy) ys
       |    ON ys.sy < d.h),
       |cells AS (
       |  SELECT media_id, (sx * ${GridW + 1}) // w AS cx, (sy * $GridH) // h AS cy,
       |         sum((($rExpr) * 299 + ($gExpr) * 587 + ($bExpr) * 114) // 1000) AS s,
       |         count(*) AS n
       |  FROM g GROUP BY media_id, (sx * ${GridW + 1}) // w, (sy * $GridH) // h),
       |bits AS (
       |  SELECT a.media_id, a.cy * $GridW + a.cx AS j,
       |         CASE WHEN a.s * b.n < b.s * a.n THEN 1 ELSE 0 END AS bit
       |  FROM cells a JOIN cells b
       |    ON a.media_id = b.media_id AND a.cy = b.cy AND b.cx = a.cx + 1
       |  WHERE a.cx < $GridW),
       |hx AS (
       |  SELECT media_id,
       |         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
       |         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
       |         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
       |         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
       |  FROM bits GROUP BY media_id)""".stripMargin

  /** The WIDE (256-bit) dHash bands recomputed from a closed-form
    * pixel formula — the [[hashSql]] twin on the 17×16 grid, ending
    * in `hxw(media_id, w0..w7)` (BIGINT band values, bit j = y·16+x,
    * band k = bits [32k, 32k+32)). Empty cells (images narrower than
    * the grid) simply have no `cellsw` row, and the inner join in
    * `bitsw` then emits no bit — the same 0 the kernel's strict
    * compare produces on S=0/N=0 cells. */
  def hashWideSql(rExpr: String, gExpr: String, bExpr: String): String =
    s"""g AS (
       |  SELECT d.media_id, d.w, d.h,
       |         CAST(xs.sx AS BIGINT) AS sx, CAST(ys.sy AS BIGINT) AS sy
       |  FROM dims d
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(w) FROM dims) - 1)) AS sx) xs
       |    ON xs.sx < d.w
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(h) FROM dims) - 1)) AS sy) ys
       |    ON ys.sy < d.h),
       |cellsw AS (
       |  SELECT media_id, (sx * ${WideGridW + 1}) // w AS cx, (sy * $WideGridH) // h AS cy,
       |         sum((($rExpr) * 299 + ($gExpr) * 587 + ($bExpr) * 114) // 1000) AS s,
       |         count(*) AS n
       |  FROM g GROUP BY media_id, (sx * ${WideGridW + 1}) // w, (sy * $WideGridH) // h),
       |bitsw AS (
       |  SELECT a.media_id, a.cy * $WideGridW + a.cx AS j,
       |         CASE WHEN a.s * b.n < b.s * a.n THEN 1 ELSE 0 END AS bit
       |  FROM cellsw a JOIN cellsw b
       |    ON a.media_id = b.media_id AND a.cy = b.cy AND b.cx = a.cx + 1
       |  WHERE a.cx < $WideGridW),
       |hxw AS (
       |  -- LEFT JOIN from dims: an image too narrow to populate any
       |  -- adjacent cell pair has NO bitsw row but still hashes to
       |  -- all-zero bands in the kernel — emit its zero row here too
       |  SELECT d.media_id,
       |${(0 until 8).map(k =>
          s"    CAST(coalesce(sum(CASE WHEN bw.j // 32 = $k THEN " +
            s"bw.bit * (CAST(1 AS BIGINT) << (bw.j % 32)) ELSE 0 END), 0) AS BIGINT) AS w$k")
          .mkString(",\n")}
       |  FROM dims d LEFT JOIN bitsw bw ON bw.media_id = d.media_id
       |  GROUP BY d.media_id)""".stripMargin
}
