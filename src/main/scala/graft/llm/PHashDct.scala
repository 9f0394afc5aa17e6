package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** DCT perceptual hash (pHash) — the frequency-domain member of the
  * image-dedup family (dHash is gradient-based; pHash is what the
  * LAION-scale dedup pipelines ran: robust to blur and to global
  * luma/contrast changes because bits compare low-frequency DCT
  * coefficients to their own median). Classic recipe (Zauner 2010,
  * "Implementation and Benchmarking of Perceptual Image Hash
  * Functions"), pinned here so a DuckDB oracle replays every bit:
  *
  *   1. area-averaged 32×32 luma grid (`cell(x) = x·32/w`, integer
  *      division — the [[ImageDedup.dHashBands]] cell rule), cell
  *      value = FLOOR(luma_sum / pixel_count), 0 for empty cells —
  *      integer-exact, no resampling library;
  *   2. 2-D DCT-II restricted to the 8×8 lowest frequencies, with the
  *      basis QUANTIZED to integers: `q(u, x) = round(16384 ·
  *      cos((2x+1)·u·π/64))` — the [[basisQ]] table is the single
  *      source of truth, embedded verbatim into the oracle SQL, so
  *      both engines multiply the SAME integers and the coefficient
  *      `F(u,v) = Σₓ Σᵧ q(u,x)·q(v,y)·m(x,y)` is exact BIGINT
  *      arithmetic (|F| ≤ 16384²·255·1024 < 2^63);
  *   3. bit `j = v·8 + u` is `F(u,v) > median`, where the median is
  *      pinned as the 32nd-smallest (0-indexed 31) of the 63 non-DC
  *      coefficients and the DC bit (0,0) is pinned 0;
  *   4. 64 bits pack into the 4 × 16-bit band layout
  *      ([[BandedHamming.NarrowBands]]) — same candidate join, same
  *      pigeonhole exactness for Hamming ≤ 3, same `maxBucket`
  *      telemetry.
  *
  * Why median-compare buys invariance: a global contrast scale k > 0
  * multiplies every coefficient AND their median by k, preserving
  * every comparison; a uniform brightness shift lands (almost)
  * entirely in the DC coefficient, which no bit uses. Both are exact
  * only up to the floor/quantization steps, so the specs assert
  * small-Hamming, not bit-identity, under those edits.
  *
  * Scale shape: identical to [[ImageDedup]] — the hash is a
  * partition-local map over the binary column (the 8×32-long basis
  * table is a constant on every executor); the only shuffle keys on
  * (band, key16).
  */
object PHashDct {

  val Grid = 32
  val Freq = 8
  val Scale = 16384L

  /** The quantized DCT-II basis: basisQ(u)(x) = round(16384 ·
    * cos((2x+1)·u·π/64)) for u ∈ 0..7, x ∈ 0..31. The SINGLE source
    * of truth — [[basisSqlRows]] serializes exactly these values into
    * the oracle. */
  val basisQ: Array[Array[Long]] = Array.tabulate(Freq, Grid) { (u, x) =>
    math.round(Scale * math.cos((2 * x + 1) * u * math.Pi / (2 * Grid)))
  }

  /** `(u, x, q)` VALUES rows of [[basisQ]] for the oracle CTE. */
  def basisSqlRows: String =
    (for { u <- 0 until Freq; x <- 0 until Grid }
      yield s"($u, $x, ${basisQ(u)(x)})").mkString(", ")

  /** Per-image pHash as four 16-bit band values (media_id, b0..b3).
    * Undecodable payloads are dropped. Partition-local — no shuffle. */
  def hash(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: java.io.IOException => null }
        if (img == null) Iterator.empty
        else {
          val b = hashBands(img)
          Iterator((r.media_id, b(0), b(1), b(2), b(3)))
        }
      }
    }.toDF("media_id", "b0", "b1", "b2", "b3")
  }

  private[graft] def hashBands(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val s = Array.ofDim[Long](Grid, Grid)
    val n = Array.ofDim[Long](Grid, Grid)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * Grid / h).toInt
      var x = 0
      while (x < w) {
        val cx = (x.toLong * Grid / w).toInt
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
    // floor cell means (0 for empty cells) — the pinned grid value
    val m = Array.ofDim[Long](Grid, Grid)
    var cy = 0
    while (cy < Grid) {
      var cx = 0
      while (cx < Grid) {
        m(cy)(cx) = if (n(cy)(cx) == 0L) 0L else s(cy)(cx) / n(cy)(cx)
        cx += 1
      }
      cy += 1
    }
    // F(u,v) = Σx Σy q(u,x)·q(v,y)·m(x,y), factored as q(v,·)·(q(u,·)·m)
    val coeffs = Array.ofDim[Long](Freq, Freq)
    var u = 0
    while (u < Freq) {
      val rowDot = new Array[Long](Grid) // Σx q(u,x)·m(y? no: per y)
      var yy = 0
      while (yy < Grid) {
        var acc = 0L
        var xx = 0
        while (xx < Grid) { acc += basisQ(u)(xx) * m(yy)(xx); xx += 1 }
        rowDot(yy) = acc
        yy += 1
      }
      var v = 0
      while (v < Freq) {
        var acc = 0L
        var y2 = 0
        while (y2 < Grid) { acc += basisQ(v)(y2) * rowDot(y2); y2 += 1 }
        coeffs(u)(v) = acc
        v += 1
      }
      u += 1
    }
    // median: 32nd smallest (index 31) of the 63 non-DC coefficients
    val nonDc = new Array[Long](Freq * Freq - 1)
    var k = 0
    var j = 0
    while (j < Freq * Freq) {
      val uu = j % Freq
      val vv = j / Freq
      if (j != 0) { nonDc(k) = coeffs(uu)(vv); k += 1 }
      j += 1
    }
    java.util.Arrays.sort(nonDc)
    val med = nonDc(31)
    val bands = new Array[Int](4)
    j = 0
    while (j < Freq * Freq) {
      val uu = j % Freq
      val vv = j / Freq
      if (j != 0 && coeffs(uu)(vv) > med) bands(j / 16) |= 1 << (j % 16)
      j += 1
    }
    bands
  }

  /** Near-duplicate pairs over a [[hash]] table — the shared banded
    * join: EXACT for `maxHamming <= 3`, silent-cap audit via
    * [[BandedHamming.bucketCost]]. */
  def nearDuplicates(
      hashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    BandedHamming.nearDuplicates(hashes, maxHamming, maxBucket)

  /** DuckDB replay: given `dims(media_id, w, h)` and channel
    * expressions over (sx, sy, media_id, w, h), emits CTEs ending in
    * `px(media_id, b0..b3)` — grid means, integer DCT over the
    * embedded [[basisQ]] literals, lower-median compare, band
    * packing. */
  def hashSql(rExpr: String, gExpr: String, bExpr: String): String =
    s"""g AS (
       |  SELECT d.media_id, d.w, d.h,
       |         CAST(xs.sx AS BIGINT) AS sx, CAST(ys.sy AS BIGINT) AS sy
       |  FROM dims d
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(w) FROM dims) - 1)) AS sx) xs
       |    ON xs.sx < d.w
       |  JOIN (SELECT unnest(generate_series(0, (SELECT max(h) FROM dims) - 1)) AS sy) ys
       |    ON ys.sy < d.h),
       |basis(u, x, q) AS (VALUES $basisSqlRows),
       |cellsp AS (
       |  SELECT media_id, (sx * $Grid) // w AS cx, (sy * $Grid) // h AS cy,
       |         sum((($rExpr) * 299 + ($gExpr) * 587 + ($bExpr) * 114) // 1000)
       |           // count(*) AS m
       |  FROM g GROUP BY media_id, (sx * $Grid) // w, (sy * $Grid) // h),
       |coef AS (
       |  SELECT c.media_id, bu.u, bv.u AS v, sum(bu.q * bv.q * c.m) AS f
       |  FROM cellsp c
       |  JOIN basis bu ON bu.x = c.cx
       |  JOIN basis bv ON bv.x = c.cy
       |  GROUP BY c.media_id, bu.u, bv.u),
       |medp AS (
       |  SELECT media_id, f AS med FROM (
       |    SELECT media_id, f,
       |           row_number() OVER (PARTITION BY media_id ORDER BY f) AS rn
       |    FROM coef WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32),
       |bitsp AS (
       |  SELECT c.media_id, c.v * $Freq + c.u AS j,
       |         CASE WHEN NOT (c.u = 0 AND c.v = 0) AND c.f > m.med
       |              THEN 1 ELSE 0 END AS bit
       |  FROM coef c JOIN medp m USING (media_id)),
       |px AS (
       |  SELECT media_id,
       |         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
       |         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
       |         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
       |         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
       |  FROM bitsp GROUP BY media_id)""".stripMargin
}
