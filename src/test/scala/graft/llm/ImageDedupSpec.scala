package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the perceptual-hash image dedup that the
  * hash oracle cannot express: brightness invariance of dHash, the
  * banded join's exactness vs a brute-force Hamming scan, and the
  * guard behaviors. */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The q_media_dhash fixture: 24 patterns × (2 exact copies + 2
    * resolution variants). */
  private def corpus = spark.range(96).map { id =>
    val pid = (id % 24).toInt
    val (w, h) =
      if (id < 48) (8 + pid % 9, 8 + (pid * 3) % 7)
      else (9 + (id % 8).toInt, 8 + (id % 6).toInt)
    Multimodal.MediaRow(id, Multimodal.syntheticPngBlocks(pid, w, h), "image/png", w, h)
  }

  test("the fixture discriminates: same-pattern pairs dominate the near-dup set") {
    val pairs = ImageDedup.nearDuplicates(ImageDedup.dHash(corpus), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val samePattern = pairs.count { case (a, b) => a % 24 == b % 24 }
    assert(samePattern * 2 > pairs.size,
      s"expected same-pattern majority, got $samePattern of ${pairs.size}")
    // and the near-dup set is a small fraction of all 96*95/2 pairs
    assert(pairs.size < 500)
  }

  test("exact copies hash identically and surface as Hamming-0 pairs") {
    val pairs = ImageDedup.nearDuplicates(ImageDedup.dHash(corpus), maxHamming = 3)
      .filter(col("hamming") === 0)
      .select("media_id_a", "media_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ids 0..23 and 24..47 are bit-identical renders of the same pattern
    (0L until 24L).foreach(id => assert(pairs.contains((id, id + 24)),
      s"exact duplicate pair ($id, ${id + 24}) must be found at Hamming 0"))
  }

  test("banded LSH equals the brute-force Hamming scan (exactness guarantee)") {
    val hashes = ImageDedup.dHash(corpus)
    val got = ImageDedup.nearDuplicates(hashes, maxHamming = 3)
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

  test("dHash is invariant to a uniform (non-wrapping) brightness shift") {
    def flatPng(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        12, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 12) {
        val v = math.min(10 * x + 3 * y + shift, 255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, flatPng(0), "image/png", 12, 10),
      Multimodal.MediaRow(1L, flatPng(50), "image/png", 12, 10)))
    val rows = ImageDedup.dHash(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(rows(0L) === rows(1L), "gradient bits must ignore uniform brightness")
  }

  test("keepTable keeps one representative per duplicate class") {
    val hashes = ImageDedup.dHash(corpus)
    val keep = ImageDedup.keepTable(hashes,
      ImageDedup.nearDuplicates(hashes, maxHamming = 3))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(keep.size === 96)
    // the exact copy of pattern p (id p+24) always loses to id p
    (0L until 24L).foreach { id =>
      assert(!keep(id + 24)._2, s"exact copy ${id + 24} must be dropped")
      assert(keep(id + 24)._1 === keep(id)._1, "copies share a cluster")
    }
    // cluster representatives are kept, exactly one per cluster id
    val reps = keep.values.filter(_._2).map(_._1).toSeq
    assert(reps.distinct.size === reps.size)
    assert(reps.toSet === keep.values.map(_._1).toSet)
  }

  test("undecodable payloads are dropped, not hashed") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(7L, Multimodal.syntheticPng(7, 9, 9), "image/png", 9, 9),
      Multimodal.MediaRow(8L, Array[Byte](1, 2, 3), "image/png", 9, 9)))
    assert(ImageDedup.dHash(media).select("media_id").as[Long].collect().toSeq === Seq(7L))
  }

  test("maxHamming beyond the 4-band guarantee is refused") {
    val hashes = ImageDedup.dHash(corpus)
    val e = intercept[IllegalArgumentException] {
      ImageDedup.nearDuplicates(hashes, maxHamming = 4)
    }
    assert(e.getMessage.contains("exactness guarantee"))
  }

  test("maxBucket drops saturated band buckets (and reports fewer pairs)") {
    val hashes = ImageDedup.dHash(corpus)
    val full = ImageDedup.nearDuplicates(hashes, maxHamming = 0).count()
    // every exact-dup pair collides in all 4 bands; capping buckets at 2
    // keeps pairs only where a band bucket holds exactly the duplicates
    val capped = ImageDedup.nearDuplicates(hashes, maxHamming = 0, maxBucket = 2).count()
    assert(capped <= full)
  }

  /** The q_media_dhash_wide fixture: big enough that every 17×16 grid
    * cell receives pixels. */
  private def wideCorpus = spark.range(96).map { id =>
    val pid = (id % 24).toInt
    val (w, h) =
      if (id < 48) (34 + pid % 9, 33 + (pid * 3) % 7)
      else (35 + (id % 8).toInt, 34 + (id % 6).toInt)
    Multimodal.MediaRow(id, Multimodal.syntheticPngBlocks(pid, w, h), "image/png", w, h)
  }

  test("wide banded LSH equals the brute-force Hamming scan (8-band exactness)") {
    val hashes = ImageDedup.dHashWide(wideCorpus)
    val got = ImageDedup.nearDuplicatesWide(hashes, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h = hashes.collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong))
    val brute = (for {
      (ia, ba) <- h; (ib, bb) <- h if ia < ib
      d = ba.zip(bb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
    // exact copies land at Hamming 0
    (0L until 24L).foreach(id => assert(got.contains((id, id + 24, 0L)),
      s"exact duplicate pair ($id, ${id + 24}) must be found at Hamming 0"))
  }

  test("wide maxHamming beyond the 8-band guarantee is refused") {
    val hashes = ImageDedup.dHashWide(wideCorpus)
    val e = intercept[IllegalArgumentException] {
      ImageDedup.nearDuplicatesWide(hashes, maxHamming = 8)
    }
    assert(e.getMessage.contains("0..7"))
  }

  test("a degenerate-narrow image hashes to all-zero wide bands, no crash") {
    // w=2: only grid cells 0 and 8 populated on the 17-wide axis —
    // no adjacent pair exists, so every compare sees an empty cell
    val tiny = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, Multimodal.syntheticPngBlocks(1, 2, 40), "image/png", 2, 40)))
    val r = ImageDedup.dHashWide(tiny).collect().head
    assert((1 to 8).map(r.getLong).forall(_ === 0L))
  }

  test("incremental dedup equals the batch run restricted to new-image pairs") {
    val hashes = ImageDedup.dHash(corpus)
    val isNew = col("media_id") % 4 === 0
    def restricted(cap: Int) = ImageDedup
      .nearDuplicates(hashes, maxHamming = 3, maxBucket = cap)
      .filter(col("media_id_a") % 4 === 0 || col("media_id_b") % 4 === 0)
      .collect().map(_.toSeq).toSet
    def incremental(cap: Int) = BandedHamming.nearDuplicatesIncremental(
      hashes.filter(isNew), hashes.filter(!isNew), maxHamming = 3, maxBucket = cap)
      .collect().map(_.toSeq).toSet
    // uncapped-equivalent AND under a truncating cap: the union-count
    // guard sees the same buckets the batch window does
    assert(incremental(10000) === restricted(10000))
    assert(incremental(3) === restricted(3))
    assert(incremental(10000).nonEmpty)
    assert(!incremental(10000).exists(r =>
      r.head.asInstanceOf[Long] % 4 != 0 && r(1).asInstanceOf[Long] % 4 != 0))
    // the at-rest bucket-count side-table changes the shape, not the
    // answer — including under the truncating cap, where it IS the
    // guard's old half; and its increment-ADD maintenance equals the
    // union-corpus bootstrap, row for row
    val counts = BandedHamming.bucketCountsTable(hashes.filter(!isNew))
    def incrementalSide(cap: Int) = BandedHamming.nearDuplicatesIncremental(
      hashes.filter(isNew), hashes.filter(!isNew), maxHamming = 3, maxBucket = cap,
      indexBucketCounts = Some(counts))
      .collect().map(_.toSeq).toSet
    assert(incrementalSide(10000) === restricted(10000))
    assert(incrementalSide(3) === restricted(3))
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val advanced = counts
      .unionByName(BandedHamming.bucketCountsTable(hashes.filter(isNew)))
      .groupBy(col("band"), col("key")).agg(sum(col("n")).as("n"))
    assert(rowsOf(advanced) === rowsOf(BandedHamming.bucketCountsTable(hashes)))
  }

  test("bucketCost telemetry agrees with the guard's silent drop") {
    val hashes = ImageDedup.dHash(corpus)
    // a generous cap truncates nothing: telemetry says so, and the
    // guarded join equals the unguarded one
    val quiet = BandedHamming.truncationReport(hashes, maxBucket = 10000)
    assert(!quiet.truncates && quiet.cappedPairs === 0L && quiet.cappedBuckets === 0L)
    assert(quiet.candidatePairs > 0L)
    assert(quiet.maxBucketSize <= 10000L)
    // a tight cap truncates: telemetry flags it, and the guarded join
    // really returns fewer pairs — the silent loss the report prices
    val tightCap = 3
    val loud = BandedHamming.truncationReport(hashes, maxBucket = tightCap)
    assert(loud.truncates && loud.cappedPairs > 0L && loud.cappedBuckets > 0L)
    assert(loud.maxBucketSize === quiet.maxBucketSize) // cap-independent
    val full = ImageDedup.nearDuplicates(hashes, maxHamming = 3).count()
    val capped = ImageDedup.nearDuplicates(hashes, maxHamming = 3, maxBucket = tightCap).count()
    assert(capped < full,
      s"telemetry reported truncation but the guarded join kept all $full pairs")
  }
}
