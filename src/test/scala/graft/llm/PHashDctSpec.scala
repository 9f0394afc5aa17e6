package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the DCT pHash the hash oracle cannot
  * express: the median-compare invariances (brightness shift,
  * contrast scale — approximate, bounded by the floor/quantization
  * steps), banded-join exactness, and discrimination on the block
  * fixture. */
class PHashDctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The q_media_phash fixture (large dims: every 32×32 cell hit). */
  private def corpus = spark.range(96).map { id =>
    val pid = (id % 24).toInt
    val (w, h) =
      if (id < 48) (34 + pid % 9, 33 + (pid * 3) % 7)
      else (35 + (id % 8).toInt, 34 + (id % 6).toInt)
    Multimodal.MediaRow(id, Multimodal.syntheticPngBlocks(pid, w, h), "image/png", w, h)
  }

  private def img(w: Int, h: Int)(px: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
    im
  }

  private def gray(v: Int): Int = { val c = math.max(0, math.min(255, v)); (c << 16) | (c << 8) | c }

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum

  test("exact copies hash identically; banded join equals brute force") {
    val hashes = PHashDct.hash(corpus)
    val got = PHashDct.nearDuplicates(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h = hashes.collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val brute = (for {
      (ia, ba) <- h; (ib, bb) <- h if ia < ib
      d = ba.zip(bb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got === brute)
    (0L until 24L).foreach(id => assert(got.contains((id, id + 24, 0L)),
      s"exact duplicate pair ($id, ${id + 24}) must pair at Hamming 0"))
  }

  test("pHash is EXACTLY invariant to a uniform brightness shift (DC absorbs it)") {
    // keep every value under 225 so the +30 shift never clips at 255
    // (clipping is a real structural edit, not a brightness shift).
    // Exactness, not approximation: on a gray image the shift adds c
    // to every grid mean exactly, and ΔF(u,v) = c·Σq(u,·)·Σq(v,·)
    // where each non-DC rounded basis row sums to 0 (the x ↔ x+16
    // terms cancel sign-exactly) — so only the unused DC moves
    val base = img(40, 40)((x, y) => gray(20 + (3 * x + 2 * y) % 170))
    val shifted = img(40, 40)((x, y) => gray(20 + (3 * x + 2 * y) % 170 + 30))
    val d = hamming(PHashDct.hashBands(base), PHashDct.hashBands(shifted))
    assert(d === 0, s"brightness shift flipped $d bits; it must land only in DC")
  }

  test("pHash survives a global contrast scale (median scales with coefficients)") {
    val base = img(40, 40)((x, y) => gray(20 + (7 * x + 13 * y) % 120))
    val scaled = img(40, 40)((x, y) => gray((20 + (7 * x + 13 * y) % 120) * 3 / 2))
    val d = hamming(PHashDct.hashBands(base), PHashDct.hashBands(scaled))
    assert(d <= 3, s"contrast scale flipped $d bits; median-compare should absorb it")
  }

  test("pHash survives resampling (the resolution-variant duplicate class)") {
    val hashes = PHashDct.hash(corpus).collect()
      .map(r => r.getLong(0) -> Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    // ids 48..95 re-render patterns at other dims; same-pattern pairs
    // should sit near, different-pattern pairs far
    val near = (48L until 96L).map { id =>
      hamming(hashes(id % 24), hashes(id))
    }
    assert(near.count(_ <= 8) * 2 > near.size,
      s"most resolution variants should stay within Hamming 8, got $near")
    val cross = for (a <- 0L until 12L; b <- 12L until 24L) yield
      hamming(hashes(a), hashes(b))
    assert(cross.count(_ > 8) * 2 > cross.size,
      s"different patterns should mostly be far apart, got ${cross.take(30)}")
  }

  test("distinct patterns do not collapse to one hash (median split is balanced)") {
    val hashes = PHashDct.hash(corpus).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(hashes.distinct.length >= 20, "24 patterns must yield many distinct hashes")
    // median-compare guarantees ~half the 63 non-DC bits are set
    hashes.foreach { case (b0, b1, b2, b3) =>
      val bits = Seq(b0, b1, b2, b3).map(Integer.bitCount).sum
      assert(bits >= 16 && bits <= 47, s"median split out of balance: $bits bits set")
    }
  }
}
