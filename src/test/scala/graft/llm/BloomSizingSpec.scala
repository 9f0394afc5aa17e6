package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sizing contract of the bloom decontamination bitmap: an
  * undersized (default-width) bitmap saturates at benchmark scale,
  * while [[Bloom.sizedMBits]] holds the configured FP budget — and the
  * filter never produces false negatives either way. */
class BloomSizingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // a "benchmark" of 30k distinct single-token docs (n=1 shingles) and
  // a disjoint clean probe set — every flagged probe is a false positive
  private val benchN = 30000L
  private val probeN = 20000L
  private def bench = spark.range(benchN)
    .select(col("id").cast("string").as("doc_id"),
      concat(lit("bm"), col("id")).as("text"))
  private def probes = spark.range(probeN)
    .select(col("id").cast("string").as("doc_id"),
      concat(lit("clean"), col("id")).as("text"))

  private def fpRate(bitmap: Array[Long], mBits: Int): Double = {
    val flagged = Bloom.contaminationFlags(probes, "doc_id", "text", bitmap, 1, mBits)
      .filter(col("flagged")).count()
    flagged.toDouble / probeN
  }

  test("sizedMBits: word-rounded, monotone in n, shrinks with looser budget") {
    assert(Bloom.sizedMBits(0, 0.01) === 64)
    val m4 = Bloom.sizedMBits(10000, 0.01)
    val m5 = Bloom.sizedMBits(100000, 0.01)
    val m5loose = Bloom.sizedMBits(100000, 0.1)
    assert(m4 % 64 === 0 && m5 % 64 === 0)
    assert(m5 > m4, "more shingles need a wider bitmap")
    assert(m5loose < m5, "a looser budget allows a narrower bitmap")
    // the closed form at k=4, p=0.01: m = 4n/0.38026 ≈ 10.52 bits/shingle
    assert(math.abs(m4 / 10000.0 - 10.52) < 0.1)
  }

  test("default 8 KiB bitmap saturates at a 30k-shingle benchmark") {
    val bm = Bloom.buildBitmap(bench, "text", 1)
    // (1 - e^(-4*30000/65536))^4 ≈ 0.50 — half of all clean docs flagged
    assert(fpRate(bm, Bloom.DefaultMBits) > 0.3,
      "the undersized default should visibly saturate (this is the documented hazard)")
  }

  test("sized bitmap holds the 1% FP budget at the same benchmark") {
    val (bm, m) = Bloom.buildSizedBitmap(bench, "text", 1, fpRate = 0.01)
    assert(m === Bloom.sizedMBits(benchN, 0.01))
    val fp = fpRate(bm, m)
    // the ideal-hash formula gives exactly the budget; the k affine
    // permutations of ONE base hash measure ~2x it (documented on
    // sizedMBits — halve the budget when the bound must be hard).
    // Either way: 25x under the saturated default, one-sided error.
    assert(fp <= 0.03, s"measured FP $fp exceeds 3x the 1% budget")
    assert(fp > 0.0005, "a zero-ish FP rate would mean the probe set never exercises the filter")
  }

  test("no false negatives: every benchmark doc is flagged at either width") {
    val (bm, m) = Bloom.buildSizedBitmap(bench, "text", 1, fpRate = 0.01)
    val missed = Bloom.contaminationFlags(bench, "doc_id", "text", bm, 1, m)
      .filter(!col("flagged")).count()
    assert(missed === 0L)
  }
}
