package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter benchmark decontamination — the constant-size
  * alternative to [[Decontaminate]]'s broadcast shingle-set join.
  *
  * [[Decontaminate.overlaps]] broadcasts the benchmark's DISTINCT
  * n-gram strings; that is exact but its broadcast grows with the
  * benchmark (a 10 GB eval suite broadcasts gigabytes of strings to
  * every executor). The bloom path compresses the benchmark side to an
  * `mBits/8`-byte bitmap whose cost is independent of the SHAPE of the
  * benchmark (string lengths, n-gram width), and the corpus-side
  * membership test becomes row-local bit arithmetic against an in-plan
  * literal array — zero joins, zero shuffle of corpus text, whole-stage
  * codegen throughout. The price is one-sided error: false POSITIVES
  * only (a clean doc may be over-flagged at rate ~(1-e^(-kn/m))^k),
  * never false negatives — the safe direction for decontamination,
  * where flagged docs are dropped or re-checked exactly.
  *
  * **The bitmap width must be sized to the benchmark**: m ∝ n, where n
  * is the benchmark's distinct-shingle count. The FP formula saturates
  * toward 1 once n ≫ m/k — an undersized bitmap (e.g. the 8 KiB
  * [[DefaultMBits]] against a 10 GB eval suite's ~10⁸ shingles) flags
  * EVERY corpus document, which is an outage, not decontamination.
  * Use [[buildSizedBitmap]] (one extra distinct-count job on the small
  * benchmark side) or [[sizedMBits]] to hold a configured FP budget;
  * [[DefaultMBits]] is only adequate up to ~10³ distinct shingles
  * (FP ≈ 10⁻⁵ at n=10³, already ~4% at n=10⁴). At the 10 GB scale
  * above, a 1% budget sizes to ~130 MB — still a literal array, still
  * join-free, ~1/75th of what the exact broadcast would ship.
  *
  * Determinism: the k bit positions are affine permutations of
  * [[TextHash.polyHash]] in the same [0, Prime) domain as [[MinHash]],
  * so the filter — bitmap construction AND membership — is replayable
  * bit-for-bit in the DuckDB oracle (`q_doc_bloom_decontam`).
  *
  * Scale shape: bitmap construction aggregates bit positions into
  * `mBits/64` words with one partial-aggregable `bit_or` groupBy (the
  * benchmark side — bounded, but never all collected as strings); the
  * only driver materialization is the word table, provably ≤ mBits/64
  * rows by construction (1024 rows at the default m=2^16) — a config
  * bound, not a data bound.
  */
object Bloom {

  /** Number of hash functions (k). */
  val NumHashes: Int = 4

  /** Affine constants for position j: ((h*A(j)+B(j)) mod Prime) mod m.
    * Disjoint from [[MinHash.A]]/[[MinHash.B]] so bloom positions are
    * independent of minhash signatures over the same shingles. */
  val A: Seq[Long] = Seq(13L, 47L, 103L, 241L)
  val B: Seq[Long] = Seq(19L, 67L, 139L, 269L)

  /** Default filter width: 2^16 bits = 8 KiB bitmap — adequate for
    * benchmarks up to ~10³ distinct shingles only (FP ≈ 10⁻⁵ at n=10³,
    * ~4% at n=10⁴, saturating toward 1 beyond n ≈ m/k). Size with
    * [[sizedMBits]]/[[buildSizedBitmap]] for anything larger. */
  val DefaultMBits: Int = 1 << 16

  /** Smallest bitmap width (rounded up to whole 64-bit words) that
    * holds false-positive budget `fpRate` for `distinctShingles`
    * benchmark n-grams under this filter's fixed k = [[NumHashes]]:
    * p = (1 − e^(−k·n/m))^k  ⇒  m = ⌈ −k·n / ln(1 − p^(1/k)) ⌉.
    *
    * The formula assumes k independent hashes; this filter's k
    * positions are affine permutations of ONE base hash (the price of
    * DuckDB replayability), which measures ≈2× the formula's p
    * (BloomSizingSpec: 2.1% at a 1% budget). Halve `fpRate` when the
    * budget must be a hard bound. */
  def sizedMBits(distinctShingles: Long, fpRate: Double): Int = {
    require(fpRate > 0 && fpRate < 1, s"fpRate must be in (0,1), got $fpRate")
    require(distinctShingles >= 0, "distinctShingles must be non-negative")
    if (distinctShingles == 0) 64
    else {
      val m = -NumHashes.toDouble * distinctShingles /
        math.log1p(-math.pow(fpRate, 1.0 / NumHashes))
      val words = math.ceil(m / 64.0).toLong
      require(words * 64 < Int.MaxValue,
        s"sized bitmap ($words words) exceeds the literal-array bound; " +
          "shard the benchmark or raise the FP budget")
      (words * 64).toInt
    }
  }

  /** [[buildBitmap]] with the width sized from the benchmark itself:
    * one distinct-count job over the (small) benchmark side picks m for
    * the FP budget, then the bitmap is built at that width. Returns
    * (bitmap, mBits) — membership must use the same width. */
  def buildSizedBitmap(
      bench: DataFrame,
      textCol: String,
      n: Int,
      fpRate: Double = 0.01,
      hash: Column => Column = TextHash.polyHash): (Array[Long], Int) = {
    val distinct = bench
      .select(explode(Shingles.shingles(Shingles.tokens(col(textCol)), n)).as("s"))
      .select(hash(col("s")).as("h"))
      .distinct().count()
    val m = sizedMBits(distinct, fpRate)
    (buildBitmap(bench, textCol, n, m, hash), m)
  }

  import TextHash.Prime

  /** Bit position j for shingle-hash column `h`. */
  def bitPosition(h: Column, j: Int, mBits: Int): Column =
    ((h * A(j) + B(j)) % Prime) % mBits

  /** Builds the bitmap: distinct benchmark n-gram hashes → k bit
    * positions each → OR-folded into `mBits/64` little-endian words.
    * Missing words (no bit set) come back as 0L. */
  def buildBitmap(
      bench: DataFrame,
      textCol: String,
      n: Int,
      mBits: Int = DefaultMBits,
      hash: Column => Column = TextHash.polyHash): Array[Long] = {
    val nWords = mBits / 64
    val pos = bench
      .select(explode(Shingles.shingles(Shingles.tokens(col(textCol)), n)).as("s"))
      .select(hash(col("s")).as("h"))
      .select(explode(array((0 until NumHashes).map(j => bitPosition(col("h"), j, mBits)): _*)).as("p"))
    val words = pos
      .groupBy((col("p") / 64).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))").as("bits"))
      .collect()
    val bm = new Array[Long](nWords)
    words.foreach(r => bm(r.getInt(0)) = r.getLong(1))
    bm
  }

  /** Membership test for shingle-hash column `h` against the bitmap
    * literal: all k positions set. Pure codegen bit arithmetic — no
    * join, no shuffle. */
  def mightContain(h: Column, bitmap: Array[Long], mBits: Int): Column = {
    val bm = typedLit(bitmap.toSeq)
    (0 until NumHashes).map { j =>
      val p = bitPosition(h, j, mBits)
      (element_at(bm, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int")))) =!= 0L
    }.reduce(_ && _)
  }

  /** Per-document contamination flags: one row per doc —
    * (doc_id, ngrams, bloom_hits, flagged). `ngrams` counts the doc's
    * DISTINCT n-grams, `bloom_hits` how many of them the filter
    * reports as benchmark members, `flagged` = bloom_hits > 0. */
  def contaminationFlags(
      docs: DataFrame,
      docId: String,
      textCol: String,
      bitmap: Array[Long],
      n: Int,
      mBits: Int = DefaultMBits,
      hash: Column => Column = TextHash.polyHash): DataFrame =
    docs
      .select(col(docId).as("doc_id"),
        explode(Shingles.shingles(Shingles.tokens(col(textCol)), n)).as("s"))
      .distinct()
      .select(col("doc_id"), mightContain(hash(col("s")), bitmap, mBits).as("hit"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ngrams"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("bloom_hits"))
      .withColumn("flagged", col("bloom_hits") > 0)

  /** DuckDB mirror of [[bitPosition]]. */
  def bitPositionSql(h: String, j: Int, mBits: Int): String =
    s"((($h) * ${A(j)} + ${B(j)}) % $Prime) % $mBits"
}
