package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded Hamming-LSH pairing over any 64-bit perceptual hash stored
  * as four 16-bit band columns `(media_id, b0, b1, b2, b3)` — the
  * shared candidate-generation core of [[ImageDedup]] (dHash) and
  * [[AudioDedup]] (envelope hash). Pairs collide if ANY band matches
  * exactly; pigeonhole makes the result EXACT for Hamming ≤ 3 (a pair
  * differing in ≤ 3 bits leaves at least one of the 4 bands
  * untouched). Never an all-pairs product; the only shuffle keys on
  * (band, key16). See [[ImageDedup]]'s object doc for the honest
  * 16-bit-keyspace saturation bound and its remedies.
  *
  * Truncation honesty: the `maxBucket` guard in [[nearDuplicates]]
  * drops over-cap (band, key) buckets SILENTLY — qualifying pairs
  * whose every matching band sits in a dropped bucket vanish, voiding
  * the exactness guarantee at saturation scale. [[bucketCost]] /
  * [[truncationReport]] are the telemetry companions (the
  * [[MinHash.bandCostTable]] pattern): run them with the production
  * cap to see exactly how much candidate volume the guard would drop
  * BEFORE trusting the exactness statement. `capped_pairs == 0` ⇒ the
  * guard was a no-op and the pigeonhole guarantee holds in full. */
object BandedHamming {

  private val BandCols = Seq("b0", "b1", "b2", "b3")

  /** (media_id, band, key) — one row per band per item; the exact
    * relation the candidate join shuffles on. */
  private def bandKeyRows(hashes: DataFrame): DataFrame =
    hashes.select(col("media_id"),
      explode(array(BandCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("band"), col(c).as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Near-duplicate pairs `(media_id_a, media_id_b, hamming)` with
    * `media_id_a < media_id_b` and `hamming <= maxHamming`. EXACT for
    * `maxHamming <= 3` (the require refuses larger thresholds rather
    * than silently under-reporting). `maxBucket` drops band buckets
    * larger than the cap before pairing — the quadratic-blowup guard.
    * The drop is SILENT here (a per-row filter cannot report); audit
    * it with [[bucketCost]]/[[truncationReport]] at the same cap —
    * `capped_pairs > 0` means the exactness guarantee no longer holds
    * for pairs living only in dropped buckets. */
  def nearDuplicates(
      hashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in 0..3 for the 4-band exactness guarantee, got $maxHamming")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val h = hashes.select(col("media_id") +: BandCols.map(col): _*)
    val keyed = bandKeyRows(h)
    val guarded = keyed
      .withColumn("__n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("key"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    val cand = guarded.as("l")
      .join(guarded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("media_id_a"), col("r.media_id").as("media_id_b"))
      .distinct()
    val ham = BandCols.map(c =>
      bit_count(col(s"ha.$c").bitwiseXOR(col(s"hb.$c")))).reduce(_ + _)
    cand
      .join(h.as("ha"), col("media_id_a") === col("ha.media_id"))
      .join(h.as("hb"), col("media_id_b") === col("hb.media_id"))
      .select(col("media_id_a"), col("media_id_b"),
        ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Truncation telemetry for a [[nearDuplicates]] run at the same
    * `maxBucket`: ONE row —
    * `(candidate_pairs, capped_pairs, capped_buckets, max_bucket_sz)`.
    * `candidate_pairs` is Σ sz·(sz−1)/2 over the (band, key) buckets
    * (the verification work the banded join emits, pre-distinct);
    * `capped_pairs` is the share in buckets the guard drops ENTIRELY —
    * the silent recall loss the exactness statement doesn't price in
    * once buckets saturate. Scale shape: one groupBy on the same
    * (band, key) the production join shuffles on, then a one-row
    * aggregate — costs one candidate-generation shuffle, no join. */
  def bucketCost(hashes: DataFrame, maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    bandKeyRows(hashes.select(col("media_id") +: BandCols.map(col): _*))
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("sz"))
      .agg(
        coalesce(sum(expr("(sz * (sz - 1)) div 2")), lit(0L)).as("candidate_pairs"),
        coalesce(sum(when(col("sz") > maxBucket, expr("(sz * (sz - 1)) div 2"))
          .otherwise(lit(0L))), lit(0L)).as("capped_pairs"),
        coalesce(sum(when(col("sz") > maxBucket, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("capped_buckets"),
        coalesce(max(col("sz")), lit(0L)).as("max_bucket_sz"))
  }

  /** Driver-side view of [[bucketCost]] (a 1-row collect). `truncates`
    * is the go/no-go bit: false ⇒ the `maxBucket` guard dropped
    * nothing and the pigeonhole exactness guarantee holds in full. */
  final case class BucketCost(
      candidatePairs: Long,
      cappedPairs: Long,
      cappedBuckets: Long,
      maxBucketSize: Long) {
    def truncates: Boolean = cappedPairs > 0L
  }

  def truncationReport(hashes: DataFrame, maxBucket: Int): BucketCost = {
    val r = bucketCost(hashes, maxBucket).collect().head
    BucketCost(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }
}
