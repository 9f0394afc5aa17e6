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
  * 16-bit-keyspace saturation bound and its remedies. */
object BandedHamming {

  /** Near-duplicate pairs `(media_id_a, media_id_b, hamming)` with
    * `media_id_a < media_id_b` and `hamming <= maxHamming`. EXACT for
    * `maxHamming <= 3` (the require refuses larger thresholds rather
    * than silently under-reporting). `maxBucket` drops band buckets
    * larger than the cap before pairing — the quadratic-blowup guard. */
  def nearDuplicates(
      hashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in 0..3 for the 4-band exactness guarantee, got $maxHamming")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    val h = hashes.select(col("media_id") +: bandCols.map(col): _*)
    // (band, key16, media_id) — one row per band per item
    val keyed = h.select(col("media_id"),
      explode(array(bandCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("band"), col(c).as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("bk.band").as("band"), col("bk.key").as("key"))
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
    val ham = bandCols.map(c =>
      bit_count(col(s"ha.$c").bitwiseXOR(col(s"hb.$c")))).reduce(_ + _)
    cand
      .join(h.as("ha"), col("media_id_a") === col("ha.media_id"))
      .join(h.as("hb"), col("media_id_b") === col("hb.media_id"))
      .select(col("media_id_a"), col("media_id_b"),
        ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
