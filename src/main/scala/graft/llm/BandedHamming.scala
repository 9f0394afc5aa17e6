package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded Hamming-LSH pairing over perceptual hashes stored as band
  * columns — the shared candidate-generation core of [[ImageDedup]]
  * (dHash, 4 × 16-bit bands), [[AudioDedup]] (envelope hash, same
  * layout) and the wide [[ImageDedup.dHashWide]] variant (256-bit,
  * 8 × 32-bit bands). Pairs collide if ANY band matches exactly;
  * pigeonhole makes the result EXACT for Hamming ≤ bands−1 (a pair
  * differing in ≤ bands−1 bits leaves at least one band untouched).
  * Never an all-pairs product; the only shuffle keys on (band, key).
  * See [[ImageDedup]]'s object doc for the honest keyspace saturation
  * bound and its remedies — the wide layout IS the remedy: 2^32 keys
  * per band instead of 2^16.
  *
  * Truncation honesty: the `maxBucket` guard drops over-cap
  * (band, key) buckets SILENTLY — qualifying pairs whose every
  * matching band sits in a dropped bucket vanish, voiding the
  * exactness guarantee at saturation scale. [[bucketCost]] /
  * [[truncationReport]] are the telemetry companions (the
  * [[MinHash.bandCostTable]] pattern): run them with the production
  * cap to see exactly how much candidate volume the guard would drop
  * BEFORE trusting the exactness statement. `capped_pairs == 0` ⇒ the
  * guard was a no-op and the pigeonhole guarantee holds in full. */
object BandedHamming {

  /** The classic 64-bit layout: 4 × 16-bit bands (b0..b3). */
  val NarrowBands: Seq[String] = Seq("b0", "b1", "b2", "b3")

  /** The wide 256-bit layout: 8 × 32-bit bands (w0..w7) — key space
    * 2^32 per band, the post-saturation remedy. */
  val WideBands: Seq[String] = (0 until 8).map(i => s"w$i")

  /** THE `maxBucket` guard shape, shared by every banded-LSH family
    * here (media hashes, MinHash bands, embedding LSH buckets): one
    * partial-aggregable groupBy finds the over-cap keys — a tiny set
    * by construction (≤ |rows|/maxBucket keys can exceed the cap) —
    * and a broadcast anti-join drops their rows. Skew-SAFE: the old
    * `count().over(Window.partitionBy(keys))` shape landed a saturated
    * bucket's EVERY row on one task just to count-and-drop it (linear
    * work, but a single-task cliff exactly on the hot keys the guard
    * exists for); the partial aggregation counts map-side and the
    * crawl-sized relation never funnels through the hot key at all.
    * Same drops, bit-identical survivors.
    *
    * Broadcast-size precondition: the over-cap key set is bounded by
    * |rows|/maxBucket, so the forced broadcast assumes a PRODUCTION
    * cap (thousands+) — the regime every caller here runs in, where
    * the set is megabytes at crawl scale. A degenerate cap (the
    * `require` floor allows maxBucket = 2) against a crawl-sized
    * relation could push it past executor memory, where the old
    * window arm would merely be slow. The same bound governs the
    * union-counted guards in the incremental MinHash/Winnow/Jaccard
    * arms and the endpoint broadcast in [[DedupClusters]] (bounded by
    * 2·|newPairs| — increment-sized by contract there). When the
    * bound is NOT trusted — tiny caps, bootstrap-sized "increments" —
    * set [[Guards.ConfKey]] to `"auto"`: the hint is dropped and AQE's
    * byte-accurate runtime stats decide, degrading an over-threshold
    * guard set to a shuffled join instead of OOMing the driver
    * (GuardBroadcastSpec pins both modes' executed plans). */
  private[graft] def dropOverCap(
      keyed: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame = {
    val over = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select(keyCols.map(col): _*)
    // a using-columns join moves the join keys FIRST — restore the
    // caller's column order by NAME (positional renames downstream)
    keyed.join(Guards.broadcastBounded(over), keyCols, "left_anti")
      .select(keyed.columns.map(col): _*)
  }

  /** (media_id, band, key) — one row per band per item; the exact
    * relation the candidate join shuffles on. */
  private def bandKeyRows(hashes: DataFrame, bandCols: Seq[String]): DataFrame =
    hashes.select(col("media_id"),
      explode(array(bandCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("band"), col(c).cast("long").as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Near-duplicate pairs `(media_id_a, media_id_b, hamming)` with
    * `media_id_a < media_id_b` and `hamming <= maxHamming`, over the
    * given band columns. EXACT for `maxHamming <= bandCols.size - 1`
    * (the require refuses larger thresholds rather than silently
    * under-reporting). `maxBucket` drops band buckets larger than the
    * cap before pairing — the quadratic-blowup guard; the drop is
    * SILENT here (a per-row filter cannot report) — audit it with
    * [[bucketCost]]/[[truncationReport]] at the same cap. */
  def nearDuplicatesOver(
      hashes: DataFrame,
      bandCols: Seq[String],
      maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(bandCols.size >= 2, s"need at least 2 bands, got $bandCols")
    require(maxHamming >= 0 && maxHamming <= bandCols.size - 1,
      s"maxHamming must be in 0..${bandCols.size - 1} for the ${bandCols.size}-band " +
        s"exactness guarantee, got $maxHamming")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val h = hashes.select(col("media_id") +: bandCols.map(col): _*)
    val guarded = dropOverCap(bandKeyRows(h, bandCols), Seq("band", "key"), maxBucket)
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

  /** The 64-bit (4 × 16-bit band) shape — EXACT for Hamming ≤ 3. */
  def nearDuplicates(
      hashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    nearDuplicatesOver(hashes, NarrowBands, maxHamming, maxBucket)

  /** INCREMENTAL near-duplicate pairs: a NEW batch of hashes against
    * an AT-REST index of the accumulated corpus, plus within the
    * batch — bit-identical to [[nearDuplicatesOver]] on old ∪ new
    * restricted to pairs involving ≥ 1 new item, WITHOUT the old×old
    * candidate join (the [[MinHash.nearDuplicatesIncremental]] shape
    * for the media families; a perceptual-hash table IS its own
    * at-rest index — 4 ints per item). The pigeonhole exactness
    * argument is unchanged: any qualifying pair with a new member
    * still collides in some band. The `maxBucket` guard counts
    * bucket sizes over the UNION of both sides — the same buckets the
    * batch run would see, so the restriction identity holds capped or
    * not. Ids must be disjoint across the two inputs.
    *
    * `indexBucketCounts = Some([[bucketCountsTableOver]] artifact)`
    * replaces the one remaining index-sized aggregate (the union
    * bucket count) with an increment-keyed left join against the
    * stored per-bucket counts — only buckets an increment key lands
    * in can generate candidates, so old-only over-cap buckets stay
    * unlisted AND pairless; output bit-identical with or without. */
  def nearDuplicatesIncrementalOver(
      newHashes: DataFrame,
      indexHashes: DataFrame,
      bandCols: Seq[String],
      maxHamming: Int,
      maxBucket: Int,
      indexBucketCounts: Option[DataFrame] = None): DataFrame = {
    require(bandCols.size >= 2, s"need at least 2 bands, got $bandCols")
    require(maxHamming >= 0 && maxHamming <= bandCols.size - 1,
      s"maxHamming must be in 0..${bandCols.size - 1} for the ${bandCols.size}-band " +
        s"exactness guarantee, got $maxHamming")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val hN = newHashes.select(col("media_id") +: bandCols.map(col): _*)
    val hO = indexHashes.select(col("media_id") +: bandCols.map(col): _*)
    val keyedN = bandKeyRows(hN, bandCols)
    val keyedO = bandKeyRows(hO, bandCols)
    // union bucket sizes (what the batch window would count); over-cap
    // keys drop from BOTH sides — one index-sized groupBy without the
    // side-table, an increment-keyed join with it
    val overCap = indexBucketCounts match {
      case Some(counts) =>
        keyedN.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__nn"))
          .join(counts.toDF("band", "key", "__on"), Seq("band", "key"), "left")
          .filter(col("__nn") + coalesce(col("__on"), lit(0L)) > maxBucket)
          .select(col("band"), col("key"))
      case None =>
        keyedN.unionByName(keyedO)
          .groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBucket)
          .select(col("band"), col("key"))
    }
    // NOTE: using-columns joins put the join keys FIRST in the output,
    // so rename by NAME (a positional toDF here once scrambled
    // media_id into the key column and silently emptied the result)
    val gN = keyedN.join(Guards.broadcastBounded(overCap), Seq("band", "key"), "left_anti")
      .select(col("media_id"), col("band"), col("key"))
    val gO = keyedO.join(Guards.broadcastBounded(overCap), Seq("band", "key"), "left_anti")
      .select(col("media_id"), col("band"), col("key"))
    val newOld = gN.select(col("media_id").as("id_n"), col("band"), col("key"))
      .join(gO.select(col("media_id").as("id_o"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("media_id_a"),
        greatest(col("id_n"), col("id_o")).as("media_id_b"))
    val newNew = gN.select(col("media_id").as("media_id_a"), col("band"), col("key"))
      .join(gN.select(col("media_id").as("media_id_b"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("media_id_a") < col("media_id_b"))
      .select(col("media_id_a"), col("media_id_b"))
    val cand = newOld.unionByName(newNew).distinct()
    val h = hN.unionByName(hO)
    val ham = bandCols.map(c =>
      bit_count(col(s"ha.$c").bitwiseXOR(col(s"hb.$c")))).reduce(_ + _)
    cand
      .join(h.as("ha"), col("media_id_a") === col("ha.media_id"))
      .join(h.as("hb"), col("media_id_b") === col("hb.media_id"))
      .select(col("media_id_a"), col("media_id_b"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The at-rest per-(band, key) bucket-count side-table that makes
    * [[nearDuplicatesIncrementalOver]]'s cap fully increment-sized —
    * the [[MinHash.bandBucketCounts]] recipe for the media families.
    * Build once next to the hash table; maintain by increment-ADD
    * (union with the increment's own counts + per-key sum). */
  def bucketCountsTableOver(hashes: DataFrame, bandCols: Seq[String]): DataFrame =
    bandKeyRows(hashes.select(col("media_id") +: bandCols.map(col): _*), bandCols)
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))

  /** [[bucketCountsTableOver]] for the 4 × 16-bit layout. */
  def bucketCountsTable(hashes: DataFrame): DataFrame =
    bucketCountsTableOver(hashes, NarrowBands)

  /** [[nearDuplicatesIncrementalOver]] for the 4 × 16-bit layout. */
  def nearDuplicatesIncremental(
      newHashes: DataFrame,
      indexHashes: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000,
      indexBucketCounts: Option[DataFrame] = None): DataFrame =
    nearDuplicatesIncrementalOver(newHashes, indexHashes, NarrowBands,
      maxHamming, maxBucket, indexBucketCounts)

  /** OFFSET-TOLERANT near-duplicate pairs over a FRAME-KEYED hash
    * table `(media_id, frame_no, b0..b3)` — the shared core of
    * [[VideoDedup.nearDuplicatesAligned]] (per-frame dHash) and
    * [[AudioDedup.nearDuplicatesAligned]] (fixed-stride envelope
    * frames): trimmed copies of the same cut/recording align at a
    * nonzero frame offset the same-length contract misses. Candidates
    * collide on (band, key) across ANY frame pair, carrying
    * `offset = frame_no_a − frame_no_b`; the verify aligns the two
    * items under that offset and keeps (pair, offset) rows whose
    * overlapping window has ≥ `minOverlap` frames, EVERY one within
    * `maxPerFrameHamming` (≤ 3, the 4-band pigeonhole — exact per
    * overlapping window, see [[VideoDedup]]'s doc for the argument).
    * Dropping frame_no from the collision key widens buckets
    * nFrames×; `maxBucket` still bounds hot keys (silently — audit
    * with [[bucketCost]]). The band layout is a parameter for exactly
    * that reason: the offset-tolerant mode's deliberately narrower
    * keyspace saturates nFrames× sooner, so the wide 8 × 32-bit
    * layout (2^32 keys per band AND per-frame exactness to
    * Hamming ≤ 7) is the production remedy here just as it is for
    * still images.
    * Output: (media_id_a, media_id_b, offset, n_overlap,
    * max_frame_hamming), one row per qualifying alignment. */
  def nearDuplicatesAlignedOver(
      frames: DataFrame,
      bandCols: Seq[String],
      maxPerFrameHamming: Int,
      minOverlap: Int = 2,
      maxBucket: Int = 10000): DataFrame = {
    require(bandCols.size >= 2, s"need at least 2 bands, got $bandCols")
    require(maxPerFrameHamming >= 0 && maxPerFrameHamming <= bandCols.size - 1,
      s"maxPerFrameHamming must be in 0..${bandCols.size - 1} for the " +
        s"${bandCols.size}-band exactness guarantee, got $maxPerFrameHamming")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val h = frames.select(col("media_id") +: col("frame_no") +: bandCols.map(col): _*)
    val keyed = h.select(col("media_id"), col("frame_no"),
      explode(array(bandCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("band"), col(c).cast("long").as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("frame_no"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val guarded = dropOverCap(keyed, Seq("band", "key"), maxBucket)
    val cand = guarded.as("l")
      .join(guarded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("media_id_a"), col("r.media_id").as("media_id_b"),
        (col("l.frame_no") - col("r.frame_no")).cast("long").as("offset"))
      .distinct()
    val ham = bandCols.map(c =>
      bit_count(col(s"ha.$c").bitwiseXOR(col(s"hb.$c")))).reduce(_ + _)
    cand
      .join(h.as("ha"), col("media_id_a") === col("ha.media_id"))
      .join(h.as("hb"),
        col("media_id_b") === col("hb.media_id") &&
          col("ha.frame_no").cast("long") === col("hb.frame_no").cast("long") + col("offset"))
      .select(col("media_id_a"), col("media_id_b"), col("offset"),
        ham.cast("long").as("__fh"))
      .groupBy(col("media_id_a"), col("media_id_b"), col("offset"))
      .agg(count(lit(1)).as("n_overlap"), max(col("__fh")).as("max_frame_hamming"))
      .filter(col("n_overlap") >= minOverlap &&
        col("max_frame_hamming") <= maxPerFrameHamming)
  }

  /** [[nearDuplicatesAlignedOver]] on the classic 4 × 16-bit layout —
    * exact per overlapping window for Hamming ≤ 3. */
  def nearDuplicatesAligned(
      frames: DataFrame,
      maxPerFrameHamming: Int = 3,
      minOverlap: Int = 2,
      maxBucket: Int = 10000): DataFrame =
    nearDuplicatesAlignedOver(frames, NarrowBands, maxPerFrameHamming,
      minOverlap, maxBucket)

  /** Truncation telemetry for a cap over the given band columns: ONE
    * row — `(candidate_pairs, capped_pairs, capped_buckets,
    * max_bucket_sz)`. `candidate_pairs` is Σ sz·(sz−1)/2 over the
    * (band, key) buckets (the verification work the banded join
    * emits, pre-distinct); `capped_pairs` is the share in buckets the
    * guard drops ENTIRELY — the silent recall loss the exactness
    * statement doesn't price in once buckets saturate. Scale shape:
    * one groupBy on the same (band, key) the production join shuffles
    * on, then a one-row aggregate — costs one candidate-generation
    * shuffle, no join. */
  def bucketCostOver(
      hashes: DataFrame, bandCols: Seq[String], maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    bandKeyRows(hashes.select(col("media_id") +: bandCols.map(col): _*), bandCols)
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

  /** [[bucketCostOver]] for the 4 × 16-bit layout. */
  def bucketCost(hashes: DataFrame, maxBucket: Int): DataFrame =
    bucketCostOver(hashes, NarrowBands, maxBucket)

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
