package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-balanced shard assignment — the write-side layout step that
  * turns a curated corpus into N training shards with near-equal
  * token mass (so data-parallel readers finish epochs together
  * instead of waiting on one heavy shard).
  *
  * Greedy bin-packing (always-fill-lightest) is inherently sequential,
  * so the distributed heuristic is BANDED ROUND-ROBIN: documents are
  * banded by token count (integer division — no float log, so band
  * edges replay exactly in the oracle), and each band deals its
  * members round-robin across the N shards in deterministic id order.
  * Every shard receives the same count (±1) from every band — the
  * invariant the balance rests on: per-shard token totals differ only
  * by the within-band spread (< bandWidth per deal round), vanishing
  * relative to shard mass as the corpus grows, robust to skew because
  * heavy documents sit in their own bands.
  *
  * The within-band rank is the same two-level scan as [[Packer]]:
  * ranks accumulate within (band, id-range bucket) partitions — one
  * bounded shuffle — then per-bucket counts roll up into band-local
  * base offsets (a relation of buckets-per-band rows, metadata-sized)
  * broadcast back onto the rows. No global sort, no data-sized
  * single-partition window; the deal order is total because the
  * bucket key is monotone in the id.
  */
object Sharder {

  /** Output: doc_id, n_tokens, band, shard — shard in [0, nShards). */
  def assign(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      bandWidth: Long = 64L,
      bucketSize: Long = 4096L): DataFrame = {
    val counted = docs.select(col(idCol).cast("long").as("doc_id"),
        TextStats.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("band", expr(s"n_tokens div $bandWidth"))
      .withColumn("__bucket", expr(s"doc_id div $bucketSize"))
    val withinW = Window.partitionBy(col("band"), col("__bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = counted.withColumn("__within",
      coalesce(count(lit(1)).over(withinW), lit(0L)))
    val totals = counted.groupBy(col("band"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
    // per-band cumulative bucket counts: buckets-per-band rows only
    val baseW = Window.partitionBy(col("band")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = totals
      .withColumn("__base", coalesce(sum(col("__n")).over(baseW), lit(0L)))
      .select(col("band"), col("__bucket"), col("__base"))
    within.join(broadcast(bases), Seq("band", "__bucket"))
      .withColumn("shard", (col("__base") + col("__within")) % nShards)
      .select(col("doc_id"), col("n_tokens"), col("band"), col("shard"))
  }

  /** Per-shard balance summary over [[assign]]'s output. */
  def shardStats(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
}
