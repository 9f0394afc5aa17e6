package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents head-to-tail on a single token
  * axis in deterministic id order and cut fixed-budget training
  * sequences — the "concat-and-chunk" step that turns a curated
  * corpus into equal-length LLM training rows. Each document gets its
  * global token offset, the sequence it starts in, and its position
  * within that sequence; a downstream writer groups by `seq_id` to
  * emit packed rows.
  *
  * The global prefix sum is a two-level scan, never a
  * single-partition window: token counts first accumulate WITHIN
  * id-range buckets (a window partitioned by the bucket key — one
  * bounded shuffle, ≤ `bucketSize` ids per bucket), then each
  * bucket's base offset is a cumulative sum over per-bucket totals —
  * a relation of corpus-rows / bucketSize rows, small enough that its
  * unpartitioned window is a deliberate single-partition step over
  * metadata, not data — broadcast back onto the bucketed rows. At
  * 100 TB: two bounded shuffles plus one broadcast; no global sort,
  * no data-sized single-partition window.
  */
object Packer {

  /** Output: doc_id, n_tokens, offset (global token start), seq_id
    * (= offset div budget), seq_pos (= offset mod budget). */
  def packed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      bucketSize: Long = 4096L): DataFrame = {
    val counted = docs.select(col(idCol).cast("long").as("doc_id"),
        TextStats.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__bucket", expr(s"doc_id div $bucketSize"))
    val withinW = Window.partitionBy(col("__bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = counted.withColumn("__within",
      coalesce(sum(col("n_tokens")).over(withinW), lit(0L)))
    val totals = counted.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__total"))
    // one row per bucket: the unpartitioned window here is metadata-
    // sized by construction (see scaladoc)
    val baseW = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = totals
      .withColumn("__base", coalesce(sum(col("__total")).over(baseW), lit(0L)))
      .select(col("__bucket"), col("__base"))
    within.join(broadcast(bases), "__bucket")
      .withColumn("offset", col("__base") + col("__within"))
      .select(col("doc_id"), col("n_tokens"), col("offset"),
        expr(s"offset div $budget").as("seq_id"),
        (col("offset") % budget).as("seq_pos"))
  }

  /** The packed rows themselves: one output row per token, placed at
    * its global position — `seq_id` is the training sequence the
    * token lands in, `pos_in_seq` its slot. Documents straddling a
    * sequence boundary split naturally (each token is placed
    * independently), exactly like concat-and-chunk training data.
    * A writer groups by `seq_id` and sorts by `pos_in_seq`.
    *
    * Scale shape: [[packed]]'s offsets join back to the tokenized
    * corpus on `doc_id` (both sides hash-partition on the id — one
    * co-keyed shuffle), then the explode is row-local. Token rows
    * never carry text payloads other than their own token. */
  def packedTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      bucketSize: Long = 4096L): DataFrame = {
    val offsets = packed(docs, idCol, textCol, budget, bucketSize)
      .select(col("doc_id"), col("offset"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      Shingles.tokens(col(textCol)).as("__toks"))
    toks.join(offsets, "doc_id")
      .select(col("doc_id"), col("offset"),
        posexplode(col("__toks")).as(Seq("pos", "token")))
      .select(
        expr(s"(offset + pos) div $budget").as("seq_id"),
        ((col("offset") + col("pos")) % budget).as("pos_in_seq"),
        col("token"), col("doc_id"))
  }
}
