package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting: score every raw document by how
  * much it looks like a small target corpus, using hashed unigram
  * features — `log p_target(doc) − p_raw(doc)` under two smoothed
  * bag-of-buckets models. The canonical data-selection recipe (Xie et
  * al., "Data Selection for Language Models via Importance Resampling"):
  * rank/resample the raw corpus by this weight to up-sample
  * target-domain-like documents.
  *
  * Relational shape: hash every token into `numBuckets` buckets
  * ([[TextHash.polyHash]] mod B, so the oracle replays it exactly),
  * build two B-row count tables (target side and raw side), join them
  * into a B-row log-ratio table, and score each document with one
  * broadcast join from its token-bucket stream. The only corpus-wide
  * shuffle is the bucket `groupBy` (B keys, map-side combined); the
  * scoring join is broadcast because B is fixed and tiny. At 100 TB
  * nothing about this grows except the already-partitioned token scan.
  *
  * The target set must be deterministic for the oracle, so it is
  * selected by `doc_id % targetMod == targetRem` (the same derived-set
  * trick as benchmark decontamination). Real deployments pass any
  * predicate — the algebra is unchanged.
  *
  * Float determinism: per-bucket log-ratios are rounded to 6 decimals
  * and summed as DECIMAL(20,9) per document (order-insensitive).
  */
object Dsir {

  val NumBuckets = 512

  /** Per-document importance weight. Output: doc_id, n_tokens,
    * log_weight (sum over token occurrences of the bucket log-ratio,
    * rounded to 6 decimals). */
  def weights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetMod: Int = 17,
      targetRem: Int = 3,
      numBuckets: Int = NumBuckets): DataFrame = {
    val tk = docs.select(
        col(idCol).cast("long").as("doc_id"),
        explode(Shingles.tokens(col(textCol))).as("w"))
      .select(col("doc_id"), pmod(TextHash.polyHash(col("w")), lit(numBuckets.toLong)).as("bkt"))
    val target = tk.filter(pmod(col("doc_id"), lit(targetMod.toLong)) === targetRem)
    val tCnt = target.groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
    val rCnt = tk.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
    val tTot = target.agg(count(lit(1)).as("nt"))
    val rTot = tk.agg(count(lit(1)).as("nr"))
    // dense B-row ratio table: every bucket present, add-one smoothed
    val buckets = docs.sparkSession.range(numBuckets).select(col("id").as("bkt"))
    val ratio = buckets
      .join(tCnt, Seq("bkt"), "left").na.fill(0L, Seq("ct"))
      .join(rCnt, Seq("bkt"), "left").na.fill(0L, Seq("cr"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bkt"),
        round(
          log(((col("ct") + lit(1.0)) / (col("nt") + lit(numBuckets.toDouble))) /
            ((col("cr") + lit(1.0)) / (col("nr") + lit(numBuckets.toDouble)))),
          6).cast("decimal(20,9)").as("lr"))
    tk.join(broadcast(ratio), "bkt")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("s").cast("double"), 6).as("log_weight"))
  }
}
