package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSH recall evaluation — the measurement a curation pipeline runs
  * before trusting banded MinHash at scale: against the exact n-gram
  * Jaccard ground truth ([[Jaccard.nearDuplicates]], df-capped
  * inverted index), what fraction of true near-duplicate pairs does
  * the banded-LSH path ([[MinHash.nearDuplicates]]) actually surface,
  * per similarity threshold? This is the empirical S-curve for the
  * configured (bands, rows) — the knob-tuning artifact the theory
  * curve `1 − (1 − s^r)^b` only approximates.
  *
  * Scale shape: both inputs are pair relations (already bounded by
  * their own candidate-generation guards), joined on the pair key; the
  * per-threshold metrics are ONE conditional aggregate over that
  * joined relation (single pass, no per-threshold jobs), exploded back
  * to one row per threshold.
  *
  * Output: (threshold, n_truth, n_detected, recall) — recall null when
  * the threshold bucket has no true pairs.
  */
object LshEval {

  def recallCurve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      thresholds: Seq[Double] = Seq(0.1, 0.15, 0.2, 0.3),
      maxDf: Int = 50): DataFrame = {
    val tmin = thresholds.min
    val truth = Jaccard.nearDuplicates(docs, idCol, textCol, n, tmin, maxDf)
    val det = MinHash.nearDuplicates(docs, idCol, textCol, n, tmin)
    val j = truth.select(col("id_a"), col("id_b"), col("jaccard"))
      .join(det.select(col("id_a"), col("id_b"), lit(1L).as("__hit")),
        Seq("id_a", "id_b"), "left")
      .select(col("jaccard"), coalesce(col("__hit"), lit(0L)).as("__hit"))
    val aggCols = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"__nt$i"),
        sum(when(col("jaccard") >= t, col("__hit")).otherwise(0L)).as(s"__nd$i"))
    }
    val one = j.agg(aggCols.head, aggCols.tail: _*)
    val rows = array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"),
        coalesce(col(s"__nt$i"), lit(0L)).as("n_truth"),
        coalesce(col(s"__nd$i"), lit(0L)).as("n_detected"))
    }: _*)
    one.select(explode(rows).as("r"))
      .select(col("r.threshold").as("threshold"),
        col("r.n_truth").as("n_truth"),
        col("r.n_detected").as("n_detected"),
        when(col("r.n_truth") > 0,
          round((col("r.n_detected").cast("double") / col("r.n_truth"))
            .cast("decimal(20,9)"), 6).cast("double")).as("recall"))
  }
}
