package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seed-vs-corpus quality classification — the GPT-3/CCNet curation
  * recipe (Brown et al. 2020 appendix A; Wenzek et al. 2019): train a
  * linear text classifier where the POSITIVE class is a trusted seed
  * slice of the corpus (curated sources standing in for
  * WebText/Wikipedia) and the NEGATIVE class is everything else, then
  * score every document and keep the ones that look like the seed.
  *
  * The trainer is the relational closed form of that classifier:
  * add-one-smoothed Naive-Bayes log-odds per word,
  * `ln((c_pos+1)/(N_pos+V)) − ln((c_neg+1)/(N_neg+V))` — the
  * one-pass, shuffle-once analogue of fastText's logistic fit (same
  * bag-of-words features, closed-form weights instead of SGD). A
  * document's score is its mean token log-odds; `keep = score > 0`
  * is the symmetric decision rule.
  *
  * Scale shape (the [[NgramLm]] pattern, proved green there):
  *  - class word counts are ONE groupBy over the token stream keyed on
  *    the word — partial aggregation absorbs the corpus size, the
  *    count tables are vocabulary-sized (Zipf-bounded);
  *  - totals and the vocabulary size are one-row aggregates broadcast
  *    into the weight table — never collected to the driver;
  *  - scoring joins the token stream back to the weight table on the
  *    word key; at 100 TB a `minCount` prune makes the weight side
  *    broadcastable and the scan stays the only corpus-sized pass.
  *
  * Determinism: each log-odds weight is `round(ln(...), 6)` cast to
  * DECIMAL(20,9) before the per-document sum, so summation order
  * cannot change the result and the DuckDB oracle
  * (`q_doc_quality_clf`) replays training and scoring exactly.
  */
object QualityClassifier {

  /** Per-word log-odds weight table: (w, c_pos, c_neg, lo). */
  def weights(docs: DataFrame, textCol: String, seed: Column): DataFrame = {
    val tk = docs.select(seed.cast("int").as("__pos"),
        explode(Shingles.tokens(col(textCol))).as("w"))
    val wc = tk.groupBy(col("w")).agg(
      sum(col("__pos")).cast("long").as("c_pos"),
      sum(lit(1) - col("__pos")).cast("long").as("c_neg"))
    val tot = wc.agg(
      sum(col("c_pos")).cast("double").as("__np"),
      sum(col("c_neg")).cast("double").as("__nn"),
      count(lit(1)).cast("double").as("__v")) // 1 row, broadcast
    wc.crossJoin(broadcast(tot))
      .select(col("w"), col("c_pos"), col("c_neg"),
        round(log((col("c_pos") + lit(1.0)) / (col("__np") + col("__v"))) -
              log((col("c_neg") + lit(1.0)) / (col("__nn") + col("__v"))), 6)
          .as("lo"))
  }

  /** Per-document classification: (doc_id, n_tokens, score, keep) —
    * score = mean token log-odds (round 6), keep = score > 0. */
  def scored(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seed: Column): DataFrame = {
    val lo = weights(docs, textCol, seed)
      .select(col("w"), col("lo").cast("decimal(20,9)").as("__lo"))
    val tk = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(Shingles.tokens(col(textCol))).as("w"))
    // collapse the stream to (doc, word-type) BEFORE the weight join:
    // Σ_occurrences lo == Σ_types n·lo exactly (decimal × integer),
    // and the join probes per distinct word per doc, not per token
    val dw = tk.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    dw.join(lo, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"), sum(col("__lo") * col("n")).as("__s"))
      .select(col("doc_id"), col("n_tokens"),
        // round through DECIMAL — see [[KneserNey.scored]]
        round((col("__s").cast("double") / col("n_tokens"))
          .cast("decimal(20,9)"), 6).cast("double").as("score"))
      .withColumn("keep", col("score") > 0)
  }
}
