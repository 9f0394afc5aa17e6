package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules and repetition signals — the
  * rule-based pre-filter stage of a large-scale LLM training-data
  * pipeline (Rae et al. 2021, arXiv:2112.11446 §A1.1; the same family
  * of filters used by MassiveText/C4-style curation).
  *
  * Everything is row-local column algebra over each document's own
  * line/token arrays — NO shuffle for the per-document signals, so the
  * stage scales with the scan partitioning and composes with
  * [[graft.api.CurationPipeline]]'s gate. The only shuffled signal is
  * the top-n-gram coverage ([[topBigramCoverage]]), which needs a
  * per-(doc, bigram) count: that is one partial-aggregable groupBy on
  * the doc+bigram key plus a per-doc max — both map-side combinable,
  * never a per-document collect.
  *
  * HOF discipline (SNIPPETS "interpreted-HOF trap"): the `__lines` /
  * `__toks` arrays are materialized as their own projection and
  * referenced repeatedly, so the lambdas below consume a bound column,
  * not a re-evaluated `split()` subtree.
  */
object QualityRules {

  /** Gopher's "must contain 2 of these" stop list (§A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document quality signals. Output one row per non-empty doc:
    * `n_words, mean_word_len, symbol_word_ratio, bullet_line_ratio,
    * ellipsis_line_ratio, alpha_word_ratio, stopword_distinct,
    * dup_line_frac, gopher_pass`. */
  def signals(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(
      col(idCol),
      col(textCol).as("__text"),
      split(col(textCol), "\n").as("__lines"),
      Shingles.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)

    val n = size(col("__toks")).cast("double")
    val meanWordLen = aggregate(col("__toks"), lit(0L),
      (acc, t) => acc + length(t)).cast("double") / n
    // Gopher counts '#' and ellipsis glyphs as "symbols"
    val hashCount = (length(col("__text")) -
      length(regexp_replace(col("__text"), "#", ""))).cast("double")
    val ellipsisCount =
      (size(split(col("__text"), "\\.\\.\\.", -1)) - 1 +
        size(split(col("__text"), "…", -1)) - 1).cast("double")
    val nonEmptyLines = filter(col("__lines"), l => trim(l) =!= "")
    val nLines = size(nonEmptyLines).cast("double")
    val bulletLines = size(filter(nonEmptyLines,
      l => trim(l).rlike("^[-*•]"))).cast("double")
    val ellipsisLines = size(filter(nonEmptyLines,
      l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("double")
    val alphaWords = size(filter(col("__toks"), t => t.rlike("[a-z]"))).cast("double")
    val stopHits = size(array_intersect(
      array_distinct(col("__toks")),
      typedLit(GopherStopwords))).cast("int")
    val dupLineFrac = when(nLines > 0,
      lit(1.0) - size(array_distinct(nonEmptyLines)).cast("double") / nLines)
      .otherwise(0.0)

    val sig = base.select(
      col(idCol),
      n.cast("long").as("n_words"),
      meanWordLen.as("mean_word_len"),
      ((hashCount + ellipsisCount) / n).as("symbol_word_ratio"),
      when(nLines > 0, bulletLines / nLines).otherwise(0.0).as("bullet_line_ratio"),
      when(nLines > 0, ellipsisLines / nLines).otherwise(0.0).as("ellipsis_line_ratio"),
      (alphaWords / n).as("alpha_word_ratio"),
      stopHits.as("stopword_distinct"),
      dupLineFrac.as("dup_line_frac"))

    // Gopher §A1.1 thresholds (word-count band relaxed to the corpus
    // scale here; the bounds are parameters of the pass column only)
    sig.withColumn("gopher_pass",
      col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_word_ratio") <= 0.1 &&
        col("bullet_line_ratio") <= 0.9 &&
        col("ellipsis_line_ratio") <= 0.3 &&
        col("alpha_word_ratio") >= 0.8 &&
        col("stopword_distinct") >= 2 &&
        col("dup_line_frac") <= 0.3)
  }

  /** Repetition signal: the most frequent token bigram per document and
    * the fraction of the document's tokens it covers (2·count/n_words
    * — the token-count analogue of Gopher's top-2-gram character
    * fraction, documented deviation). One exploded groupBy on
    * (doc, bigram) with map-side combine, then an order-free
    * `max_by`-style struct max per doc — no window, no collect. Ties
    * break to the lexicographically smallest bigram. */
  def topBigramCoverage(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), Shingles.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
    val bigrams = toks.select(col(idCol),
      size(col("__toks")).cast("double").as("__n"),
      explode(Shingles.shingles(col("__toks"), 2)).as("bigram"))
    bigrams
      .groupBy(col(idCol), col("__n"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      // min over (-cnt, bigram): highest count, then smallest bigram
      .agg(min(struct((-col("cnt")).as("negcnt"), col("bigram"), col("__n"))).as("__top"))
      .select(
        col(idCol),
        col("__top.bigram").as("top_bigram"),
        (-col("__top.negcnt")).as("top_bigram_count"),
        (-col("__top.negcnt") * 2.0 / col("__top.__n")).as("top_bigram_frac"))
  }
}
