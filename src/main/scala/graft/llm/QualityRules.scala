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

  /** C4's document blocklist terms (Raffel et al. 2020 §2.2): a doc
    * containing any of these is dropped whole. The curly brace is
    * C4's code heuristic; "lorem ipsum" is placeholder text; the
    * badword entries stand in for C4's full blocklist (the real list
    * is a deployment artifact — swap it in via the parameter). */
  val C4DocBlocklist: Seq[String] = Seq("{", "lorem ipsum", "badword")

  /** C4's line-and-document cleaning (Raffel et al. 2020 §2.2) —
    * THE reference recipe this family descends from. Line rules (a
    * line survives iff ALL hold):
    *   - ends in terminal punctuation: `. ! ? "`;
    *   - has at least `minLineWords` (5) whitespace words;
    *   - does not contain `javascript` (case-insensitive).
    * Document rules (after line cleaning; the doc survives iff ALL
    * hold):
    *   - at least `minLines` (3) retained lines (C4's "3 sentences",
    *     with lines standing in for sentences — documented deviation);
    *   - contains none of [[C4DocBlocklist]] (case-insensitive).
    * Output: one row per SURVIVING document — doc id, the cleaned
    * `text` (retained lines joined by newlines), `n_lines_kept`,
    * `n_lines_dropped`.
    *
    * Scale shape: pure row-local array algebra (split → filter →
    * join) — NO shuffle; the whole pass rides the scan like
    * [[signals]]. The `__lines` array is materialized once and every
    * lambda consumes the bound column (the interpreted-HOF rule). */
  def c4Clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minLineWords: Int = 5,
      minLines: Int = 3,
      blocklist: Seq[String] = C4DocBlocklist): DataFrame = {
    require(minLineWords >= 1 && minLines >= 1, "thresholds must be >= 1")
    val base = docs.select(col(idCol), lower(col(textCol)).as("__lower"),
      transform(split(col(textCol), "\n"), l => trim(l)).as("__lines"))
    val kept = filter(col("__lines"), l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))
    val blocked = blocklist.map(t => col("__lower").contains(t.toLowerCase))
      .reduce(_ || _)
    base.select(col(idCol), kept.as("__kept"),
        (size(col("__lines")) - size(kept)).as("n_lines_dropped"), blocked.as("__b"))
      .filter(size(col("__kept")) >= minLines && !col("__b"))
      .select(col(idCol), array_join(col("__kept"), "\n").as("text"),
        size(col("__kept")).cast("long").as("n_lines_kept"),
        col("n_lines_dropped").cast("long").as("n_lines_dropped"))
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

  /** Gopher's published repetition thresholds (Rae et al. 2021 Table
    * A1): top n-gram character fraction for n = 2..4, duplicate n-gram
    * character fraction for n = 5..10. */
  val TopNgramThresholds: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupNgramThresholds: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** Gopher's FULL repetition-signal matrix (Rae et al. 2021 §A1.1,
    * Table A1) — the companion to [[signals]]' structural rules:
    *
    *  - `dup_line_frac` / `dup_para_frac`: fraction of non-empty
    *    lines/paragraphs belonging to a value that occurs 2+ times in
    *    the document (ALL occurrences counted — a stricter reading than
    *    [[signals]]' extra-occurrence `dup_line_frac`, kept distinct on
    *    purpose);
    *  - `dup_line_char_frac` / `dup_para_char_frac`: the same,
    *    character-weighted;
    *  - `top_{n}gram_char_frac` (n ∈ topNs): characters covered by the
    *    most frequent token n-gram (count × its token characters) over
    *    total token characters — ties break to the smallest n-gram;
    *  - `dup_{n}gram_char_frac` (n ∈ dupNs): characters of token
    *    POSITIONS covered by any n-gram occurring 2+ times — a true
    *    position-set union, so overlapping duplicate occurrences are
    *    never double-counted;
    *  - `rep_pass`: all signals within the published thresholds
    *    (line/para ≤ 0.30 count / 0.20 char; [[TopNgramThresholds]] /
    *    [[DupNgramThresholds]] for the n-gram families — ns without a
    *    published threshold don't gate).
    *
    * Documented deviation: "characters" are token characters
    * (whitespace excluded) for the n-gram signals and raw line /
    * trimmed paragraph lengths for the unit signals.
    *
    * Scale shape: one explode carries every requested n (the per-n
    * shingle arrays are built in a single projection and flattened —
    * the scan is read ONCE, not once per n); all groupBys/joins key on
    * (doc, n, gram) or (doc, idx) — doc-local keys, partial-aggregable,
    * never a per-document collect and never an all-pairs product. */
  def repetitionSignals(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): DataFrame = {
    require(topNs.nonEmpty && dupNs.nonEmpty, "topNs and dupNs must be non-empty")
    require((topNs ++ dupNs).forall(_ >= 1), "n-gram sizes must be >= 1")
    val id = col(idCol)
    val base = docs.select(id, col(textCol).as("__text"),
        Shingles.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)

    val totChars = base.select(id,
      aggregate(col("__toks"), lit(0L), (a, t) => a + length(t)).as("__tot"))

    // ---- duplicate line / paragraph fractions (count + char weighted)
    def unitAgg(units: Column, prefix: String): DataFrame =
      base.select(id, explode(units).as("__u"))
        .groupBy(id, col("__u")).agg(count(lit(1)).as("__c"))
        .select(id, col("__c"), length(col("__u")).cast("long").as("__l"))
        .groupBy(id)
        .agg(
          sum(col("__c")).as("__t"),
          sum(when(col("__c") >= 2, col("__c")).otherwise(0L)).as("__d"),
          sum(col("__c") * col("__l")).as("__tc"),
          sum(when(col("__c") >= 2, col("__c") * col("__l")).otherwise(0L)).as("__dc"))
        .select(id,
          (col("__d").cast("double") / col("__t")).as(s"dup_${prefix}_frac"),
          (col("__dc").cast("double") / col("__tc")).as(s"dup_${prefix}_char_frac"))
    val lineAgg = unitAgg(
      filter(split(col("__text"), "\n"), l => trim(l) =!= ""), "line")
    val paraAgg = unitAgg(
      filter(transform(split(col("__text"), "\n\n"), p => trim(p)), p => p =!= ""), "para")

    // ---- one exploded (doc, n, pos, ngram) relation for every n ----
    val allNs = (topNs ++ dupNs).distinct.sorted
    val annotated = allNs.map { n =>
      when(size(col("__toks")) >= n,
        transform(sequence(lit(0), size(col("__toks")) - n),
          i => struct(lit(n).as("n"), i.as("pos"),
            array_join(slice(col("__toks"), i + 1, lit(n)), " ").as("ng"))))
        .otherwise(array().cast("array<struct<n:int,pos:int,ng:string>>"))
    }
    val ng = base.select(id, explode(flatten(array(annotated: _*))).as("__s"))
      .select(id, col("__s.n").as("__n"), col("__s.pos").as("__pos"),
        col("__s.ng").as("__ng"))
    val ngc = ng.groupBy(id, col("__n"), col("__ng")).agg(count(lit(1)).as("__cnt"))

    // ---- top n-gram char coverage: count × token chars of the top gram
    val topChars = ngc.filter(col("__n").isin(topNs: _*))
      .groupBy(id, col("__n"))
      .agg(min(struct((-col("__cnt")).as("negcnt"), col("__ng").as("ng"))).as("__top"))
      .select(id, col("__n"),
        ((-col("__top.negcnt")) *
          (length(col("__top.ng")) - (col("__n") - 1)).cast("long")).as("__chars"))
    val topExprs = topNs.map(x =>
      max(when(col("__n") === x, col("__chars"))).as(s"__top$x"))
    val topAgg = topChars.groupBy(id).agg(topExprs.head, topExprs.tail: _*)

    // ---- duplicate n-gram char coverage: position-set union ----
    val dupStarts = ng.filter(col("__n").isin(dupNs: _*))
      .join(ngc.filter(col("__cnt") >= 2).select(id, col("__n"), col("__ng")),
        Seq(idCol, "__n", "__ng"))
    val covered = dupStarts
      .select(id, col("__n"),
        explode(sequence(col("__pos"), col("__pos") + col("__n") - 1)).as("__idx"))
      .distinct()
    val tokLens = base
      .select(id, posexplode(col("__toks")).as(Seq("__idx", "__tok")))
      .select(id, col("__idx"), length(col("__tok")).cast("long").as("__l"))
    val dupChars = covered.join(tokLens, Seq(idCol, "__idx"))
      .groupBy(id, col("__n")).agg(sum(col("__l")).as("__chars"))
    val dupExprs = dupNs.map(x =>
      max(when(col("__n") === x, col("__chars"))).as(s"__dup$x"))
    val dupAgg = dupChars.groupBy(id).agg(dupExprs.head, dupExprs.tail: _*)

    def fr(c: Column) = coalesce(c.cast("double") / col("__tot"), lit(0.0))
    val sig = totChars
      .join(lineAgg, Seq(idCol), "left")
      .join(paraAgg, Seq(idCol), "left")
      .join(topAgg, Seq(idCol), "left")
      .join(dupAgg, Seq(idCol), "left")
      .select(id +: (Seq(
        col("dup_line_frac"), col("dup_line_char_frac"),
        col("dup_para_frac"), col("dup_para_char_frac")) ++
        topNs.map(x => fr(col(s"__top$x")).as(s"top_${x}gram_char_frac")) ++
        dupNs.map(x => fr(col(s"__dup$x")).as(s"dup_${x}gram_char_frac"))): _*)
    val gates =
      Seq(col("dup_line_frac") <= 0.30, col("dup_para_frac") <= 0.30,
        col("dup_line_char_frac") <= 0.20, col("dup_para_char_frac") <= 0.20) ++
        topNs.flatMap(x => TopNgramThresholds.get(x)
          .map(t => col(s"top_${x}gram_char_frac") <= t)) ++
        dupNs.flatMap(x => DupNgramThresholds.get(x)
          .map(t => col(s"dup_${x}gram_char_frac") <= t))
    sig.withColumn("rep_pass", gates.reduce(_ && _))
  }
}
