package graft.api

import graft.llm._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-stop user journey for training-data curation — the composed
  * flow a 100 TB corpus pipeline actually runs, staged over the
  * `graft.llm` operators (no counterpart in the reference repo; this
  * realizes the engine brief's curation requirements end-to-end):
  *
  *  0. Optional pre-passes, each independently oracle-verified:
  *     [[urlHygiene]] (canonical-URL dedup + per-host caps — the
  *     crawl-side cut that runs before any text is even read),
  *     [[graft.llm.Scrub.scrub]] (URL/e-mail/IP masking),
  *     [[graft.llm.LineDedup.dedupLines]] (corpus-level boilerplate
  *     line removal), [[gopherGate]] (Gopher rule filter),
  *     [[repetitionGate]] (the full Rae et al. Table-A1 repetition
  *     matrix), [[graft.llm.SpanDedup.stats]] (ExactSubstr-style
  *     repeated-span pressure — drop or trim docs that are mostly
  *     copied text). Multimodal corpora run the same journey with
  *     [[graft.llm.ImageDedup]] (dHash / wide / [[graft.llm.PHashDct]]
  *     DCT pHash) / [[graft.llm.AudioDedup]] / [[graft.llm.VideoDedup]]
  *     standing in for stage 3-4 on their binary columns — including
  *     the offset-tolerant trimmed-copy class via
  *     [[graft.llm.BandedHamming.nearDuplicatesAligned]].
  *  1. [[score]] — row-local text stats: token counts, language ID,
  *     quality score (no shuffle).
  *  2. [[gate]] — quality/language filters (predicate-pushdown
  *     friendly: plain filters over the scored table).
  *  3. [[nearDuplicatePairs]] — MinHash + banded LSH with the
  *     bucket-size guard; shuffles on band keys only.
  *  4. [[dedup]] — connected components over the pairs → per-document
  *     cluster id + canonical keep flag; drops non-canonical docs.
  *  5. [[chunk]] — context-window packing of the surviving corpus.
  *  6. Optional post-passes, each independently oracle-verified:
  *     [[decontaminate]] (drop benchmark-overlapping docs — run
  *     BEFORE dedup canonicalization would also be valid; after, it
  *     sees 1/cluster), [[mix]] (source-ratio down-sampling),
  *     [[pack]] ([[graft.llm.Packer.packedTokens]] — fixed-budget
  *     training rows on the global token axis), or BPE segmentation
  *     via [[graft.llm.Bpe.segments]].
  *  7. Optional corpus-level scoring passes for selection/bucketing,
  *     each independently oracle-verified: [[perplexityScore]]
  *     (CCNet-style bigram-LM nll — bucket by it, keep the head),
  *     [[importanceWeights]] (DSIR target-likeness — rank/resample by
  *     it), [[retrieve]] (BM25 topical top-k — pull a targeted
  *     subset).
  *
  * Each stage is a lazy DataFrame, so any prefix of the journey is a
  * single Catalyst plan; the expensive stages (3-4) run over the gated
  * subset, not the raw corpus — the order IS the optimization.
  */
object CurationPipeline {

  /** Stage 1: per-document stats. Adds n_tokens, lang_guess, quality. */
  def score(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("__toks", Shingles.tokens(col(textCol)))
      .filter(size(col("__toks")) > 0)
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("lang_guess", TextStats.langIdOfTokens(col("__toks")))
      .withColumn("quality", TextStats.qualityScoreOfTokens(col("__toks")))
      .drop("__toks")

  /** Stage 2: keep docs above the quality floor with a confident
    * language guess (and optionally restrict to a language set). */
  def gate(
      scored: DataFrame,
      minQuality: Double = 0.5,
      languages: Seq[String] = Nil): DataFrame = {
    val base = scored.filter(col("quality") >= minQuality && col("lang_guess") =!= "und")
    if (languages.isEmpty) base
    else base.filter(col("lang_guess").isin(languages: _*))
  }

  /** Stage 2b (optional, composable with [[gate]]): the Gopher-style
    * rule gate — keep only documents whose [[QualityRules.signals]]
    * pass the composite rule filter. One left-semi join on the doc id;
    * the signals themselves are shuffle-free. */
  def gopherGate(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.join(
      QualityRules.signals(docs, idCol, textCol)
        .filter(col("gopher_pass")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Stage -1: HTML → text ([[graft.llm.HtmlExtract]]) — the
    * extraction every web crawl runs before any text operator sees a
    * byte: drop head/script/style/comments, keep block structure as
    * newlines, decode entities, surface the title and the
    * link-density boilerplate signal. A pure shuffle-free projection;
    * gate on `link_density` alongside the quality rules. */
  def extractHtml(docs: DataFrame, htmlCol: String = "html"): DataFrame =
    HtmlExtract.extract(docs, htmlCol)

  /** Stage 0a: crawl-side URL hygiene — canonical-URL first-crawl-wins
    * dedup, then a per-host document cap (see [[graft.llm.Urls]]; the
    * cap picks survivors with a k-bounded partial aggregation and a
    * broadcast keep-list, so no rank window and no single-task
    * Zipf-head host). Runs before any text stage because it prunes on
    * metadata alone. */
  def urlHygiene(
      docs: DataFrame,
      idCol: String = "doc_id",
      urlCol: String = "url",
      maxPerHost: Int = 10000): DataFrame =
    Urls.hostCap(
      Urls.dedupByUrl(docs, idCol, urlCol).drop("host", "canonical_url"),
      idCol, urlCol, maxPerHost)

  /** Stage 0c: C4's line-and-document cleaning
    * ([[QualityRules.c4Clean]] — the Raffel et al. recipe): line-level
    * boilerplate drops (terminal punctuation, min words, javascript)
    * and whole-document blocklist/min-lines gates, emitting the
    * CLEANED text the later stages consume. Shuffle-free. */
  def c4Clean(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    QualityRules.c4Clean(docs, idCol, textCol)

  /** Stage 2c (optional, composable with [[gate]]/[[gopherGate]]): the
    * full Gopher Table-A1 repetition gate — keep only documents whose
    * [[QualityRules.repetitionSignals]] pass every published
    * threshold. One left-semi join on the doc id; the signals' keys
    * are all doc-local. */
  def repetitionGate(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.join(
      QualityRules.repetitionSignals(docs, idCol, textCol)
        .filter(col("rep_pass")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Stage 3: MinHash near-dup candidate pairs with exact Jaccard
    * verification, guarded against degenerate band buckets. */
  def nearDuplicatePairs(
      gated: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      maxBucket: Option[Int] = Some(10000)): DataFrame =
    // the cap reaches candidate generation inside nearDuplicates, so a
    // pathological band bucket never executes its k² join at all
    MinHash.nearDuplicates(gated, idCol, textCol, threshold = threshold,
      maxBucket = maxBucket)

  /** Stage 4: cluster the pairs, keep one canonical doc per cluster. */
  def dedup(
      gated: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val keep = DedupClusters.keepTable(gated, pairs, idCol)
      .filter(col("keep")).select(col(idCol))
    gated.join(keep, Seq(idCol), "left_semi")
  }

  /** Stage 5: context-window chunks of the surviving corpus. */
  def chunk(
      deduped: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      size: Int = 512,
      stride: Int = 384): DataFrame =
    Chunker.chunks(deduped, idCol, textCol, size, stride)

  /** Stage 6a: drop documents overlapping a benchmark corpus (see
    * [[graft.llm.Decontaminate]] — benchmark side broadcasts). */
  def decontaminate(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      benchIdCol: String = "bench_id",
      benchTextCol: String = "text",
      n: Int = 13,
      minOverlap: Int = 1): DataFrame =
    Decontaminate.clean(docs, idCol, textCol, bench, benchIdCol, benchTextCol,
      n, minOverlap)

  /** Stage 6b: deterministic source-ratio mixing (see
    * [[graft.llm.Mixer]] — md5-keyed scan predicate, no shuffle). */
  def mix(
      docs: DataFrame,
      rates: Map[String, Double],
      idCol: String = "doc_id",
      sourceCol: String = "source",
      defaultRate: Double = 1.0): DataFrame =
    Mixer.sample(docs, idCol, sourceCol, rates, defaultRate)

  /** Stage 6c: fixed-budget training rows — every token placed at its
    * (seq_id, pos_in_seq) slot (see [[graft.llm.Packer]]). */
  def pack(
      docs: DataFrame,
      budget: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Packer.packedTokens(docs, idCol, textCol, budget)

  /** Stage 7a: per-doc average nll under a corpus-trained bigram LM
    * (see [[graft.llm.NgramLm]]). CCNet keeps the low-nll head/middle
    * buckets; join this back on the id to gate. */
  def perplexityScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    NgramLm.scored(docs, idCol, textCol)

  /** Stage 7b: DSIR importance weight of every doc vs a target slice
    * (see [[graft.llm.Dsir]]). Resample the corpus by `log_weight` to
    * up-sample target-domain-like documents. */
  def importanceWeights(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      targetMod: Int = 17,
      targetRem: Int = 3): DataFrame =
    Dsir.weights(docs, idCol, textCol, targetMod, targetRem)

  /** Stage 7c: BM25 top-k retrieval of a topical training subset (see
    * [[graft.llm.Bm25]]). */
  def retrieve(
      docs: DataFrame,
      terms: Seq[String],
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Bm25.topk(docs, idCol, textCol, terms, k)

  /** Stage 7d: seed-vs-corpus quality classification (the GPT-3/CCNet
    * recipe). `trained = false` (default) is the closed-form NB
    * log-odds path — DECIMAL-exact, DuckDB-oracled
    * (`q_doc_quality_clf`); `trained = true` is the MLlib
    * hashed-BoW LogisticRegression fastText analog
    * ([[graft.llm.MlBridge.qualityScored]]) — the production trainer,
    * cross-validated against the NB path in MlBridgeSpec. Gate on
    * `keep` (or rank by `score`) downstream. */
  def classifierScore(
      docs: DataFrame,
      seed: org.apache.spark.sql.Column,
      idCol: String = "doc_id",
      textCol: String = "text",
      trained: Boolean = false): DataFrame =
    if (trained) MlBridge.qualityScored(docs, idCol, textCol, seed)
    else QualityClassifier.scored(docs, idCol, textCol, seed)

  /** The whole journey with defaults. */
  def run(
      docs: DataFrame,
      minQuality: Double = 0.5,
      dupThreshold: Double = 0.8,
      chunkSize: Int = 512,
      chunkStride: Int = 384): DataFrame = {
    val gated = gate(score(docs), minQuality)
    val pairs = nearDuplicatePairs(gated, threshold = dupThreshold)
    chunk(dedup(gated, pairs), size = chunkSize, stride = chunkStride)
  }
}
