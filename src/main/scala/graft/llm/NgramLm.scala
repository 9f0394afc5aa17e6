package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style corpus-level language-model scoring: train an add-one
  * smoothed bigram LM on the corpus itself and score every document by
  * its average negative log-likelihood under that LM. High `avg_nll`
  * (≈ log-perplexity) flags boilerplate-free but incoherent text; the
  * classic curation recipe buckets documents by this score (CCNet keeps
  * the head/middle buckets). Reference pipeline: Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data".
  *
  * Everything is relational — no driver-side model object:
  *
  *  - unigram/bigram count tables are `groupBy` aggregates of the token
  *    stream (partial aggregation map-side; the shuffle key is the
  *    n-gram itself, so counts distribute like any word-count);
  *  - the vocabulary size is a one-row aggregate broadcast into the
  *    scoring join (never collected to the driver);
  *  - scoring joins each document's bigram stream back to the count
  *    tables — big-big shuffle joins keyed on the n-gram, exactly the
  *    key the count tables were just built on, so AQE reuses the
  *    exchange on the count side. At 100 TB the count tables are
  *    vocabulary-sized (Zipf-bounded, far smaller than the corpus) and
  *    a `minCount` prune makes the bigram side broadcastable.
  *
  * Float determinism for the oracle: each per-pair log-probability is
  * rounded to 6 decimals and cast to DECIMAL(20,9) before the per-doc
  * sum, so the sum is exact integer-scaled arithmetic — order of
  * summation cannot change the result (the [[graft.queries.LlmQueries]]
  * centroid trick).
  */
object NgramLm {

  /** Per-document average negative log-likelihood under the corpus
    * bigram LM. Output: doc_id, n_pairs, avg_nll (natural-log base,
    * rounded to 6 decimals). Documents with fewer than 2 tokens carry
    * no bigram evidence and are omitted. */
  def scored(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs.select(
      col(idCol).cast("long").as("doc_id"),
      Shingles.tokens(col(textCol)).as("toks"))
    val tk = t.select(col("doc_id"), explode(col("toks")).as("w"))
    val uni = tk.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = tk.agg(countDistinct(col("w")).as("vs")) // 1 row, broadcast
    val bg = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(Shingles.shingles(col("toks"), 2)).as("b"))
    val bc = bg.groupBy(col("b")).agg(count(lit(1)).as("c12"))
    // the stream rides the two count joins directly: bc is built FROM
    // bg, so the join's stream-side exchange on b is reused from the
    // count groupBy, and the small uni side broadcasts — measured
    // faster at sf1 than the score-per-type shape that pays off for
    // the four-table KneserNey (see [[KneserNey.scored]])
    val lp = bg
      .join(bc, "b")
      .withColumn("w1", element_at(split(col("b"), " "), 1))
      .join(uni, col("w1") === col("w"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        // add-one smoothing; rounded+decimal => order-insensitive sum
        round(log((col("c12") + lit(1.0)) / (col("c1") + col("vs"))), 6)
          .cast("decimal(20,9)").as("l"))
    lp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("l")).as("s"))
      .select(col("doc_id"), col("n_pairs"),
        // round through DECIMAL — see [[KneserNey.scored]]
        round(((-col("s")).cast("double") / col("n_pairs"))
          .cast("decimal(20,9)"), 6).cast("double").as("avg_nll"))
  }

  /** CCNet's signature selection move: bucket every document into
    * `head` / `middle` / `tail` by its [[scored]] avg_nll terciles
    * (head = most-fluent third; CCNet trains on head+middle and drops
    * the tail). Scale shape: the two cut points come from ONE exact
    * `percentile` aggregate (a 1-row, 2-value relation that
    * broadcasts — never a global sort or a single-partition rank
    * window over the corpus), and bucket assignment is then a plain
    * scan-stage CASE. The [[scored]] relation feeds BOTH the
    * threshold aggregate and the assignment side, and its lineage is
    * the full corpus-wide bigram-LM retrain — so it is persisted here
    * (one doc-score row per document, far smaller than the corpus)
    * rather than recomputed twice. At 100 TB CCNet itself computes
    * the thresholds on a sample; swap the aggregate input for
    * `.sample(...)` to match — the assignment side is unchanged.
    *
    * Cache lifetime: the score table stays persisted after the
    * caller's action (the relation is lazy, so this method cannot
    * release it) — in a one-shot job LRU reclaim is fine; long-lived
    * drivers should use [[ccnetBucketsScoped]], which unpersists
    * after use. Output: doc_id, n_pairs, avg_nll, ppl_bucket. */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    ccnetBucketsInternal(docs, idCol, textCol)._1

  /** [[ccnetBuckets]] with deterministic cache release: runs `use` on
    * the bucketed relation (e.g. write/collect) and unpersists the
    * internal score cache afterwards. */
  def ccnetBucketsScoped[T](docs: DataFrame, idCol: String, textCol: String)(
      use: DataFrame => T): T = {
    val (df, caches) = ccnetBucketsInternal(docs, idCol, textCol)
    try use(df)
    finally caches.foreach(_.unpersist(blocking = false))
  }

  private def ccnetBucketsInternal(
      docs: DataFrame, idCol: String, textCol: String): (DataFrame, Seq[DataFrame]) = {
    val s = scored(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val th = s.agg(expr(
      "percentile(avg_nll, array(CAST(1.0 AS DOUBLE)/3.0, CAST(2.0 AS DOUBLE)/3.0))")
      .as("__th"))
    val out = s.crossJoin(broadcast(th))
      .select(col("doc_id"), col("n_pairs"), col("avg_nll"),
        when(col("avg_nll") <= element_at(col("__th"), 1), "head")
          .when(col("avg_nll") <= element_at(col("__th"), 2), "middle")
          .otherwise("tail").as("ppl_bucket"))
    (out, Seq(s))
  }
}
