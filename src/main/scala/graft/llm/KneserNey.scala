package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram scoring — the smoothing KenLM ships
  * as its default (Kneser & Ney 1995; Chen & Goodman 1998 §2.7) and
  * the standard upgrade over [[NgramLm]]'s add-one baseline for
  * perplexity-based corpus filtering:
  *
  *   P(w|w₁) = max(c(w₁w) − D, 0)/c(w₁) + λ(w₁)·P_cont(w)
  *   λ(w₁)   = D·N₁₊(w₁•)/c(w₁)
  *   P_cont(w) = N₁₊(•w) / |distinct bigram types|
  *
  * with the fixed discount D = 0.75. The continuation probability
  * counts distinct CONTEXTS, not raw frequency — the famous
  * "San Francisco" fix: "francisco" is frequent but follows almost
  * nothing, so backing off to it is penalized.
  *
  * Everything is relational (the [[NgramLm]] shape, proved green
  * there): token/bigram counts and both continuation-type counts are
  * ONE groupBy each over the n-gram stream, keyed on the n-gram —
  * vocabulary-sized tables, partial aggregation absorbs the corpus;
  * the type total is a one-row aggregate broadcast into the scoring
  * join; scoring joins the document bigram stream back to those
  * count tables on the keys they were just built on. At 100 TB a
  * `minCount` prune on the bigram table makes that side
  * broadcastable and the token scan stays the only corpus-sized pass.
  *
  * Float determinism: each per-pair log-probability is
  * `round(ln(...), 6)` cast to DECIMAL(20,9) before the per-document
  * sum — order-free, replayed exactly by the `q_doc_kn_ppl` oracle.
  */
object KneserNey {

  val Discount: Double = 0.75

  /** Per-document average negative KN log-likelihood:
    * (doc_id, n_pairs, avg_nll). Documents with fewer than 2 tokens
    * carry no bigram evidence and are omitted.
    *
    * Cache lifetime: the internal bigram-type table stays persisted
    * after the caller's action (the relation is lazy, so this method
    * cannot release it) — vocabulary-sized, so in a one-shot job LRU
    * reclaim is fine; long-lived drivers invoking this repeatedly
    * should use [[scoredScoped]], which unpersists after use. */
  def scored(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoredInternal(docs, idCol, textCol)._1

  /** [[scored]] with deterministic cache release: runs `use` on the
    * scored relation (e.g. write/collect) and unpersists the internal
    * bigram-type cache afterwards. */
  def scoredScoped[T](docs: DataFrame, idCol: String, textCol: String)(
      use: DataFrame => T): T = {
    val (df, caches) = scoredInternal(docs, idCol, textCol)
    try use(df)
    finally caches.foreach(_.unpersist(blocking = false))
  }

  private def scoredInternal(
      docs: DataFrame, idCol: String, textCol: String): (DataFrame, Seq[DataFrame]) = {
    val t = docs.select(
      col(idCol).cast("long").as("doc_id"),
      Shingles.tokens(col(textCol)).as("toks"))
    val tk = t.select(col("doc_id"), explode(col("toks")).as("w"))
    val uni = tk.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bg = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(Shingles.shingles(col("toks"), 2)).as("b"))
    // persist the TYPE-sized bigram table: four branches (counts,
    // fan-out, continuation, type total) consume it, and per-branch
    // column pruning makes their exchanges non-identical so
    // ReuseExchange cannot collapse them — without the persist each
    // branch re-explodes the corpus-sized bigram stream (measured 4
    // redundant corpus passes at sf1). Type-sized, so caching it is
    // safe at any corpus scale (Heaps'-law vocabulary growth).
    val bc = bg.groupBy(col("b")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", element_at(split(col("b"), " "), 1))
      .withColumn("w2", element_at(split(col("b"), " "), 2))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // continuation-type tables: distinct successors of w1, distinct
    // predecessors of w2, and the bigram-type total (1 row, broadcast)
    val fan = bc.groupBy(col("w1")).agg(count(lit(1)).as("n_succ"))
    val cont = bc.groupBy(col("w2")).agg(count(lit(1)).as("n_pred"))
    val types = bc.agg(count(lit(1)).cast("double").as("bt"))
    val d = lit(Discount)
    // score each bigram TYPE once: the stats assembly joins only
    // vocabulary/type-sized relations among themselves, so the
    // corpus-sized occurrence stream shuffles exactly ONCE (the
    // per-doc groupBy) instead of riding four sequential joins — at
    // sf1 the count tables outgrow the broadcast threshold and the
    // old shape paid four sort-merge passes over the stream
    val stats = bc
      .join(uni.select(col("w").as("w1"), col("c1")), "w1")
      .join(fan, "w1")
      .join(cont.select(col("w2"), col("n_pred")), "w2")
      .crossJoin(broadcast(types))
      .select(col("b"),
        round(log(
          greatest(col("c12") - d, lit(0.0)) / col("c1") +
            d * col("n_succ") / col("c1") * (col("n_pred") / col("bt"))), 6)
          .cast("decimal(20,9)").as("l"))
    // one stream join on b, then the per-doc partial-agg — bigrams
    // rarely repeat within a document, so a (doc, b) pre-collapse
    // would add a stream-sized shuffle without shrinking anything
    // (unlike the token-level [[QualityClassifier.scored]])
    val out = bg.join(stats, "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("l")).as("s"))
      .select(col("doc_id"), col("n_pairs"),
        // round through DECIMAL: the double divide can land on a
        // 6th-decimal half boundary that the engines' double-round
        // resolves differently; the 9-dp decimal cast collapses the
        // 1-ulp divergence before the 6-dp decision
        round(((-col("s")).cast("double") / col("n_pairs"))
          .cast("decimal(20,9)"), 6).cast("double").as("avg_nll"))
    (out, Seq(bc))
  }
}
