package graft.api

import graft.llm._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DAILY-INCREMENT twin of [[CurationPipeline]]: one step curates
  * a new crawl batch against the accumulated corpus's at-rest state
  * and advances that state — the journey a production pipeline runs
  * every day, where [[CurationPipeline.run]] is what it runs once to
  * bootstrap. No stage ever touches old×old work:
  *
  *  - URL hygiene reads the at-rest seen-URL set and per-host counts
  *    ([[Urls.dedupByUrlIncremental]], [[Urls.hostCapIncremental]]);
  *  - scoring/gating are row-local (identical to batch by
  *    construction);
  *  - near-dup pairing reads the at-rest shingle index
  *    ([[MinHash.nearDuplicatesIncremental]], union-counted cap);
  *  - the keep decision reads the at-rest component labels
  *    ([[DedupClusters.updateComponents]] — CC on the contracted
  *    increment-sized graph only).
  *
  * Identity contract (spec-pinned in IncrementalCurationSpec): with
  * crawl ids MONOTONE (every new id exceeds every old id — the
  * arrival-order property real crawl ids have), a step's survivors
  * equal the batch pipeline over old ∪ new restricted to new ids, and
  * the advanced state equals the state built from old ∪ new. Chaining
  * steps therefore equals one big batch run — the increments compose.
  *
  * State tables are plain DataFrames so production can persist each
  * one where it belongs (bucket `seenUrls` by canonical_url,
  * `hostCounts` by host, `shingleIndex` by h, `labels` by component —
  * then every read here is exchange-free on the corpus side).
  */
object IncrementalCuration {

  /** At-rest crawl-hygiene state: every canonical URL ever crawled and
    * the per-host counts of the URL-DEDUPED stream (hostCap ranks over
    * what survived URL dedup — the batch composition's intermediate). */
  final case class UrlState(seenUrls: DataFrame, hostCounts: DataFrame)

  /** At-rest dedup state of the GATED accumulated corpus: its shingle
    * index and the component labels of its near-dup graph. */
  final case class State(shingleIndex: DataFrame, labels: DataFrame)

  /** Bootstrap [[UrlState]] from an accumulated crawl (production
    * persists and advances it instead of rebuilding). */
  def urlStateOf(docs: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url"): UrlState =
    UrlState(
      Urls.seenUrls(docs, urlCol),
      Urls.hostSeenCounts(
        Urls.dedupByUrl(docs, idCol, urlCol).drop("host", "canonical_url"),
        urlCol))

  /** Incremental [[CurationPipeline.urlHygiene]]: the new batch's
    * survivors plus the advanced state. */
  def urlHygieneStep(
      newDocs: DataFrame,
      state: UrlState,
      idCol: String = "doc_id",
      urlCol: String = "url",
      maxPerHost: Int = 10000): (DataFrame, UrlState) = {
    val urlDeduped = Urls
      .dedupByUrlIncremental(newDocs, idCol, urlCol, state.seenUrls)
      .drop("host", "canonical_url")
    val survivors = Urls.hostCapIncremental(
      urlDeduped, idCol, urlCol, maxPerHost, state.hostCounts)
    val nextState = UrlState(
      state.seenUrls.unionByName(Urls.seenUrls(newDocs, urlCol)).distinct(),
      state.hostCounts.unionByName(Urls.hostSeenCounts(urlDeduped, urlCol))
        .groupBy(col("host")).agg(sum(col("n_seen")).as("n_seen")))
    (survivors, nextState)
  }

  /** Bootstrap [[State]] from an accumulated corpus with the SAME
    * knobs the steps will use (the spec path; production persists). */
  def stateOf(
      docs: DataFrame,
      minQuality: Double = 0.5,
      dupThreshold: Double = 0.8,
      maxBucket: Option[Int] = Some(10000)): State = {
    val gated = CurationPipeline.gate(CurationPipeline.score(docs), minQuality)
    val pairs = CurationPipeline.nearDuplicatePairs(gated,
      threshold = dupThreshold, maxBucket = maxBucket)
    State(
      MinHash.shingleIndex(gated, "doc_id", "text"),
      DedupClusters.connectedComponentsGraphX(pairs, "id_a", "id_b"))
  }

  /** One daily step of [[CurationPipeline.run]]'s stages 1–4: score →
    * gate → incremental near-dup pairs → incremental keep decision.
    * Returns the batch's curated survivors (with the batch pipeline's
    * score columns) and the advanced [[State]]. Chunking/packing/
    * mixing compose downstream exactly as in the batch pipeline. */
  def step(
      newDocs: DataFrame,
      state: State,
      minQuality: Double = 0.5,
      dupThreshold: Double = 0.8,
      maxBucket: Option[Int] = Some(10000)): (DataFrame, State) = {
    val gatedNew = CurationPipeline.gate(CurationPipeline.score(newDocs), minQuality)
    val newPairs = MinHash.nearDuplicatesIncremental(
      gatedNew, "doc_id", "text", state.shingleIndex,
      threshold = dupThreshold, maxBucket = maxBucket)
      .select(col("id_a"), col("id_b"))
    val labels = DedupClusters.updateComponents(state.labels, newPairs)
    // keep decision for the new ids only: a new doc survives iff it is
    // its component's minimum (monotone ids ⇒ old keeps never flip)
    val dropped = labels.toDF("doc_id", "__comp")
      .filter(col("__comp") =!= col("doc_id"))
      .select(col("doc_id"))
    val survivors = gatedNew.join(dropped, Seq("doc_id"), "left_anti")
    val nextState = State(
      state.shingleIndex.unionByName(
        MinHash.shingleIndex(gatedNew, "doc_id", "text")),
      labels)
    (survivors, nextState)
  }
}
