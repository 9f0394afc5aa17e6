package graft.streaming

import graft.api.IncrementalCuration
import graft.api.IncrementalCuration.{State, UrlState}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the COMPOSED curation journey — a document
  * stream curated continuously at micro-batch cadence, where
  * [[graft.api.IncrementalCuration.step]] is the daily-increment form
  * and [[graft.api.CurationPipeline.run]] the one-shot bootstrap.
  *
  * Design mirrors [[StreamingDedupClusters]]: the journey's state
  * (optional URL-hygiene state, shingle index + banded-LSH
  * side-tables, component labels, id watermark) is an at-rest-TABLE
  * update, not per-row keyed state, so the right primitive is
  * `foreachBatch` — each micro-batch runs ONE incremental step
  * (URL hygiene when a [[UrlState]] is carried → score → gate →
  * incremental pairs against the held index → contraction-CC keep)
  * and swaps the state forward. The STEP's cost is the incremental
  * one: every stage of the step touches work proportional to the
  * batch, never the accumulated corpus (the banded side-tables are
  * what keep the pairing stage increment-sized — see
  * [[graft.llm.MinHash.BandIndex]]).
  *
  * Honest cost accounting for the STORE itself: `advance` re-
  * materializes the ACCUMULATED survivor set and state tables via
  * `localCheckpoint` each trigger, so per-trigger maintenance is
  * O(accumulated corpus) — a deliberate trade for snapshot reads
  * (`survivors`/`state` always see complete, materialized tables),
  * NOT an incremental-maintenance claim. State lives as
  * executor-memory blocks that grow with the corpus for the stream's
  * lifetime; a long-running production deployment should persist the
  * tables as parquet deltas in `foreachBatch` instead (append the
  * increment's index/band/survivor rows, rewrite only changed label
  * partitions — the bucketing [[IncrementalCuration]]'s Scaladoc
  * prescribes) and compact periodically, keeping per-trigger I/O
  * increment-sized. This in-memory store is the test/spec twin of
  * that layout, not its replacement.
  *
  * The store maintains the accumulated survivor set under the step's
  * retraction contract: survivors ∪= batch survivors, then −= the
  * step's revoked old canonicals — so at any trigger boundary
  * `survivors` equals what one batch pipeline over every document
  * ever seen would emit (spec-pinned across bridging triggers; the
  * identity is exactly IncrementalCurationSpec's consumer identity,
  * re-checked at micro-batch cadence). Batches must carry
  * monotonically increasing ids — arrival order, which a stream has
  * by construction; the state's watermark guard makes a violating
  * replay fail fast instead of corrupting the survivor set.
  */
object StreamingCuration {

  /** What [[attach]] drives: one incremental step per non-empty
    * micro-batch. [[CurationStore]] is the in-memory twin (snapshot
    * reads, executor-memory state); [[PersistentCurationStore]] the
    * durable parquet layout (increment-sized appends, epoch-versioned
    * keyed merges). */
  trait JourneyStore {
    /** `batchId` is foreachBatch's replay-detection key: durable
      * stores use it to make a re-delivered micro-batch idempotent
      * (at-least-once → effectively-once); pass a negative value from
      * direct non-stream callers to opt out. */
    private[streaming] def advance(
        batch: DataFrame,
        minQuality: Double,
        dupThreshold: Double,
        maxBucket: Option[Int],
        maxPerHost: Int,
        batchId: Long): Unit
  }

  /** The journey state + accumulated survivors a document stream
    * advances. Reads (`state`, `survivors`, `urlState`) always see a
    * complete, materialized snapshot — updates localCheckpoint before
    * swapping (the in-memory twin of production's parquet round-trip;
    * see the object doc for the growth/cost contract). `survivors`
    * keeps the schema of the step's survivor rows (id + text + score
    * columns), projected to `initialSurvivors`'s columns.
    *
    * Pass `initialUrl = Some(urlStateOf(...))` to run the FULL
    * journey — each batch then flows through
    * [[IncrementalCuration.urlHygieneStep]] (canonical-URL
    * first-crawl-wins dedup + per-host cap against the at-rest crawl
    * state) BEFORE score/gate/dedup, exactly like the batch
    * composition `urlHygiene → run`. `None` curates a pre-hygiene
    * stream (documents with no url column). */
  final class CurationStore(
      initial: State,
      initialSurvivors: DataFrame,
      initialUrl: Option[UrlState] = None) extends JourneyStore {
    @volatile private var st: State = checkpointed(initial)
    @volatile private var surv: DataFrame = initialSurvivors.localCheckpoint()
    @volatile private var ust: Option[UrlState] = initialUrl.map(checkpointedUrl)

    def state: State = st
    def survivors: DataFrame = surv
    def urlState: Option[UrlState] = ust

    private def checkpointed(s: State): State =
      State(s.shingleIndex.localCheckpoint(), s.labels.localCheckpoint(),
        s.maxId.map(_.localCheckpoint()),
        s.bands.map(bi => graft.llm.MinHash.BandIndex(
          bi.bandKeys.localCheckpoint(),
          bi.bucketCounts.localCheckpoint(),
          bi.sizes.localCheckpoint())))

    private def checkpointedUrl(u: UrlState): UrlState =
      UrlState(u.seenUrls.localCheckpoint(), u.hostCounts.localCheckpoint(),
        u.maxId.map(_.localCheckpoint()))

    private[streaming] def advance(
        batch: DataFrame,
        minQuality: Double,
        dupThreshold: Double,
        maxBucket: Option[Int],
        maxPerHost: Int,
        batchId: Long): Unit = synchronized {
      val hygienic = ust match {
        case Some(u) =>
          val (kept, nextU) = IncrementalCuration.urlHygieneStep(
            batch, u, maxPerHost = maxPerHost)
          ust = Some(checkpointedUrl(nextU))
          kept
        case None => batch
      }
      // the step's internal persists (scored batch, shingle/band-key
      // relations — increment-sized each) live in the session's
      // CacheManager, which never GCs entries: without the scoped
      // unpersist a long-running stream accumulates one set per
      // trigger. Safe to drop once every snapshot below is
      // materialized as localCheckpoint blocks (unpersist does not
      // touch those); precise — unrelated caches in a shared session
      // are untouched.
      val scope = new graft.core.CacheScope
      try {
        val (sv, revoked, next) = IncrementalCuration.step(
          hygienic, st, minQuality, dupThreshold, maxBucket, scope)
        surv = surv
          .unionByName(sv.select(surv.columns.map(col): _*))
          .join(revoked, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        st = checkpointed(next)
      } finally scope.unpersistAll()
    }
  }

  /** Attach the curation journey to a streaming document relation
    * (same schema the batch pipeline scores: the id, text, and any
    * carried metadata columns — plus a url column when the store
    * carries a [[UrlState]]). Every micro-batch advances `store`;
    * read `store.survivors` / `store.state` at any time for the
    * currently-curated corpus and its at-rest state. */
  def attach(
      docs: DataFrame,
      store: JourneyStore,
      minQuality: Double = 0.5,
      dupThreshold: Double = 0.8,
      maxBucket: Option[Int] = Some(10000),
      maxPerHost: Int = 10000,
      queryName: String = "curation_journey"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty trigger must not pay a step
        if (!batch.isEmpty)
          store.advance(batch, minQuality, dupThreshold, maxBucket, maxPerHost,
            batchId)
      }
      .start()
}
