package graft.streaming

import graft.api.IncrementalCuration
import graft.api.IncrementalCuration.State
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the COMPOSED curation journey — a document
  * stream curated continuously at micro-batch cadence, where
  * [[graft.api.IncrementalCuration.step]] is the daily-increment form
  * and [[graft.api.CurationPipeline.run]] the one-shot bootstrap.
  *
  * Design mirrors [[StreamingDedupClusters]]: the journey's state
  * (shingle index, component labels, id watermark) is an
  * at-rest-TABLE update, not per-row keyed state, so the right
  * primitive is `foreachBatch` — each micro-batch runs ONE
  * incremental step (score → gate → incremental pairs against the
  * held index → contraction-CC keep) and swaps the state forward.
  * Per-batch cost is the incremental one: every stage touches work
  * proportional to the batch, never the accumulated corpus.
  *
  * The store also maintains the ACCUMULATED survivor set under the
  * step's retraction contract: survivors ∪= batch survivors, then
  * −= the step's revoked old canonicals — so at any trigger boundary
  * `survivors` equals what one batch pipeline over every document
  * ever seen would emit (spec-pinned across bridging triggers; the
  * identity is exactly IncrementalCurationSpec's consumer identity,
  * re-checked at micro-batch cadence). Batches must carry
  * monotonically increasing ids — arrival order, which a stream has
  * by construction; the state's watermark guard makes a violating
  * replay fail fast instead of corrupting the survivor set.
  */
object StreamingCuration {

  /** The journey state + accumulated survivors a document stream
    * advances. Reads (`state`, `survivors`) always see a complete,
    * materialized snapshot — updates localCheckpoint before swapping
    * (the in-memory twin of production's parquet round-trip; persist
    * the four tables bucketed as [[IncrementalCuration]]'s Scaladoc
    * prescribes to make the store durable). `survivors` keeps the
    * schema of the step's survivor rows (id + text + score columns),
    * projected to `initialSurvivors`'s columns. */
  final class CurationStore(initial: State, initialSurvivors: DataFrame) {
    @volatile private var st: State = checkpointed(initial)
    @volatile private var surv: DataFrame = initialSurvivors.localCheckpoint()

    def state: State = st
    def survivors: DataFrame = surv

    private def checkpointed(s: State): State =
      State(s.shingleIndex.localCheckpoint(), s.labels.localCheckpoint(),
        s.maxId.map(_.localCheckpoint()))

    private[streaming] def advance(
        batch: DataFrame,
        minQuality: Double,
        dupThreshold: Double,
        maxBucket: Option[Int]): Unit = synchronized {
      val (sv, revoked, next) =
        IncrementalCuration.step(batch, st, minQuality, dupThreshold, maxBucket)
      surv = surv
        .unionByName(sv.select(surv.columns.map(col): _*))
        .join(revoked, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      st = checkpointed(next)
    }
  }

  /** Attach the curation journey to a streaming document relation
    * (same schema the batch pipeline scores: the id, text, and any
    * carried metadata columns). Every micro-batch advances `store`;
    * read `store.survivors` / `store.state` at any time for the
    * currently-curated corpus and its at-rest state. */
  def attach(
      docs: DataFrame,
      store: CurationStore,
      minQuality: Double = 0.5,
      dupThreshold: Double = 0.8,
      maxBucket: Option[Int] = Some(10000),
      queryName: String = "curation_journey"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty trigger must not pay a step
        if (!batch.isEmpty) store.advance(batch, minQuality, dupThreshold, maxBucket)
      }
      .start()
}
