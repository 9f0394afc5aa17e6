package graft.streaming

import graft.llm.DedupClusters
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming component-label maintenance — the continuous-ingest form
  * of [[graft.llm.DedupClusters.updateComponents]], closing the loop
  * between the streaming dedup shapes (which emit near-duplicate PAIRS
  * as they discover them) and the incremental keep-table family.
  *
  * Design: label maintenance is an at-rest-TABLE update, not per-row
  * state, so the right streaming primitive is `foreachBatch` — each
  * micro-batch of pairs runs ONE contraction-CC update against the
  * held label table and swaps it forward, exactly the daily-increment
  * algebra at micro-batch cadence. The per-batch cost is the
  * incremental one: CC over the contracted graph (≤ 2·batch-pairs
  * nodes) plus two broadcast map passes over the at-rest table —
  * never a recompute over the accumulated pair set.
  *
  * Associativity is what makes micro-batching correct here: chained
  * [[DedupClusters.updateComponents]] calls equal one batch CC over
  * the union of every pair ever seen (IncrementalCcSpec pins it), so
  * trigger boundaries cannot change the fixpoint — the spec asserts
  * stream-vs-batch label parity after arbitrary batch splits.
  *
  * [[LabelStore]] holds the table `localCheckpoint`ed between batches
  * (the in-memory twin of production's parquet round-trip; swap
  * `persist`/`load` for a bucketed-by-component parquet table and
  * rewrite only [[DedupClusters.componentDelta]]'s partitions to make
  * the store durable — the algebra is unchanged).
  */
object StreamingDedupClusters {

  /** The at-rest (node, component) table a pair stream advances.
    * `labels` is always a complete, consistent snapshot (updates swap
    * the reference only after the new table is materialized). */
  final class LabelStore(initial: DataFrame) {
    @volatile private var table: DataFrame = initial.localCheckpoint()
    def labels: DataFrame = table
    private[streaming] def advance(newPairs: DataFrame, aCol: String, bCol: String): Unit =
      synchronized {
        // materialize BEFORE the swap: a lazy plan would chain every
        // micro-batch's lineage (and re-run all prior CC on each read)
        table = DedupClusters.updateComponents(table, newPairs, aCol, bCol)
          .localCheckpoint()
      }
  }

  /** Attach label maintenance to a streaming pair relation
    * (`aCol`, `bCol` — e.g. [[StreamingMediaDedup]]'s near-dup output
    * or any banded-collision stream). Every micro-batch advances
    * `store`; read `store.labels` at any time for the current
    * min-member component of every node ever paired. */
  def attach(
      pairs: DataFrame,
      store: LabelStore,
      aCol: String = "id_a",
      bCol: String = "id_b",
      queryName: String = "dedup_labels"): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty trigger must not pay a CC round-trip
        if (!batch.isEmpty) store.advance(batch, aCol, bCol)
      }
      .start()
}
