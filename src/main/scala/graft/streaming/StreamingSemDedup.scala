package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming semantic deduplication — the continuous-ingest form of
  * [[graft.llm.Similarity.semDeDup]].
  *
  * The batch operator confines pairwise cosine to coarse-quantizer
  * cells; the streaming form keeps that exact structure: the CELL is
  * the state key, so each cell's seen-set lives on one executor and
  * a new vector only ever compares against its own cell — the state
  * analog of the batch cell-keyed shuffle. The codebook is trained
  * offline ([[graft.llm.KMeansLite]] or the md5 hash-sample) and
  * captured as a plain broadcast value; cell assignment is the same
  * highest-cosine rule (ties to the lowest cell id) computed with the
  * same index-ascending double fold, so batch and stream agree on
  * every assignment bit-for-bit.
  *
  * Contract (mirrors the batch rule under monotone arrival): a vector
  * is DROPPED iff some earlier-arrived vector in its cell sits at
  * cosine ≥ threshold — earlier-arrived vectors count whether or not
  * they were themselves kept, exactly like the batch "any smaller id"
  * rule. Feed the stream in id order and the kept set equals the
  * batch operator's (asserted by `StreamingSemDedupSpec`).
  *
  * State is bounded by `maxSeenPerCell`: past the cap a cell stops
  * recording new vectors (arrivals still emit, compared against the
  * capped set) — the documented degradation is missed NEW duplicate
  * groups, never a false drop. Size the codebook so cells stay under
  * the cap, the same k ∝ corpus rule the batch operator documents.
  */
object StreamingSemDedup {

  final case class VecRow(vec_id: Long, embedding: Seq[Float], ts: Long)
  final case class CellRow(vec_id: Long, embedding: Seq[Float], ts: Long, cell: Long)
  final case class SemOut(vec_id: Long, cell: Long, keep: Boolean)
  final case class CellState(seen: List[(Long, Seq[Float])])

  /** Index-ascending double-fold dot — the closure twin of the native
    * [[graft.functions.VectorExpressions.dotNative]] (same order, same
    * widening, bit-identical results). */
  def dot(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def cosine(a: Seq[Float], b: Seq[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Highest-cosine cell, ties to the lowest cell id — the closure
    * twin of the batch assignment rule. */
  def assignCell(v: Seq[Float], codebook: Seq[(Long, Seq[Float])]): Long =
    codebook.map { case (cell, cent) => (cosine(v, cent), -cell) }.max match {
      case (_, negCell) => -negCell
    }

  /** One output row per arrival, in arrival order within each
    * micro-batch group (rows sorted by (ts, vec_id) for determinism
    * across batch boundaries). */
  def dedupStream(
      vecs: Dataset[VecRow],
      codebook: Seq[(Long, Seq[Float])],
      threshold: Double,
      maxSeenPerCell: Int = 10000): Dataset[SemOut] = {
    import vecs.sparkSession.implicits._
    vecs
      .map(r => CellRow(r.vec_id, r.embedding, r.ts, assignCell(r.embedding, codebook)))
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (cell: Long, rows: Iterator[CellRow], state: GroupState[CellState]) => {
          var seen = state.getOption.map(_.seen).getOrElse(Nil)
          val out = rows.toSeq.sortBy(r => (r.ts, r.vec_id)).map { r =>
            val dup = seen.exists { case (_, v) => cosine(r.embedding, v) >= threshold }
            if (seen.size < maxSeenPerCell) seen = seen :+ (r.vec_id, r.embedding)
            SemOut(r.vec_id, cell, keep = !dup)
          }
          state.update(CellState(seen))
          out.iterator
        })
  }
}
