package graft.streaming

import graft.llm.Sketches
import org.apache.spark.sql.DataFrame

/** Streaming sketch maintenance — the continuous-ingest form of
  * [[graft.llm.Sketches]].
  *
  * Both sketches are streaming aggregations whose STATE IS FIXED-SIZE
  * BY CONSTRUCTION — the rare stateful operators that need no
  * watermark to stay bounded:
  *
  *  - the CMS grid is at most d·w cells (3072 counter rows) no matter
  *    how many tokens flow through;
  *  - the HLL register table is at most m rows per group, and register
  *    maxima only ever increase.
  *
  * Because sketch merge is the same associative op as the batch build
  * (cell-wise sum / register-wise max), the streaming state after N
  * micro-batches is IDENTICAL to the batch sketch of the concatenated
  * input — not approximately, bit-for-bit (proved by
  * `StreamingSketchSpec`). That makes these the correct continuous
  * feed for the batch estimators: a monitoring job reads the complete
  * state table each trigger and applies [[Sketches.hllDistinct]]'s
  * estimate arithmetic / CMS probes downstream.
  *
  * Run with `outputMode("complete")` (the state is small enough to
  * re-emit) or `"update"` (changed cells only).
  */
object StreamingSketch {

  /** CMS counter grid over an unbounded token stream: same plan as the
    * batch [[Sketches.cmsSketch]] — valid in streaming because the
    * grouping keyspace is bounded. */
  def cmsSketchStream(toks: DataFrame, tokCol: String): DataFrame =
    Sketches.cmsSketch(toks, tokCol)

  /** HLL register maxima over an unbounded (group, token) stream: at
    * most [[Sketches.HllM]] state rows per group. */
  def hllRegistersStream(occ: DataFrame, groupCol: String, tokCol: String): DataFrame =
    Sketches.hllRegisters(occ, groupCol, tokCol)
}
