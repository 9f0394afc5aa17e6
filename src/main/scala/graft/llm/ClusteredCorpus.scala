package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mixture-of-Gaussians embedding corpus for the
  * clustered-regime ANN evaluation.
  *
  * Every recall number the clusterless synthetic `embeddings` table
  * produces (ivf 0.24, lsh 0.0, pq 0.025 at sf0.01) sits in the regime
  * where ANN is structurally hopeless — near-uniform random vectors
  * have no cluster structure for cell-local search, bucketing, or
  * codebooks to exploit. Production ANN systems (the FAISS
  * IVF/PQ/refine stack this library's serving paths mirror) are always
  * benchmarked on CLUSTERED corpora (SIFT1M/GIST/Deep1B), where the
  * same knobs reach 0.8–0.95+ recall. This transform manufactures that
  * regime from the existing table so the eight-variant [[AnnEval]]
  * matrix and the [[Similarity.probeRecallCurve]] knob curve can be
  * read side by side in both regimes — calibrated sizing guidance
  * instead of a warning artifact.
  *
  * Construction (no RNG, same md5 discipline as the rest of the
  * engine, replayable bit-for-bit in the DuckDB oracle):
  *
  *  - component: `md5("graft-mog|" + id)` first 8 hex chars mod `k` —
  *    independent of every other id-derived hash in the engine
  *    (codebooks key on `md5(id)`, mixing on `"graft-mix|" + id`).
  *  - center(c, i): `((c*31 + i*7) % 13 - 6) / 6.0` per dimension —
  *    integer arithmetic, values in [-1, 1], distinct dimension
  *    patterns per component; expected inter-center distance ~5 in
  *    64 dims.
  *  - vector: `center(c, i) + original[i]`, cast back to FLOAT — the
  *    original near-uniform coordinates (~±0.3) become the
  *    within-cluster "Gaussian" noise, so within-cluster rankings stay
  *    non-degenerate while inter-cluster distance dominates
  *    (noise-to-center norm ratio ≈ 0.24).
  *
  * All arithmetic is exact-parity across engines: integer ops, one
  * FLOAT→DOUBLE widening (exact), IEEE double add/divide, one final
  * round-to-nearest FLOAT narrowing — mirrored verbatim by [[sql]].
  *
  * Scale shape: a single stateless projection over the corpus scan —
  * no shuffle, no state; at 100 TB it fuses into whatever consumes it.
  */
object ClusteredCorpus {

  val Salt = "graft-mog"

  /** The clustered corpus as a (idCol, vecCol) DataFrame — a drop-in
    * replacement for the `embeddings` table (same column names, same
    * FLOAT element type). */
  def mixtureOfGaussians(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 8): DataFrame = {
    val comp = conv(substring(
      md5(concat(lit(Salt + "|"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % k
    emb
      .select(col(idCol), col(vecCol), comp.as("__comp"))
      .select(col(idCol),
        transform(col(vecCol), (v, i) =>
          ((((col("__comp") * 31 + i * 7) % 13 - 6).cast("double") / 6.0)
            + v.cast("double")).cast("float")).as(vecCol))
  }

  /** DuckDB mirror of [[mixtureOfGaussians]] over a `(vec_id,
    * embedding)` relation — same hash, same integer center formula,
    * same one-widening/one-narrowing float path. */
  def sql(corpus: String, k: Int = 8, dims: Int = 64): String =
    s"""SELECT vec_id,
       |  list_transform(range($dims), i ->
       |    CAST(CAST(((comp * 31 + i * 7) % 13 - 6) AS DOUBLE) / 6.0
       |         + CAST(embedding[i + 1] AS DOUBLE) AS REAL)) AS embedding
       |FROM (SELECT vec_id, embedding,
       |        CAST(('0x' || substring(md5('$Salt|' || vec_id), 1, 8)) AS BIGINT) % $k AS comp
       |      FROM $corpus)""".stripMargin
}
