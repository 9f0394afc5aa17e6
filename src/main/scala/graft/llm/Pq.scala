package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") — the classic memory-bound scale path
  * for billion-vector search, complementing [[Similarity]]'s LSH and
  * IVF paths.
  *
  * The embedding space is split into `M` contiguous subspaces; each
  * subspace gets its own tiny codebook of `K` centroids, and every
  * corpus vector is ENCODED as M small code ids (M bytes at K≤256 —
  * a 64-dim float vector compresses 256 B → 4 B here). Search is
  * asymmetric distance computation (ADC): the query builds an M×K
  * lookup table of partial squared-L2 distances to every centroid,
  * and a corpus vector's approximate distance is just the sum of M
  * table lookups — no float arithmetic against corpus vectors at all.
  *
  * Scale shape, stage by stage:
  *  - codebook: a deterministic md5 hash-sample of K corpus rows
  *    (distributed TakeOrdered, same trick as
  *    [[Similarity.topKCosineIvf]]; k-means-trained centroids drop in
  *    without changing the algebra), broadcast everywhere — K rows.
  *  - encode: one broadcast product corpus×K, then ONE
  *    partial-aggregable groupBy per vector computing all M argmins at
  *    once (`min_by` over (distance, code) structs — no window, no
  *    per-subspace pass over the corpus).
  *  - search: the corpus side of the ADC join carries ONLY
  *    (id, sub, code) rows — the encoded table, never the vectors —
  *    joined map-side against the broadcast LUT and partially
  *    aggregated before the (query_id, id) shuffle. At 100 TB the
  *    full-precision vectors are read once (encode) and never again.
  *
  * All distances are ordered-fold double arithmetic via the native
  * dot product (l2² = ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩) and the M partial
  * distances are summed as DECIMAL(20,9) so the total is
  * merge-order-free — bit-replayable in the DuckDB oracle
  * (`q_emb_pq_ann`).
  */
object Pq {

  /** Squared L2 via ordered dots — bit-identical across engines
    * because each ⟨·,·⟩ is the same index-ascending fold. */
  def l2sq(a: Column, b: Column): Column =
    Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) + Similarity.dot(b, b)

  /** DuckDB mirror of [[l2sq]] (same parse, same associativity). */
  def l2sqSql(a: String, b: String): String =
    s"${Similarity.dotSql(a, a)} - 2.0 * ${Similarity.dotSql(a, b)} + ${Similarity.dotSql(b, b)}"

  /** The K-row codebook: (code, vec) with code 0..K-1 in md5(id)
    * order; subspace centroids are slices of these rows. */
  private def codebook(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__h"))
    corpus.select(col(idCol), col(vecCol))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h")).limit(k)
      .withColumn("code", (row_number().over(w) - 1).cast("long"))
      .select(col("code"), col(vecCol).as("__cb"))
  }

  private def sub(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** Encodes every vector as its `codes` array (length M): codes(s) =
    * argmin over the codebook of subspace-s squared L2, ties to the
    * lowest code id. Output: (idCol, codes). */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      subDim: Int,
      k: Int): DataFrame = {
    val cb = codebook(corpus, idCol, vecCol, k)
    val aggs = (0 until m).map { s =>
      val d = l2sq(sub(col("__v"), s, subDim), sub(col("__cb"), s, subDim))
      min_by(col("code"), struct(d, col("code"))).as(s"__c$s")
    }
    corpus.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(cb))
      .groupBy(col(idCol), col("__v"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until m).map(s => col(s"__c$s")): _*).as("codes"))
  }

  /** ADC top-k: approximate squared-L2 nearest neighbors of each query
    * over the ENCODED corpus. Output: (query_id, neighbor_id, rank,
    * adist) — adist rounded to 6 decimals. */
  def topKAdc(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      dim: Int,
      m: Int = 4,
      k: Int = 8): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val subDim = dim / m
    val cb = codebook(corpus, idCol, vecCol, k)
    val enc = encode(corpus, idCol, vecCol, m, subDim, k)
      .select(col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    // LUT: per (query, sub, code) the partial distance — |q|·M·K rows.
    val lut = queries.select(col(idCol).as("query_id"), col(vecCol).as("__q"))
      .crossJoin(broadcast(cb))
      .select(col("query_id"), col("code"),
        posexplode(array((0 until m).map(s =>
          l2sq(sub(col("__q"), s, subDim), sub(col("__cb"), s, subDim))): _*))
          .as(Seq("sub", "d")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__adist").asc, col("neighbor_id").asc)
    enc.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      // order-free exact sum of the M partials (cf. Similarity.groupCentroids)
      .agg(sum(col("d").cast(org.apache.spark.sql.types.DecimalType(20, 9)))
        .cast("double").as("__adist"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("__adist"), 6).as("adist"))
  }

  /** ADC shortlist + exact re-ranking ([[Similarity.refineTopK]]):
    * the quantized scan proposes `kNeighbors · refineFactor`
    * candidates per query, then exact squared-L2 on ONLY those
    * candidates picks the final top-k — the standard FAISS remedy for
    * ADC's quantization-error mis-ordering (recall@k ≥ the unrefined
    * path's, cost one candidate-bounded corpus probe). Output:
    * (query_id, neighbor_id, rank, dist round 6) — TRUE distances,
    * unlike [[topKAdc]]'s approximate `adist`. */
  def topKAdcRefined(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      dim: Int,
      m: Int = 4,
      k: Int = 8,
      refineFactor: Int = 3): DataFrame = {
    require(refineFactor >= 1, s"refineFactor=$refineFactor must be >= 1")
    val shortlist = topKAdc(corpus, queries, idCol, vecCol,
      kNeighbors * refineFactor, dim, m, k)
    Similarity.refineTopK(corpus, queries, shortlist, idCol, vecCol,
      kNeighbors, metric = "l2")
  }
}
