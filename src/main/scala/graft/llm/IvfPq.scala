package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** IVF-ADC: inverted-file search over PRODUCT-QUANTIZED RESIDUALS —
  * the composition FAISS ships as `IndexIVFPQ` (Jégou et al. 2011,
  * §IV) and the standard billion-vector serving layout. [[Similarity]]
  * contributes the coarse inverted file (only `nprobe` cells are
  * searched), [[Pq]] the memory layout (a vector is M code ids, not
  * floats); composing them quantizes each vector's RESIDUAL v − c(v)
  * against its coarse centroid, which carries far more information per
  * code bit than quantizing raw vectors because residual norms are a
  * fraction of vector norms.
  *
  * Scale shape, stage by stage:
  *  - coarse codebook: `nlist` md5-sampled rows (distributed
  *    TakeOrdered), broadcast; k-means centroids from [[KMeansLite]]
  *    drop in without changing the algebra.
  *  - assign + residual: ONE pass over the corpus — broadcast product
  *    with the codebook, one partial-aggregable `min_by` groupBy per
  *    vector, residual as an elementwise `zip_with`. Full-precision
  *    vectors are never read again after this stage.
  *  - residual codebook: the md5-smallest `k` corpus rows' residuals
  *    (deterministic, engine-replayable; a per-subspace k-means drops
  *    in), broadcast — k rows.
  *  - encode: all M subspace argmins in ONE groupBy (`min_by` over
  *    (distance, code) structs), exactly [[Pq.encode]]'s shape.
  *  - search: queries probe their `nprobe` nearest cells; the LUT of
  *    partial distances is |Q|·nprobe·M·K rows, broadcast into a join
  *    whose corpus side carries ONLY (id, cell, sub, code) — at 100 TB
  *    the searched bytes are the code table, not the vectors, and only
  *    nprobe/nlist of it per query.
  *
  * Determinism for the DuckDB oracle (`q_emb_ivfpq_ann`): coarse and
  * PQ distances are index-ascending folds ([[KMeansLite.l2sqFold]]),
  * residuals are elementwise double subtraction, and the M partial
  * distances are summed as DECIMAL(20,9) — merge-order-free, so the
  * oracle replays assignment, residuals, encoding, and ADC bit-for-bit.
  */
object IvfPq {

  /** Elementwise double residual v − c (index order preserved). */
  def residual(v: Column, c: Column): Column =
    zip_with(v, c, (x, y) => x.cast("double") - y.cast("double"))

  /** DuckDB mirror of [[residual]]. */
  def residualSql(v: String, c: String): String =
    s"list_transform(generate_series(1, len($v)), " +
      s"i -> CAST(($v)[i] AS DOUBLE) - CAST(($c)[i] AS DOUBLE))"

  private def sub(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** (cell, __cent) coarse codebook ∪ (id → cell, __res) assignment in
    * one corpus pass: nearest cell by the ordered L2 fold (ties to the
    * lowest cell id), residual against that cell's centroid. */
  private def assignResiduals(
      corpus: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__d", KMeansLite.l2sqFold(col("__v"), col("__cent")))
      .groupBy(col(idCol), col("__v"))
      .agg(min_by(struct(col("cell"), col("__cent")), struct(col("__d"), col("cell")))
        .as("__best"))
      .select(col(idCol), col("__best.cell").as("cell"),
        residual(col("__v"), col("__best.__cent")).as("__res"))

  /** IVF-ADC top-k approximate squared-L2 neighbors.
    * Output: (query_id, neighbor_id, rank, adist round 6) — only
    * neighbors sharing one of the query's `nprobe` probed cells are
    * candidates (the IVF recall/throughput dial). */
  def topKAdc(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      dim: Int,
      nlist: Int = 4,
      nprobe: Int = 2,
      m: Int = 4,
      k: Int = 8): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val subDim = dim / m
    val cents = Similarity.coarseCodebook(corpus, idCol, vecCol, nlist)
    val res = assignResiduals(corpus, cents, idCol, vecCol)

    // residual codebook: residuals of the md5-smallest k corpus rows
    val wCode = Window.orderBy(col("__h"))
    val rcb = res
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h")).limit(k)
      .withColumn("code", (row_number().over(wCode) - 1).cast("long"))
      .select(col("code"), col("__res").as("__rcb"))

    // encode: all M subspace argmins in one partial-aggregable groupBy
    val encAggs = (0 until m).map { s =>
      val d = KMeansLite.l2sqFold(sub(col("__res"), s, subDim), sub(col("__rcb"), s, subDim))
      min_by(col("code"), struct(d, col("code"))).as(s"__c$s")
    }
    val enc = res.crossJoin(broadcast(rcb))
      .groupBy(col(idCol), col("cell"), col("__res"))
      .agg(encAggs.head, encAggs.tail: _*)
      .select(col(idCol).as("neighbor_id"), col("cell"),
        posexplode(array((0 until m).map(s => col(s"__c$s")): _*)).as(Seq("sub", "code")))

    // queries probe their nprobe nearest cells (queries broadcast-small)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__d").asc, col("cell").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__q"))
      .crossJoin(broadcast(cents))
      .withColumn("__d", KMeansLite.l2sqFold(col("__q"), col("__cent")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cell"),
        residual(col("__q"), col("__cent")).as("__qres"))

    // LUT: per (query, probed cell, sub, code) the partial distance
    val lut = probes.crossJoin(broadcast(rcb))
      .select(col("query_id"), col("cell"), col("code"),
        posexplode(array((0 until m).map(s =>
          KMeansLite.l2sqFold(sub(col("__qres"), s, subDim), sub(col("__rcb"), s, subDim))): _*))
          .as(Seq("sub", "d")))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("__adist").asc, col("neighbor_id").asc)
    enc.join(broadcast(lut), Seq("cell", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d").cast(DecimalType(20, 9))).cast("double").as("__adist"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("__adist"), 6).as("adist"))
  }

  /** IVF-ADC shortlist + exact re-ranking — `IndexRefineFlat` over
    * `IndexIVFPQ`, the full FAISS billion-vector serving stack. The
    * inverted file bounds WHICH vectors are scored (nprobe cells),
    * the residual-PQ codes bound the scan's memory, and the refine
    * stage ([[Similarity.refineTopK]]) re-scores the
    * `kNeighbors · refineFactor` shortlist with exact squared-L2 so
    * quantization error cannot mis-order the final top-k. The refine
    * join touches ≤|Q|·k′ full-precision vectors — candidate-bounded,
    * not cell-bounded. Output: (query_id, neighbor_id, rank, dist). */
  def topKAdcRefined(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNeighbors: Int,
      dim: Int,
      nlist: Int = 4,
      nprobe: Int = 2,
      m: Int = 4,
      k: Int = 8,
      refineFactor: Int = 3): DataFrame = {
    require(refineFactor >= 1, s"refineFactor=$refineFactor must be >= 1")
    val shortlist = topKAdc(corpus, queries, idCol, vecCol,
      kNeighbors * refineFactor, dim, nlist, nprobe, m, k)
    Similarity.refineTopK(corpus, queries, shortlist, idCol, vecCol,
      kNeighbors, metric = "l2")
  }
}
