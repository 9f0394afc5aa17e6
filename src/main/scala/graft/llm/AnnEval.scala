package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANN serving-quality evaluation — the vector-side counterpart of the
  * LSH recall S-curve ([[LshEval]]): measure recall@k of each
  * approximate path against the exact cosine top-k ground truth, on
  * the same corpus, in one run. This is the artifact that tunes the
  * knobs (nCells, hyperplane count) before a production rollout: the
  * approximate paths trade recall for cell/bucket-local candidate
  * generation, and the trade is an empirical property of the corpus
  * geometry, not of the code.
  *
  * Scale shape: the heavy stages ARE the evaluated paths themselves
  * (their shapes are plan-audited elsewhere); the eval adds only
  * ≤|Q|·k-row joins against the ≤|Q|·k-row truth set and one-row
  * aggregates — an offline eval run, like `q_doc_lsh_recall`.
  *
  * Output: one row per method — (method, returned, hits, possible,
  * recall) with recall = hits/possible rounded through DECIMAL(20,9)
  * (`q_emb_ann_recall` replays all three pipelines and the metric).
  *
  * Measured on the sf0.01 synthetic embeddings (near-uniform random —
  * the hardest geometry for ANN): ivf_p1 0.24, ivf_p2 0.35,
  * lsh_bucketed 0.00, pq_adc 0.025 (vs its exact-L2 truth — 8 codes
  * per 16-dim subspace is ~3 bits/subspace, hopeless on clusterless
  * vectors). The numbers are the POINT, not a defect: random vectors
  * have no structure for cell-local search or codebooks to exploit,
  * the probe knob demonstrably buys recall (the FAISS nprobe trade),
  * and the 8-plane LSH buckets (2^8 = 256 of them) are so fine that
  * queries rarely share a bucket with their true neighbors — run
  * this eval on the real corpus before picking any serving path or
  * its knobs.
  *
  * The eval also measures the in-engine remedy: `pq_adc_refine`
  * ([[Pq.topKAdcRefined]] — 3k-deep ADC shortlist, exact re-rank)
  * sits next to `pq_adc` so the recall lift of refinement is read
  * off the same run that exposes the quantization loss, and `lsh_mp`
  * ([[Similarity.topKCosineBucketedMultiProbe]], Hamming-1) next to
  * `lsh_bucketed` for the same reason (0.0 → 0.125 at sf0.01).
  */
object AnnEval {

  /** Recall@k of every approximate serving path against its exact
    * ground truth: the cosine paths (single-/multi-probe IVF, random-
    * hyperplane LSH buckets) vs exact cosine top-k, and PQ-ADC vs
    * exact L2 top-k (PQ ranks by quantized L2 — comparing it to the
    * cosine truth would conflate metric choice with quantization
    * error). `dim` is the PQ input dimension. */
  def recallAtK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nCentroids: Int = 8,
      dim: Int = 64): DataFrame = {
    val q = emb.filter(queryPred)

    def truthOf(topk: DataFrame) = topk
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__t"))
    val cosTruth = truthOf(Similarity.topKCosine(emb, q, idCol, vecCol, k))
    // exact L2 ground truth — same brute-force shape, Pq's distance
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__d").asc, col("neighbor_id").asc)
    val l2Truth = truthOf(
      emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
        .crossJoin(broadcast(q.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("__d", Pq.l2sq(col("__qv"), col("__cv")))
        .withColumn("rank", row_number().over(wL2))
        .filter(col("rank") <= k))

    val methods: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("ivf_p1", Similarity.topKCosineIvf(emb, q, idCol, vecCol, k, nCentroids),
        cosTruth),
      ("ivf_p2", Similarity.topKCosineIvf(emb, q, idCol, vecCol, k, nCentroids,
        nProbe = 2), cosTruth),
      ("lsh_bucketed", Similarity.topKCosineBucketed(emb, q, idCol, vecCol, k),
        cosTruth),
      // SQ8: full scan over int8 codes — near-exact recall (per-dim
      // resolution kept) at 4× scan-byte cut; no candidate pruning
      ("sq", Sq.topKCosineSq(emb, q, idCol, vecCol, k), cosTruth),
      ("sq_refine", Sq.topKCosineSqRefined(emb, q, idCol, vecCol, k,
        refineFactor = 3), cosTruth),
      // the LSH remedy: probe the 8 Hamming-1 neighbor buckets too
      ("lsh_mp", Similarity.topKCosineBucketedMultiProbe(emb, q, idCol, vecCol, k,
        hamming = 1), cosTruth),
      ("pq_adc", Pq.topKAdc(emb, q, idCol, vecCol, kNeighbors = k,
        dim = dim, m = 4, k = nCentroids), l2Truth),
      // the remedy next to the disease: same ADC scan, 3k shortlist,
      // exact re-rank — recall ≥ pq_adc's by construction
      ("pq_adc_refine", Pq.topKAdcRefined(emb, q, idCol, vecCol, kNeighbors = k,
        dim = dim, m = 4, k = nCentroids, refineFactor = 3), l2Truth),
      // the full FAISS serving stack, bare and refined — residual
      // codes recover more than raw-vector codes, and the refine
      // stage re-ranks whatever the probed cells surfaced
      ("ivfpq_adc", IvfPq.topKAdc(emb, q, idCol, vecCol, kNeighbors = k,
        dim = dim, nlist = 4, nprobe = 2, m = 4, k = nCentroids), l2Truth),
      ("ivfpq_refine", IvfPq.topKAdcRefined(emb, q, idCol, vecCol, kNeighbors = k,
        dim = dim, nlist = 4, nprobe = 2, m = 4, k = nCentroids,
        refineFactor = 3), l2Truth))
    methods.map { case (name, df, truth) =>
      val possible = truth.agg(count(lit(1)).as("possible"))
      df.select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("returned"),
          sum(coalesce(col("__t"), lit(0L))).as("hits"))
        .crossJoin(broadcast(possible))
        .select(lit(name).as("method"),
          col("returned"), col("hits").cast("long").as("hits"), col("possible"),
          round((col("hits").cast("double") / col("possible"))
            .cast("decimal(20,9)"), 6).cast("double").as("recall"))
    }.reduce(_ unionByName _)
  }
}
