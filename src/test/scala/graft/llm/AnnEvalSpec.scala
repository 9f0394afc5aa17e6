package graft.llm

import graft.SparkTestSession
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the ANN recall eval that the hash oracle
  * cannot express: probing more cells grows the candidate set and
  * never hurts recall, and the exact path trivially scores 1.0. */
class AnnEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("multi-probe: p2 candidates are a superset of p1, recall non-decreasing") {
    val q = emb.filter(col("vec_id") < 8)
    def pairs(p: Int) = Similarity
      .topKCosineIvf(emb, q, "vec_id", "embedding", k = 5, nCentroids = 4, nProbe = p)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs(1); val p2 = pairs(2)
    assert((p1 & truth).size <= (p2 & truth).size,
      "probing a second cell must not lose true neighbors")
    // full probe count == cell count degenerates to exact search
    val pAll = pairs(4)
    assert(pAll === truth)
  }

  test("recallAtK: one row per method, recall in [0,1], exact-degenerate sanity") {
    val out = AnnEval.recallAtK(emb, "vec_id", "embedding", col("vec_id") < 8,
      k = 5, nCentroids = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out.keySet ===
      Set("ivf_p1", "ivf_p2", "lsh_bucketed", "lsh_mp", "sq", "sq_refine",
        "pq_adc", "pq_adc_refine", "ivfpq_adc", "ivfpq_refine"))
    assert(out("ivfpq_refine") >= out("ivfpq_adc"))
    out.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(out("ivf_p2") >= out("ivf_p1"))
    // the refine guarantee: exact re-ranking of a superset shortlist
    // can only recover truth items the quantized ordering buried
    assert(out("pq_adc_refine") >= out("pq_adc"))
    // the multi-probe guarantee: Hamming-1 probing searches a superset
    // of the single-bucket candidates
    assert(out("lsh_mp") >= out("lsh_bucketed"))
    // SQ8 keeps per-dimension resolution: on this corpus the scan
    // should sit at-or-near exact recall, and refine never hurts
    assert(out("sq_refine") >= out("sq"))
    assert(out("sq") >= out("pq_adc"),
      "8-bit per-dim codes must beat 3-bit-per-subspace PQ on clusterless vectors")
  }

  test("multi-probe LSH: hamming=0 degenerates to single-bucket; candidates nest") {
    val q = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(Similarity.topKCosineBucketed(emb, q, "vec_id", "embedding", k = 5))
    val h0 = pairs(Similarity.topKCosineBucketedMultiProbe(emb, q, "vec_id", "embedding",
      k = 5, hamming = 0))
    assert(h0 === single, "hamming=0 must equal the single-bucket path")
    // unbounded k exposes the raw candidate sets: h1 must contain h0's
    val all0 = pairs(Similarity.topKCosineBucketedMultiProbe(emb, q, "vec_id", "embedding",
      k = 100000, hamming = 0))
    val all1 = pairs(Similarity.topKCosineBucketedMultiProbe(emb, q, "vec_id", "embedding",
      k = 100000, hamming = 1))
    val all2 = pairs(Similarity.topKCosineBucketedMultiProbe(emb, q, "vec_id", "embedding",
      k = 100000, hamming = 2))
    assert(all0.subsetOf(all1) && all1.subsetOf(all2))
    assert(all1.size > all0.size, "Hamming-1 probes must widen the candidate set")
  }
}
