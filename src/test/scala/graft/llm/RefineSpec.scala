package graft.llm

import graft.SparkTestSession
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural contracts of the FAISS-style re-ranking refine stage
  * ([[Similarity.refineTopK]], [[Pq.topKAdcRefined]],
  * [[IvfPq.topKAdcRefined]]) that the `q_emb_ann_refine` /
  * `q_emb_ivfpq_refine` hash oracles cannot state: candidate
  * confinement, exact-degenerate equality with brute force, true
  * (not approximate) distances, and the recall-dominance guarantee. */
class RefineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  // 8-dim corpus with an exact duplicate pair (cf. IvfPqSpec)
  private def tiny = Seq(
    (1L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
    (3L, Array(0.9f, 0.1f, 0f, 0f, 0f, 1f, 0f, 0f)),
    (4L, Array(0f, 0f, 1f, 0f, 1f, 0f, 0f, 0f)),
    (5L, Array(0f, 0f, 0.9f, 0f, 1f, 0f, 0.1f, 0f)),
    (6L, Array(0f, 1f, 0f, 1f, 0f, 0f, 1f, 0f))
  ).toDF("vec_id", "embedding")

  test("refined pairs are confined to the shortlist; ranks contiguous from 1") {
    val q = emb.filter(col("vec_id") < 8)
    val shortlist = Pq.topKAdc(emb, q, "vec_id", "embedding",
      kNeighbors = 9, dim = 64, m = 4, k = 8)
    val refined = Similarity.refineTopK(emb, q, shortlist,
      "vec_id", "embedding", k = 3, metric = "l2")
    val sl = shortlist.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rf = refined.collect()
    assert(rf.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(sl),
      "refine may only re-rank, never introduce candidates")
    rf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("a shortlist covering the whole corpus degenerates to exact brute force") {
    val q = tiny.filter($"vec_id" <= 2L)
    // refineFactor large enough that the ADC shortlist is every vector
    val refined = Pq.topKAdcRefined(tiny, q, "vec_id", "embedding",
      kNeighbors = 3, dim = 8, m = 2, k = 4, refineFactor = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    // exact L2 top-3, the brute-force ground truth
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__d").asc, col("neighbor_id").asc)
    val exact = tiny.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
      .crossJoin(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__d", Pq.l2sq(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wL2))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong) -> r.getLong(1)).toMap
    assert(refined === exact)
  }

  test("refined output carries TRUE distances: the exact dup scores 0.0") {
    val q = tiny.filter($"vec_id" === 1L)
    val r = Pq.topKAdcRefined(tiny, q, "vec_id", "embedding",
      kNeighbors = 3, dim = 8, m = 2, k = 4, refineFactor = 5).collect()
    val first = r.filter(_.getLong(2) == 1L)
    assert(first.length === 1)
    assert(first.head.getLong(1) === 2L, "the exact dup must rank first")
    assert(first.head.getDouble(3) === 0.0)
  }

  test("ivf-pq refine: recall vs exact-L2 truth is >= the unrefined path's") {
    val q = emb.filter(col("vec_id") < 8)
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__d").asc, col("neighbor_id").asc)
    val truth = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
      .crossJoin(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__d", Pq.l2sq(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wL2))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(truth).size
    val base = IvfPq.topKAdc(emb, q, "vec_id", "embedding",
      kNeighbors = 5, dim = 64, nlist = 4, nprobe = 2, m = 4, k = 8)
    val refined = IvfPq.topKAdcRefined(emb, q, "vec_id", "embedding",
      kNeighbors = 5, dim = 64, nlist = 4, nprobe = 2, m = 4, k = 8,
      refineFactor = 3)
    assert(hits(refined) >= hits(base),
      "exact re-ranking of a superset shortlist cannot lose truth items")
  }

  test("refineTopK cosine metric matches topKCosine on a full shortlist") {
    val q = tiny.filter($"vec_id" <= 2L)
    val all = tiny.select(col("vec_id").as("neighbor_id"))
      .crossJoin(q.select(col("vec_id").as("query_id")))
      .filter(col("query_id") =!= col("neighbor_id"))
    val refined = Similarity.refineTopK(tiny, q, all, "vec_id", "embedding",
      k = 3, metric = "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getDouble(3))).toSet
    val exact = Similarity.topKCosine(tiny, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong, r.getLong(1), r.getDouble(3))).toSet
    assert(refined === exact)
  }
}
