package graft.llm

import graft.SparkTestSession
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the SQ8 asymmetric scan that the hash oracle
  * cannot express: scale-invariance of the ranking (cos(q, codes) ==
  * cos(q, reconstruction)), the refine monotonicity guarantee, and
  * near-exact recall on the synthetic corpus (the contrast arm to
  * PQ-ADC's collapse). */
class SqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def pairs(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "neighbor_id")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("sq ranking equals ranking against the explicit reconstruction") {
    val q = emb.filter(col("vec_id") < 8)
    val sq = Sq.topKCosineSq(emb, q, "vec_id", "embedding", k = 5)
    // reconstruct v̂ = codes · amax/127 explicitly and rank exactly —
    // cosine's positive-scale invariance says the result must match
    val recon = Quantize.int8(emb, "vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("codes"),
          c => (c.cast("double") * col("amax") / lit(127.0)).cast("float"))
          .as("embedding"))
    // the query side stays the EXACT float vectors (q, not its codes):
    // the identity under test is cos(q, codes) == cos(q, v̂) — querying
    // with quantized vectors would test a different (symmetric) scan
    val viaRecon = Similarity.topKCosine(
      recon, q, "vec_id", "embedding", k = 5)
    assert(pairs(sq) === pairs(viaRecon))
  }

  test("refine never loses recall and returns exact cosines") {
    val q = emb.filter(col("vec_id") < 8)
    val truth = pairs(Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 5))
    val bare = pairs(Sq.topKCosineSq(emb, q, "vec_id", "embedding", k = 5))
    val refined = Sq.topKCosineSqRefined(emb, q, "vec_id", "embedding",
      k = 5, refineFactor = 3)
    assert((pairs(refined) & truth).size >= (bare & truth).size)
    // refined scores are TRUE cosines: re-compute one row by hand
    val row = refined.limit(1).collect().head
    val ids = Seq(row.getLong(0), row.getLong(1))
    val vecs = emb.filter(col("vec_id").isin(ids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val (a, b) = (vecs(ids.head), vecs(ids(1)))
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val exact = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(math.abs(row.getDouble(3) - exact) < 1e-5)
  }

  test("sq recall is near-exact on the synthetic corpus (the anti-PQ story)") {
    val q = emb.filter(col("vec_id") < 8)
    val truth = pairs(Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 5))
    val sq = pairs(Sq.topKCosineSq(emb, q, "vec_id", "embedding", k = 5))
    val recall = (sq & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"SQ8 keeps per-dimension resolution; got recall $recall")
  }

  test("all-zero vector quantizes to all-zero codes and does not crash the scan") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.2f, 0.0f))).toDF("vec_id", "embedding")
    val out = Sq.topKCosineSq(tiny, tiny.filter(col("vec_id") === 0), "vec_id",
      "embedding", k = 2)
    val got = out.select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L) || got.contains(1L),
      s"nearest real neighbor must rank first, got $got")
  }
}
