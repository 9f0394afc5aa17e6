package graft.llm

import graft.SparkTestSession
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the sketch family that the hash-match oracle
  * cannot express: HLL's insert-idempotence and accuracy envelope,
  * CMS's one-sided error, RRF's rank coherence. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def occ = Tables.documents(spark, sf)
    .select(col("lang"), explode(Shingles.tokens(col("text"))).as("tok"))

  test("hll: estimate over occurrences == estimate over the distinct set") {
    val a = Sketches.hllDistinct(occ, "lang", "tok")
      .orderBy("lang").collect().toSeq
    val b = Sketches.hllDistinct(occ.distinct(), "lang", "tok")
      .orderBy("lang").collect().toSeq
    assert(a === b)
  }

  test("hll: relative error within the m=64 envelope on every group") {
    val exact = occ.groupBy("lang").agg(countDistinct(col("tok")).as("n"))
    val rows = Sketches.hllDistinct(occ, "lang", "tok")
      .join(exact, "lang").select("lang", "est", "n").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(1); val n = r.getLong(2).toDouble
      // linear counting is active at these cardinalities; 30% is a
      // loose bound over the 1.04/sqrt(64) = 13% asymptotic sigma
      assert(math.abs(est - n) / n < 0.30,
        s"${r.getString(0)}: est $est vs exact $n")
    }
  }

  test("cms: estimates are one-sided (est >= true count), top token exact") {
    val o = occ.select("tok")
    val hh = Sketches.cmsHeavyHitters(o, "tok", k = 25).collect()
    assert(hh.nonEmpty)
    hh.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        s"${r.getString(1)}: est ${r.getLong(2)} < true ${r.getLong(3)}")
    }
    val trueTop = o.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).first().getString(0)
    assert(hh.head.getString(1) === trueTop)
  }

  test("cms: sketch never exceeds d*w cells and counts sum to d*N") {
    val o = occ.select("tok")
    val sk = Sketches.cmsSketch(o, "tok")
    assert(sk.count() <= Sketches.CmsD.toLong * Sketches.CmsW)
    val total = sk.agg(sum("cnt")).first().getLong(0)
    assert(total === Sketches.CmsD * o.count())
  }

  test("rrf: fused ranks are dense per query and sourced from a list") {
    import graft.queries.SketchQueries
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val lex = Bm25.topkPerQuery(docs, "doc_id", "text",
      SketchQueries.RrfQueries, k = 20)
    val dense = Similarity
      .topKCosine(emb, emb.filter(col("vec_id") < 4), "vec_id", "embedding", 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val fused = Hybrid.rrfFuse(lex, dense, k = 10).collect()
    assert(fused.nonEmpty)
    fused.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks === (1L to ranks.length).toArray.toSeq)
      // rrf non-increasing in fused rank
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b })
    }
    fused.foreach { r =>
      assert(r.getLong(4) > 0 || r.getLong(5) > 0)
    }
  }

  test("rrf: a doc ranked first in both lists is fused first") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 10L, 1L), (0L, 13L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val fused = Hybrid.rrfFuse(lex, dense, k = 10)
      .orderBy("fused_rank").collect()
    assert(fused.head.getLong(2) === 10L)
    // 11 (lex rank 2) vs 13 (dense rank 2) tie on rrf; doc_id breaks it
    assert(fused(1).getLong(2) === 11L)
  }
}
