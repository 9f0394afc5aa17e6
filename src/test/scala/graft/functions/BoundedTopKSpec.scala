package graft.functions

import graft.SparkTestSession
import graft.core.Tables
import graft.llm.{Similarity, Sq, Urls}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the k-bounded top-k aggregation against the generic
  * window arm it replaces, plus the ordering edge cases the comparator
  * must mirror from Spark's sort (NaN-greatest doubles, merge-order
  * independence). */
class BoundedTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("topKCosine: native bounded agg equals the window arm bit-for-bit") {
    val q = emb.filter(col("vec_id") < 8)
    val native = Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 5)
    val window = Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 5,
      nativeTopK = false)
    assert(native.schema === window.schema)
    assert(rows(native) === rows(window))
    assert(native.count() === 8 * 5)
  }

  test("sq coded scan: native bounded agg equals the window arm bit-for-bit") {
    val q = emb.filter(col("vec_id") < 16)
    val idx = Sq.buildIndex(emb, "vec_id", "embedding")
    val native = Sq.topKCosineCoded(idx, q, "vec_id", "embedding", k = 3)
    val window = Sq.topKCosineCoded(idx, q, "vec_id", "embedding", k = 3,
      nativeTopK = false)
    assert(native.schema === window.schema)
    assert(rows(native) === rows(window))
  }

  test("result is independent of partitioning (merge-order robustness)") {
    val q = emb.filter(col("vec_id") < 4)
    val one = Similarity.topKCosine(emb.repartition(1), q, "vec_id", "embedding", k = 5)
    val many = Similarity.topKCosine(emb.repartition(17), q, "vec_id", "embedding", k = 5)
    assert(rows(one) === rows(many))
  }

  test("NaN scores rank first, like Spark's descending double sort") {
    // ANSI mode means cosine itself can't mint a NaN from 0/0 (it
    // throws), but upstream scores can still carry NaN — pin the heap
    // against the window's desc ordering directly
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 11L, Double.NaN), (1L, 12L, 0.9),
      (1L, 13L, Double.NaN), (2L, 14L, 0.1)).toDF("g", "id", "s")
    val native = scored.groupBy(col("g"))
      .agg(BoundedTopK.topKByScore(2, col("s"), col("id")).as("__top"))
      .select(col("g"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("g"), col("__e.id").as("id"), (col("__pos") + 1).as("rank"),
        col("__e.s").as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("s").desc, col("id").asc)
    val window = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2).select(col("g"), col("id"), col("rank"), col("s"))
    // compare string renderings: Scala boxes compare NaN numerically
    // (NaN != NaN), which would fail even on identical row sets
    def strRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    assert(strRows(native) === strRows(window))
    val g1 = native.filter(col("g") === 1).orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(g1(0)._1 === 11L && g1(0)._2.isNaN, s"NaN (smallest id) must rank 1: ${g1.toSeq}")
    assert(g1(1)._1 === 13L && g1(1)._2.isNaN, s"NaN must out-rank 0.9: ${g1.toSeq}")
  }

  test("hostCap: bounded-agg survivors equal the brute-force rank") {
    val urls = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("https://h"), (col("id") % 7).cast("string"),
        lit(".example.com/p/"), col("id").cast("string")).as("url"))
    val capped = Urls.hostCap(urls, "doc_id", "url", maxPerHost = 50)
    // brute force: per host, the 50 smallest doc_ids survive
    val got = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = (0L until 2000L).groupBy(_ % 7).values
      .flatMap(_.sorted.take(50)).toSet
    assert(got === want)
  }

  test("hostCap refuses non-integral id columns (the keep-list is BIGINT)") {
    val urls = Seq(("a", "https://x.example.com/1")).toDF("doc_id", "url")
    val e = intercept[IllegalArgumentException] {
      Urls.hostCap(urls, "doc_id", "url", maxPerHost = 1)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("smallestLongs skips nulls and keeps the k smallest, ascending") {
    val df = Seq(
      (1L, Some(9L)), (1L, Some(2L)), (1L, None), (1L, Some(5L)),
      (1L, Some(1L)), (2L, Some(4L))).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(BoundedTopK.smallestLongs(2, col("v")).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) === Seq(1L, 2L))
    assert(got(2L) === Seq(4L))
  }
}
