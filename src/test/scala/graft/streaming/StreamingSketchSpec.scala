package graft.streaming

import graft.SparkTestSession
import graft.core.Tables
import graft.llm.{Shingles, Sketches}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sketches: bit-for-bat batch parity — the streaming state
  * after N micro-batches equals the batch sketch of the concatenated
  * input, because sketch merge is the same associative aggregate as
  * the build (cell-wise sum / register-wise max). */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docRows: Seq[(String, String)] =
    Tables.documents(spark, sf)
      .select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("streaming CMS state equals the batch sketch, cell for cell") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = docRows
    val batch = Sketches
      .cmsSketch(rows.toDF("lang", "text")
        .select(explode(Shingles.tokens(col("text"))).as("tok")), "tok")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val source = MemoryStream[(String, String)]
    val toks = source.toDF().toDF("lang", "text")
      .select(explode(Shingles.tokens(col("text"))).as("tok"))
    val q = StreamingSketch.cmsSketchStream(toks, "tok")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      source.addData(a); q.processAllAvailable()
      source.addData(b); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming HLL registers equal the batch registers, so estimates match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = docRows
    def occOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), explode(Shingles.tokens(col("text"))).as("tok"))
    val batch = Sketches.hllRegisters(occOf(rows.toDF("lang", "text")), "lang", "tok")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

    val source = MemoryStream[(String, String)]
    val q = StreamingSketch
      .hllRegistersStream(occOf(source.toDF().toDF("lang", "text")), "lang", "tok")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      // three uneven micro-batches
      source.addData(rows.take(10)); q.processAllAvailable()
      source.addData(rows.slice(10, 11)); q.processAllAvailable()
      source.addData(rows.drop(11)); q.processAllAvailable()
      val streamed = spark.table("hll_stream")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(streamed === batch)
      // and the estimator over the streamed state gives the batch estimate
      val estB = Sketches.hllEstimate(
        Sketches.hllRegisters(occOf(rows.toDF("lang", "text")), "lang", "tok"), "lang")
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      val estS = Sketches.hllEstimate(spark.table("hll_stream"), "lang")
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(estS === estB)
    } finally q.stop()
  }

  test("state stays fixed-size: cms cells ≤ d·w, hll rows ≤ m per group") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, String)]
    val toks = source.toDF().toDF("lang", "text")
      .select(explode(Shingles.tokens(col("text"))).as("tok"))
    val q = StreamingSketch.cmsSketchStream(toks, "tok")
      .writeStream.format("memory").queryName("cms_bound")
      .outputMode("complete").start()
    try {
      source.addData(docRows); q.processAllAvailable()
      assert(spark.table("cms_bound").count() <= Sketches.CmsD.toLong * Sketches.CmsW)
    } finally q.stop()
  }
}
