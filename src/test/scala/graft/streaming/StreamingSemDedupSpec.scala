package graft.streaming

import graft.SparkTestSession
import graft.llm.{KMeansLite, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantic dedup: exact batch parity under monotone-id
  * arrival (the batch "any smaller id ≥ τ" rule IS arrival-order
  * dedup when arrival order is id order), chain semantics (a dropped
  * vector still suppresses its own near-duplicates), and the state
  * cap's fail-open contract. */
class StreamingSemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import StreamingSemDedup._

  // three near-dup chains and two singletons, across two directions
  private def vecs: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(1f, 0f, 0f, 0f),
    2L -> Array(0.999f, 0.045f, 0f, 0f),   // ~1 (cos ≈ .999)
    3L -> Array(0.995f, 0.0995f, 0f, 0f),  // ~2 but farther from 1
    4L -> Array(0f, 1f, 0f, 0f),
    5L -> Array(0f, 0.999f, 0.045f, 0f),   // ~4
    6L -> Array(0f, 0f, 0f, 1f)            // singleton
  )

  private def batchKeep(threshold: Double, nCells: Int): Map[Long, Boolean] = {
    import spark.implicits._
    val df = vecs.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    Similarity.semDeDup(df, "vec_id", "embedding", threshold, nCells)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
  }

  private def batchCodebook(nCells: Int): Seq[(Long, Seq[Float])] = {
    import spark.implicits._
    val df = vecs.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    Similarity.coarseCodebook(df, "vec_id", "embedding", nCells)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
  }

  private def runStream(
      codebook: Seq[(Long, Seq[Float])],
      threshold: Double,
      maxSeen: Int = 10000): Map[Long, Boolean] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[VecRow]
    val q = dedupStream(source.toDS(), codebook, threshold, maxSeen)
      .writeStream.format("memory").queryName("semdedup_out")
      .outputMode("append").start()
    try {
      // two micro-batches, id order (monotone arrival = the batch rule)
      val rows = vecs.map { case (id, v) => VecRow(id, v.toSeq, id) }
      source.addData(rows.take(3)); q.processAllAvailable()
      source.addData(rows.drop(3)); q.processAllAvailable()
      spark.table("semdedup_out").select(col("vec_id"), col("keep"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    } finally {
      q.stop()
      spark.catalog.dropTempView("semdedup_out")
    }
  }

  test("monotone-id arrival reproduces the batch keep set exactly") {
    val threshold = 0.99
    val batch = batchKeep(threshold, nCells = 3)
    val stream = runStream(batchCodebook(3), threshold)
    assert(stream.size === vecs.size)
    assert(stream === batch, s"stream=$stream batch=$batch")
  }

  test("dropped vectors still suppress their own near-duplicates (chains)") {
    // threshold where 2~1 and 3~2 but 3 is NOT ~1: batch drops both 2
    // and 3; a kept-only state would wrongly keep 3
    val c12 = cosine(vecs(0)._2.toSeq, vecs(1)._2.toSeq)
    val c13 = cosine(vecs(0)._2.toSeq, vecs(2)._2.toSeq)
    val c23 = cosine(vecs(1)._2.toSeq, vecs(2)._2.toSeq)
    val threshold = (c13 + math.min(c12, c23)) / 2
    assert(c13 < threshold && c12 >= threshold && c23 >= threshold,
      s"fixture drifted: c12=$c12 c13=$c13 c23=$c23 t=$threshold")
    val stream = runStream(batchCodebook(1), threshold)
    assert(stream(1L) && !stream(2L) && !stream(3L),
      s"chain semantics broken: $stream")
    assert(stream === batchKeep(threshold, nCells = 1))
  }

  test("state cap fails open: capped cells never false-drop") {
    // 0.997 sits between c13 (~0.995) and c12/c23 (~0.999): with only
    // vector 1 recorded, 2 is dropped against it, 3 is NOT (its only
    // suppressor, 2, was never recorded — the documented missed-dup
    // degradation), and nothing later is falsely dropped
    val stream = runStream(batchCodebook(1), threshold = 0.997, maxSeen = 1)
    assert(stream(1L) && !stream(2L))
    assert(stream(3L) && stream(4L) && stream(5L) && stream(6L))
  }
}
