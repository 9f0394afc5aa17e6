package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  final case class Doc(doc_id: Long, ts: Long, text: String)

  private def runStream(batches: Seq[Seq[Doc]]): Seq[Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = StreamingDedup.exactDedupStream(source.toDF(), "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      spark.table("dedup_out").select("doc_id").as[Long].collect().toSeq.sorted
    } finally q.stop()
  }

  // event times must sit above the initial (epoch-zero) watermark or
  // the first rows are discarded as late data
  private val base = 1700000000L * 1000000L
  private val sec = 1000000L

  test("drops duplicate text within the watermark horizon, across batches") {
    val out = runStream(Seq(
      Seq(Doc(1, base + 0 * sec, "alpha beta"), Doc(2, base + 1 * sec, "gamma delta")),
      Seq(Doc(3, base + 2 * sec, "alpha beta"), // dup of 1, inside horizon
          Doc(4, base + 3 * sec, "epsilon"))))
    assert(out === Seq(1L, 2L, 4L))
  }

  test("case-insensitive fingerprint: 'A b' duplicates 'a b'") {
    val out = runStream(Seq(Seq(
      Doc(1, base, "Alpha Beta"), Doc(2, base + sec, "alpha beta"))))
    assert(out === Seq(1L))
  }
}
