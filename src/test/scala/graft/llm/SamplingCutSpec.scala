package graft.llm

import graft.SparkTestSession
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A-ES priority sampling (independent Scala replay of the md5 key)
  * and the ExactSubstr cut step (seeded duplicate corpus). */
class SamplingCutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("prioritySample keeps exactly the k best ln(u)/w keys (scala replay)") {
    val docs = Tables.documents(spark, sf)
    val k = 37
    val kept = Mixer.prioritySample(docs, "doc_id", "n_chars", k)
      .collect().map(_.getLong(0)).toSet
    // independent replay: JDK md5, same variate/key arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): BigDecimal = {
      val hex = md.digest(s"graft-mix|$id".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val v = java.lang.Long.parseLong(hex, 16)
      BigDecimal(math.log((v + 0.5) / 4294967296.0) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val all = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), key(r.getLong(0), r.getLong(1))))
    val expect = all.sortBy { case (id, p) => (-p, id) }.take(k).map(_._1).toSet
    assert(kept === expect)
  }

  test("dedupText cuts the shared run and keeps the unique remainder") {
    import spark.implicits._
    val shared = (1 to 15).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"head1 a b $shared tail1 x"),
      (2L, s"$shared other words entirely here"),
      (3L, "completely unrelated text with no duplication at all"))
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupText(docs, "doc_id", "text", n = 13)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) === (5L, "head1 a b tail1 x")) // region covers the run only
    assert(out(2L)._2 === "other words entirely here")
    assert(out(3L)._2 === "completely unrelated text with no duplication at all")
  }

  test("dedupText keeps fully-duplicated documents with empty text") {
    import spark.implicits._
    val run = (1 to 13).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, run), (2L, run)).toDF("doc_id", "text")
    val out = SpanDedup.dedupText(docs, "doc_id", "text", n = 13)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out === Map(1L -> (0L, ""), 2L -> (0L, "")))
  }
}
