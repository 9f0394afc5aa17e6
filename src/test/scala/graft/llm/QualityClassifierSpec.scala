package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seed-vs-corpus NB log-odds classifier. Value parity is pinned by
  * the `q_doc_quality_clf` oracle; this spec pins the decision
  * semantics: seed-typical vocabulary scores positive, background
  * vocabulary negative, and shared vocabulary contributes nothing.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "good", "clean prose reads well"),
    (2L, "good", "clean prose flows well"),
    (3L, "spam", "buy pills buy pills"),
    (4L, "spam", "pills pills buy now"),
    (5L, "good", "clean prose reads well"), // seed-identical holdout
    (6L, "spam", "buy pills now")           // background-identical holdout
  ).toDF("doc_id", "src", "text")

  private def seed = col("src") === "good" && col("doc_id") <= 2

  test("weights separate seed vocabulary from background vocabulary") {
    val w = QualityClassifier.weights(docs, "text", seed)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(w("clean") > 0 && w("prose") > 0)
    assert(w("pills") < 0 && w("buy") < 0)
  }

  test("scored keeps seed-like documents and drops background-like ones") {
    val r = QualityClassifier.scored(docs, "doc_id", "text", seed)
      .collect().map(x => x.getLong(0) -> (x.getDouble(2), x.getBoolean(3))).toMap
    assert(r.size === 6)
    assert(r(5L)._2, "held-out seed-identical doc must be kept")
    assert(!r(6L)._2, "held-out background-identical doc must be dropped")
    assert(r(5L)._1 > 0 && r(6L)._1 < 0)
  }

  test("token counts and mean normalization") {
    val r = QualityClassifier.scored(docs, "doc_id", "text", seed)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === 4L && r(3L) === 4L && r(6L) === 3L)
  }
}
