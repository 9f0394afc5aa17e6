package graft.llm

import graft.SparkTestSession
import graft.core.Tables
import org.scalatest.funsuite.AnyFunSuite

/** LSH recall-curve invariants: detection never exceeds truth, and
  * recall is non-decreasing in the similarity threshold (the S-curve
  * rises — banded LSH only gets better as pairs get more similar). */
class LshEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("recall curve: n_detected <= n_truth, recall rises with threshold") {
    val rows = LshEval.recallCurve(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text",
      n = 3, thresholds = Seq(0.02, 0.05, 0.1, 0.2), maxDf = 50)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length === 4)
    rows.foreach { case (_, nt, nd, _) => assert(nd <= nt) }
    val recalls = rows.filter(!_._4.isNaN).map(_._4)
    assert(recalls.zip(recalls.drop(1)).forall { case (a, b) => a <= b })
  }
}
