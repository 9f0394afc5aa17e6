package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Interpolated Kneser-Ney bigram scoring. Value parity is pinned by
  * the `q_doc_kn_ppl` oracle; this spec pins the smoothing semantics
  * against a hand-computed model and the continuation-count fix.
  */
class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the hand-computed interpolated KN model") {
    // corpus: "a b", "a b", "a c" → bigrams: (a b)×2, (a c)×1
    // c1: a=3, b=2, c=1; types=2; N1+(a•)=2; N1+(•b)=1, N1+(•c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val r = KneserNey.scored(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // P(b|a) = (2-0.75)/3 + 0.75*2/3 * (1/2) = 0.75+1/3*0.75... compute:
    val pb = (2 - 0.75) / 3.0 + 0.75 * 2 / 3.0 * (1.0 / 2)
    val pc = (1 - 0.75) / 3.0 + 0.75 * 2 / 3.0 * (1.0 / 2)
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r.values.forall(_._1 == 1L), "one bigram per doc")
    assert(math.abs(r(1L)._2 - -math.log(pb)) < 2e-6)
    assert(math.abs(r(2L)._2 - -math.log(pb)) < 2e-6)
    assert(math.abs(r(3L)._2 - -math.log(pc)) < 2e-6)
  }

  test("continuation counts penalize frequent-but-predictable successors") {
    // identical raw counts everywhere; the ONLY difference is that z
    // has 2 distinct predecessors while y has 1 — the continuation
    // probability must prefer the many-context word:
    // P(z|q) = (1-.75)/1 + .75*1*(2/3) = 0.75
    // P(y|s) = (1-.75)/1 + .75*1*(1/3) = 0.50
    val docs = Seq((1L, "q z"), (2L, "r z"), (3L, "s y"))
      .toDF("doc_id", "text")
    val probs = KneserNey.scored(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(math.abs(probs(1L) - -math.log(0.75)) < 2e-6)
    assert(math.abs(probs(3L) - -math.log(0.50)) < 2e-6)
    assert(probs(1L) < probs(3L),
      "many-context successor must score higher (lower NLL)")
  }
}
