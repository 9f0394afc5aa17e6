package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** IVF-ADC (inverted file over product-quantized residuals). Value
  * parity is pinned cross-engine by the `q_emb_ivfpq_ann` oracle; this
  * spec pins the structural contracts the oracle can't state: probe
  * confinement, self-exclusion, rank shape, and that an exact duplicate
  * is the zero-distance first neighbor.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of 4; two tight groups + outliers
  private def corpus = Seq(
    (1L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),      // exact dup of 1
    (3L, Array(0.9f, 0.1f, 0f, 0f, 0f, 1f, 0f, 0f)),  // near 1
    (4L, Array(0f, 0f, 1f, 0f, 1f, 0f, 0f, 0f)),
    (5L, Array(0f, 0f, 0.9f, 0f, 1f, 0f, 0.1f, 0f)),  // near 4
    (6L, Array(0f, 1f, 0f, 1f, 0f, 0f, 1f, 0f))
  ).toDF("vec_id", "embedding")

  private def run(nprobe: Int, kNeighbors: Int = 3) =
    IvfPq.topKAdc(corpus, corpus.filter($"vec_id" === 1L || $"vec_id" === 4L),
      "vec_id", "embedding", kNeighbors, dim = 8,
      nlist = 3, nprobe = nprobe, m = 2, k = 4)

  test("exact duplicate is the first neighbor at approximate distance 0") {
    val r = run(nprobe = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    val first1 = r.filter(t => t._1 == 1L && t._3 == 1L)
    assert(first1.length === 1)
    assert(first1.head._2 === 2L, "the exact dup must rank first")
    assert(first1.head._4 === 0.0, "ADC distance of identical codes is 0")
  }

  test("self never appears; ranks are contiguous from 1 per query") {
    val r = run(nprobe = 3).collect()
    assert(r.forall(x => x.getLong(0) != x.getLong(1)))
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("candidates are confined to the query's probed cells") {
    // nprobe=1 searches only the query's own cell; probing every cell
    // with an unbounded k must return a superset of those candidates
    val narrow = run(nprobe = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val wide = run(nprobe = 3, kNeighbors = 5).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(narrow.subsetOf(wide),
      s"nprobe=1 candidate set $narrow must be within nprobe=3 set $wide")
  }
}
