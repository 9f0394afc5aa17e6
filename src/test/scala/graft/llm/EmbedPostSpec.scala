package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Embedding post-processing: all-but-the-top and the JL sign
  * projection. Value parity is pinned by the `q_emb_abtt` /
  * `q_emb_jl_project` oracles; these specs pin the linear-algebra
  * contracts: mean removal, PC-direction annihilation, and JL shape/
  * determinism.
  */
class EmbedPostSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // vectors spread along one dominant axis (dim 0) plus noise in dim 1
  private def emb = Seq(
    (1L, Array(4f, 1f, 0f, 0f)),
    (2L, Array(-4f, 1f, 0f, 0f)),
    (3L, Array(8f, -1f, 0f, 0f)),
    (4L, Array(-8f, -1f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("all-but-the-top output is centered and kills the top-PC direction") {
    val rows = Pca.allButTheTop(emb, "vec_id", "embedding", dim = 4, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 16)
    // per-dimension mean of the transformed corpus ≈ 0
    rows.groupBy(_._2).foreach { case (d, rs) =>
      assert(math.abs(rs.map(_._3).sum / rs.length) < 1e-4, s"dim $d not centered")
    }
    // the dominant direction here is dim 0 (variance 40 vs 1): the
    // transform must annihilate it
    val dim0 = rows.filter(_._2 == 0L).map(_._3)
    assert(dim0.forall(v => math.abs(v) < 1e-3),
      s"top-PC coordinate must be ~0, got ${dim0.mkString(",")}")
    // dim 1 variance survives
    val dim1 = rows.filter(_._2 == 1L).map(_._3)
    assert(dim1.exists(v => math.abs(v) > 0.5))
  }

  test("JL projection: shape, determinism, and non-degeneracy") {
    val a = RandomProjection.project(emb, "vec_id", "embedding", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b = RandomProjection.project(emb, "vec_id", "embedding", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(a.size === 4 * 8)
    assert(a === b, "hash-derived projection must be run-deterministic")
    assert(a.values.exists(_ != 0.0))
    // linearity: doubling the input doubles every output coordinate
    val scaled = emb.as[(Long, Array[Float])]
      .map { case (id, v) => (id + 100L, v.map(_ * 2f)) }
      .toDF("vec_id", "embedding")
    val c = RandomProjection.project(scaled, "vec_id", "embedding", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (0L until 8L).foreach { j =>
      assert(math.abs(c((101L, j)) - 2.0 * a((1L, j))) < 1e-5)
    }
  }
}
