package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental SemDeDup identity against the batch run over
  * old ∪ new sharing ONE codebook: new rows restrict exactly, and the
  * at-rest delta is precisely the set of previously-kept old vectors
  * the batch run now drops. */
class SemDedupIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def emb = graft.core.Tables.embeddings(spark, sf)

  private def decisions(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Boolean)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("incremental equals the shared-codebook batch run: new restriction + old delta") {
    val isNew = col("vec_id") % 5 === 0
    val oldEmb = emb.filter(!isNew)
    val newEmb = emb.filter(isNew)
    val codebook = Similarity.coarseCodebook(oldEmb, "vec_id", "embedding", 8)
    val oldRun = Similarity.semDeDupWithCodebook(
      oldEmb, "vec_id", "embedding", 0.4, codebook)
    val index = oldRun.join(
      oldEmb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("cell"), col("keep"))
    val inc = decisions(Similarity.semDeDupIncremental(
      newEmb, index, codebook, "vec_id", "embedding", 0.4))
    val batchUnion = decisions(Similarity.semDeDupWithCodebook(
      emb, "vec_id", "embedding", 0.4, codebook))
    val oldDecisions = decisions(oldRun)

    // 1. every new id appears, with the batch-union decision
    val newIds = batchUnion.keySet.filter(_ % 5 == 0)
    newIds.foreach { id =>
      assert(inc.get(id).contains(batchUnion(id)), s"new id $id")
    }
    // 2. the delta rows are exactly the old ids whose keep flipped
    val flipped = oldDecisions.collect {
      case (id, (cell, true)) if !batchUnion(id)._2 => id -> ((cell, false))
    }
    val deltaRows = inc.view.filterKeys(_ % 5 != 0).toMap
    assert(deltaRows === flipped.toMap)
    // 3. applying the delta to the at-rest table reproduces the union run
    assert(oldDecisions ++ deltaRows ++ inc.view.filterKeys(_ % 5 == 0).toMap
      === batchUnion)
    // the fixture must actually exercise a flip or the delta test is vacuous
    assert(flipped.nonEmpty || batchUnion.valuesIterator.forall(_._2),
      "fixture produced no old-keep flips AND some drops — check thresholds")
  }

  test("semDeDup == semDeDupWithCodebook on its own codebook (refactor guard)") {
    val a = decisions(Similarity.semDeDup(emb, "vec_id", "embedding", 0.4, nCells = 8))
    val b = decisions(Similarity.semDeDupWithCodebook(emb, "vec_id", "embedding", 0.4,
      Similarity.coarseCodebook(emb, "vec_id", "embedding", 8)))
    assert(a === b)
  }
}
