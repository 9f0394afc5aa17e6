package graft.streaming

import graft.SparkTestSession
import graft.llm.DedupClusters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch parity for the streaming label maintenance: a pair stream
  * split across arbitrary micro-batches must leave the
  * [[StreamingDedupClusters.LabelStore]] holding EXACTLY the labels a
  * single batch connected-components run over every pair ever seen
  * would produce — including merges that bridge components across
  * trigger boundaries. */
class StreamingDedupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("micro-batched pair stream equals one batch CC, across bridging triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long)]
    val pairs = source.toDF().toDF("id_a", "id_b")
    // bootstrap from a prior batch run — the production shape (the
    // store continues FROM at-rest labels, not from empty)
    val boot = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val store = new StreamingDedupClusters.LabelStore(
      DedupClusters.connectedComponentsGraphX(boot, "id_a", "id_b"))
    val q = StreamingDedupClusters.attach(pairs, store,
      queryName = "dedup_labels_spec")
    try {
      val batches = Seq(
        Seq((10L, 11L)),           // untouched new component
        Seq((9L, 2L), (9L, 6L)),   // a bridge merging {1,2} and {5,6}
        Seq((0L, 11L), (20L, 21L)) // a smaller id relabels; another island
      )
      var seen = Seq((1L, 2L), (5L, 6L))
      batches.foreach { b =>
        source.addData(b)
        q.processAllAvailable()
        seen = seen ++ b
        val expected = labelsOf(DedupClusters.connectedComponentsGraphX(
          seen.toDF("id_a", "id_b"), "id_a", "id_b"))
        assert(labelsOf(store.labels) === expected, s"after ${seen.size} pairs")
      }
      // an empty trigger leaves the table untouched
      val before = labelsOf(store.labels)
      q.processAllAvailable()
      assert(labelsOf(store.labels) === before)
    } finally q.stop()
  }
}
