package graft.streaming

import graft.SparkTestSession
import graft.api.{CurationPipeline, IncrementalCuration}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The durability CONTRACT of [[PersistentCurationStore]], scenario by
  * scenario — the claims its Scaladoc makes about at-least-once
  * foreachBatch delivery and crash windows, proven against the disk
  * layout rather than asserted:
  *
  *  1. a REPLAYED already-committed trigger is skipped (no duplicate
  *     index/survivor rows — the silent-corruption case);
  *  2. a trigger that CRASHED mid-write (data directories present, no
  *     commit marker) is invisible to readers, and its re-delivery
  *     overwrites the partial directories and commits cleanly;
  *  3. a trigger writes ONLY increment-sized additions — every
  *     pre-existing file (the corpus-sized bases included) is
  *     untouched, byte for byte;
  *  4. reader plans obtained before a trigger stay valid across it
  *     and keep serving their own consistent snapshot;
  *  5. [[PersistentCurationStore.compact]] preserves content, folds
  *     to one directory per table, and a compaction that crashed
  *     before its generation marker leaves the old generation
  *     serving (unmarked generations are ignored).
  */
@graft.SlowTest
class PersistentStoreCrashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val threshold = 0.05

  private def docs(lo: Long, hi: Long) =
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)

  private def batchSurvivors(all: DataFrame): DataFrame = {
    val gated = CurationPipeline.gate(CurationPipeline.score(all), 0.0)
    CurationPipeline.dedup(gated,
      CurationPipeline.nearDuplicatePairs(gated, threshold = threshold))
  }

  private def freshStore(): (PersistentCurationStore, String, DataFrame) = {
    val root = java.nio.file.Files.createTempDirectory("graft_pstore_crash").toString
    val d0 = docs(0, 60)
    val store = PersistentCurationStore.bootstrap(spark, root,
      IncrementalCuration.stateOf(d0, minQuality = 0.0, dupThreshold = threshold),
      batchSurvivors(d0))
    (store, root, d0)
  }

  private def advanceWith(store: PersistentCurationStore, b: DataFrame, id: Long): Unit =
    store.advance(b, minQuality = 0.0, dupThreshold = threshold,
      maxBucket = Some(10000), maxPerHost = 10000, batchId = id)

  private def rowSet(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  private def stateRows(store: PersistentCurationStore): Map[String, Set[Seq[Any]]] = {
    val st = store.state
    Map(
      "index" -> rowSet(st.shingleIndex),
      "labels" -> rowSet(st.labels),
      "maxid" -> rowSet(st.maxId.get),
      "bandkeys" -> rowSet(st.bands.get.bandKeys),
      "bucketcounts" -> rowSet(st.bands.get.bucketCounts),
      "sizes" -> rowSet(st.bands.get.sizes),
      "survivors" -> rowSet(store.survivors.select(col("doc_id"))))
  }

  /** (path, length, modTime) of every file under `root` — the
    * fingerprint immutability assertions compare. */
  private def fileFingerprints(root: String): Set[(String, Long, Long)] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
      }
    walk(new Path(root)).toSet
  }

  test("replay of an already-committed trigger is a no-op (idempotent advance)") {
    val (store, _, _) = freshStore()
    advanceWith(store, docs(110, 160), id = 0L)
    val after = stateRows(store)
    advanceWith(store, docs(110, 160), id = 0L) // foreachBatch re-delivery
    assert(stateRows(store) === after,
      "a replayed committed trigger must not append its rows twice")
  }

  test("crash mid-trigger: unmarked directories are invisible; re-delivery overwrites and commits") {
    val (store, root, d0) = freshStore()
    val b1 = docs(110, 160)
    advanceWith(store, b1, id = 0L)
    val committed = stateRows(store)
    // simulate a trigger-2 crash AFTER some data writes, BEFORE the
    // commit marker: partial (and wrong — half the batch) directories
    val b2 = docs(161, 200)
    val partial = graft.llm.MinHash.shingleIndex(
      b2.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    partial.write.mode("overwrite").parquet(s"$root/index/g0_a2")
    partial.select(col("doc_id"), col("h").as("component"))
      .withColumnRenamed("doc_id", "node")
      .write.mode("overwrite").parquet(s"$root/labels/g0_a2")
    // a fresh instance (the restart) must serve the committed state
    val reopened = new PersistentCurationStore(spark, root)
    assert(stateRows(reopened) === committed,
      "uncommitted partial directories leaked into reads")
    // the re-delivered trigger overwrites the partials and lands
    advanceWith(reopened, b2, id = 1L)
    val unionState = IncrementalCuration.stateOf(
      d0.unionByName(b1).unionByName(b2),
      minQuality = 0.0, dupThreshold = threshold)
    assert(rowSet(reopened.state.shingleIndex) === rowSet(unionState.shingleIndex))
    assert(rowSet(reopened.state.labels) === rowSet(unionState.labels))
    assert(rowSet(reopened.state.bands.get.bucketCounts) ===
      rowSet(unionState.bands.get.bucketCounts))
    assert(rowSet(reopened.survivors.select(col("doc_id"))) ===
      rowSet(batchSurvivors(d0.unionByName(b1).unionByName(b2))
        .select(col("doc_id"))))
  }

  test("a trigger writes only increment-sized additions — every pre-existing file untouched") {
    val (store, root, _) = freshStore()
    advanceWith(store, docs(110, 160), id = 0L)
    val before = fileFingerprints(root)
    advanceWith(store, docs(161, 200), id = 1L)
    val after = fileFingerprints(root)
    assert(before.subsetOf(after),
      "a trigger rewrote or deleted pre-existing files — the corpus-sized " +
        "base must only ever be rewritten by compact()")
    val newFiles = (after -- before).map(_._1)
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(p => p.contains("_a2") || p.contains("_commits")),
      s"unexpected write targets outside the new epoch: $newFiles")
  }

  test("reader plans stay valid and snapshot-consistent across a trigger") {
    val (store, _, _) = freshStore()
    advanceWith(store, docs(110, 160), id = 0L)
    val heldLabels = store.state.labels
    val heldSurvivors = store.survivors
    val labelsBefore = rowSet(heldLabels)
    val survBefore = rowSet(heldSurvivors.select(col("doc_id")))
    advanceWith(store, docs(161, 200), id = 1L)
    // the held plans re-execute against their original directory lists
    assert(rowSet(heldLabels) === labelsBefore,
      "a held labels plan must keep serving its own snapshot")
    assert(rowSet(heldSurvivors.select(col("doc_id"))) === survBefore,
      "a held survivors plan must keep serving its own snapshot")
  }

  test("compact folds to one directory per table, preserves content; an unmarked generation is ignored") {
    val (store, root, _) = freshStore()
    advanceWith(store, docs(110, 160), id = 0L)
    advanceWith(store, docs(161, 200), id = 1L)
    val before = stateRows(store)
    assert(store.fileStats.forall(_.dirs == 3), "two triggers + base expected")
    store.compact(files = 2)
    assert(stateRows(store) === before, "compaction changed table content")
    assert(store.fileStats.forall(_.dirs == 1),
      s"compaction must fold to one directory per table: ${store.fileStats}")
    // a compaction that crashed before its generation marker: a
    // newer-generation directory with GARBAGE content and no marker —
    // reads must keep serving the marked generation
    store.state.labels.limit(1)
      .write.mode("overwrite").parquet(s"$root/labels/g7_a2")
    val reopened = new PersistentCurationStore(spark, root)
    assert(rowSet(reopened.state.labels) === before("labels"),
      "an unmarked (crashed-compact) generation leaked into reads")
    // the next compact garbage-collects the abandoned generation
    reopened.compact(files = 2)
    assert(rowSet(reopened.state.labels) === before("labels"))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/labels/g7_a2")),
      "crashed-compact leftovers must be GC'd")
  }

  test("fileStats reports erosion per table") {
    val (store, _, _) = freshStore()
    val base = store.fileStats.map(s => s.table -> s).toMap
    advanceWith(store, docs(110, 160), id = 0L)
    val grown = store.fileStats.map(s => s.table -> s).toMap
    PersistentCurationStore.Tables.foreach { t =>
      assert(grown(t).dirs === base(t).dirs + 1, s"$t directory count")
      assert(grown(t).files > base(t).files, s"$t file count")
    }
  }
}
