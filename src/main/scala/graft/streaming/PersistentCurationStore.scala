package graft.streaming

import graft.api.{CurationPipeline, IncrementalCuration}
import graft.api.IncrementalCuration.State
import graft.llm.{Jaccard, MinHash, Urls}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The DURABLE twin of [[StreamingCuration.CurationStore]]: the
  * journey's state lives at `root` as the at-rest parquet artifacts
  * [[IncrementalCuration]]'s Scaladoc prescribes, and each micro-batch
  * advances it with I/O proportional to the batch wherever the
  * maintenance rule is append-shaped:
  *
  *  - `index/` (id, h), `bandkeys/` (id, band, key), `sizes/`
  *    (id, sz), `surv_adds/` (survivor rows), `revoked/` (doc_id) —
  *    pure APPEND of the increment's own rows (disjoint ids ⇒
  *    disjoint rows; the accumulated corpus is never rewritten);
  *  - `labels/eN`, `bucketcounts/eN`, `maxid/eN` — keyed merges,
  *    written as a NEW epoch directory each trigger (the merge plan
  *    reads the previous epoch, so in-place overwrite would read its
  *    own output; epochs also make a crash between writes recoverable
  *    — the previous epoch is intact until the new one is complete).
  *    The labels rewrite is the one corpus-sized write per trigger;
  *    [[graft.llm.DedupClusters.componentDelta]] + a
  *    component-bucketed table is the partition-scoped remedy when
  *    that write becomes the bottleneck.
  *
  * Reads reconstruct everything from disk, so a NEW store instance
  * over the same `root` — a restart, or another application — sees
  * the full journey state; there is no executor-memory state to lose
  * (the contrast with the in-memory twin's localCheckpoint blocks).
  * `survivors` = `surv_adds` anti-join `revoked`: a revoked doc never
  * re-survives (the keep rule is min-label, and a node that loses its
  * minimum never regains it), so the two append-only logs compose to
  * exactly the retraction-correct accumulated set the in-memory store
  * maintains (parity spec-pinned across a bridging trigger, including
  * after reopening from disk).
  *
  * Scope: the dedup journey ([[IncrementalCuration.step]]). A
  * pre-hygiene URL stage persists by the same recipe (`seenUrls`
  * append, `hostCounts` epoch-merged) next to this layout;
  * [[StreamingCuration.CurationStore]] demonstrates the composition
  * in memory.
  *
  * Append erosion: every trigger adds one small file per append table
  * — run [[compact]] on a cadence (the same loop any log-structured
  * store schedules) to fold them into few clustered files. */
final class PersistentCurationStore(spark: SparkSession, root: String)
    extends StreamingCuration.JourneyStore {
  import PersistentCurationStore._

  def state: State = State(
    read(spark, root, "index"),
    readLatestEpoch(spark, root, "labels"),
    Some(readLatestEpoch(spark, root, "maxid")),
    Some(MinHash.BandIndex(
      read(spark, root, "bandkeys"),
      readLatestEpoch(spark, root, "bucketcounts"),
      read(spark, root, "sizes"))))

  def survivors: DataFrame =
    read(spark, root, "surv_adds")
      .join(read(spark, root, "revoked"), Seq("doc_id"), "left_anti")

  private[streaming] def advance(
      batch: DataFrame,
      minQuality: Double,
      dupThreshold: Double,
      maxBucket: Option[Int],
      maxPerHost: Int): Unit = synchronized {
    val st = state
    val (sv, revoked, next) =
      IncrementalCuration.step(batch, st, minQuality, dupThreshold, maxBucket)
    // materialize every output BEFORE mutating the directories their
    // plans read: an un-materialized plan re-reading `index/` after
    // the append below would double-count the increment's rows
    val survCols = read(spark, root, "surv_adds").columns
    val svM = sv.select(survCols.map(col): _*).localCheckpoint()
    val rvM = revoked.localCheckpoint()
    val labelsM = next.labels.localCheckpoint()
    val bcM = next.bands.get.bucketCounts.localCheckpoint()
    val maxIdM = next.maxId.get.localCheckpoint()
    // the increment's OWN append rows, recomputed from the batch
    // (increment-sized; the scored pass is what step just persisted)
    val gated = CurationPipeline.gate(CurationPipeline.score(
      Urls.requireMonotone(batch, "doc_id", st.maxId.get,
        "PersistentCurationStore.advance")), minQuality)
    val newIndex = MinHash.shingleIndex(gated, "doc_id", "text").localCheckpoint()
    append(newIndex, s"$root/index")
    append(MinHash.indexBandKeys(newIndex, "doc_id"), s"$root/bandkeys")
    append(Jaccard.indexSizes(newIndex, "doc_id"), s"$root/sizes")
    append(svM, s"$root/surv_adds")
    append(rvM.toDF("doc_id"), s"$root/revoked")
    writeNextEpoch(spark, root, "labels", labelsM)
    writeNextEpoch(spark, root, "bucketcounts", bcM)
    writeNextEpoch(spark, root, "maxid", maxIdM)
    // the step's internal persists are dead weight once everything is
    // on disk (see CurationStore.advance's note)
    spark.catalog.clearCache()
  }

  /** Fold each append table's accumulated small files into `files`
    * clustered ones (index/bandkeys/sizes by their join keys; the
    * survivor/retraction logs by id). Corpus-sized I/O by design —
    * schedule it, don't run it per trigger. The table is materialized
    * to executor memory before its directory is overwritten (the
    * rewrite would otherwise read its own output). */
  def compact(files: Int = 32): Unit = synchronized {
    def rewrite(name: String, keys: Seq[String]): Unit = {
      val m = read(spark, root, name).localCheckpoint()
      m.repartitionByRange(files, keys.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
        .write.mode("overwrite").parquet(s"$root/$name")
    }
    rewrite("index", Seq("h"))
    rewrite("bandkeys", Seq("band", "key"))
    rewrite("sizes", Seq("doc_id"))
    rewrite("surv_adds", Seq("doc_id"))
    rewrite("revoked", Seq("doc_id"))
  }
}

object PersistentCurationStore {

  /** Initialize `root` from a bootstrap batch run: the [[State]]
    * (bands REQUIRED — [[IncrementalCuration.stateOf]] carries them)
    * and its survivor set. Epoch-merged tables start at `e0`. */
  def bootstrap(
      spark: SparkSession,
      root: String,
      state: State,
      survivors: DataFrame): PersistentCurationStore = {
    val bands = state.bands.getOrElse(throw new IllegalArgumentException(
      "PersistentCurationStore needs the banded side-tables; build the " +
        "state with IncrementalCuration.stateOf (bands = Some(...))"))
    state.shingleIndex.write.mode("overwrite").parquet(s"$root/index")
    bands.bandKeys.write.mode("overwrite").parquet(s"$root/bandkeys")
    bands.sizes.write.mode("overwrite").parquet(s"$root/sizes")
    survivors.write.mode("overwrite").parquet(s"$root/surv_adds")
    survivors.select(col("doc_id")).limit(0)
      .write.mode("overwrite").parquet(s"$root/revoked")
    state.labels.write.mode("overwrite").parquet(s"$root/labels/e0")
    bands.bucketCounts.write.mode("overwrite").parquet(s"$root/bucketcounts/e0")
    state.maxId.getOrElse(throw new IllegalArgumentException(
      "PersistentCurationStore needs the id watermark (stateOf carries it)"))
      .write.mode("overwrite").parquet(s"$root/maxid/e0")
    new PersistentCurationStore(spark, root)
  }

  private def read(spark: SparkSession, root: String, name: String): DataFrame =
    spark.read.parquet(s"$root/$name")

  private def epochs(spark: SparkSession, root: String, name: String): Seq[Long] = {
    val dir = new Path(s"$root/$name")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("e") && n.drop(1).forall(_.isDigit) =>
        n.drop(1).toLong }
  }

  private def readLatestEpoch(
      spark: SparkSession, root: String, name: String): DataFrame = {
    val es = epochs(spark, root, name)
    require(es.nonEmpty, s"no epoch directory under $root/$name — bootstrap first")
    spark.read.parquet(s"$root/$name/e${es.max}")
  }

  private def writeNextEpoch(
      spark: SparkSession, root: String, name: String, df: DataFrame): Unit = {
    val es = epochs(spark, root, name)
    val next = es.max + 1
    df.write.mode("overwrite").parquet(s"$root/$name/e$next")
    // previous epochs are garbage once the new one is complete; a
    // crash BEFORE this point leaves the old epoch as the valid state
    val dir = new Path(s"$root/$name")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    es.foreach(e => fs.delete(new Path(s"$root/$name/e$e"), true))
  }

  private def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)
}
