package graft.tools

import graft.SparkEntry
import graft.api.{CurationPipeline, IncrementalCuration}
import graft.core.Tables
import graft.streaming.PersistentCurationStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Append-erosion telemetry for [[PersistentCurationStore]], measured:
  * bootstraps the durable journey store over the bottom 90% of the
  * documents corpus, advances it through 8 simulated daily triggers
  * (the top 10% in monotone id slices), and prices what erosion
  * actually costs — per-table directory/file counts and the min-of-3
  * full-state read time — BEFORE and AFTER [[PersistentCurationStore
  * .compact]]. The read covers every resolution path the store has:
  * append unions (index/bandkeys/sizes/survivors), the last-wins
  * label delta log, and the additive bucket-count log.
  *
  * Prints one JSON line:
  * {{{ {"metric":"store_soak","triggers":8,...,"sf":dir} }}}
  *
  * Run (after `ScaleGen` for the sf1 dir):
  * {{{
  * SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_CPUS=32 \
  *   SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.StoreSoak"
  * }}}
  */
object StoreSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nTriggers = sys.env.get("SPARK_GRAFT_STORE_TRIGGERS").map(_.toInt).getOrElse(8)
    def docs = Tables.documents(spark, sfDir)
    // slice bounds: 90% bootstrap, then nTriggers monotone id slices
    val probs = (0 to nTriggers).map(i => 0.9 + 0.1 * i / nTriggers).toArray
    val cuts = docs.stat.approxQuantile("doc_id", probs, 0.0).map(_.toLong)
    val root = "/tmp/graft_storesoak_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val d0 = docs.filter(col("doc_id") < cuts.head)
    val t0 = System.nanoTime()
    val gated = CurationPipeline.gate(CurationPipeline.score(d0), 0.5)
    val store = PersistentCurationStore.bootstrap(spark, root,
      IncrementalCuration.stateOf(d0, dupThreshold = 0.01),
      CurationPipeline.dedup(gated,
        CurationPipeline.nearDuplicatePairs(gated, threshold = 0.01)))
    val bootstrapSec = (System.nanoTime() - t0) / 1e9

    val advanceTimes = (0 until nTriggers).map { i =>
      val slice = docs.filter(
        col("doc_id") >= cuts(i) && (if (i == nTriggers - 1) lit(true)
                                     else col("doc_id") < cuts(i + 1)))
      val t = System.nanoTime()
      store.advance(slice, dupThreshold = 0.01, batchId = i.toLong)
      math.rint((System.nanoTime() - t) / 1e6) / 1e3
    }

    // the full-state read: every table, every resolution path
    def readAll(): Long = {
      val st = store.state
      st.shingleIndex.count() + st.labels.count() + st.maxId.get.count() +
        st.bands.get.bandKeys.count() + st.bands.get.bucketCounts.count() +
        st.bands.get.sizes.count() + store.survivors.count()
    }
    def timedRead(): Double = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t = System.nanoTime()
      readAll()
      (System.nanoTime() - t) / 1e9
    }.min
    readAll() // warm-up
    val readBefore = timedRead()
    val statsBefore = store.fileStats
    val tc = System.nanoTime()
    store.compact(files = 32)
    val compactSec = (System.nanoTime() - tc) / 1e9
    val readAfter = timedRead()
    val statsAfter = store.fileStats

    def statsJson(s: Seq[PersistentCurationStore.TableStats]) =
      s.map(t => s""""${t.table}":{"dirs":${t.dirs},"files":${t.files},"mb":${math.rint(t.bytes / 1e4) / 100}}""")
        .mkString("{", ",", "}")
    def r3(d: Double) = math.rint(d * 1000) / 1000
    println(s"""{"metric":"store_soak","triggers":$nTriggers""" +
      s""","bootstrap_sec":${r3(bootstrapSec)}""" +
      s""","advance_sec":[${advanceTimes.map(r3).mkString(",")}]""" +
      s""","read_before_sec":${r3(readBefore)},"read_after_sec":${r3(readAfter)}""" +
      s""","compact_sec":${r3(compactSec)}""" +
      s""","files_before":${statsJson(statsBefore)}""" +
      s""","files_after":${statsJson(statsAfter)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
