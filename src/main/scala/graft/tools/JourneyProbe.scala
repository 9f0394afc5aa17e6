package graft.tools

import graft.SparkEntry
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition of the composed daily step at sf1 — times
  * each stage of `IncrementalCuration.step` separately for the banded
  * (side-table) and nosides flavors, against the same at-rest state
  * the journey soak writes. Diagnostic only; SCALING.md quotes it. */
object JourneyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = Tables.documents(spark, sfDir)
    val journeyDir = "/tmp/graft_journey_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val cut = docs.stat.approxQuantile("doc_id", Array(0.8), 0.0).head.toLong
    val nw = docs.filter(col("doc_id") >= cut)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.1fs")
      r
    }

    def state(banded: Boolean) = graft.api.IncrementalCuration.State(
      spark.read.parquet(s"$journeyDir/index"),
      spark.read.parquet(s"$journeyDir/labels"),
      Some(spark.read.parquet(s"$journeyDir/maxid")),
      if (banded) Some(graft.llm.MinHash.BandIndex(
        spark.read.parquet(s"$journeyDir/bandkeys"),
        spark.read.parquet(s"$journeyDir/bucketcounts"),
        spark.read.parquet(s"$journeyDir/sizes")))
      else None)

    Seq(false, true).foreach { banded =>
      val flavor = if (banded) "banded" else "nosides"
      println(s"=== $flavor ===")
      val st = state(banded)
      val gated = t(s"$flavor gate+score count") {
        val g = graft.api.CurationPipeline.gate(graft.api.CurationPipeline.score(
          graft.llm.Urls.requireMonotone(nw, "doc_id", st.maxId.get, "probe")))
        g.count(); g
      }
      val pairsDf = graft.llm.MinHash.nearDuplicatesIncremental(
        gated, "doc_id", "text", st.shingleIndex,
        threshold = 0.01, maxBucket = Some(10000), sideTables = st.bands)
        .select(col("id_a"), col("id_b"))
      // stage A: candidate pairs only (band join, pre-verify) — count
      // the pair relation WITHOUT the exact-Jaccard verify by rebuilding
      // the band keys the same way
      val pairs = t(s"$flavor pairs+verify count")(pairsDf.count())
      println(s"[probe] $flavor pairs rows: $pairs")
      val ckpt = t(s"$flavor pairs localCheckpoint") {
        pairsDf.localCheckpoint()
      }
      val (labels, revoked) = t(s"$flavor contraction CC") {
        val lr = graft.llm.DedupClusters.updateComponentsWithRevokedKeeps(
          st.labels, ckpt, gated.select(col("doc_id")))
        lr._2.count(); lr
      }
      t(s"$flavor survivors count") {
        val dropped = labels.toDF("doc_id", "__comp")
          .filter(col("__comp") =!= col("doc_id")).select(col("doc_id"))
        gated.join(dropped, Seq("doc_id"), "left_anti").count()
      }
      t(s"$flavor index append count") {
        graft.llm.MinHash.shingleIndex(gated, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
