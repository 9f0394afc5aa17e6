package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** One-shot generator for the committed golden parquets under
  * `/root/repo/goldens/` that back the oracle rows of queries DuckDB
  * cannot recompute itself (XML ingestion, Delaunay triangulation).
  *
  * The goldens are NOT self-fulfilling: their VALUES are pinned by
  * independent ground truth before being committed —
  * `SportecFixtureGoldensSpec` cross-checks the 483-row load against
  * the reference's own test goldens (kloppy position codes,
  * first-frame kinematics, TTI 2.6428493704618106), and `DelaunaySpec`
  * verifies the triangulation against the defining empty-circumcircle
  * property plus hand-computed small cases. The committed files then
  * serve as regression anchors: the oracle compare fails the round if
  * the loader or the triangulation ever drifts from the
  * golden-verified behavior.
  *
  * Regenerate (only after an INTENTIONAL semantics change, with the
  * anchoring specs green):
  * {{{ sbt "runMain graft.tools.GoldenGen" }}}
  */
object GoldenGen {

  /** name → (query key, sf dir the golden is pinned at). */
  val Goldens: Map[String, (String, String)] = Map(
    "sportec_load" -> ("q_sportec_load", "/root/testdata/sf0.01"),
    "sportec_events" -> ("q_sportec_events", "/root/testdata/sf0.01"),
    "delaunay_sf0.01" -> ("q_graph_adjacency_delaunay", "/root/testdata/sf0.01"))

  /** Extra non-query goldens: name → DataFrame builder. */
  def extras(spark: SparkSession): Map[String, org.apache.spark.sql.DataFrame] = Map(
    "sportec_section_starts" -> graft.tracking.SportecEvents.sectionStarts(
      spark, "/root/reference/tests/files/sportec_tracking.xml"))

  def path(name: String): String = s"/root/repo/goldens/$name.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder(), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("/root/repo/goldens"))
    def dump(name: String, df: org.apache.spark.sql.DataFrame, src: String): Unit = {
      val tmp = s"/tmp/graft_golden_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(path(name)),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"[goldengen] wrote ${path(name)} from $src")
    }
    Goldens.foreach { case (name, (query, sfDir)) =>
      dump(name, SparkEntry.queries(query)(spark, sfDir), s"$query @ $sfDir")
    }
    extras(spark).foreach { case (name, df) => dump(name, df, "extras") }
    spark.stop()
  }
}
