package graft.football

import graft.SparkTestSession
import graft.tracking.Labels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-fixture ground truth: the reference repo's own
  * BigDataBowl sample CSVs (`tests/files/bdb_{coords,players,plays}-1
  * .csv`) loaded through [[BigDataBowl.load]] and asserted against the
  * exact goldens in `tests/test_american_football.py` — row values
  * after load (`:285-306`), the per-frame node order (`:324-345`), and
  * the 263-graph count (`:346`). These are engine-independent ground
  * truth: any semantic drift in rotation, radian wrapping, frame-id
  * synthesis, metadata joins, or node ordering breaks them. */
class BdbFixtureGoldensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val files = "/root/reference/tests/files"
  private lazy val loaded = {
    val base = BigDataBowl.load(spark,
      s"$files/bdb_coords-1.csv", s"$files/bdb_players-1.csv", s"$files/bdb_plays-1.csv")
    // test fixture applies add_graph_ids + add_dummy_labels
    // (test_american_football.py:58-59)
    Labels.addDummyLabels(
      Labels.addGraphIds(base, Seq("game_id", "play_id")),
      Seq("game_id", "play_id", "frame_id")).cache()
  }

  test("fixture loads to 6049 rows (test_american_football.py:285)") {
    assert(loaded.count() === 6049L)
  }

  test("row 10 in the reference sort order carries the exact reference goldens (:289-306)") {
    // the reference sorts (game_id, play_id, frame_id, id) at the end of
    // load (dataset.py:332-334) and asserts data.row(10)
    val row = loaded
      .withColumn("time_str", date_format(col("time"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .orderBy(col("game_id"), col("play_id"), col("frame_id"), col("id"))
      .limit(11).collect().last
    def d(n: String): Double = row.getDouble(row.fieldIndex(n))
    def s(n: String): String = row.getString(row.fieldIndex(n))
    assert(row.getLong(row.fieldIndex("game_id")) === 2021091300L)
    assert(row.getLong(row.fieldIndex("play_id")) === 4845L)
    assert(d("id") === 44999.0)
    assert(row.getLong(row.fieldIndex("frame_id")) === 484500001L)
    assert(s("time_str") === "2021-09-14 03:54:17.700")
    assert(d("jerseyNumber") === 36.0)
    assert(s("team_id") === "BAL")
    assert(s("playDirection") === "left")
    assert(math.abs(d("x") - 20.369999999999997) < 1e-9)
    assert(math.abs(d("y") - -2.5400000000000027) < 1e-9)
    assert(d("v") === 0.03)
    assert(d("a") === 0.03)
    assert(d("dis") === 0.02)
    assert(math.abs(d("o") - -1.6957619012376899) < 1e-12)
    assert(math.abs(d("dir") - -1.9114845967841898) < 1e-12)
    assert(row.isNullAt(row.fieldIndex("event")))
    assert(s("position_name") === "SS")
    assert(s("ball_owning_team_id") === "LV")
    assert(s("graph_id") === "2021091300-4845")
    assert(loaded.columns.contains("label"))
  }

  test("frame 484500005 node order matches the reference id list (:324-345)") {
    val complete = BigDataBowl.removeIncompleteFrames(loaded)
    val ids = AfFeatures.graphFrames(complete)
      .filter(col("frame_id") === 484500005L)
      .select("object_ids").head.getSeq[Double](0)
    val expected = Seq(
      41265.0, 42547.0, 43362.0, 44849.0, 44972.0, 46084.0, 47920.0,
      47932.0, 48235.0, 52517.0, 53446.0, // attacking (LV), id asc
      33131.0, 37240.0, 40042.0, 44828.0, 44999.0, 46187.0, 46259.0,
      48565.0, 52436.0, 52506.0, 53460.0, // defending (BAL), id asc
      -9999.9) // football last
    assert(ids === expected)
  }

  test("fixture converts to 263 graphs (:346)") {
    val complete = BigDataBowl.removeIncompleteFrames(loaded)
    assert(AfFeatures.graphFrames(complete).count() === 263L)
  }
}
