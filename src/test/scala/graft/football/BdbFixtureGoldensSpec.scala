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

  // ---- exact feature-tensor goldens (`test_american_football.py:
  // 86-156, 346-386`): the reference's converter fixture runs
  // max speeds/accs 8/28/10/10 with defending_team_node_value=0.0.
  // These pin the full node/edge feature algebra, including the
  // reference's frame-global Frobenius normalization of the
  // speed/acceleration direction vectors (see AfFeatures scaladoc).

  private lazy val fixtureSettings = AfFeatures.AfSettings(
    maxPlayerSpeed = 8.0, maxBallSpeed = 28.0,
    maxPlayerAcc = 10.0, maxBallAcc = 10.0, defendingNodeValue = 0.0)

  private lazy val goldenFrame = BigDataBowl.removeIncompleteFrames(loaded)
    .filter(col("frame_id") === 484500005L)

  test("node 14 of frame 484500005 carries the 20 exact reference feature values (:129-156)") {
    val nf = AfFeatures.withNodeIndex(
      AfFeatures.withNodeFeatures(goldenFrame, fixtureSettings))
    val n14 = nf.filter(col("node_idx") === 14)
      .select(AfFeatures.NodeFeatureNames.map(col): _*).head()
    val golden = Seq(
      0.6679999999999999, 0.6906191369606004, 0.0006550334862428781,
      0.003179802408809971, 0.0025, 0.0012270197205202379,
      0.005956459242025524, 0.001, 0.9897173160115632,
      0.6008808723120034, 0.394422899008786, 0.9887263812669529,
      0.31312769316888, 0.05817057703598108, 0.2486666666666667,
      0.0, 0.0, 0.0, 0.21428571428571427, 0.5333333333333333)
    golden.zipWithIndex.foreach { case (g, i) =>
      assert(math.abs(n14.getDouble(i) - g) < 1e-5,
        s"feature ${AfFeatures.NodeFeatureNames(i)}: ${n14.getDouble(i)} vs $g")
    }
  }

  test("edge 56 of frame 484500005 carries the 9 exact reference values; 287 edges total (:84-97,:359)") {
    val nf = AfFeatures.withNodeIndex(
      AfFeatures.withNodeFeatures(goldenFrame, fixtureSettings))
    val idx = nf.select(col("id"), col("node_idx")).collect()
      .map(r => r.getDouble(0) -> r.getInt(1)).toMap
    val idxMap = typedLit(idx.map { case (k, v) => k.toString -> v })
    // reference edge order = row-major over the adjacency matrix
    // (np.where's non_zeros ordering, edge_features.py:58-83)
    val edges = AfFeatures.pairs(goldenFrame, fixtureSettings).filter(col("a") === 1)
      .withColumn("i_idx", element_at(idxMap, col("i_id").cast("string")))
      .withColumn("j_idx", element_at(idxMap, col("j_id").cast("string")))
      .orderBy("i_idx", "j_idx")
      .select(AfFeatures.EdgeFeatureNames.map(col): _*)
      .collect()
    assert(edges.length === 287) // == sum of the reference adjacency fixture
    val golden = Seq(
      0.01313932645066367, -0.0, -0.035, 0.36378814141831695,
      0.018911307988097092, 0.3153698930324255, 0.03533697844444089,
      0.9964516879114877, 0.4405380662117784)
    golden.zipWithIndex.foreach { case (g, i) =>
      assert(math.abs(edges(56).getDouble(i) - g) < 1e-5,
        s"edge feature ${AfFeatures.EdgeFeatureNames(i)}: ${edges(56).getDouble(i)} vs $g")
    }
  }
}
