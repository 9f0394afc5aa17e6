package graft.tracking

import graft.SparkTestSession
import graft.graphs.{GraphConverter, GraphSettings}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

/** Sportec event XML ingestion + the W6 event-label journey over the
  * reference repo's own fixtures (`tests/files/sportec_events.xml` +
  * the tracking/meta pair). The fixture's tracking clip (21 frames,
  * 11:01:29.320–11:01:30.120 UTC) straddles the second event of the
  * match (a pass at 11:01:30.007), so the forward-fill genuinely
  * switches labels mid-clip: frames up to 11:01:30.000 carry the
  * KickOff, the last three frames carry the pass. The final test runs
  * the full label-real-graphs journey the reference README describes —
  * kinematics → possession → event attach → per-frame labels → graph
  * tensors. */
class SportecEventsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val files = "/root/reference/tests/files"
  private val HomeId = "DFL-CLU-00000P"

  private def micros(iso: String): Long = Instant.parse(iso).toEpochMilli * 1000L

  private lazy val events =
    SportecEvents.events(spark, s"$files/sportec_events.xml").cache()

  test("canonical event table: 1504 events, family counts from the raw XML") {
    assert(events.count() === 1504L)
    val byType = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("Play") === 798L)
    assert(byType("OtherBallAction") === 252L)
    assert(byType("TacklingGame") === 208L)
    assert(byType("Delete") === 60L)
    assert(byType("ThrowIn") === 41L)
    assert(byType("ShotAtGoal") === 26L)
    assert(byType("FreeKick") === 20L)
    assert(byType("GoalKick") === 18L)
    assert(byType("Foul") === 18L)
    assert(byType("KickOff") === 3L)
    assert(byType("FinalWhistle") === 2L)
    // the 9 rare families (RefereeBall, FairPlay, Offside, ... 17
    // events) degrade to 'other' (kloppy GENERIC analog)
    assert(byType("other") === 17L)
    // every event keeps its envelope
    assert(events.filter(col("event_ts_utc").isNull).count() === 0L)
  }

  test("kickoff envelope: ids, wall-clock micros, nested-play attributes") {
    val ko = events.filter(col("event_id") === "18237400000006").head()
    assert(ko.getAs[String]("game_id") === "DFL-MAT-J03WPY")
    assert(ko.getAs[Long]("event_ts_utc") === micros("2022-10-15T11:01:28.310Z"))
    assert(ko.getAs[String]("event_type") === "KickOff")
    assert(ko.getAs[String]("sub_type") === "Pass")
    assert(ko.getAs[String]("team_id") === HomeId) // nested Play@Team
    assert(ko.getAs[String]("player_id") === "DFL-OBJ-002G5J")
    assert(ko.getAs[String]("recipient_id") === "DFL-OBJ-0028FW")
    assert(ko.getAs[Double]("x") === 52.50 && ko.getAs[Double]("y") === 34.00)
    assert(ko.getAs[String]("evaluation") === "successfullyCompleted")
    assert(ko.getAs[String]("section") === "firstHalf")
  }

  test("family-specific extraction: tackles, shots, substitutions, cards") {
    val tk = events.filter(col("event_type") === "TacklingGame"
      && col("event_id") === "18237400000008").head()
    assert(tk.getAs[String]("team_id") === HomeId) // WinnerTeam
    assert(tk.getAs[String]("player_id") === "DFL-OBJ-002FXT") // Winner
    assert(tk.getAs[String]("recipient_id") === "DFL-OBJ-002GG4") // Loser
    assert(tk.getAs[Boolean]("possession_change"))
    val shots = events.filter(col("event_type") === "ShotAtGoal")
    assert(shots.filter(col("sub_type").isNull).count() === 0L)
    assert(shots.filter(col("sub_type") === "SavedShot").count() === 5L)
    assert(shots.filter(col("sub_type") === "ShotWide").count() === 11L)
    val subs = events.filter(col("event_type") === "Substitution")
    assert(subs.count() === 9L)
    assert(subs.filter(col("player_id").isNull || col("recipient_id").isNull).count() === 0L)
  }

  test("section starts: first frame of the only section, exact wall-clock") {
    val st = SportecEvents.sectionStarts(spark, s"$files/sportec_tracking.xml").collect()
    assert(st.length === 1)
    assert(st.head.getAs[String]("game_id") === "DFL-MAT-J03WPY")
    assert(st.head.getAs[Int]("period_id") === 1)
    assert(st.head.getAs[Long]("section_start_utc") === micros("2022-10-15T11:01:29.320Z"))
  }

  test("attach: the fill switches from KickOff to the 11:01:30.007 pass at frame 10018") {
    val trk = SportecSource.load(
      spark, s"$files/sportec_tracking.xml", s"$files/sportec_meta.xml")
    val starts = SportecEvents.sectionStarts(spark, s"$files/sportec_tracking.xml")
    val out = SportecEvents.attach(trk, events, starts).cache()
    assert(out.count() === 483L) // attach is row-preserving
    val perFrame = out.select("frame_id", "event_id", "event_type", "event_player_id")
      .distinct().collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(perFrame.size === 21) // one event label per frame
    (10000L to 10017L).foreach { f =>
      assert(perFrame(f) === (("18237400000006", "KickOff", "DFL-OBJ-002G5J")), s"frame $f")
    }
    (10018L to 10020L).foreach { f =>
      assert(perFrame(f) === (("18237400000007", "Play", "DFL-OBJ-0028FW")), s"frame $f")
    }
    out.unpersist()
  }

  test("label real graphs end-to-end: event-derived labels survive to the tensors") {
    val prepared = graft.api.SoccerPipeline.loadSportec(
      spark, s"$files/sportec_tracking.xml", s"$files/sportec_meta.xml")
    val starts = SportecEvents.sectionStarts(spark, s"$files/sportec_tracking.xml")
    val attached = SportecEvents.attach(prepared, events, starts)
    val labeled = Orientation.toBallOwning(attached, HomeId)
      .withColumn("label", (col("event_type") === "KickOff").cast("long"))
      .withColumn("graph_id", concat_ws("-", col("game_id"), col("frame_id")))
    val graphs = GraphConverter.graphFrames(labeled, GraphSettings(pad = false))
      .select("frame_id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graphs.size === 21)
    assert(graphs.count(_._2 == 1L) === 18) // kickoff-labeled frames
    assert((10018L to 10020L).forall(graphs(_) == 0L))
  }
}
