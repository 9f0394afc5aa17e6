package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Period alternation mechanics the reference fixture (single half)
  * cannot exercise: STATIC_HOME_AWAY must rotate exactly the periods
  * where home would attack right-to-left (sides switch at half time),
  * and timestamps rebase per game section. Synthetic two-section XML
  * in the Sportec layout. */
class SportecTwoPeriodSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val (tracking, meta): (String, String) = {
    def frameSet(section: String, team: String, person: String, frames: Seq[(Long, Double, Double)]) =
      s"""<FrameSet GameSection="$section" MatchId="M1" TeamId="$team" PersonId="$person">
         |${frames.map { case (n, x, y) =>
            s"""<Frame N="$n" T="t" X="$x" Y="$y" D="0" S="0" A="0" M="1"/>""" }.mkString("\n")}
         |</FrameSet>""".stripMargin
    def ballSet(section: String, frames: Seq[(Long, Double, Double)]) =
      s"""<FrameSet GameSection="$section" MatchId="M1" TeamId="BALL" PersonId="BALL-1">
         |${frames.map { case (n, x, y) =>
            s"""<Frame N="$n" T="t" X="$x" Y="$y" Z="0.1" D="0" S="0" A="0" M="1" BallPossession="1" BallStatus="1"/>""" }.mkString("\n")}
         |</FrameSet>""".stripMargin
    // period 1: home left (avg -25), away right (avg +20) → home LTR, raw
    // period 2: sides switched (home right) → rotate 180°
    val h1p1 = Seq((10000L, -30.0, 5.0), (10001L, -29.0, 5.0))
    val h2p1 = Seq((10000L, -20.0, -5.0), (10001L, -19.0, -5.0))
    val a1p1 = Seq((10000L, 25.0, 3.0), (10001L, 24.0, 3.0))
    val a2p1 = Seq((10000L, 15.0, -3.0), (10001L, 14.0, -3.0))
    val h1p2 = Seq((100000L, 30.0, -5.0), (100001L, 29.0, -5.0))
    val h2p2 = Seq((100000L, 20.0, 5.0), (100001L, 19.0, 5.0))
    val a1p2 = Seq((100000L, -25.0, -3.0), (100001L, -24.0, -3.0))
    val a2p2 = Seq((100000L, -15.0, 3.0), (100001L, -14.0, 3.0))
    val ballP1 = Seq((10000L, 0.5, 0.2), (10001L, 0.6, 0.2))
    val ballP2 = Seq((100000L, -0.5, -0.2), (100001L, -0.6, -0.2))
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<PutDataRequest>
         |<Positions>
         |${frameSet("firstHalf", "T-HOME", "P-H1", h1p1)}
         |${frameSet("firstHalf", "T-HOME", "P-H2", h2p1)}
         |${frameSet("firstHalf", "T-AWAY", "P-A1", a1p1)}
         |${frameSet("firstHalf", "T-AWAY", "P-A2", a2p1)}
         |${ballSet("firstHalf", ballP1)}
         |${frameSet("secondHalf", "T-HOME", "P-H1", h1p2)}
         |${frameSet("secondHalf", "T-HOME", "P-H2", h2p2)}
         |${frameSet("secondHalf", "T-AWAY", "P-A1", a1p2)}
         |${frameSet("secondHalf", "T-AWAY", "P-A2", a2p2)}
         |${ballSet("secondHalf", ballP2)}
         |</Positions>
         |</PutDataRequest>""".stripMargin
    val metaXml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<PutDataRequest>
        |<MatchInformation>
        |<General MatchId="M1" HomeTeamId="T-HOME" GuestTeamId="T-AWAY" HomeTeamName="Home" GuestTeamName="Away" KickoffTime="2024-01-01T12:00:00Z"/>
        |<Environment PitchX="105.00" PitchY="68.00"/>
        |<Teams>
        |<Team TeamId="T-HOME" TeamName="Home" Role="home">
        |<Players>
        |<Player PersonId="P-H1" ShirtNumber="1" LastName="HOne" Starting="true" PlayingPosition="TW"/>
        |<Player PersonId="P-H2" ShirtNumber="2" LastName="HTwo" Starting="true" PlayingPosition="IVR"/>
        |</Players>
        |</Team>
        |<Team TeamId="T-AWAY" TeamName="Away" Role="guest">
        |<Players>
        |<Player PersonId="P-A1" ShirtNumber="3" LastName="AOne" Starting="true" PlayingPosition="TW"/>
        |<Player PersonId="P-A2" ShirtNumber="4" LastName="ATwo" Starting="true" PlayingPosition="STL"/>
        |</Players>
        |</Team>
        |</Teams>
        |</MatchInformation>
        |</PutDataRequest>""".stripMargin
    val t = "/tmp/graft_sportec_two_tracking.xml"
    val m = "/tmp/graft_sportec_two_meta.xml"
    Files.write(Paths.get(t), xml.getBytes("UTF-8"))
    Files.write(Paths.get(m), metaXml.getBytes("UTF-8"))
    (t, m)
  }

  private lazy val loaded = SportecSource.load(spark, tracking, meta).cache()

  test("two sections load as periods 1 and 2 with per-section clocks") {
    assert(loaded.count() === 20L) // 5 objects x 2 frames x 2 sections
    val ts = loaded.select("period_id", "frame_id", "timestamp").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ts((1, 10000L)) === 0L && ts((1, 10001L)) === 40000L)
    assert(ts((2, 100000L)) === 0L && ts((2, 100001L)) === 40000L)
  }

  test("STATIC_HOME_AWAY rotates only the period where home attacks RTL") {
    def xy(p: Int, n: Long, id: String): (Double, Double) = {
      val r = loaded.filter(col("period_id") === p && col("frame_id") === n && col("id") === id).head()
      (r.getAs[Double]("x"), r.getAs[Double]("y"))
    }
    assert(xy(1, 10000L, "P-H1") === ((-30.0, 5.0)))   // period 1 raw
    assert(xy(1, 10000L, "P-A1") === ((25.0, 3.0)))
    assert(xy(2, 100000L, "P-H1") === ((-30.0, 5.0)))  // period 2 rotated back
    assert(xy(2, 100000L, "P-A1") === ((25.0, 3.0)))
    assert(xy(2, 100000L, "ball") === ((0.5, 0.2)))
  }

  test("raw orientation keeps provider coordinates in both periods") {
    val raw = SportecSource.load(spark, tracking, meta, orientation = "raw")
    val r = raw.filter(col("period_id") === 2 && col("frame_id") === 100000L && col("id") === "P-H1").head()
    assert(r.getAs[Double]("x") === 30.0 && r.getAs[Double]("y") === -5.0)
  }

  test("possession and state flow from the ball in both sections") {
    val states = loaded.select("period_id", "ball_owning_team_id", "ball_state").distinct().collect()
    assert(states.forall(r => r.getString(1) === "T-HOME" && r.getString(2) === "alive"))
  }

  test("only_alive filters dead-ball frames; malformed attributes null out, not fail") {
    // dead second frame + a frame with a malformed X attribute
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<PutDataRequest>
        |<Positions>
        |<FrameSet GameSection="firstHalf" MatchId="M1" TeamId="T-HOME" PersonId="P-H1">
        |<Frame N="10000" T="t" X="1.0" Y="1.0" D="0" S="0" A="0" M="1"/>
        |<Frame N="10001" T="t" X="oops" Y="1.0" D="0" S="0" A="0" M="1"/>
        |<Frame N="10002" T="t" X="3.0" Y="1.0" D="0" S="0" A="0" M="1"/>
        |</FrameSet>
        |<FrameSet GameSection="firstHalf" MatchId="M1" TeamId="BALL" PersonId="B">
        |<Frame N="10000" T="t" X="0" Y="0" Z="0.1" BallPossession="1" BallStatus="1" D="0" S="0" A="0" M="1"/>
        |<Frame N="10001" T="t" X="0" Y="0" Z="0.1" BallPossession="1" BallStatus="0" D="0" S="0" A="0" M="1"/>
        |<Frame N="10002" T="t" X="0" Y="0" Z="0.1" BallPossession="1" BallStatus="1" D="0" S="0" A="0" M="1"/>
        |</FrameSet>
        |</Positions>
        |</PutDataRequest>""".stripMargin
    val t = "/tmp/graft_sportec_alive_tracking.xml"
    Files.write(Paths.get(t), xml.getBytes("UTF-8"))

    val all = SportecSource.load(spark, t, meta, orientation = "raw")
    assert(all.count() === 6L)
    // malformed X → null under the declared schema (PERMISSIVE), row kept
    val bad = all.filter(col("frame_id") === 10001L && col("id") === "P-H1").head()
    assert(bad.isNullAt(bad.fieldIndex("x")))
    assert(bad.getAs[Double]("y") === 1.0)
    assert(all.filter(col("frame_id") === 10001L).select("ball_state")
      .distinct().head().getString(0) === "dead") // BallStatus != "1"

    val alive = SportecSource.load(spark, t, meta, onlyAlive = true, orientation = "raw")
    assert(alive.count() === 4L)
    assert(alive.select("frame_id").distinct().collect().map(_.getLong(0)).sorted
      .toSeq === Seq(10000L, 10002L))
  }
}
