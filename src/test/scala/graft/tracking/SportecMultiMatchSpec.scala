package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Multi-match ingestion through one glob — the deployment shape at
  * scale (a season = many per-match XML files; FrameSets parallelize
  * across files). Two synthetic matches with different frame offsets,
  * opposite raw attacking directions, and different home ids must stay
  * fully isolated: per-game clock rebase, per-game flip decision,
  * per-game roster/owning-team resolution. */
class SportecMultiMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def trackingXml(matchId: String, n0: Long, homeTeam: String, awayTeam: String,
      homeX: Double, awayX: Double) =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PutDataRequest>
       |<Positions>
       |<FrameSet GameSection="firstHalf" MatchId="$matchId" TeamId="$homeTeam" PersonId="$matchId-H1">
       |<Frame N="$n0" T="t" X="$homeX" Y="2.0" D="0" S="0" A="0" M="1"/>
       |<Frame N="${n0 + 1}" T="t" X="${homeX + 1}" Y="2.0" D="0" S="0" A="0" M="1"/>
       |</FrameSet>
       |<FrameSet GameSection="firstHalf" MatchId="$matchId" TeamId="$awayTeam" PersonId="$matchId-A1">
       |<Frame N="$n0" T="t" X="$awayX" Y="-2.0" D="0" S="0" A="0" M="1"/>
       |<Frame N="${n0 + 1}" T="t" X="${awayX - 1}" Y="-2.0" D="0" S="0" A="0" M="1"/>
       |</FrameSet>
       |<FrameSet GameSection="firstHalf" MatchId="$matchId" TeamId="BALL" PersonId="$matchId-B">
       |<Frame N="$n0" T="t" X="0.0" Y="0.0" Z="0.2" D="0" S="0" A="0" M="1" BallPossession="2" BallStatus="1"/>
       |<Frame N="${n0 + 1}" T="t" X="0.1" Y="0.0" Z="0.2" D="0" S="0" A="0" M="1" BallPossession="2" BallStatus="1"/>
       |</FrameSet>
       |</Positions>
       |</PutDataRequest>""".stripMargin

  private def metaXml(matchId: String, homeTeam: String, awayTeam: String) =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<PutDataRequest>
       |<MatchInformation>
       |<General MatchId="$matchId" HomeTeamId="$homeTeam" GuestTeamId="$awayTeam" HomeTeamName="H" GuestTeamName="A"/>
       |<Environment PitchX="105.00" PitchY="68.00"/>
       |<Teams>
       |<Team TeamId="$homeTeam" TeamName="H" Role="home"><Players>
       |<Player PersonId="$matchId-H1" ShirtNumber="1" LastName="h" Starting="true" PlayingPosition="TW"/>
       |</Players></Team>
       |<Team TeamId="$awayTeam" TeamName="A" Role="guest"><Players>
       |<Player PersonId="$matchId-A1" ShirtNumber="2" LastName="a" Starting="true" PlayingPosition="STR"/>
       |</Players></Team>
       |</Teams>
       |</MatchInformation>
       |</PutDataRequest>""".stripMargin

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_sportec_multi").toString
    // match A: home left (LTR, raw); frames from 10000
    Files.write(Paths.get(s"$d/trk_a.xml"),
      trackingXml("MATCH-A", 10000L, "TEAM-A-H", "TEAM-A-G", -20.0, 20.0).getBytes("UTF-8"))
    // match B: home RIGHT (RTL → rotate); frames from 50000
    Files.write(Paths.get(s"$d/trk_b.xml"),
      trackingXml("MATCH-B", 50000L, "TEAM-B-H", "TEAM-B-G", 20.0, -20.0).getBytes("UTF-8"))
    Files.write(Paths.get(s"$d/meta_a.xml"),
      metaXml("MATCH-A", "TEAM-A-H", "TEAM-A-G").getBytes("UTF-8"))
    Files.write(Paths.get(s"$d/meta_b.xml"),
      metaXml("MATCH-B", "TEAM-B-H", "TEAM-B-G").getBytes("UTF-8"))
    d
  }

  private lazy val loaded =
    SportecSource.load(spark, s"$dir/trk_*.xml", s"$dir/meta_*.xml").cache()

  test("two matches through one glob: 12 rows, isolated game ids") {
    assert(loaded.count() === 12L)
    assert(loaded.select("game_id").distinct().count() === 2L)
  }

  test("per-game clock rebase despite different frame offsets") {
    val ts = loaded.groupBy("game_id").agg(min("timestamp"), max("timestamp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ts("MATCH-A") === ((0L, 40000L)))
    assert(ts("MATCH-B") === ((0L, 40000L)))
  }

  test("per-game flip: raw-LTR match untouched, raw-RTL match rotated") {
    def x(game: String, id: String): Double =
      loaded.filter(col("game_id") === game && col("id") === id &&
        col("timestamp") === 0L).head().getAs[Double]("x")
    assert(x("MATCH-A", "MATCH-A-H1") === -20.0) // already home-LTR
    assert(x("MATCH-B", "MATCH-B-H1") === -20.0) // rotated from +20
    assert(x("MATCH-B", "MATCH-B-A1") === 20.0)  // rotated from -20
  }

  test("per-game owning team resolves against each match's own meta") {
    val own = loaded.filter(col("team_id") === "ball")
      .select("game_id", "ball_owning_team_id").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(own("MATCH-A") === "TEAM-A-G") // BallPossession=2 → guest
    assert(own("MATCH-B") === "TEAM-B-G")
  }

  test("rosters resolve per match: both GKs labeled from their own meta") {
    val pos = loaded.filter(col("timestamp") === 0L && col("team_id") =!= "ball")
      .select("id", "position_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pos("MATCH-A-H1") === "GK" && pos("MATCH-B-H1") === "GK")
    assert(pos("MATCH-A-A1") === "ST" && pos("MATCH-B-A1") === "ST")
  }
}
