package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** SecondSpectrum JSONL provider path: synthetic round-trip (the
  * reference ships no fixture) plus hand-written frame lines covering
  * the format's semantics — lastTouch→owning team, live→ball_state,
  * roster positions, ball z, missing-ball frames, and the per-period
  * static flip. */
class SecondSpectrumSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic round-trip: write → load reproduces the canonical table") {
    val input = SyntheticTracking.df(spark, "/root/testdata/sf0.001")
      .filter(col("game_id") === "1").cache()
    val out = "/tmp/graft_2spectrum_roundtrip"
    SecondSpectrumSource.writeJsonl(input, out)
    val loaded = SecondSpectrumSource.load(
      spark, s"$out/frames/*.txt", s"$out/meta.json", orientation = "raw")

    assert(loaded.count() === input.count())
    val joined = input.alias("i").join(loaded.alias("l"),
      Seq("game_id", "period_id", "frame_id", "id"))
    assert(joined.count() === input.count())
    val bad = joined.filter(
      col("i.team_id") =!= col("l.team_id") ||
        col("i.timestamp") =!= col("l.timestamp") ||
        abs(col("i.x") - col("l.x")) > 1e-9 ||
        abs(col("i.y") - col("l.y")) > 1e-9 ||
        abs(col("i.z") - col("l.z")) > 1e-9 ||
        col("l.ball_state") =!= "alive")
    assert(bad.count() === 0L)
    input.unpersist()
  }

  test("corrupt rows drop: missing/truncated xyz and null frame keys") {
    val dir = "/tmp/graft_2spectrum_corrupt"
    Files.createDirectories(Paths.get(s"$dir/frames"))
    Files.write(Paths.get(s"$dir/frames/lines.txt"),
      ("""{"period":1,"frameIdx":1,"gameClock":0.0,"live":true,"homePlayers":[{"playerId":"ok","xyz":[1.0,2.0,0.0]},{"playerId":"noxyz"},{"playerId":"short","xyz":[3.0]}],"awayPlayers":[],"ball":{"xyz":[0.5]}}""" + "\n" +
        """{"frameIdx":2,"gameClock":0.04,"live":true,"homePlayers":[{"playerId":"ok","xyz":[1.0,2.0,0.0]}],"awayPlayers":[]}""" + "\n")
        .getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/meta.json"),
      ("""{"gameId": "mc", "homeTeamId": "H", "awayTeamId": "A"}""").getBytes("UTF-8"))
    val out = SecondSpectrumSource.load(
      spark, s"$dir/frames/*.txt", s"$dir/meta.json", orientation = "raw")
    val rows = out.collect().map(r => (r.getAs[Long]("frame_id"), r.getAs[String]("id")))
    // frame 1: only the fully-coordinated player survives (ball xyz
    // truncated → drops); frame 2 has no period → whole line drops
    assert(rows.toSet === Set((1L, "ok")))
    assert(out.filter(col("x").isNull || col("y").isNull).count() === 0L)
  }

  test("hand-written lines: lastTouch/live/roster/ball-z semantics and the static flip") {
    val dir = "/tmp/graft_2spectrum_edge"
    Files.createDirectories(Paths.get(s"$dir/frames"))
    // p1 home LTR (h7 at -20 < a11 at +10): no flip.
    // p2 home RTL (+20 vs -10): 180° rotation.
    // frame 3: dead ball, no lastTouch, ball missing → no ball row.
    Files.write(Paths.get(s"$dir/frames/lines.txt"),
      ("""{"period":1,"frameIdx":1,"gameClock":0.0,"live":true,"lastTouch":"home","homePlayers":[{"playerId":"h7","xyz":[-20.0,5.0,0.0]}],"awayPlayers":[{"playerId":"a11","xyz":[10.0,-3.0,0.0]}],"ball":{"xyz":[0.5,0.2,0.11]}}""" + "\n" +
        """{"period":1,"frameIdx":3,"gameClock":0.08,"live":false,"homePlayers":[{"playerId":"h7","xyz":[-19.0,5.0,0.0]}],"awayPlayers":[]}""" + "\n" +
        """{"period":2,"frameIdx":100,"gameClock":0.0,"live":true,"lastTouch":"away","homePlayers":[{"playerId":"h7","xyz":[20.0,-5.0,0.0]}],"awayPlayers":[{"playerId":"a11","xyz":[-10.0,3.0,0.0]}],"ball":{"xyz":[1.0,1.0,0.3]}}""" + "\n")
        .getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/meta.json"),
      ("""{"gameId": "m9", "homeTeamId": "HOME1", "awayTeamId": "AWAY1",
         | "pitchLength": 105.0, "pitchWidth": 68.0,
         | "players": [{"playerId": "h7", "teamId": "HOME1", "position": "GK"}]}
         |""".stripMargin).getBytes("UTF-8"))

    val out = SecondSpectrumSource.load(
      spark, s"$dir/frames/*.txt", s"$dir/meta.json").cache()
    assert(out.select("game_id").distinct().head().getString(0) === "m9")

    val f1 = out.filter(col("frame_id") === 1).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(f1.keySet === Set("h7", "a11", "ball"))
    assert(f1("h7").getAs[String]("team_id") === "HOME1")
    assert(f1("h7").getAs[String]("position_name") === "GK") // roster join
    assert(f1("a11").getAs[String]("position_name") === null)
    assert(f1("h7").getAs[Double]("x") === -20.0 && f1("h7").getAs[Double]("y") === 5.0)
    assert(f1("ball").getAs[Double]("z") === 0.11)
    assert(f1("ball").getAs[String]("ball_state") === "alive")
    assert(f1("ball").getAs[String]("ball_owning_team_id") === "HOME1") // lastTouch

    val f3 = out.filter(col("frame_id") === 3).collect()
    assert(f3.length === 1) // no ball object, empty away array
    assert(f3.head.getAs[String]("ball_state") === "dead")
    // kloppy-default only_alive drops the dead frame entirely
    val alive = SecondSpectrumSource.load(
      spark, s"$dir/frames/*.txt", s"$dir/meta.json", onlyAlive = true)
    assert(alive.filter(col("frame_id") === 3).count() === 0L)
    assert(alive.filter(col("frame_id") === 1).count() === 3L)
    assert(f3.head.isNullAt(f3.head.fieldIndex("ball_owning_team_id")))
    assert(f3.head.getAs[Long]("timestamp") === 80000L) // 0.08 s

    // p2 rotated back to home-LTR; owning maps through lastTouch=away
    val p2 = out.filter(col("frame_id") === 100).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(p2("h7").getAs[Double]("x") === -20.0 && p2("h7").getAs[Double]("y") === 5.0)
    assert(p2("ball").getAs[String]("ball_owning_team_id") === "AWAY1")
    out.unpersist()
  }
}
