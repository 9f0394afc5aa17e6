package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** SkillCorner provider path. The reference repo ships only the
  * match-data half of its SkillCorner fixture
  * (`tests/files/skillcorner_match_data.json`; the structured tracking
  * gz the tests reference is absent), so the roster/team parsing is
  * pinned against the real fixture while the frame mechanics
  * (include_empty_frames, anonymous/referee drops, possession →
  * owning team, clock rebase, STATIC_HOME_AWAY flip) are exercised on
  * a sample written in SkillCorner's public open-data frame schema
  * using the real fixture's trackable ids. */
class SkillCornerSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val matchData = "/root/reference/tests/files/skillcorner_match_data.json"

  // real trackable ids from the fixture: home (team 100) LCB 2405 and
  // GK 6637, away (team 103) CF 6806; ball trackable 55
  private lazy val structured: String = {
    val frames =
      """[
        |{"frame":2000,"period":null,"timestamp":null,"possession":{"trackable_object":null,"group":null},"data":[{"track_id":1,"trackable_object":2405,"x":-1.0,"y":0.0}]},
        |{"frame":2001,"period":1,"timestamp":"0:00:00.00","possession":{"trackable_object":2405,"group":"home team"},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-20.0,"y":5.0},
        |         {"track_id":2,"trackable_object":6637,"x":-45.0,"y":0.0},
        |         {"track_id":3,"trackable_object":6806,"x":10.0,"y":-3.0},
        |         {"track_id":4,"trackable_object":55,"x":0.5,"y":0.2,"z":0.11},
        |         {"track_id":99,"x":1.0,"y":1.0},
        |         {"track_id":98,"trackable_object":999999,"x":2.0,"y":2.0}]},
        |{"frame":2002,"period":1,"timestamp":"0:00:00.10","possession":{"trackable_object":6806,"group":"away team"},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-19.5,"y":5.1},
        |         {"track_id":4,"trackable_object":55,"x":0.9,"y":0.3,"z":0.2}]},
        |{"frame":2003,"period":1,"timestamp":"0:00:00.20","possession":{"trackable_object":null,"group":null},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-19.0,"y":5.2}]},
        |{"frame":2004,"period":1,"timestamp":"0:00:00.30","possession":{"trackable_object":null,"group":null},"data":[]},
        |{"frame":40000,"period":2,"timestamp":"0:45:00.00","possession":{"trackable_object":2405,"group":"home team"},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-20.0,"y":5.0},
        |         {"track_id":3,"trackable_object":6806,"x":15.0,"y":1.0}]},
        |{"frame":40001,"period":2,"timestamp":"0:45:00.10","possession":{"trackable_object":2405,"group":"home team"},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-20.5,"y":5.0}]}
        |]""".stripMargin
    val p = "/tmp/graft_skillcorner_sample.json"
    Files.write(Paths.get(p), frames.getBytes("UTF-8"))
    p
  }

  private lazy val loaded =
    SkillCornerSource.load(spark, structured, matchData).cache()

  test("real match_data fixture: teams, ball trackable, 38-player squad") {
    val g = SkillCornerSource.games(spark, matchData).head()
    assert(g.getAs[String]("game_id") === "2417")
    assert(g.getAs[String]("home_team_id") === "100")
    assert(g.getAs[String]("away_team_id") === "103")
    assert(g.getAs[Long]("ball_trackable_object") === 55L)
    assert(g.getAs[Double]("pitch_length") === 105.0)

    val r = SkillCornerSource.roster(spark, matchData).cache()
    assert(r.count() === 38L)
    assert(r.filter(col("is_home")).count() > 0 && r.filter(!col("is_home")).count() > 0)
    val gk = r.filter(col("id") === "6637").head()
    assert(gk.getAs[String]("position_name") === "GK")
    assert(gk.getAs[String]("team_id") === "100")
    assert(gk.getAs[Boolean]("is_home"))
    // bench players keep a null canonical position but expose the acronym
    val sub = r.filter(col("role_acronym") === "SUB")
    assert(sub.count() > 0)
    assert(sub.filter(col("position_name").isNotNull).count() === 0)
    r.unpersist()
  }

  test("null-period and empty frames drop; anonymous and unknown tracks drop") {
    assert(loaded.select("frame_id").distinct().count() === 5L) // 2001-2003, 40000-40001
    val f1 = loaded.filter(col("frame_id") === 2001)
    assert(f1.count() === 4L) // 2 home + 1 away + ball
    assert(f1.filter(col("id") === "ball").count() === 1L)
  }

  test("possession group maps to owning team id; ball_state tracks it") {
    def one(f: Long) = loaded.filter(col("frame_id") === f)
      .select("ball_owning_team_id", "ball_state").distinct().head()
    assert(one(2001).getString(0) === "100" && one(2001).getString(1) === "alive")
    assert(one(2002).getString(0) === "103")
    assert(one(2003).isNullAt(0) && one(2003).isNullAt(1))
  }

  test("clock rebases to period start; centisecond fractions parse") {
    val ts = loaded.select("period_id", "frame_id", "timestamp").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ts((1, 2001L)) === 0L)
    assert(ts((1, 2002L)) === 100000L) // 0.10 s
    assert(ts((1, 2003L)) === 200000L)
    assert(ts((2, 40000L)) === 0L) // second-half clock starts at 45:00
    assert(ts((2, 40001L)) === 100000L)
  }

  test("malformed clocks (short or non-numeric) drop the frame, not the scan") {
    val frames =
      """[
        |{"frame":1,"period":1,"timestamp":"0:00:00.00","possession":{"trackable_object":null,"group":null},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-20.0,"y":5.0}]},
        |{"frame":2,"period":1,"timestamp":"0:00","possession":{"trackable_object":null,"group":null},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-19.0,"y":5.0}]},
        |{"frame":3,"period":1,"timestamp":"a:00:00.0","possession":{"trackable_object":null,"group":null},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-18.0,"y":5.0}]},
        |{"frame":4,"period":1,"timestamp":"0:00:00.30","possession":{"trackable_object":null,"group":null},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-17.0,"y":5.0}]}
        |]""".stripMargin
    val p = "/tmp/graft_skillcorner_badclock_sample.json"
    Files.write(Paths.get(p), frames.getBytes("UTF-8"))
    val df = SkillCornerSource.load(spark, p, matchData)
    // under ANSI mode a plain cast of "a" would abort the whole scan;
    // frames 2 (short) and 3 (non-numeric) must drop instead
    assert(df.select("frame_id").distinct().collect().map(_.getLong(0)).sorted
      === Array(1L, 4L))
  }

  test("STATIC_HOME_AWAY detects per period: home LTR in both halves here → nothing flips") {
    // p1 first frame: home mean x = -32.5 < away 10.0 → home LTR, raw
    val p1 = loaded.filter(col("frame_id") === 2001 && col("id") === "2405").head()
    assert(p1.getAs[Double]("x") === -20.0 && p1.getAs[Double]("y") === 5.0)
    // p2 first frame: home -20.0 < away 15.0 → home STILL LTR (a
    // non-alternating feed, e.g. already normalized upstream) → kloppy
    // flips exactly the RTL periods, i.e. none — a parity rule would
    // have silently rotated the half
    val p2 = loaded.filter(col("frame_id") === 40000 && col("id") === "2405").head()
    assert(p2.getAs[Double]("x") === -20.0 && p2.getAs[Double]("y") === 5.0)
    // canonical columns: team/position from the roster join
    assert(p2.getAs[String]("team_id") === "100")
    assert(p2.getAs[String]("position_name") === "LCB")
  }

  test("STATIC_HOME_AWAY rotates the RTL periods 180 degrees") {
    // same schema, sides genuinely switch at half time: home RTL in p2
    val frames =
      """[
        |{"frame":1,"period":1,"timestamp":"0:00:00.00","possession":{"trackable_object":null,"group":null},
        | "data":[{"track_id":1,"trackable_object":2405,"x":-20.0,"y":5.0},
        |         {"track_id":3,"trackable_object":6806,"x":10.0,"y":-3.0}]},
        |{"frame":50000,"period":2,"timestamp":"0:45:00.00","possession":{"trackable_object":null,"group":null},
        | "data":[{"track_id":1,"trackable_object":2405,"x":20.0,"y":-5.0},
        |         {"track_id":3,"trackable_object":6806,"x":-10.0,"y":3.0}]}
        |]""".stripMargin
    val p = "/tmp/graft_skillcorner_flip_sample.json"
    Files.write(Paths.get(p), frames.getBytes("UTF-8"))
    val flipped = SkillCornerSource.load(spark, p, matchData)
    val p1 = flipped.filter(col("frame_id") === 1 && col("id") === "2405").head()
    assert(p1.getAs[Double]("x") === -20.0 && p1.getAs[Double]("y") === 5.0)
    val p2 = flipped.filter(col("frame_id") === 50000 && col("id") === "2405").head()
    assert(p2.getAs[Double]("x") === -20.0 && p2.getAs[Double]("y") === 5.0)
  }

  test("ball carries z and the sentinel ids; players z = 0") {
    val b = loaded.filter(col("frame_id") === 2001 && col("team_id") === "ball").head()
    assert(b.getAs[String]("id") === "ball" && b.getAs[String]("position_name") === "ball")
    assert(b.getAs[Double]("z") === 0.11)
    assert(loaded.filter(col("team_id") =!= "ball").agg(max(abs(col("z"))))
      .head().getDouble(0) === 0.0)
  }
}
