package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** PFF (GradientSports) provider path. The reference repo ships no PFF
  * fixture, so the format contract is pinned two ways: a synthetic
  * round-trip (canonical table → writeTracking → load → same table)
  * over the sf0.001 synthetic tracking, and hand-written frame lines
  * covering the edge semantics (jersey→roster resolution with gap
  * fallback, multi-ball head, ballInPlay/possession mapping, corrupt
  * player objects, headerless lines). */
class PffSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic round-trip: write → load reproduces the canonical table") {
    val input = SyntheticTracking.df(spark, "/root/testdata/sf0.001")
      .filter(col("game_id") === "0").cache()
    val out = "/tmp/graft_pff_roundtrip"
    PffSource.writeTracking(input, out)
    // raw orientation: the round trip pins the FORMAT; the static flip
    // is replayed in the q_pff_load oracle
    val loaded = PffSource.load(spark, s"$out/frames/*.txt",
      s"$out/roster.json", s"$out/meta.json", orientation = "raw")

    assert(loaded.count() === input.count())
    val joined = input.alias("i").join(loaded.alias("l"),
      col("i.game_id") === col("l.game_id") &&
        col("i.period_id") === col("l.period_id") &&
        col("i.frame_id") === col("l.frame_id") &&
        col("i.id") === col("l.id"))
    assert(joined.count() === input.count())
    val bad = joined.filter(
      col("i.team_id") =!= col("l.team_id") ||
        col("i.position_name") =!= col("l.position_name") ||
        abs(col("i.x") - col("l.x")) > 1e-9 ||
        abs(col("i.y") - col("l.y")) > 1e-9 ||
        abs(col("i.z") - col("l.z")) > 1e-9 ||
        col("i.timestamp") =!= col("l.timestamp"))
    assert(bad.count() === 0L)
    input.unpersist()
  }

  private def writeFixtures(dir: String): Unit = {
    Files.createDirectories(Paths.get(s"$dir/frames"))
    Files.write(Paths.get(s"$dir/meta.json"),
      """{"id": "PFF1", "homeTeam": {"id": "t-h", "name": "Home"},
        | "awayTeam": {"id": "t-a", "name": "Away"},
        | "pitchLength": 105.0, "pitchWidth": 68.0, "fps": 25.0}
        |""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/roster.json"),
      """[{"player": {"id": "p1", "nickname": "One"}, "team": {"id": "t-h"}, "shirtNumber": 1, "positionGroupType": "GK"},
        | {"player": {"id": "p9", "nickname": "Nine"}, "team": {"id": "t-a"}, "shirtNumber": 9, "positionGroupType": "FW"}]
        |""".stripMargin.getBytes("UTF-8"))
  }

  test("hand-written frames: roster resolution, multi-ball head, flags, corrupt objects") {
    val dir = "/tmp/graft_pff_edge"
    writeFixtures(dir)
    // frame 100: p1 resolves via roster; jersey 99 has NO roster row →
    //   deterministic fallback id home_99; two candidate balls → head
    //   wins; in-play + home possession
    // frame 101: corrupt player object (missing y) drops the OBJECT
    //   only; dead ball, away possession
    // frame 102: ball-less frame → players load, ball attrs null
    // junk line: not a frame object → dropped entirely
    Files.write(Paths.get(s"$dir/frames/lines.txt"),
      ("""{"frameNum":100,"period":1,"periodGameClockTime":12.0,"homePlayers":[{"jerseyNum":1,"x":1.5,"y":-2.5},{"jerseyNum":99,"x":3.0,"y":4.0}],"awayPlayers":[{"jerseyNum":9,"x":-12.0,"y":0.5}],"balls":[{"x":0.5,"y":0.25,"z":0.11},{"x":99.0,"y":99.0,"z":9.0}],"ballInPlay":true,"possession":{"team":"home"}}""" + "\n" +
        """{"frameNum":101,"period":1,"periodGameClockTime":12.04,"homePlayers":[{"jerseyNum":1,"x":1.6}],"awayPlayers":[{"jerseyNum":9,"x":-12.0,"y":0.6}],"balls":[{"x":0.0,"y":0.0,"z":0.0}],"ballInPlay":false,"possession":{"team":"away"}}""" + "\n" +
        "this is not json\n" +
        """{"frameNum":102,"period":1,"periodGameClockTime":12.08,"homePlayers":[{"jerseyNum":1,"x":1.7,"y":-2.7}],"awayPlayers":[],"balls":[]}""" + "\n").getBytes("UTF-8"))

    val df = PffSource.load(spark, s"$dir/frames/*.txt", s"$dir/roster.json",
      s"$dir/meta.json", orientation = "raw").cache()

    // frame 100: p1 + fallback home_99 + p9 + ball
    val f100 = df.filter(col("frame_id") === 100L)
    assert(f100.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("ball", "home_99", "p1", "p9"))
    val p1 = f100.filter(col("id") === "p1").head()
    assert(p1.getAs[String]("team_id") === "t-h")
    assert(p1.getAs[String]("position_name") === "GK")
    assert(p1.getAs[Long]("timestamp") === 12000000L)
    assert(p1.getAs[String]("ball_state") === "alive")
    assert(p1.getAs[String]("ball_owning_team_id") === "t-h")
    val gap = f100.filter(col("id") === "home_99").head()
    assert(gap.getAs[String]("team_id") === "t-h")
    assert(gap.isNullAt(gap.fieldIndex("position_name")))
    val b = f100.filter(col("id") === "ball").head()
    assert(b.getAs[Double]("x") === 0.5 && b.getAs[Double]("z") === 0.11)

    // frame 101: corrupt home object dropped; p9 + ball survive
    val f101 = df.filter(col("frame_id") === 101L)
    assert(f101.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("ball", "p9"))
    assert(f101.select("ball_state").distinct().head().getString(0) === "dead")
    assert(f101.select("ball_owning_team_id").distinct().head().getString(0) === "t-a")

    // frame 102: ball-less; state/owning null
    val f102 = df.filter(col("frame_id") === 102L)
    assert(f102.count() === 1L)
    assert(f102.head().isNullAt(f102.head().fieldIndex("ball_state")))

    // junk line contributed nothing
    assert(df.select("frame_id").distinct().count() === 3L)

    // onlyInPlay keeps only the ballInPlay=true frame
    val inPlay = PffSource.load(spark, s"$dir/frames/*.txt", s"$dir/roster.json",
      s"$dir/meta.json", orientation = "raw", onlyInPlay = true)
    assert(inPlay.select("frame_id").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(100L))
    df.unpersist()
  }

  test("static_home_away flips periods where home attacks right-to-left") {
    val dir = "/tmp/graft_pff_flip"
    writeFixtures(dir)
    // period 1 home left (ltr, no flip); period 2 home right (rtl, flip)
    Files.write(Paths.get(s"$dir/frames/lines.txt"),
      ("""{"frameNum":100,"period":1,"periodGameClockTime":0.0,"homePlayers":[{"jerseyNum":1,"x":-30.0,"y":5.0}],"awayPlayers":[{"jerseyNum":9,"x":25.0,"y":3.0}],"balls":[{"x":0.5,"y":0.2,"z":0.0}]}""" + "\n" +
        """{"frameNum":200,"period":2,"periodGameClockTime":0.0,"homePlayers":[{"jerseyNum":1,"x":30.0,"y":-5.0}],"awayPlayers":[{"jerseyNum":9,"x":-25.0,"y":-3.0}],"balls":[{"x":-0.5,"y":-0.2,"z":0.0}]}""" + "\n").getBytes("UTF-8"))
    val df = PffSource.load(spark, s"$dir/frames/*.txt", s"$dir/roster.json",
      s"$dir/meta.json")
    def xy(p: Int, id: String): (Double, Double) = {
      val r = df.filter(col("period_id") === p && col("id") === id).head()
      (r.getAs[Double]("x"), r.getAs[Double]("y"))
    }
    assert(xy(1, "p1") === ((-30.0, 5.0)))  // period 1 raw
    assert(xy(2, "p1") === ((-30.0, 5.0)))  // period 2 rotated 180°
    assert(xy(2, "ball") === ((0.5, 0.2)))
  }
}
