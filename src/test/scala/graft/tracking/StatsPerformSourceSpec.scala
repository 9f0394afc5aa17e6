package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** StatsPerform MA25/MA1 provider path. The reference repo ships no
  * StatsPerform fixture, so the format contract is pinned two ways: a
  * synthetic round-trip (canonical table → writeMa25 → load → same
  * table) over the sf0.001 synthetic tracking, and hand-written MA25
  * lines covering the edge semantics (official/referee drops, H/A/−
  * possession, 1/0 status, running-clock rebase, corrupt chunks,
  * headerless lines). */
class StatsPerformSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic round-trip: write → load reproduces the canonical table") {
    val input = SyntheticTracking.df(spark, "/root/testdata/sf0.001")
      .filter(col("game_id") === "0").cache()
    val out = "/tmp/graft_statsperform_roundtrip"
    StatsPerformSource.writeMa25(input, out)
    // raw orientation: the round trip pins the FORMAT; the static flip
    // is replayed in the q_statsperform_load oracle
    val loaded = StatsPerformSource.load(spark, s"$out/ma25/*.txt",
      s"$out/ma1.json", orientation = "raw")

    assert(loaded.count() === input.count())

    // the writer emits a continuously-running clock (+45 min per
    // period); the loader must rebase to micros since period start
    val starts = input.groupBy("period_id").agg(min("timestamp").as("t0"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val joined = input.alias("i").join(loaded.alias("l"),
      col("i.game_id") === col("l.game_id") &&
        col("i.period_id") === col("l.period_id") &&
        col("i.frame_id") === col("l.frame_id") &&
        col("i.id") === col("l.id"))
    assert(joined.count() === input.count())

    val rebased = col("i.timestamp") -
      when(col("i.period_id") === 1, starts(1)).otherwise(starts(2))
    val bad = joined.filter(
      col("i.team_id") =!= col("l.team_id") ||
        abs(col("i.x") - col("l.x")) > 1e-9 ||
        abs(col("i.y") - col("l.y")) > 1e-9 ||
        abs(col("i.z") - col("l.z")) > 1e-9 ||
        col("l.timestamp") =!= rebased)
    assert(bad.count() === 0L)

    // ball state fans out: synthetic is all-alive with a ball row per
    // frame, so every loaded row must carry it
    assert(loaded.filter(col("ball_state") =!= "alive").count() === 0L)
    input.unpersist()
  }

  test("MA1 lineup parses contestants and positions") {
    val dir = "/tmp/graft_statsperform_ma1"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/ma1.json"),
      """{"matchInfo":{"id":"SP1","contestant":[
        |{"id":"t-h","name":"Home FC","position":"home"},
        |{"id":"t-a","name":"Away FC","position":"away"}]},
        |"liveData":{"lineUp":[
        |{"contestantId":"t-h","player":[
        |  {"playerId":"p1","matchName":"P. One","shirtNumber":1,"position":"Goalkeeper"},
        |  {"playerId":"p2","matchName":"P. Two","shirtNumber":4,"position":"Defender"}]},
        |{"contestantId":"t-a","player":[
        |  {"playerId":"p9","matchName":"P. Nine","shirtNumber":9,"position":"Striker"}]}
        |]}}""".stripMargin.getBytes("UTF-8"))
    val m = StatsPerformSource.matches(spark, s"$dir/ma1.json").head()
    assert(m.getString(0) === "SP1")
    assert(m.getString(1) === "t-h" && m.getString(2) === "t-a")
    val ros = StatsPerformSource.roster(spark, s"$dir/ma1.json")
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[String]("team_id"), r.getAs[Boolean]("is_home"),
          r.getAs[String]("position_name"), r.getAs[Int]("shirt_number"))).toMap
    assert(ros("p1") === (("t-h", true, "Goalkeeper", 1)))
    assert(ros("p2") === (("t-h", true, "Defender", 4)))
    assert(ros("p9") === (("t-a", false, "Striker", 9)))
  }

  test("hand-written lines: officials drop, flags map, clock rebases, corrupt chunks drop") {
    val dir = "/tmp/graft_statsperform_edge"
    Files.createDirectories(Paths.get(s"$dir/ma25"))
    Files.write(Paths.get(s"$dir/ma1.json"),
      """{"matchInfo":{"id":"SP1","contestant":[
        |{"id":"t-h","name":"Home","position":"home"},
        |{"id":"t-a","name":"Away","position":"away"}]},
        |"liveData":{"lineUp":[
        |{"contestantId":"t-h","player":[{"playerId":"p1","matchName":"One","shirtNumber":1,"position":"Goalkeeper"}]},
        |{"contestantId":"t-a","player":[{"playerId":"p9","matchName":"Nine","shirtNumber":9,"position":"Striker"}]}
        |]}}""".stripMargin.getBytes("UTF-8"))
    // frame 100 @ clock 600000: p1 (home), p9 (away), referee (side 3)
    //   dropped, ball owned H alive
    // frame 101 @ clock 600040: corrupt player chunk (non-numeric x)
    //   drops the CHUNK only; ball Dead owned A
    // frame 102: ball-less line → players load, ball attrs null
    // junk line: no numeric header → dropped entirely
    // period 2 frame 200 @ clock 3300000: rebase restarts at 0
    Files.write(Paths.get(s"$dir/ma25/lines.txt"),
      ("1700000600000;100;1,600000,1,H:0,p1,1,105,-230;1,p9,9,-1203,0;3,ref,0,0,0;:50,-25,11\n" +
        "1700000600040;101;1,600040,0,A:0,p1,1,oops,-230;1,p9,9,-1200,5;:0,0,0\n" +
        "1700000600080;102;1,600080,-,-:0,p1,1,110,-225;:\n" +
        "garbage line with no header\n" +
        "1700003300000;200;2,3300000,1,A:0,p1,1,-105,230;:10,20,0\n").getBytes("UTF-8"))

    val df = StatsPerformSource.load(spark, s"$dir/ma25/*.txt", s"$dir/ma1.json",
      orientation = "raw").cache()

    // frame 100: two players + ball; referee dropped
    val f100 = df.filter(col("frame_id") === 100L)
    assert(f100.count() === 3L)
    val p1 = f100.filter(col("id") === "p1").head()
    assert(p1.getAs[String]("team_id") === "t-h")
    assert(p1.getAs[String]("position_name") === "Goalkeeper")
    assert(p1.getAs[Double]("x") === 1.05 && p1.getAs[Double]("y") === -2.3)
    assert(p1.getAs[String]("ball_state") === "alive")
    assert(p1.getAs[String]("ball_owning_team_id") === "t-h")
    val b100 = f100.filter(col("id") === "ball").head()
    assert(b100.getAs[Double]("z") === 0.11)
    assert(b100.getAs[String]("position_name") === "ball")

    // frame 101: corrupt p1 chunk dropped, p9 + ball survive; Dead/A
    val f101 = df.filter(col("frame_id") === 101L)
    assert(f101.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("ball", "p9"))
    assert(f101.select("ball_state").distinct().head().getString(0) === "dead")
    assert(f101.select("ball_owning_team_id").distinct().head().getString(0) === "t-a")

    // frame 102: ball-less; state/owning null
    val f102 = df.filter(col("frame_id") === 102L)
    assert(f102.count() === 1L)
    assert(f102.head().isNullAt(f102.head().fieldIndex("ball_state")))

    // garbage line contributed nothing
    assert(df.select("frame_id").distinct().count() === 4L)

    // clock rebase: period 1 rebases to its 600000 base, period 2 to its own
    val ts = df.select("period_id", "frame_id", "timestamp").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ts((1, 100L)) === 0L && ts((1, 101L)) === 40000L && ts((1, 102L)) === 80000L)
    assert(ts((2, 200L)) === 0L)

    // onlyAlive filters the dead frame
    val alive = StatsPerformSource.load(spark, s"$dir/ma25/*.txt", s"$dir/ma1.json",
      orientation = "raw", onlyAlive = true)
    assert(!alive.select("frame_id").distinct().collect().map(_.getLong(0)).contains(101L))
    df.unpersist()
  }

  test("static_home_away flips periods where home attacks right-to-left") {
    val dir = "/tmp/graft_statsperform_flip"
    Files.createDirectories(Paths.get(s"$dir/ma25"))
    Files.write(Paths.get(s"$dir/ma1.json"),
      """{"matchInfo":{"id":"SP1","contestant":[
        |{"id":"t-h","name":"Home","position":"home"},
        |{"id":"t-a","name":"Away","position":"away"}]},
        |"liveData":{"lineUp":[
        |{"contestantId":"t-h","player":[{"playerId":"p1","matchName":"One","shirtNumber":1}]},
        |{"contestantId":"t-a","player":[{"playerId":"p9","matchName":"Nine","shirtNumber":9}]}
        |]}}""".stripMargin.getBytes("UTF-8"))
    // period 1 home left (ltr, no flip); period 2 home right (rtl, flip)
    Files.write(Paths.get(s"$dir/ma25/lines.txt"),
      ("1;100;1,0,1,H:0,p1,1,-3000,500;1,p9,9,2500,300;:50,20,0\n" +
        "2;200;2,2700000,1,H:0,p1,1,3000,-500;1,p9,9,-2500,-300;:-50,-20,0\n").getBytes("UTF-8"))
    val df = StatsPerformSource.load(spark, s"$dir/ma25/*.txt", s"$dir/ma1.json")
    def xy(p: Int, id: String): (Double, Double) = {
      val r = df.filter(col("period_id") === p && col("id") === id).head()
      (r.getAs[Double]("x"), r.getAs[Double]("y"))
    }
    assert(xy(1, "p1") === ((-30.0, 5.0)))  // period 1 raw
    assert(xy(2, "p1") === ((-30.0, 5.0)))  // period 2 rotated 180°
    assert(xy(2, "ball") === ((0.5, 0.2)))
  }
}
