package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Tracab DAT provider path. The reference repo ships no Tracab
  * fixture, so the format contract is pinned two ways: a synthetic
  * round-trip (canonical table → writeDat → load → same table) over
  * the sf0.001 synthetic tracking, and hand-written DAT lines covering
  * the format's edge semantics (referee/official drops, H/A/−
  * possession flags, Alive/Dead status, frames outside the period
  * ranges, ball-less frames). */
class TracabSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Offset = 10000000L

  test("synthetic round-trip: write → load reproduces the canonical table") {
    val input = SyntheticTracking.df(spark, "/root/testdata/sf0.001")
      .filter(col("game_id") === "0").cache()
    val out = "/tmp/graft_tracab_roundtrip"
    TracabSource.writeDat(input, out)
    // raw orientation: the round trip pins the FORMAT; the static flip
    // is pinned separately below and replayed in the q_tracab_load oracle
    val loaded = TracabSource.load(spark, s"$out/dat/*.txt", s"$out/meta.xml",
      orientation = "raw")
      // recover the original frame id and period-relative clock base
      .withColumn("orig_frame", col("frame_id") - (col("period_id") - 1) * Offset)

    assert(loaded.count() === input.count()) // row-preserving, ball-less frames included

    // per-period start frames for the expected rebased clock
    val starts = input.groupBy("period_id").agg(min("frame_id").as("f0"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val joined = input.alias("i").join(loaded.alias("l"),
      col("i.game_id") === col("l.game_id") &&
        col("i.period_id") === col("l.period_id") &&
        col("i.frame_id") === col("l.orig_frame") &&
        col("i.id") === col("l.id"))
    assert(joined.count() === input.count()) // every row matched by key

    val bad = joined.filter(
      col("i.team_id") =!= col("l.team_id") ||
        abs(col("i.x") - col("l.x")) > 1e-9 ||
        abs(col("i.y") - col("l.y")) > 1e-9 ||
        abs(col("i.z") - col("l.z")) > 1e-9)
    assert(bad.count() === 0L)

    // ball attrs fan out to every row of frames that HAVE a ball block;
    // ball-less frames cannot carry state through DAT and load back null
    val hasBall = input.filter(col("team_id") === "ball")
      .select(col("period_id").as("hb_p"), col("frame_id").as("hb_f")).distinct()
    val stateful = loaded.join(hasBall,
      col("period_id") === col("hb_p") && col("orig_frame") === col("hb_f"), "left")
    assert(stateful.filter(col("hb_f").isNotNull && col("ball_state") =!= "alive")
      .count() === 0L)
    assert(stateful.filter(col("hb_f").isNull && col("ball_state").isNotNull)
      .count() === 0L)

    // clock rebases to each period's first frame at 25 fps
    val p1 = starts(1)
    val ts = loaded.filter(col("period_id") === 1 && col("orig_frame") === p1)
      .select("timestamp").distinct().collect()
    assert(ts.map(_.getLong(0)).toSeq === Seq(0L))
    input.unpersist()
  }

  test("hand-written lines: referees/officials drop, flags map, out-of-range frames drop") {
    val dir = "/tmp/graft_tracab_edge"
    Files.createDirectories(Paths.get(s"$dir/dat"))
    // frame 100: 2 players + referee(-1) + official(4); ball owned Home, Alive
    // frame 101: away player only, ball Dead owned Away
    // frame 102: ball-less frame (empty ball block)
    // frame 999: outside both period ranges → drops entirely
    Files.write(Paths.get(s"$dir/dat/lines.txt"),
      ("100:1,7,7,105,-230,0;0,11,11,-1203,0,0;-1,90,90,0,0,0;4,91,91,1,1,0;:50,-25,11,0,H,Alive;:\n" +
        "101:0,11,11,-1200,5,0;:0,0,0,0,A,Dead;:\n" +
        "102:1,7,7,110,-225,0;::\n" +
        "999:1,7,7,0,0,0;:0,0,0,0,H,Alive;:\n").getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/meta.xml"),
      ("""<TracabMetaData sVersion="1.0">
         |  <match iId="m1" iFrameRateFps="25" fPitchXSizeMeters="105.00" fPitchYSizeMeters="68.00">
         |    <period iId="1" iStartFrame="100" iEndFrame="200"/>
         |  </match>
         |</TracabMetaData>
         |""".stripMargin).getBytes("UTF-8"))

    val out = TracabSource.load(spark, s"$dir/dat/*.txt", s"$dir/meta.xml",
      orientation = "raw").cache()
    assert(out.filter(col("frame_id") === 999).count() === 0L)
    val f100 = out.filter(col("frame_id") === 100).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(f100.keySet === Set("7", "11", "ball")) // -1 and 4 dropped
    assert(f100("7").getAs[String]("team_id") === "home")
    assert(f100("7").getAs[Double]("x") === 1.05 && f100("7").getAs[Double]("y") === -2.30)
    assert(f100("11").getAs[String]("team_id") === "away")
    assert(f100("ball").getAs[Double]("z") === 0.11)
    assert(f100("ball").getAs[String]("ball_owning_team_id") === "home")
    assert(f100("ball").getAs[String]("ball_state") === "alive")
    assert(f100("7").getAs[Long]("timestamp") === 0L)
    val f101 = out.filter(col("frame_id") === 101 && col("id") === "ball").head()
    assert(f101.getAs[String]("ball_state") === "dead")
    assert(f101.getAs[String]("ball_owning_team_id") === "away")
    assert(f101.getAs[Long]("timestamp") === 40000L)
    // line-level flags fan out to player rows (canonical contract)
    val p101 = out.filter(col("frame_id") === 101 && col("id") === "11").head()
    assert(p101.getAs[String]("ball_state") === "dead")
    assert(p101.getAs[String]("ball_owning_team_id") === "away")
    // kloppy-default only_alive drops the dead-ball frame entirely
    val alive = TracabSource.load(spark, s"$dir/dat/*.txt", s"$dir/meta.xml",
      orientation = "raw", onlyAlive = true)
    assert(alive.filter(col("frame_id") === 101).count() === 0L)
    assert(alive.filter(col("frame_id") === 100).count() === 3L)
    assert(out.filter(col("frame_id") === 102).count() === 1L) // player row survives, no ball row
    assert(out.filter(col("game_id") =!= "m1").count() === 0L)
    out.unpersist()
  }

  test("fps that doesn't divide 1e6 rounds the timestamp instead of flooring") {
    val dir = "/tmp/graft_tracab_fps24"
    Files.createDirectories(Paths.get(s"$dir/dat"))
    Files.write(Paths.get(s"$dir/dat/lines.txt"),
      ("100:1,7,7,105,-230,0;:50,-25,11,0,H,Alive;:\n" +
        "101:1,7,7,110,-225,0;:50,-25,11,0,H,Alive;:\n" +
        "103:1,7,7,115,-220,0;:50,-25,11,0,H,Alive;:\n").getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/meta.xml"),
      ("""<TracabMetaData sVersion="1.0">
         |  <match iId="m24" iFrameRateFps="24">
         |    <period iId="1" iStartFrame="100" iEndFrame="200"/>
         |  </match>
         |</TracabMetaData>
         |""".stripMargin).getBytes("UTF-8"))
    val out = TracabSource.load(spark, s"$dir/dat/*.txt", s"$dir/meta.xml",
      orientation = "raw")
    val ts = out.filter(col("id") === "7")
      .select("frame_id", "timestamp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1e6/24 = 41666.66…: kloppy's frame/fps timedelta rounds to 41667,
    // a floor would drift to 41666 / 124999
    assert(ts(100L) === 0L)
    assert(ts(101L) === 41667L)
    assert(ts(103L) === 125000L)
  }

  test("corrupt rows drop: unparseable coordinates, garbage frame ids, short ball blocks") {
    val dir = "/tmp/graft_tracab_corrupt"
    Files.createDirectories(Paths.get(s"$dir/dat"))
    // frame 100: one good target, one with garbage x, ball with garbage y
    // frame 101: good everything
    // "junk" line: unparseable frame id
    Files.write(Paths.get(s"$dir/dat/lines.txt"),
      ("100:1,7,7,105,-230,0;0,11,11,abc,0,0;:50,xyz,11,0,H,Alive;:\n" +
        "junk:nonsense:::\n" +
        "101:1,7,7,110,-225,0;:50,-25,11,0,H,Alive;:\n").getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/meta.xml"),
      ("""<TracabMetaData sVersion="1.0">
         |  <match iId="mc" iFrameRateFps="25">
         |    <period iId="1" iStartFrame="100" iEndFrame="200"/>
         |  </match>
         |</TracabMetaData>
         |""".stripMargin).getBytes("UTF-8"))
    val out = TracabSource.load(spark, s"$dir/dat/*.txt", s"$dir/meta.xml",
      orientation = "raw")
    val rows = out.collect().map(r => (r.getAs[Long]("frame_id"), r.getAs[String]("id")))
    // frame 100: corrupt target AND corrupt ball drop, good target stays
    assert(rows.toSet === Set((100L, "7"), (101L, "7"), (101L, "ball")))
    // nothing leaks null coordinates
    assert(out.filter(col("x").isNull || col("y").isNull).count() === 0L)
  }

  test("writeDat refuses frame ids that would overlap the period offset") {
    import spark.implicits._
    val bad = Seq(("g", 1, 20000000L, 0L, "7", "home", null: String,
      1.0, 2.0, 0.0, "alive", null: String))
      .toDF("game_id", "period_id", "frame_id", "timestamp", "id", "team_id",
        "position_name", "x", "y", "z", "ball_state", "ball_owning_team_id")
    val e = intercept[IllegalArgumentException] {
      TracabSource.writeDat(bad, "/tmp/graft_tracab_refuse")
    }
    assert(e.getMessage.contains("periodOffset"))
  }

  test("STATIC_HOME_AWAY default rotates the RTL periods, like the other readers") {
    val dir = "/tmp/graft_tracab_flip"
    Files.createDirectories(Paths.get(s"$dir/dat"))
    // p1: home (7) at x=-20, away (11) at x=+10 → home LTR, raw
    // p2: home at x=+20, away at x=-10 → home RTL → 180° rotation
    Files.write(Paths.get(s"$dir/dat/lines.txt"),
      ("100:1,7,7,-2000,500,0;0,11,11,1000,-300,0;:0,0,11,0,H,Alive;:\n" +
        "5000:1,7,7,2000,-500,0;0,11,11,-1000,300,0;:0,0,11,0,H,Alive;:\n").getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/meta.xml"),
      ("""<TracabMetaData sVersion="1.0">
         |  <match iId="m2" iFrameRateFps="25" fPitchXSizeMeters="105.00" fPitchYSizeMeters="68.00">
         |    <period iId="1" iStartFrame="100" iEndFrame="200"/>
         |    <period iId="2" iStartFrame="5000" iEndFrame="5100"/>
         |  </match>
         |</TracabMetaData>
         |""".stripMargin).getBytes("UTF-8"))
    val out = TracabSource.load(spark, s"$dir/dat/*.txt", s"$dir/meta.xml")
      .filter(col("id") === "7").collect()
      .map(r => r.getAs[Int]("period_id") -> (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    assert(out(1) === ((-20.0, 5.0))) // p1 untouched
    assert(out(2) === ((-20.0, 5.0))) // p2 rotated back to home-LTR
  }
}
