package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** HawkEye provider path. The reference repo ships no HawkEye fixture,
  * so the format contract is pinned two ways: a synthetic round-trip
  * (canonical table → writeFeeds → load → same table, modulo the
  * per-period clock rebase and the derived frame ids — HawkEye samples
  * carry no frame numbers) over the sf0.001 synthetic tracking, and
  * hand-written per-minute documents covering the edge semantics
  * (match-global minutes, ball/centroid frame alignment, truncated
  * pos arrays, junk documents). */
class HawkEyeSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic round-trip: write → load reproduces positions, clock and sides") {
    val input = SyntheticTracking.df(spark, "/root/testdata/sf0.001")
      .filter(col("game_id") === "2").cache()
    val out = "/tmp/graft_hawkeye_roundtrip"
    HawkEyeSource.writeFeeds(input, out)
    val loaded = HawkEyeSource.load(spark, s"$out/ball/*.json",
      s"$out/people/*.json", s"$out/meta.json", fps = 25,
      orientation = "raw").cache()

    assert(loaded.count() === input.count())

    // the writer emits a MATCH-GLOBAL clock (minute 46+ in period 2);
    // the loader must rebase to micros since period start — compare on
    // the same rebase of the input
    val starts = input.groupBy("period_id").agg(min("timestamp").as("t0"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rebased = col("i.timestamp") -
      when(col("i.period_id") === 1, starts(1)).otherwise(starts(2))

    val joined = input.alias("i").join(loaded.alias("l"),
      col("i.game_id") === col("l.game_id") &&
        col("i.period_id") === col("l.period_id") &&
        col("l.timestamp") === rebased &&
        col("i.id") === col("l.id"))
    assert(joined.count() === input.count())
    val bad = joined.filter(
      col("i.team_id") =!= col("l.team_id") ||
        abs(col("i.x") - col("l.x")) > 1e-9 ||
        abs(col("i.y") - col("l.y")) > 1e-9 ||
        abs(col("i.z") - col("l.z")) > 1e-9)
    assert(bad.count() === 0L)

    // derived frame ids: one per sample instant, shared by the ball
    // and every player of that instant (the capture-rate alignment)
    assert(loaded.select("period_id", "frame_id").distinct().count() ===
      loaded.select("period_id", "timestamp").distinct().count())
    // ball and player samples of one instant land on ONE frame (the
    // synthetic table has ≤1 ball row per frame; not every frame has
    // all seven objects, so only the ball-collision bound is invariant)
    val perFrame = loaded.groupBy("period_id", "frame_id")
      .agg(sum(when(col("id") === "ball", 1).otherwise(0)).as("balls"))
    assert(perFrame.filter(col("balls") > 1).count() === 0L)
    input.unpersist(); loaded.unpersist()
  }

  private def writeMeta(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/meta.json"),
      """{"gameId": "HE1", "homeTeamId": "t-h", "awayTeamId": "t-a",
        | "pitchLength": 105.0, "pitchWidth": 68.0}
        |""".stripMargin.getBytes("UTF-8"))
  }

  test("hand-written documents: global minutes rebase, pos truncation drops, junk ignored") {
    val dir = "/tmp/graft_hawkeye_edge"
    writeMeta(dir)
    Files.createDirectories(Paths.get(s"$dir/ball"))
    Files.createDirectories(Paths.get(s"$dir/people"))
    // period 1, minute 3: two ball samples 20ms apart (50 fps)
    Files.write(Paths.get(s"$dir/ball/p1_m3.json"),
      """{"details":{"period":1,"minute":3},
        |"samples":{"ball":[{"time":10.00,"pos":[0.5,0.25,0.11]},
        |                   {"time":10.02,"pos":[0.6,0.30,0.12]}]}}""".stripMargin.getBytes("UTF-8"))
    // period 2, minute 48 (MATCH-GLOBAL): clock must rebase to period start
    Files.write(Paths.get(s"$dir/ball/p2_m48.json"),
      """{"details":{"period":2,"minute":48},
        |"samples":{"ball":[{"time":0.00,"pos":[-0.5,-0.2,0.0]}]}}""".stripMargin.getBytes("UTF-8"))
    // centroids aligned with the first ball sample; one truncated pos
    // (dropped object, not a failed scan) and one role-less person
    Files.write(Paths.get(s"$dir/people/p1_m3.json"),
      """{"details":{"period":1,"minute":3},
        |"samples":{"people":[
        |  {"personId":"p1","role":{"name":"Goalkeeper"},"teamId":"t-h",
        |   "centroid":[{"time":10.00,"pos":[-30.0,5.0]}]},
        |  {"personId":"p2","role":{"name":"Outfielder"},"teamId":"t-h",
        |   "centroid":[{"time":10.00,"pos":[-10.0]}]},
        |  {"personId":"p9","teamId":"t-a",
        |   "centroid":[{"time":10.00,"pos":[25.0,3.0]},{"time":10.02,"pos":[25.5,3.1]}]}
        |]}}""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/people/p2_m48.json"),
      """{"details":{"period":2,"minute":48},
        |"samples":{"people":[
        |  {"personId":"p1","role":{"name":"Goalkeeper"},"teamId":"t-h",
        |   "centroid":[{"time":0.00,"pos":[30.0,-5.0]}]}
        |]}}""".stripMargin.getBytes("UTF-8"))
    // junk document: parseable JSON, wrong shape → contributes nothing
    Files.write(Paths.get(s"$dir/people/junk.json"),
      """{"unexpected": true}""".getBytes("UTF-8"))

    val df = HawkEyeSource.load(spark, s"$dir/ball/*.json",
      s"$dir/people/*.json", s"$dir/meta.json", orientation = "raw").cache()

    // p2's truncated pos dropped; everything else loads
    assert(df.select("id").distinct().collect().map(_.getString(0)).sorted.toSeq
      === Seq("ball", "p1", "p9"))

    // clock rebase: period 1 base is its own min raw clock
    // ((3-1)*60+10 = 130 s); period 2's global minute 48 rebases to 0
    val p1b = df.filter(col("period_id") === 1 && col("id") === "ball")
      .orderBy("timestamp").collect()
    assert(p1b.map(_.getAs[Long]("timestamp")).toSeq === Seq(0L, 20000L))
    val p2b = df.filter(col("period_id") === 2 && col("id") === "ball").head()
    assert(p2b.getAs[Long]("timestamp") === 0L)

    // frame alignment at 50 fps: ball at 130.00s and p1/p9 at 130.00s
    // share a frame; the 130.02s samples share the next (+1)
    val f0 = df.filter(col("period_id") === 1 && col("timestamp") === 0L)
      .select("frame_id").distinct().collect()
    assert(f0.length === 1)
    val f1 = df.filter(col("period_id") === 1 && col("timestamp") === 20000L)
      .select("frame_id").distinct().collect()
    assert(f1.length === 1 && f1.head.getLong(0) === f0.head.getLong(0) + 1)

    // sides and roles
    val p1r = df.filter(col("id") === "p1" && col("period_id") === 1).head()
    assert(p1r.getAs[String]("team_id") === "t-h")
    assert(p1r.getAs[String]("position_name") === "Goalkeeper")
    val p9r = df.filter(col("id") === "p9" && col("timestamp") === 0L).head()
    assert(p9r.getAs[String]("team_id") === "t-a")
    assert(p9r.isNullAt(p9r.fieldIndex("position_name")))
    // no status/possession stream in the sample shape
    assert(df.filter(col("ball_state").isNotNull).count() === 0L)
    df.unpersist()
  }

  test("static_home_away flips periods where home attacks right-to-left") {
    val dir = "/tmp/graft_hawkeye_flip"
    writeMeta(dir)
    Files.createDirectories(Paths.get(s"$dir/ball"))
    Files.createDirectories(Paths.get(s"$dir/people"))
    Files.write(Paths.get(s"$dir/ball/p1_m1.json"),
      """{"details":{"period":1,"minute":1},
        |"samples":{"ball":[{"time":0.0,"pos":[0.5,0.2,0.0]}]}}""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/ball/p2_m46.json"),
      """{"details":{"period":2,"minute":46},
        |"samples":{"ball":[{"time":0.0,"pos":[-0.5,-0.2,0.0]}]}}""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/people/p1_m1.json"),
      """{"details":{"period":1,"minute":1},
        |"samples":{"people":[
        |  {"personId":"p1","teamId":"t-h","centroid":[{"time":0.0,"pos":[-30.0,5.0]}]},
        |  {"personId":"p9","teamId":"t-a","centroid":[{"time":0.0,"pos":[25.0,3.0]}]}
        |]}}""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/people/p2_m46.json"),
      """{"details":{"period":2,"minute":46},
        |"samples":{"people":[
        |  {"personId":"p1","teamId":"t-h","centroid":[{"time":0.0,"pos":[30.0,-5.0]}]},
        |  {"personId":"p9","teamId":"t-a","centroid":[{"time":0.0,"pos":[-25.0,-3.0]}]}
        |]}}""".stripMargin.getBytes("UTF-8"))
    val df = HawkEyeSource.load(spark, s"$dir/ball/*.json",
      s"$dir/people/*.json", s"$dir/meta.json")
    def xy(p: Int, id: String): (Double, Double) = {
      val r = df.filter(col("period_id") === p && col("id") === id).head()
      (r.getAs[Double]("x"), r.getAs[Double]("y"))
    }
    assert(xy(1, "p1") === ((-30.0, 5.0)))  // period 1 raw
    assert(xy(2, "p1") === ((-30.0, 5.0)))  // period 2 rotated 180°
    assert(xy(2, "ball") === ((0.5, 0.2)))
  }
}
