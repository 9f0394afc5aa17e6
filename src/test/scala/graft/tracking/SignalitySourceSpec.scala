package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Signality provider path. The reference repo ships no Signality
  * fixture (kloppy's support is alpha), so the format contract is
  * pinned two ways: a synthetic round-trip (canonical table →
  * writeFeeds → load → same table, modulo the per-period clock rebase
  * and the derived frame ids — Signality frames carry no frame
  * numbers) over the sf0.001 synthetic tracking, and hand-written
  * per-period array documents covering the edge semantics (corner →
  * center coordinate shift, epoch-ms rebase, roster fallback ids,
  * truncated position arrays, junk elements). */
class SignalitySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic round-trip: write → load reproduces ids, positions, clock and sides") {
    val input = SyntheticTracking.df(spark, "/root/testdata/sf0.001")
      .filter(col("game_id") === "2").cache()
    val out = "/tmp/graft_signality_roundtrip"
    SignalitySource.writeFeeds(input, out)
    val loaded = SignalitySource.load(spark,
      Seq(1 -> s"$out/p1.json", 2 -> s"$out/p2.json"), s"$out/meta.json",
      orientation = "raw").cache()

    assert(loaded.count() === input.count())

    // the writer emits an epoch-ms clock with a 45-min period offset;
    // the loader must rebase per period — compare on the same rebase
    // of the input
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

    // derived frame ids: epoch-clock-based, globally monotone across
    // periods (period 2's smallest frame id exceeds period 1's largest)
    val p1max = loaded.filter(col("period_id") === 1)
      .agg(max("frame_id")).head().getLong(0)
    val p2min = loaded.filter(col("period_id") === 2)
      .agg(min("frame_id")).head().getLong(0)
    assert(p2min > p1max)
    // one frame per sample instant per period
    assert(loaded.select("period_id", "frame_id").distinct().count() ===
      loaded.select("period_id", "timestamp").distinct().count())
    input.unpersist(); loaded.unpersist()
  }

  private def writeMeta(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/meta.json"),
      """{"id": "SIG1", "team_home_name": "HomeFC", "team_away_name": "AwayFC",
        | "team_home_players": [{"jersey_number": 1, "name": "hk"}],
        | "team_away_players": [{"jersey_number": 9, "name": "as"}],
        | "pitch_size": [100.0, 60.0]}
        |""".stripMargin.getBytes("UTF-8"))
  }

  test("hand-written feeds: corner→center shift, ms rebase, roster fallback, truncation drops") {
    val dir = "/tmp/graft_signality_edge"
    writeMeta(dir)
    // period 1: two frames 40 ms apart; jersey 1 in the roster, jersey
    // 2 not (fallback id); one truncated position (dropped row); ball
    // with z
    Files.write(Paths.get(s"$dir/p1.json"),
      """[
        |{"utc_time": 1700000000000,
        | "ball": {"position": [50.0, 30.0, 0.11]},
        | "home_team": [{"jersey_number": 1, "position": [10.0, 30.0]},
        |               {"jersey_number": 2, "position": [20.0]}],
        | "away_team": [{"jersey_number": 9, "position": [80.0, 40.0]}]},
        |{"utc_time": 1700000000040,
        | "ball": {"position": [51.0, 30.5, 0.12]},
        | "home_team": [{"jersey_number": 1, "position": [10.5, 30.2]}],
        | "away_team": []}
        |]""".stripMargin.getBytes("UTF-8"))
    // period 2 an hour later: clock must rebase to 0
    Files.write(Paths.get(s"$dir/p2.json"),
      """[
        |{"utc_time": 1700003600000,
        | "ball": {"position": [40.0, 25.0]},
        | "home_team": [{"jersey_number": 1, "position": [90.0, 30.0]}],
        | "away_team": [{"jersey_number": 9, "position": [20.0, 28.0]}]}
        |]""".stripMargin.getBytes("UTF-8"))

    val df = SignalitySource.load(spark,
      Seq(1 -> s"$dir/p1.json", 2 -> s"$dir/p2.json"), s"$dir/meta.json",
      orientation = "raw").cache()

    // jersey 2's truncated position dropped; jersey 1 resolves via the
    // roster to "hk"; an unlisted jersey would fall back to home_<n>
    assert(df.select("id").distinct().collect().map(_.getString(0)).sorted.toSeq
      === Seq("as", "ball", "hk"))

    // corner origin (100 × 60 pitch from meta) → center origin
    val hk1 = df.filter(col("id") === "hk" && col("timestamp") === 0L &&
      col("period_id") === 1).head()
    assert(math.abs(hk1.getAs[Double]("x") - (10.0 - 50.0)) < 1e-9)
    assert(math.abs(hk1.getAs[Double]("y") - (30.0 - 30.0)) < 1e-9)
    assert(hk1.getAs[String]("team_id") === "HomeFC")

    // ms clock: second frame is 40 ms = 40000 us after the first;
    // period 2 rebases to 0 despite the hour gap
    val p1ts = df.filter(col("period_id") === 1 && col("id") === "ball")
      .orderBy("timestamp").collect().map(_.getAs[Long]("timestamp")).toSeq
    assert(p1ts === Seq(0L, 40000L))
    assert(df.filter(col("period_id") === 2).agg(min("timestamp"))
      .head().getLong(0) === 0L)

    // ball z read from the 3-element position, default 0.0 otherwise
    val b1 = df.filter(col("id") === "ball" && col("period_id") === 1 &&
      col("timestamp") === 0L).head()
    assert(b1.getAs[Double]("z") === 0.11)
    val b2 = df.filter(col("id") === "ball" && col("period_id") === 2).head()
    assert(b2.getAs[Double]("z") === 0.0)

    // frame ids: 25 fps epoch derivation — consecutive 40 ms samples
    // are consecutive frames, and period 2 sits far above period 1
    val f = df.filter(col("period_id") === 1 && col("id") === "ball")
      .orderBy("timestamp").collect().map(_.getAs[Long]("frame_id"))
    assert(f(1) === f(0) + 1)
    // players carry no roles in the alpha feed
    assert(df.filter(!(col("id") === "ball") && col("position_name").isNotNull)
      .count() === 0L)
    assert(df.filter(col("ball_state").isNotNull).count() === 0L)
    df.unpersist()
  }

  test("static_home_away flips periods where home attacks right-to-left") {
    val dir = "/tmp/graft_signality_flip"
    writeMeta(dir)
    // period 1: home (hk) on the left already; period 2: home on the
    // right → rotate 180°
    Files.write(Paths.get(s"$dir/p1.json"),
      """[
        |{"utc_time": 1700000000000,
        | "ball": {"position": [55.0, 32.0]},
        | "home_team": [{"jersey_number": 1, "position": [20.0, 35.0]}],
        | "away_team": [{"jersey_number": 9, "position": [75.0, 33.0]}]}
        |]""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/p2.json"),
      """[
        |{"utc_time": 1700003600000,
        | "ball": {"position": [45.0, 28.0]},
        | "home_team": [{"jersey_number": 1, "position": [80.0, 25.0]}],
        | "away_team": [{"jersey_number": 9, "position": [25.0, 37.0]}]}
        |]""".stripMargin.getBytes("UTF-8"))
    val df = SignalitySource.load(spark,
      Seq(1 -> s"$dir/p1.json", 2 -> s"$dir/p2.json"), s"$dir/meta.json")
    def xy(p: Int, id: String): (Double, Double) = {
      val r = df.filter(col("period_id") === p && col("id") === id).head()
      (r.getAs[Double]("x"), r.getAs[Double]("y"))
    }
    // period 1 raw (center-origin): hk at (20-50, 35-30) = (-30, 5)
    assert(xy(1, "hk") === ((-30.0, 5.0)))
    // period 2 rotated: hk raw (80-50, 25-30) = (30, -5) → (-30, 5)
    assert(xy(2, "hk") === ((-30.0, 5.0)))
    assert(xy(2, "ball") === ((5.0, 2.0)))
  }
}
