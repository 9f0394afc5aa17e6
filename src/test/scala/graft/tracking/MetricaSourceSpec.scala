package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Metrica open-data CSV provider path: synthetic round-trip (no
  * reference fixture ships) plus hand-written files pinning the format
  * semantics — 3-row header jersey discovery, [0,1] top-left
  * normalized coordinates → center-origin meters with the y flip,
  * continuous match clock rebased per period, off-pitch empty cells,
  * ball from the home file, and the static orientation flip. */
class MetricaSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic round-trip: write → load reproduces the canonical table") {
    val input = SyntheticTracking.df(spark, "/root/testdata/sf0.001")
      .filter(col("game_id") === "2").cache()
    val out = "/tmp/graft_metrica_roundtrip"
    MetricaSource.writeCsv(input, out)
    val loaded = MetricaSource.load(spark, s"$out/home/tracking.csv",
      s"$out/away/tracking.csv", gameId = "2", orientation = "raw")
      // loader ids are side_jersey; recover the original numeric id
      .withColumn("orig_id", regexp_replace(col("id"), "^(home|away)_", ""))

    assert(loaded.count() === input.count())
    val joined = input.alias("i").join(loaded.alias("l"),
      col("i.period_id") === col("l.period_id") &&
        col("i.frame_id") === col("l.frame_id") &&
        col("i.id") === col("l.orig_id"))
    assert(joined.count() === input.count())
    // normalize→denormalize round-trips within float tolerance; team
    // sides survive the side-file split
    val bad = joined.filter(
      col("i.team_id") =!= col("l.team_id") ||
        abs(col("i.x") - col("l.x")) > 1e-9 ||
        abs(col("i.y") - col("l.y")) > 1e-9)
    assert(bad.count() === 0L)
    // clock rebased per period
    val t0 = loaded.filter(col("period_id") === 1).agg(min("timestamp")).head().getLong(0)
    assert(t0 === 0L)
    input.unpersist()
  }

  test("hand-written files: header discovery, y flip, empty cells, per-period clock") {
    val dir = "/tmp/graft_metrica_edge"
    Files.createDirectories(Paths.get(s"$dir/home"))
    Files.createDirectories(Paths.get(s"$dir/away"))
    // home: players 11 and 7; p7 off pitch in frame 2 (empty cells).
    // Normalized coords: (0,0) = top-left → x=0.25 → -26.25 m,
    // y=0.25 → +17 m (flip).
    Files.write(Paths.get(s"$dir/home/tracking.csv"),
      (",,,HomeFC,,HomeFC,,,\n" +
        ",,,11,,7,,,\n" +
        "Period,Frame,Time [s],Player11,,Player7,,Ball,\n" +
        "1,1,0.04,0.25,0.25,0.5,0.5,0.5,0.5\n" +
        "1,2,0.08,0.26,0.25,,,0.52,0.5\n" +
        "2,100,2700.0,0.75,0.75,0.5,0.5,0.5,0.5\n").getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/away/tracking.csv"),
      (",,,AwayFC,,,\n" +
        ",,,21,,,\n" +
        "Period,Frame,Time [s],Player21,,Ball,\n" +
        "1,1,0.04,0.75,0.75,0.5,0.5\n" +
        "1,2,0.08,0.74,0.75,0.52,0.5\n" +
        "2,100,2700.0,0.25,0.25,0.5,0.5\n").getBytes("UTF-8"))

    assert(MetricaSource.headerJerseys(spark, s"$dir/home/tracking.csv") === Seq("11", "7"))

    val raw = MetricaSource.load(spark, s"$dir/home/tracking.csv",
      s"$dir/away/tracking.csv", gameId = "m", orientation = "raw").cache()
    val f1 = raw.filter(col("frame_id") === 1).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(f1.keySet === Set("home_11", "home_7", "away_21", "ball"))
    assert(f1("home_11").getAs[Double]("x") === -26.25) // (0.25-0.5)*105
    assert(f1("home_11").getAs[Double]("y") === 17.0)   // (0.5-0.25)*68 — y flips
    assert(f1("ball").getAs[Double]("x") === 0.0 && f1("ball").getAs[Double]("y") === 0.0)
    assert(f1("home_11").getAs[Long]("timestamp") === 0L) // rebased to period start
    // off-pitch empty cells drop the row, others survive
    val f2 = raw.filter(col("frame_id") === 2).select("id").collect().map(_.getString(0)).toSet
    assert(f2 === Set("home_11", "away_21", "ball"))
    // second period clock rebases again
    val p2 = raw.filter(col("period_id") === 2).agg(min("timestamp")).head().getLong(0)
    assert(p2 === 0L)
    raw.unpersist()

    // static default: p1 home LTR (x -26 < away +26) raw; p2 home at
    // +26 vs away -26 → RTL → rotated back
    val flipped = MetricaSource.load(spark, s"$dir/home/tracking.csv",
      s"$dir/away/tracking.csv", gameId = "m")
    val h2 = flipped.filter(col("period_id") === 2 && col("id") === "home_11").head()
    assert(h2.getAs[Double]("x") === -26.25 && h2.getAs[Double]("y") === 17.0)
  }
}
