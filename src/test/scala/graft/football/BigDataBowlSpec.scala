package graft.football

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BigDataBowlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("height/weight metric conversion with privacy rounding") {
    val df = Seq(
      (10L, "6-2", 220.0), // 6ft2 = 187.96cm -> round(18.796)=19 -> 190
      (11L, "5-11", 190.0), // 180.0cm -> 180; 86.18kg -> 90
      (12L, null.asInstanceOf[String], 200.0))
      .toDF("nflId", "height", "weight")
    val m = BigDataBowl.withMetricHeightWeight(df)
      .select("nflId", "height_cm", "weight_kg").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(m(10L) === (Some(190.0), Some(100.0))) // 220lb=99.79kg -> 100
    assert(m(11L) === (Some(180.0), Some(90.0)))
    assert(m(12L)._1 === None) // null height stays null
  }

  test("load: left plays rotated so both directions attack the same way") {
    val root = AfSynthetic.dir(spark, "/root/testdata/sf0.001")
    val df = BigDataBowl.load(spark, root)
    // coordinates centered on the pitch
    val stats = df.agg(min("x"), max("x"), min("y"), max("y")).head
    assert(stats.getDouble(0) >= -60.0 && stats.getDouble(1) <= 60.0)
    assert(stats.getDouble(2) >= -26.65 && stats.getDouble(3) <= 26.65)
    // o/dir wrapped to (-pi, pi]
    val od = df.filter($"o".isNotNull).agg(min("o"), max("o")).head
    assert(od.getDouble(0) >= -math.Pi && od.getDouble(1) <= math.Pi)
    // football sentinel id
    assert(df.filter($"team_id" === "football" && $"id" =!= -9999.9).count() === 0)
    // frame synthesis unique per (game, play, frame)
    val dup = df.groupBy("game_id", "frame_id", "id").count().filter($"count" > 1).count()
    assert(dup === 0L)
  }

  test("frame filter keeps only >=10-object frames with a football") {
    val root = AfSynthetic.dir(spark, "/root/testdata/sf0.001")
    val kept = BigDataBowl.removeIncompleteFrames(BigDataBowl.load(spark, root))
    val bad = kept.groupBy("game_id", "play_id", "frame_id")
      .agg(count(lit(1)).as("n"),
        sum(($"team_id" === "football").cast("int")).as("fb"))
      .filter($"n" < 10 || $"fb" === 0).count()
    assert(bad === 0L)
  }

  test("node features: QB flag, ball flag, end-zone distance bounds") {
    val root = AfSynthetic.dir(spark, "/root/testdata/sf0.001")
    val dat = BigDataBowl.removeIncompleteFrames(BigDataBowl.load(spark, root))
    val nf = AfFeatures.withNodeFeatures(dat)
    val qb = nf.filter($"position_name" === "QB").select("qb").distinct()
      .as[Double].collect().toSet
    assert(qb === Set(1.0))
    assert(nf.filter($"team_id" === "football").select("ball").distinct()
      .as[Double].collect().toSet === Set(1.0))
    val dend = nf.agg(min("dend"), max("dend")).head
    assert(dend.getDouble(0) >= -0.25 && dend.getDouble(1) <= 1.0)
  }
}
