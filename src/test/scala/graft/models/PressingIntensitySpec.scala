package graft.models

import graft.SparkTestSession
import graft.tracking.{Cols, TrackingSettings}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PressingIntensitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import Cols._

  /** Scalar reimplementation of models/utils.py:17-99 for cross-checks. */
  private def ttiScalar(
      p1: (Double, Double, Double), v1: (Double, Double, Double),
      p2: (Double, Double, Double), v2: (Double, Double, Double),
      rt: Double = 0.7, vmax: Double = 12.0): Double = {
    val u = ((p1._1 + v1._1) - p1._1, (p1._2 + v1._2) - p1._2, (p1._3 + v1._3) - p1._3)
    val d2 = (p2._1 + v2._1, p2._2 + v2._2, p2._3 + v2._3)
    val v = (d2._1 - p1._1, d2._2 - p1._2, d2._3 - p1._3)
    val uMag = math.sqrt(u._1 * u._1 + u._2 * u._2 + u._3 * u._3)
    val vMag = math.sqrt(v._1 * v._1 + v._2 * v._2 + v._3 * v._3)
    val dot = u._1 * v._1 + u._2 * v._2 + u._3 * v._3
    val angle = math.acos(dot / (uMag * vMag + 1e-10))
    val r = (p1._1 + v1._1 * rt, p1._2 + v1._2 * rt, p1._3 + v1._3 * rt)
    val d = (d2._1 - r._1, d2._2 - r._2, d2._3 - r._3)
    uMag * angle / math.Pi + rt + math.sqrt(d._1 * d._1 + d._2 * d._2 + d._3 * d._3) / vmax
  }

  /** 2 owning + 2 defending players + ball, one frame. */
  private lazy val frame: DataFrame = {
    import spark.implicits._
    Seq(
      // id, team, x, y, z, vx, vy, vz, v, carrier
      ("a1", "home", 10.0, 5.0, 0.0, 2.0, 0.0, 0.0, 2.0, true),
      ("a2", "home", 20.0, -5.0, 0.0, 0.0, 1.0, 0.0, 1.0, false),
      ("d1", "away", 12.0, 6.0, 0.0, -1.0, 0.5, 0.0, 1.118, false),
      ("d2", "away", 25.0, 0.0, 0.0, 0.0, -2.0, 0.0, 2.0, false),
      ("ball", "ball", 10.5, 5.2, 0.1, 2.0, 0.1, 0.0, 2.003, false))
      .toDF(ObjectId, TeamId, X, Y, Z, Vx, Vy, Vz, Speed, IsBallCarrier)
      .withColumn(GameId, lit("g")).withColumn(PeriodId, lit(1))
      .withColumn(FrameId, lit(100L)).withColumn(Timestamp, lit(4000000L))
      .withColumn(BallOwningTeamId, lit("home"))
  }

  test("teams/max: shape 2x2, ball column folded into carrier") {
    val p = PressingIntensity.pairs(frame, TrackingSettings(), PressingIntensity.Params())
    val rows = p.collect()
    assert(rows.length == 4) // 2 defenders x (2 attackers + ball - ball)
    val byPair = rows.map(r => (r.getAs[String]("row_id"), r.getAs[String]("col_id")) -> r).toMap
    // non-carrier column = plain formula
    val t_d1_a2 = ttiScalar((20.0, -5.0, 0.0), (0.0, 1.0, 0.0), (12.0, 6.0, 0.0), (-1.0, 0.5, 0.0))
    assert(math.abs(byPair(("d1", "a2")).getAs[Double]("tti") - t_d1_a2) < 1e-12)
    // carrier column = min(carrier tti, ball tti)
    val t_d1_a1 = ttiScalar((10.0, 5.0, 0.0), (2.0, 0.0, 0.0), (12.0, 6.0, 0.0), (-1.0, 0.5, 0.0))
    val t_d1_ball = ttiScalar((10.5, 5.2, 0.1), (2.0, 0.1, 0.0), (12.0, 6.0, 0.0), (-1.0, 0.5, 0.0))
    assert(math.abs(byPair(("d1", "a1")).getAs[Double]("tti") - math.min(t_d1_a1, t_d1_ball)) < 1e-12)
    // pti in [0, 1]
    rows.foreach(r => { val p = r.getAs[Double]("pti"); assert(p >= 0 && p <= 1) })
  }

  test("teams/include keeps ball column; node order players-then-ball") {
    val p = PressingIntensity.pairs(frame, TrackingSettings(),
      PressingIntensity.Params(ballMethod = "include"))
    val m = PressingIntensity.matrices(p).collect().head
    assert(m.getAs[scala.collection.Seq[String]]("rows") == Seq("d1", "d2"))
    assert(m.getAs[scala.collection.Seq[String]]("columns") == Seq("a1", "a2", "ball"))
    val tti = m.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("time_to_intercept")
    assert(tti.length == 2 && tti.head.length == 3)
  }

  test("full/exclude: square matrix, tti diagonal zero, pti diagonal not") {
    val p = PressingIntensity.pairs(frame, TrackingSettings(),
      PressingIntensity.Params(method = "full", ballMethod = "exclude"))
    val m = PressingIntensity.matrices(p).collect().head
    val rows = m.getAs[scala.collection.Seq[String]]("rows")
    assert(rows == Seq("a1", "a2", "d1", "d2")) // owning first, by id
    assert(m.getAs[scala.collection.Seq[String]]("columns") == rows)
    val tti = m.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("time_to_intercept")
    val pti = m.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("probability_to_intercept")
    (0 until 4).foreach { i =>
      assert(tti(i)(i) == 0.0)
      assert(pti(i)(i) > 0.0) // reference computes pti before zeroing diag
    }
  }

  test("pressing orient transposes rows and columns") {
    val normal = PressingIntensity.matrices(
      PressingIntensity.pairs(frame, TrackingSettings(), PressingIntensity.Params())).collect().head
    val t = PressingIntensity.matrices(
      PressingIntensity.pairs(frame, TrackingSettings(),
        PressingIntensity.Params(orient = "pressing"))).collect().head
    assert(t.getAs[scala.collection.Seq[String]]("rows") == normal.getAs[scala.collection.Seq[String]]("columns"))
    assert(t.getAs[scala.collection.Seq[String]]("columns") == normal.getAs[scala.collection.Seq[String]]("rows"))
    val a = normal.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("time_to_intercept")
    val b = t.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("time_to_intercept")
    for (i <- a.indices; j <- a.head.indices) assert(a(i)(j) == b(j)(i))
  }

  test("speed threshold zeroes pti for slow rows/cols") {
    val p = PressingIntensity.pairs(frame, TrackingSettings(),
      PressingIntensity.Params(speedThreshold = Some(1.5)))
    // d1 speed 1.118 < 1.5 -> its row pti all zero; a2 speed 1.0 -> col zero
    val rows = p.collect()
    rows.filter(_.getAs[String]("row_id") == "d1")
      .foreach(r => assert(r.getAs[Double]("pti") == 0.0))
    rows.filter(_.getAs[String]("col_id") == "a2")
      .foreach(r => assert(r.getAs[Double]("pti") == 0.0))
    rows.filter(r => r.getAs[String]("row_id") == "d2" && r.getAs[String]("col_id") == "a1")
      .foreach(r => assert(r.getAs[Double]("pti") > 0.0))
  }

  test("closed-form golden: stationary pair tti = rt + dist/vmax") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // attacker (owning, col side) and defender both stationary: u = 0,
    // angle term vanishes (acos(0) * 0 = 0), so tti = 0.7 + d / 12
    val df = Seq(
      ("a1", "home", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, true),
      ("d1", "away", 6.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, false),
      ("ball", "ball", 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, false))
      .toDF(ObjectId, TeamId, X, Y, Z, Vx, Vy, Vz, Speed, IsBallCarrier)
      .withColumn(GameId, lit("g")).withColumn(PeriodId, lit(1))
      .withColumn(FrameId, lit(1L)).withColumn(Timestamp, lit(0L))
      .withColumn(BallOwningTeamId, lit("home"))
    val p = PressingIntensity.pairs(df, TrackingSettings(),
      PressingIntensity.Params(ballMethod = "exclude"))
      .filter(col("row_id") === "d1" && col("col_id") === "a1")
      .select("tti").head.getDouble(0)
    assert(math.abs(p - (0.7 + 6.0 / 12.0)) < 1e-12)
    // and the scalar reimplementation agrees
    assert(math.abs(ttiScalar((0, 0, 0), (0, 0, 0), (6, 0, 0), (0, 0, 0)) - 1.2) < 1e-12)
  }

  test("filterTimeRange keeps only the window of one period") {
    import org.apache.spark.sql.functions._
    val two = frame.union(frame
      .withColumn(PeriodId, lit(2)).withColumn(Timestamp, lit(9000000L)))
    val kept = PressingIntensity.filterTimeRange(two, 0L, 5000000L, 1)
    assert(kept.select(PeriodId).distinct().collect().map(_.getInt(0)).toSeq === Seq(1))
    assert(kept.count() === 5)
  }
}
