package graft.streaming

import graft.SparkTestSession
import graft.models.PressingIntensity
import graft.tracking.TrackingSettings
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingPressingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import StreamingPressing._

  private val base = 1700000000L * 1000000L
  private val sec = 1000000L

  private def kin(frame: Long, id: String, team: String,
      x: Double, y: Double, vx: Double, vy: Double): KinRow = {
    val ts = base + frame * sec
    KinRow("g1", 1, frame, ts, ts, id, team, "home",
      x, y, 0.0, vx, vy, 0.0)
  }

  private val frame1 = Seq(
    kin(1, "h1", "home", 10.0, 5.0, 1.0, 0.0),
    kin(1, "h2", "home", 20.0, -5.0, 0.0, 2.0),
    kin(1, "a1", "away", 15.0, 0.0, -1.0, 1.0),
    kin(1, "a2", "away", 30.0, 10.0, 2.0, -1.0),
    kin(1, "ball", "ball", 11.0, 5.0, 3.0, 0.0))

  test("streaming pairs replay-match the batch pair table (teams/include)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KinRow]
    val q = pairs(source.toDS(), lateness = "5 seconds").toDF()
      .writeStream.format("memory").queryName("press_out")
      .outputMode("append").start()
    try {
      source.addData(frame1)
      q.processAllAvailable()
      source.addData(Seq(kin(100, "h1", "home", 0, 0, 0, 0))) // watermark driver
      q.processAllAvailable()
      source.addData(Seq(kin(101, "h1", "home", 0, 0, 0, 0)))
      q.processAllAvailable()
      val got = spark.table("press_out").as[PressPair].collect()
        .filter(_.frame_id == 1L)
        .map(p => (p.row_id, p.col_id) -> (p.tti, p.pti)).toMap

      val batchInput = frame1.map { r =>
        (r.game_id, r.period_id, r.frame_id, r.timestamp, r.id, r.team_id,
          r.ball_owning_team_id, false, r.x, r.y, r.z, r.vx, r.vy, r.vz,
          math.sqrt(r.vx * r.vx + r.vy * r.vy + r.vz * r.vz))
      }.toDF("game_id", "period_id", "frame_id", "timestamp", "id", "team_id",
        "ball_owning_team_id", "is_ball_carrier", "x", "y", "z", "vx", "vy", "vz", "v")
      val batch = PressingIntensity.pairs(batchInput, TrackingSettings(),
        PressingIntensity.Params(ballMethod = "include")).collect()
        .map(r => (r.getString(r.fieldIndex("row_id")), r.getString(r.fieldIndex("col_id"))) ->
          (r.getDouble(r.fieldIndex("tti")), r.getDouble(r.fieldIndex("pti")))).toMap

      assert(got.keySet === batch.keySet) // 2 defenders x (2 owning + ball)
      assert(got.keySet.size === 6)
      got.foreach { case (k, (t, p)) =>
        assert(math.abs(t - batch(k)._1) < 1e-12, s"tti mismatch at $k")
        assert(math.abs(p - batch(k)._2) < 1e-12, s"pti mismatch at $k")
      }
    } finally q.stop()
  }
}
