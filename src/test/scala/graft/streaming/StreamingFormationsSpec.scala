package graft.streaming

import graft.SparkTestSession
import graft.models.formations.Efpi
import graft.queries.FormationQueries
import graft.tracking.{Cols, Orientation, Possession, SyntheticTracking}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming EFPI parity: replaying a game's frames through
  * [[StreamingFormations.frameFormations]] must reproduce the batch
  * `Efpi.fit(every="frame")` output exactly — including the
  * keep-or-update hysteresis, whose state carries across micro-batch
  * boundaries. */
class StreamingFormationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import StreamingFormations._

  private val cfg = Efpi.Config(
    every = "frame", formations = FormationQueries.SmallFormations,
    changeAfterPossession = false, changeThreshold = Some(0.1))

  private def runStream(batches: Seq[Seq[FrameRow]]): Seq[Efpi.OutRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[FrameRow]
    val q = frameFormations(source.toDS(), cfg)
      .writeStream.format("memory").queryName("efpi_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      // event-time timeouts fire in DATA-triggered batches: the first
      // driver batch advances the watermark past everything pending,
      // the second runs the batch in which the timed-out state emits
      // (same pattern as StreamingPressingSpec)
      val maxTs = batches.flatten.map(_.abs_ts).max
      (1 to 2).foreach { i =>
        val wmTs = maxTs + i * 3600L * 1000000L
        source.addData(Seq(FrameRow("_wm", 1, 0L, wmTs, wmTs,
          "x", "home", null, 0.0, 0.0, null)))
        q.processAllAvailable()
      }
      spark.table("efpi_out").as[Efpi.OutRow].collect().toSeq
        .filter(_.game_id != "_wm")
    } finally q.stop()
  }

  test("multi-batch replay converges to the batch hysteresis output") {
    import spark.implicits._
    val input = Orientation.toBallOwning(
      Possession.inferBallCarrier(SyntheticTracking.df(spark, "/root/testdata/sf0.001")),
      "home").filter(col(Cols.GameId) === "0").cache()

    val batchOut = Efpi.fit(spark, input, cfg).as[Efpi.OutRow].collect()
      .map(r => (r.period_id, r.segment_id, r.id) ->
        (r.team_id, Option(r.position), Option(r.formation), r.is_attacking)).toMap

    val rows = input.select(
        col(Cols.GameId), col(Cols.PeriodId), col(Cols.FrameId), col(Cols.Timestamp),
        col(Cols.Timestamp).as("abs_ts"),
        col(Cols.ObjectId).as("id"), col(Cols.TeamId), col(Cols.PositionName),
        col(Cols.X), col(Cols.Y), col(Cols.BallOwningTeamId))
      .as[FrameRow].collect().sortBy(_.frame_id)
      // shift the event-time axis off epoch 0: the global-watermark late
      // filter sits exactly at t=0 before the first batch establishes a
      // watermark; the canonical timestamp stays period-relative
      .map(r => r.copy(abs_ts = r.abs_ts + 3600L * 1000000L))
    // three micro-batches; runStream's trailing driver batches flush
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val streamed = runStream(Seq(b1.toSeq, b2.toSeq, b3.toSeq))
      .map(r => (r.period_id, r.segment_id, r.id) ->
        (r.team_id, Option(r.position), Option(r.formation), r.is_attacking)).toMap

    assert(streamed.size === batchOut.size)
    assert(streamed === batchOut)
    input.unpersist()
  }

  test("hysteresis state survives micro-batch boundaries (kept formation from batch 1)") {
    // two frames far enough apart to land in different micro-batches;
    // identical rosters, tiny movement → the threshold keeps frame 1's
    // formation+labels at frame 2
    val t0 = 3600L * 1000000L
    def frame(f: Long, ts: Long, dx: Double = 0.0): Seq[FrameRow] = Seq(
      FrameRow("g", 1, f, ts, ts, "h1", "home", null, -10.0 + dx, 0.0, "home"),
      FrameRow("g", 1, f, ts, ts, "h2", "home", null, -5.0 + dx, 3.0, "home"),
      FrameRow("g", 1, f, ts, ts, "a1", "away", null, 8.0 + dx, -2.0, "home"),
      FrameRow("g", 1, f, ts, ts, "ball", "ball", null, 0.0, 0.0, "home"))
    // a watermark-driver batch between the frames forces frame 1 to
    // emit (and its fold state to persist to the store) BEFORE frame
    // 2's rows are even processed — the carried state is then read
    // back in a later invocation. The driver lands the watermark at
    // t0+10ms: past frame 1 (t0), before frame 2 (t0+40ms).
    val driver = FrameRow("_wm", 1, 0L, t0 + 10010L * 1000L, t0 + 10010L * 1000L,
      "x", "home", null, 0.0, 0.0, null)
    val out = runStream(Seq(
      frame(1, t0), Seq(driver), frame(2, t0 + 40000L, dx = 0.01)))
      .filter(_.id != "ball")
    val byFrame = out.groupBy(_.segment_id)
    assert(byFrame.keySet === Set(1L, 2L))
    // same formation and labels on both frames: the fold KEPT state
    // from the first micro-batch
    val f1 = byFrame(1L).map(r => r.id -> (r.position, r.formation)).toMap
    val f2 = byFrame(2L).map(r => r.id -> (r.position, r.formation)).toMap
    assert(f1 === f2)
  }
}
