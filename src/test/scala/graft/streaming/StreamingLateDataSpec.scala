package graft.streaming

import graft.SparkTestSession
import graft.models.formations.Efpi
import graft.queries.FormationQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins the late-data contract for every streaming op: a row whose
  * `abs_ts` is already below the committed watermark is DROPPED by
  * Spark's pre-operator late-row filter — it never reaches the
  * stateful fold, never re-opens an emitted frame, and never appends a
  * partial duplicate to the sink. Append-mode output is immutable once
  * emitted; callers who need late rows must widen `lateness`.
  *
  * (The two-period half-time scenario — where period-relative clocks
  * would make GOOD data look late — lives in
  * [[StreamingTwoPeriodParitySpec]]; this spec is about rows that are
  * genuinely late on the absolute axis.)
  */
class StreamingLateDataSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // off epoch 0: the initial watermark sits exactly at t=0 and would
  // late-filter epoch-adjacent synthetic rows
  private val base = 1700000000L * 1000000L
  private val sec = 1000000L
  private val hour = 3600L * sec

  test("streaming graphs: a frame below the watermark is dropped, emitted frames never mutate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingGraphs._
    def row(frame: Long, id: String, team: String, x: Double): FrameRow = {
      val ts = base + frame * sec
      FrameRow("g1", 1, frame, ts, ts, id, team, "home", x, 0.0, 0.0)
    }
    val source = MemoryStream[FrameRow]
    val q = graphStream(source.toDS(), lateness = "5 seconds")
      .writeStream.format("memory").queryName("late_graphs")
      .outputMode("append").start()
    try {
      source.addData(Seq(row(1, "p1", "away", 1.0), row(1, "ball", "ball", 3.0)))
      q.processAllAvailable()
      // watermark far past frame 1 → it times out and emits (n=2)
      (1 to 2).foreach { i =>
        source.addData(Seq(FrameRow("_wm", 9, 0L, 0L, base + i * hour,
          "x", "home", null, 0.0, 0.0, 0.0)))
        q.processAllAvailable()
      }
      val emitted = spark.table("late_graphs").filter($"game_id" === "g1").collect()
      assert(emitted.map(_.getAs[Long]("frame_id")).toSeq === Seq(1L))
      assert(emitted.head.getAs[Int]("n") === 2)

      // late arrivals: a straggler row of the EMITTED frame 1 and a
      // whole new frame 0, both an hour below the watermark
      source.addData(Seq(row(1, "p2", "home", 2.0), row(0, "p1", "away", 0.0)))
      q.processAllAvailable()
      source.addData(Seq(FrameRow("_wm", 9, 0L, 0L, base + 3 * hour,
        "x", "home", null, 0.0, 0.0, 0.0)))
      q.processAllAvailable()

      val after = spark.table("late_graphs").filter($"game_id" === "g1").collect()
      // nothing new: no frame 0, no second (partial or grown) frame 1
      assert(after.map(r => (r.getAs[Long]("frame_id"), r.getAs[Int]("n"))).toSeq
        === Seq((1L, 2)))
    } finally q.stop()
  }

  test("streaming pressing: late kinematic rows produce no pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingPressing._
    def row(frame: Long, id: String, team: String, x: Double): KinRow = {
      val ts = base + frame * sec
      KinRow("g1", 1, frame, ts, ts, id, team, "home", x, 0.0, 0.0, 1.0, 0.0, 0.0)
    }
    val source = MemoryStream[KinRow]
    val q = pairs(source.toDS(), lateness = "5 seconds").toDF()
      .writeStream.format("memory").queryName("late_press")
      .outputMode("append").start()
    try {
      source.addData(Seq(row(1, "h1", "home", -5.0), row(1, "a1", "away", 5.0),
        row(1, "ball", "ball", 0.0)))
      q.processAllAvailable()
      (1 to 2).foreach { i =>
        source.addData(Seq(KinRow("_wm", 9, 0L, 0L, base + i * hour,
          "x", "home", null, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
        q.processAllAvailable()
      }
      val n1 = spark.table("late_press").filter($"game_id" === "g1").count()
      assert(n1 > 0) // frame 1 emitted its pair rows

      // frame 0 arrives an hour late → filtered before the operator
      source.addData(Seq(row(0, "h1", "home", -5.0), row(0, "a1", "away", 5.0),
        row(0, "ball", "ball", 0.0)))
      q.processAllAvailable()
      source.addData(Seq(KinRow("_wm", 9, 0L, 0L, base + 3 * hour,
        "x", "home", null, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      q.processAllAvailable()

      val after = spark.table("late_press").filter($"game_id" === "g1")
      assert(after.count() === n1)
      assert(after.filter($"frame_id" === 0L).isEmpty)
    } finally q.stop()
  }

  test("streaming formations: late frames never reach the hysteresis fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingFormations._
    val cfg = Efpi.Config(
      every = "frame", formations = FormationQueries.SmallFormations,
      changeAfterPossession = false, changeThreshold = Some(0.1))
    def frame(f: Long): Seq[FrameRow] = {
      val ts = base + f * sec
      Seq(
        FrameRow("g1", 1, f, ts, ts, "h1", "home", null, -10.0, 0.0, "home"),
        FrameRow("g1", 1, f, ts, ts, "h2", "home", null, -5.0, 3.0, "home"),
        FrameRow("g1", 1, f, ts, ts, "a1", "away", null, 8.0, -2.0, "home"),
        FrameRow("g1", 1, f, ts, ts, "a2", "away", null, 12.0, 1.0, "home"),
        FrameRow("g1", 1, f, ts, ts, "ball", "ball", null, 0.0, 0.0, "home"))
    }
    val source = MemoryStream[FrameRow]
    val q = frameFormations(source.toDS(), cfg, lateness = "5 seconds")
      .writeStream.format("memory").queryName("late_efpi")
      .outputMode("append").start()
    try {
      source.addData(frame(1) ++ frame(2)); q.processAllAvailable()
      (1 to 2).foreach { i =>
        source.addData(Seq(FrameRow("_wm", 9, 0L, 0L, base + i * hour,
          "x", "home", null, 0.0, 0.0, null)))
        q.processAllAvailable()
      }
      val out1 = spark.table("late_efpi").filter($"game_id" === "g1").collect()
      assert(out1.map(_.getAs[Long]("segment_id")).toSet === Set(1L, 2L))

      // frame 0 — older than everything emitted, an hour below the
      // watermark: dropped, so the fold's segment sequence stays 1,2
      // and no out-of-order segment 0 appears
      source.addData(frame(0)); q.processAllAvailable()
      source.addData(Seq(FrameRow("_wm", 9, 0L, 0L, base + 3 * hour,
        "x", "home", null, 0.0, 0.0, null)))
      q.processAllAvailable()

      val out2 = spark.table("late_efpi").filter($"game_id" === "g1").collect()
      assert(out2.map(_.getAs[Long]("segment_id")).toSet === Set(1L, 2L))
      assert(out2.length === out1.length)
    } finally q.stop()
  }

  test("windowed mean speed: late velocity events do not reopen closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingKinematics._
    def ev(i: Long): TrackEvent = {
      val ts = base + i * 40000L // 25 fps
      TrackEvent("g1", "p1", 1, ts, ts, "home", i * 0.1, 0.0, 0.0)
    }
    val source = MemoryStream[TrackEvent]
    val q = windowedMeanSpeed(velocities(source.toDS()))
      .writeStream.format("memory").queryName("late_win")
      .outputMode("append").start()
    try {
      source.addData((0L to 9L).map(ev)) // fills the [base, base+1s) window
      q.processAllAvailable()
      source.addData(Seq(TrackEvent("_wm", "x", 9, 0L, base + hour,
        "home", 0.0, 0.0, 0.0)))
      q.processAllAvailable()
      val g1 = spark.table("late_win").filter($"game_id" === "g1").collect()
      assert(g1.map(_.getAs[Long]("n_events")).sum === 10L)

      // an 11th event inside the CLOSED window, an hour late: the
      // windowed aggregation's watermark filter drops it — the closed
      // window is never re-emitted and no duplicate window row appears
      source.addData(Seq(ev(5)))
      q.processAllAvailable()
      source.addData(Seq(TrackEvent("_wm", "x", 9, 0L, base + 2 * hour,
        "home", 0.0, 0.0, 0.0)))
      q.processAllAvailable()

      val after = spark.table("late_win").filter($"game_id" === "g1").collect()
      assert(after.map(_.getAs[Long]("n_events")).sum === 10L)
      assert(after.length === g1.length)
    } finally q.stop()
  }
}
