package graft.streaming

import graft.SparkTestSession
import graft.tracking.{SportecEvents, SportecSource}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming event-label parity: replaying the Sportec fixture's
  * frames and events through [[StreamingEventLabels.attach]] must
  * reproduce the batch [[SportecEvents.attach]] labels exactly,
  * with events and frames split across micro-batches. */
class StreamingEventLabelsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import StreamingEventLabels._

  private val files = "/root/reference/tests/files"

  private def runStream(
      batches: Seq[(Seq[FrameTick], Seq[EventTick])]): Seq[LabeledFrame] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fSrc = MemoryStream[FrameTick]
    val eSrc = MemoryStream[EventTick]
    val q = attach(fSrc.toDS(), eSrc.toDS())
      .writeStream.format("memory").queryName("evl_out")
      .outputMode("append").start()
    try {
      batches.foreach { case (fs, es) =>
        if (fs.nonEmpty) fSrc.addData(fs)
        if (es.nonEmpty) eSrc.addData(es)
        q.processAllAvailable()
      }
      // trailing watermark drivers: timeouts fire in data batches
      val maxTs = batches.flatMap(b => b._1.map(_.abs_ts) ++ b._2.map(_.abs_ts)).max
      (1 to 2).foreach { i =>
        fSrc.addData(Seq(FrameTick("_wm", 1, 0L, maxTs + i * 3600L * 1000000L)))
        q.processAllAvailable()
      }
      spark.table("evl_out").as[LabeledFrame].collect().toSeq
        .filter(_.game_id != "_wm")
    } finally q.stop()
  }

  test("fixture replay matches the batch forward-fill, events split across batches") {
    import spark.implicits._
    val trk = SportecSource.load(
      spark, s"$files/sportec_tracking.xml", s"$files/sportec_meta.xml")
    val eventsDf = SportecEvents.events(spark, s"$files/sportec_events.xml")
    val starts = SportecEvents.sectionStarts(spark, s"$files/sportec_tracking.xml")

    // batch ground truth
    val batch = SportecEvents.attach(trk, eventsDf, starts)
      .select("period_id", "frame_id", "event_id", "event_type", "event_player_id")
      .distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3), r.getString(4))).toMap

    // streaming inputs on the absolute axis
    val startUtc = starts.head().getAs[Long]("section_start_utc")
    val frames = trk.select("game_id", "period_id", "frame_id", "timestamp")
      .distinct().collect().map(r => FrameTick(
        r.getString(0), r.getInt(1), r.getLong(2), startUtc + r.getLong(3)))
    val events = eventsDf
      .select("game_id", "event_ts_utc", "event_id", "event_type",
        "team_id", "player_id")
      .collect().map(r => EventTick(r.getString(0), r.getLong(1),
        r.getString(2), r.getString(3), r.getString(4), r.getString(5)))
      .sortBy(_.abs_ts)

    // batch 1: early events + first half of frames; batch 2: the rest —
    // the second event (11:01:30.007) arrives AFTER the frames it labels
    val (e1, e2) = events.splitAt(1)
    val (f1, f2) = frames.sortBy(_.abs_ts).splitAt(frames.length / 2)
    val streamed = runStream(Seq((f1.toSeq, e1.toSeq), (f2.toSeq, e2.toSeq)))
      .map(l => (l.period_id, l.frame_id) ->
        (l.event_id, l.event_type, l.event_player_id)).toMap

    assert(streamed.size === 21)
    assert(streamed === batch)
  }
}
