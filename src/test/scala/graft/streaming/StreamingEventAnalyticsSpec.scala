package graft.streaming

import graft.SparkTestSession
import graft.SparkEntry
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel/retention: batch parity on the real events table
  * under shuffled (out-of-order) arrival, and the pinned late-data
  * contracts — funnel exact under arbitrary lateness, retention exact
  * within the day horizon. */
class StreamingEventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def eventRows: Seq[(Long, String, Long)] =
    graft.core.Tables.events(spark, sf)
      .select(col("user_id").cast("long"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  private def toEventDf(src: MemoryStream[(Long, String, Long)]) =
    src.toDF().select(col("_1").as("user_id"), col("_2").as("event_type"),
      timestamp_micros(col("_3")).as("ts"))

  /** Latest-version-wins view of an update-mode memory sink (rebuilt
    * from collected rows — a self-join of the memory table against its
    * own aggregate trips conflicting-reference resolution). */
  private def latest(table: String): org.apache.spark.sql.DataFrame = {
    val t = spark.table(table)
    val userIdx = t.schema.fieldIndex("user_id")
    val verIdx = t.schema.fieldIndex("version")
    val rows = t.collect().groupBy(_.getLong(userIdx))
      .values.map(_.maxBy(_.getLong(verIdx))).toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows), t.schema)
  }

  test("funnel: streamed shuffled arrival reproduces the batch q_evt_funnel counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = new scala.util.Random(41L).shuffle(eventRows)
    val src = MemoryStream[(Long, String, Long)]
    val q = StreamingEventAnalytics.userSteps(toEventDf(src))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      val third = rows.size / 3
      src.addData(rows.take(third)); q.processAllAvailable()
      src.addData(rows.slice(third, 2 * third)); q.processAllAvailable()
      src.addData(rows.drop(2 * third)); q.processAllAvailable()
      val streamed = StreamingEventAnalytics.funnelCounts(latest("funnel_stream"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = SparkEntry.queries("q_evt_funnel")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("funnel: late earlier view re-opens an already-pruned click window exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Long)]
    val q = StreamingEventAnalytics.userSteps(toEventDf(src))
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode("update").start()
    try {
      // click before any view, then the view arrives late, then an
      // even earlier click — batch answer: t1=2, t2=5, t3=30
      src.addData(Seq((1L, "click", 20L), (1L, "purchase", 30L))); q.processAllAvailable()
      src.addData(Seq((1L, "view", 2L))); q.processAllAvailable()
      src.addData(Seq((1L, "click", 5L))); q.processAllAvailable()
      val r = latest("funnel_late").select("t1", "t2", "t3").head
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 5L, 30L)))
    } finally q.stop()
  }

  test("retention: streamed shuffled arrival reproduces the batch q_evt_retention cohorts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = new scala.util.Random(43L).shuffle(
      eventRows.map { case (u, _, ts) => (u, "e", ts) })
    val src = MemoryStream[(Long, String, Long)]
    val q = StreamingEventAnalytics.userActivity(toEventDf(src))
      .writeStream.format("memory").queryName("retention_stream")
      .outputMode("update").start()
    try {
      val half = rows.size / 2
      src.addData(rows.take(half)); q.processAllAvailable()
      src.addData(rows.drop(half)); q.processAllAvailable()
      val streamed = StreamingEventAnalytics.retentionCohorts(latest("retention_stream"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = SparkEntry.queries("q_evt_retention")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("funnel TTL: an idle user's state is dropped and a return restarts fresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600000000L
    val day1 = 365L * 24 * hour // off t=0 (epoch-0 sits on the initial watermark)
    val src = MemoryStream[(Long, String, Long)]
    // upsert-by-emission-order collector (a TTL restart resets the
    // version counter, so max-version "latest" is wrong across
    // incarnations — emission order is the documented tiebreaker)
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, StreamingEventAnalytics.FunnelSnapshot)]
    val q = StreamingEventAnalytics.userSteps(toEventDf(src), idleTimeout = Some("1 hour"))
      .writeStream.outputMode("update")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[StreamingEventAnalytics.FunnelSnapshot],
         bid: Long) =>
          val rows = ds.collect()
          emitted.synchronized { rows.foreach(r => emitted += ((bid, r))) }
      }
      .start()
    try {
      src.addData(Seq((1L, "view", day1), (1L, "click", day1 + hour / 6)))
      q.processAllAvailable()
      // watermark drivers: far-future rows on a separate key; timeouts
      // only fire in data-triggered batches (two pushes: one to raise
      // the watermark, one to fire the timeout)
      src.addData(Seq((999L, "view", day1 + 10 * hour))); q.processAllAvailable()
      src.addData(Seq((999L, "view", day1 + 11 * hour))); q.processAllAvailable()
      // user 1 returns long after the TTL: state must have restarted
      src.addData(Seq((1L, "purchase", day1 + 12 * hour))); q.processAllAvailable()
      val u1 = emitted.synchronized {
        emitted.filter(_._2.user_id == 1L).maxBy(_._1)._2
      }
      assert(u1.version === 1L, "state should have been dropped and restarted")
      assert(u1.t1.isEmpty && u1.t3.isEmpty,
        "a fresh funnel has no view/purchase steps from the purged history")
    } finally q.stop()
  }

  test("retention TTL: an idle user re-cohorts on return") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    val src = MemoryStream[(Long, String, Long)]
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, StreamingEventAnalytics.RetentionSnapshot)]
    val q = StreamingEventAnalytics.userActivity(toEventDf(src), idleTimeout = Some("1 hour"))
      .writeStream.outputMode("update")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[StreamingEventAnalytics.RetentionSnapshot],
         bid: Long) =>
          val rows = ds.collect()
          emitted.synchronized { rows.foreach(r => emitted += ((bid, r))) }
      }
      .start()
    try {
      src.addData(Seq((9L, "e", 10L * day))); q.processAllAvailable()
      src.addData(Seq((999L, "e", 50L * day))); q.processAllAvailable()
      src.addData(Seq((999L, "e", 51L * day))); q.processAllAvailable()
      src.addData(Seq((9L, "e", 60L * day))); q.processAllAvailable()
      val u9 = emitted.synchronized {
        emitted.filter(_._2.user_id == 9L).maxBy(_._1)._2
      }
      assert(u9.version === 1L && u9.day0 === 60L,
        "the returning user must re-cohort at the new first-touch day")
    } finally q.stop()
  }

  test("funnel: state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_funnel_ckpt").toString
    val src = MemoryStream[(Long, String, Long)]
    // the memory-table sink refuses checkpoint recovery; foreachBatch
    // (the production upsert shape) recovers fine
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[StreamingEventAnalytics.FunnelSnapshot]
    def start() = StreamingEventAnalytics.userSteps(toEventDf(src))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[StreamingEventAnalytics.FunnelSnapshot],
         _: Long) =>
          val rows = ds.collect()
          emitted.synchronized { rows.foreach(emitted += _) }
      }
      .start()
    val q1 = start()
    try {
      src.addData(Seq((5L, "view", 100L), (5L, "click", 200L)))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: the per-user state must carry over,
    // so the purchase completes the funnel begun before the restart
    val q2 = start()
    try {
      src.addData(Seq((5L, "purchase", 300L)))
      q2.processAllAvailable()
      val u5 = emitted.synchronized {
        emitted.filter(_.user_id == 5L).maxBy(_.version)
      }
      assert((u5.t1, u5.t2, u5.t3) === ((Some(100L), Some(200L), Some(300L))),
        "the restarted query must remember the pre-restart view and click")
      assert(u5.version === 2L, "state version continues across the restart")
    } finally q2.stop()
  }

  test("retention: a late earlier event re-anchors the cohort; beyond-horizon activity drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    val src = MemoryStream[(Long, String, Long)]
    val q = StreamingEventAnalytics.userActivity(toEventDf(src))
      .writeStream.format("memory").queryName("retention_late")
      .outputMode("update").start()
    try {
      // first touch day 100, activity day 107; then a LATE day-0 event
      // re-anchors the cohort to week 0; then activity beyond the
      // horizon (day0 + 600) is dropped per the documented contract
      src.addData(Seq((9L, "e", 100L * day), (9L, "e", 107L * day))); q.processAllAvailable()
      src.addData(Seq((9L, "e", 0L))); q.processAllAvailable()
      src.addData(Seq((9L, "e", 600L * day))); q.processAllAvailable()
      val snap = latest("retention_late").select("day0", "active_days").head
      assert(snap.getLong(0) === 0L)
      assert(snap.getSeq[Long](1).toSet === Set(0L, 100L, 107L),
        "beyond-horizon day 600 must be dropped, earlier days re-anchored")
      val cohorts = StreamingEventAnalytics.retentionCohorts(latest("retention_late"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(cohorts === Map((0L, 0L) -> 1L, (0L, 14L) -> 1L, (0L, 15L) -> 1L))
    } finally q.stop()
  }
}
