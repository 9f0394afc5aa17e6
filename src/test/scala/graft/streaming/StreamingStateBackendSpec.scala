package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** RocksDB state-store parity: the streaming shapes must produce the
  * SAME output on the RocksDB provider as on the heap-backed default
  * ([[StateBackends]]) — the backend changes memory residency, never
  * results. Each run gets its own checkpoint dir, and the spec also
  * proves the chosen backend actually engaged by inspecting the
  * checkpoint's state files (RocksDB commits `.zip`/`.changelog`
  * snapshots; the default provider writes `.delta`/`.snapshot`). */
class StreamingStateBackendSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val base = 1700000000L * 1000000L
  private val sec = 1000000L

  private def stateFiles(ckpt: String): Seq[String] = {
    val root = new java.io.File(ckpt, "state")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    if (root.exists()) walk(root).map(_.getName) else Nil
  }

  final case class Doc(doc_id: Long, ts: Long, text: String)

  private def runDedup(rocks: Boolean): (Seq[Long], Seq[String]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("state_backend_dedup").toString
    val name = s"dedup_backend_${if (rocks) "rocks" else "heap"}"
    def run(): (Seq[Long], Seq[String]) = {
      val source = MemoryStream[Doc]
      val q = StreamingDedup.exactDedupStream(source.toDF(), "text", "ts")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        Seq(
          Seq(Doc(1, base, "alpha beta"), Doc(2, base + sec, "gamma delta")),
          Seq(Doc(3, base + 2 * sec, "alpha beta"), Doc(4, base + 3 * sec, "epsilon")),
          Seq(Doc(5, base + 4 * sec, "gamma delta"), Doc(6, base + 5 * sec, "zeta"))
        ).foreach { b => source.addData(b); q.processAllAvailable() }
        (spark.table(name).select("doc_id").as[Long].collect().toSeq.sorted,
          stateFiles(ckpt))
      } finally q.stop()
    }
    if (rocks) StateBackends.withRocksDb(spark)(run()) else run()
  }

  private def runFunnel(rocks: Boolean): (Map[Long, (Option[Long], Option[Long], Option[Long])], Seq[String]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("state_backend_funnel").toString
    val name = s"funnel_backend_${if (rocks) "rocks" else "heap"}"
    def run() = {
      val source = MemoryStream[(Long, String, Long)]
      val events = source.toDF().select(
        org.apache.spark.sql.functions.col("_1").as("user_id"),
        org.apache.spark.sql.functions.col("_2").as("event_type"),
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("_3")).as("ts"))
      val q = StreamingEventAnalytics.userSteps(events)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        Seq(
          Seq((1L, "view", base), (2L, "view", base + sec)),
          Seq((1L, "click", base + 2 * sec), (2L, "purchase", base + 2 * sec)),
          Seq((1L, "purchase", base + 3 * sec), (2L, "click", base + 3 * sec))
        ).foreach { b => source.addData(b); q.processAllAvailable() }
        val latest = spark.table(name)
          .collect()
          .map(r => (r.getLong(0),
            (Option(r.get(1)).map(_.asInstanceOf[Long]),
              Option(r.get(2)).map(_.asInstanceOf[Long]),
              Option(r.get(3)).map(_.asInstanceOf[Long]),
              r.getLong(4))))
          .groupBy(_._1)
          .map { case (u, rows) =>
            val (_, (t1, t2, t3, _)) = rows.maxBy(_._2._4)
            u -> ((t1, t2, t3))
          }
        (latest, stateFiles(ckpt))
      } finally q.stop()
    }
    if (rocks) StateBackends.withRocksDb(spark)(run()) else run()
  }

  // ---- frame-keyed sports shapes: the largest per-key state in the
  // family (a frame's ≤23 buffered rows, or a game's hysteresis state
  // + pending buffer) — the shapes a 100 TB season would actually run
  // on RocksDB. Same contract: the backend changes memory residency,
  // never output. ----

  private def runGraphs(rocks: Boolean): (Seq[(Long, Seq[String], Seq[Seq[Int]])], Seq[String]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingGraphs._
    val ckpt = java.nio.file.Files.createTempDirectory("state_backend_graphs").toString
    val name = s"graphs_backend_${if (rocks) "rocks" else "heap"}"
    def row(frame: Long, id: String, team: String, x: Double): FrameRow = {
      val ts = base + frame * sec
      FrameRow("g1", 1, frame, ts, ts, id, team, "home", x, 0.0, 0.0)
    }
    def run() = {
      val source = MemoryStream[FrameRow]
      val q = graphStream(source.toDS(), lateness = "5 seconds")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        // frame 1 straddles two batches (state carries it across), then
        // two watermark drivers release it
        source.addData(Seq(row(1, "p1", "away", 1.0), row(1, "ball", "ball", 3.0)))
        q.processAllAvailable()
        source.addData(Seq(row(1, "p2", "home", 2.0), row(2, "p1", "away", 4.0)))
        q.processAllAvailable()
        source.addData(Seq(row(999, "p1", "away", 0.0)))
        q.processAllAvailable()
        source.addData(Seq(row(1000, "p1", "away", 0.0)))
        q.processAllAvailable()
        (spark.table(name).as[StreamGraph].collect().toSeq
          .filter(g => g.frame_id == 1L || g.frame_id == 2L)
          .sortBy(_.frame_id)
          .map(g => (g.frame_id, g.object_ids, g.a)),
          stateFiles(ckpt))
      } finally q.stop()
    }
    if (rocks) StateBackends.withRocksDb(spark)(run()) else run()
  }

  private def runPressing(rocks: Boolean): (Map[(String, String), (Double, Double)], Seq[String]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingPressing._
    val ckpt = java.nio.file.Files.createTempDirectory("state_backend_press").toString
    val name = s"press_backend_${if (rocks) "rocks" else "heap"}"
    def kin(frame: Long, id: String, team: String,
        x: Double, y: Double, vx: Double, vy: Double): KinRow = {
      val ts = base + frame * sec
      KinRow("g1", 1, frame, ts, ts, id, team, "home", x, y, 0.0, vx, vy, 0.0)
    }
    def run() = {
      val source = MemoryStream[KinRow]
      val q = pairs(source.toDS(), lateness = "5 seconds").toDF()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        source.addData(Seq(
          kin(1, "h1", "home", 10.0, 5.0, 1.0, 0.0),
          kin(1, "a1", "away", 15.0, 0.0, -1.0, 1.0),
          kin(1, "ball", "ball", 11.0, 5.0, 3.0, 0.0)))
        q.processAllAvailable()
        source.addData(Seq(kin(1, "a2", "away", 30.0, 10.0, 2.0, -1.0)))
        q.processAllAvailable()
        source.addData(Seq(kin(100, "h1", "home", 0, 0, 0, 0)))
        q.processAllAvailable()
        source.addData(Seq(kin(101, "h1", "home", 0, 0, 0, 0)))
        q.processAllAvailable()
        (spark.table(name).as[PressPair].collect()
          .filter(_.frame_id == 1L)
          .map(p => (p.row_id, p.col_id) -> (p.tti, p.pti)).toMap,
          stateFiles(ckpt))
      } finally q.stop()
    }
    if (rocks) StateBackends.withRocksDb(spark)(run()) else run()
  }

  private def runFormations(rocks: Boolean): (Seq[(Long, String, String, String)], Seq[String]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingFormations._
    import graft.models.formations.Efpi
    val cfg = Efpi.Config(
      every = "frame", formations = graft.queries.FormationQueries.SmallFormations,
      changeAfterPossession = false, changeThreshold = Some(0.1))
    val ckpt = java.nio.file.Files.createTempDirectory("state_backend_efpi").toString
    val name = s"efpi_backend_${if (rocks) "rocks" else "heap"}"
    val t0 = 3600L * 1000000L
    def frame(f: Long, ts: Long, dx: Double): Seq[FrameRow] = Seq(
      FrameRow("g", 1, f, ts, ts, "h1", "home", null, -10.0 + dx, 0.0, "home"),
      FrameRow("g", 1, f, ts, ts, "h2", "home", null, -5.0 + dx, 3.0, "home"),
      FrameRow("g", 1, f, ts, ts, "a1", "away", null, 8.0 + dx, -2.0, "home"),
      FrameRow("g", 1, f, ts, ts, "ball", "ball", null, 0.0, 0.0, "home"))
    val driver = FrameRow("_wm", 1, 0L, t0 + 10010L * 1000L, t0 + 10010L * 1000L,
      "x", "home", null, 0.0, 0.0, null)
    def run() = {
      val source = MemoryStream[FrameRow]
      val q = frameFormations(source.toDS(), cfg)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        // frame 1, a driver that flushes it (hysteresis state persists
        // to the store), then frame 2 read against the CARRIED state —
        // the cross-batch path RocksDB must reproduce
        Seq(frame(1, t0, 0.0), Seq(driver), frame(2, t0 + 40000L, 0.01))
          .foreach { b => source.addData(b); q.processAllAvailable() }
        (1 to 2).foreach { i =>
          val wmTs = t0 + (i + 1) * 3600L * 1000000L
          source.addData(Seq(FrameRow("_wm", 1, 0L, wmTs, wmTs,
            "x", "home", null, 0.0, 0.0, null)))
          q.processAllAvailable()
        }
        (spark.table(name).as[Efpi.OutRow].collect().toSeq
          .filter(r => r.game_id == "g" && r.id != "ball")
          .sortBy(r => (r.segment_id, r.id))
          .map(r => (r.segment_id, r.id, r.position, r.formation)),
          stateFiles(ckpt))
      } finally q.stop()
    }
    if (rocks) StateBackends.withRocksDb(spark)(run()) else run()
  }

  test("frame graphs (flatMapGroupsWithState, frame-keyed): RocksDB parity") {
    val (heapOut, heapFiles) = runGraphs(rocks = false)
    val (rocksOut, rocksFiles) = runGraphs(rocks = true)
    assert(rocksOut === heapOut)
    // the cross-batch frame assembled completely on both backends
    assert(heapOut.map(_._1) === Seq(1L, 2L))
    assert(heapOut.head._2 === Seq("p2", "p1", "ball"))
    assert(rocksFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB state artifacts in $rocksFiles")
    assert(heapFiles.exists(_.endsWith(".delta")))
  }

  test("pressing pairs (frame-keyed TTI/PTI): RocksDB parity, bit-equal doubles") {
    val (heapOut, _) = runPressing(rocks = false)
    val (rocksOut, rocksFiles) = runPressing(rocks = true)
    assert(rocksOut.keySet === heapOut.keySet)
    assert(rocksOut.keySet === Set(("a1", "h1"), ("a1", "ball"), ("a2", "h1"), ("a2", "ball")))
    // the state round-trip must not perturb the arithmetic: exact
    // double equality, not tolerance
    heapOut.foreach { case (k, v) => assert(rocksOut(k) === v, s"pair $k drifted") }
    assert(rocksFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")))
  }

  test("streaming EFPI (game-keyed hysteresis): RocksDB parity incl. kept state across batches") {
    val (heapOut, _) = runFormations(rocks = false)
    val (rocksOut, rocksFiles) = runFormations(rocks = true)
    assert(rocksOut === heapOut)
    // both frames present and frame 2 KEPT frame 1's formation+labels —
    // the hysteresis state survived the RocksDB store round-trip
    val byFrame = heapOut.groupBy(_._1)
    assert(byFrame.keySet === Set(1L, 2L))
    assert(byFrame(1L).map(r => (r._2, r._3, r._4)) ===
      byFrame(2L).map(r => (r._2, r._3, r._4)))
    assert(rocksFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")))
  }

  test("exact dedup: RocksDB state produces the same kept set as the default") {
    val (heapOut, heapFiles) = runDedup(rocks = false)
    val (rocksOut, rocksFiles) = runDedup(rocks = true)
    assert(rocksOut === heapOut)
    assert(heapOut === Seq(1L, 2L, 4L, 6L))
    // the backends really differed: RocksDB commits zip snapshots
    // (or changelogs), the default provider writes delta files
    assert(rocksFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB state artifacts in $rocksFiles")
    assert(heapFiles.exists(_.endsWith(".delta")),
      s"no HDFS-backed state artifacts in $heapFiles")
    assert(!heapFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")))
  }

  test("funnel (flatMapGroupsWithState): RocksDB parity on the latest snapshots") {
    val (heapOut, _) = runFunnel(rocks = false)
    val (rocksOut, rocksFiles) = runFunnel(rocks = true)
    assert(rocksOut === heapOut)
    // user 1 completed view -> click -> purchase; user 2's purchase
    // precedes their click, so the strict sequence stops at t2
    assert(heapOut(1L) === ((Some(base), Some(base + 2 * sec), Some(base + 3 * sec))))
    assert(heapOut(2L) === ((Some(base + sec), Some(base + 3 * sec), None)))
    assert(rocksFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")))
  }

  test("withRocksDb restores the previous provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StateBackends.withRocksDb(spark) {
      assert(spark.conf.get(key) === StateBackends.RocksDbProvider)
    }
    assert(spark.conf.getOption(key) === before)
  }
}
