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
