package graft.tools

import graft.SparkEntry
import graft.streaming.{StateBackends, StreamingEventAnalytics}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The number behind the "beyond heap" claim: run the stateful funnel
  * (`StreamingEventAnalytics.userSteps` — one `FunnelState` per user,
  * the family's unbounded-keyspace shape) over a large user base on
  * BOTH state backends and report, per provider, the drain wall time
  * and the state store's own size metrics
  * (`StreamingQueryProgress.stateOperators`: numRowsTotal,
  * memoryUsedBytes for the heap provider, the RocksDB
  * total-memory/size custom metrics for RocksDB).
  *
  * The workload is deterministic (no RNG): `users` users, three
  * events each (view → click → purchase) split across three
  * micro-batches, timestamps derived from the user id. Output parity
  * across the two runs is asserted (count + step-3 completions), so
  * the measurement doubles as a large-N parity check on top of
  * StreamingStateBackendSpec's exactness pins.
  *
  * Prints one JSON line:
  * {{{ {"metric":"state_soak","users":N,"providers":{"heap":{...},"rocksdb":{...}}} }}}
  *
  * Run: {{{ SPARK_GRAFT_USERS=1000000 sbt "runMain graft.tools.StateSoak" }}}
  */
object StateSoak {
  def main(args: Array[String]): Unit = {
    val users = sys.env.getOrElse("SPARK_GRAFT_USERS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 1700000000L * 1000000L
    def batch(step: Int): Seq[(Long, String, Long)] = {
      val ev = step match {
        case 0 => "view"; case 1 => "click"; case _ => "purchase"
      }
      (0L until users).map(u => (u, ev, base + step * 60000000L + u))
    }

    def run(provider: String): (String, Long, Long) = {
      val name = s"state_soak_$provider"
      val ckpt = java.nio.file.Files.createTempDirectory(name).toString
      val source = MemoryStream[(Long, String, Long)]
      val events = source.toDF().select(
        col("_1").as("user_id"), col("_2").as("event_type"),
        timestamp_micros(col("_3")).as("ts"))
      val q = StreamingEventAnalytics.userSteps(events)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        val t0 = System.nanoTime()
        (0 until 3).foreach { s => source.addData(batch(s)); q.processAllAvailable() }
        val sec = (System.nanoTime() - t0) / 1e9
        val progress = q.lastProgress
        val st = progress.stateOperators.head
        val custom = st.customMetrics
        // heap provider reports memoryUsedBytes; RocksDB reports its
        // native budget via custom metrics (memoryUsedBytes ~ 0 there)
        val mem = math.max(st.memoryUsedBytes,
          Seq("rocksdbTotalMemoryUsage", "rocksdbSstFileSize")
            .map(k => Option(custom.get(k)).map(_.longValue()).getOrElse(0L)).max)
        // parity payload: every user completes all three steps. t3 is
        // monotone once set, so "completed" needs no latest-version
        // self-join (which a memory sink cannot analyze anyway)
        val done = spark.table(name)
          .filter(col("t3").isNotNull)
          .select(countDistinct(col("user_id"))).head.getLong(0)
        require(st.numRowsTotal == users,
          s"$provider state rows ${st.numRowsTotal} != $users users")
        require(done == users, s"$provider completions $done != $users")
        (f""""$provider":{"seconds":$sec%.2f,"state_rows":${st.numRowsTotal},"state_bytes":$mem}""",
          st.numRowsTotal, mem)
      } finally {
        q.stop()
        spark.catalog.clearCache()
      }
    }

    // discarded warm-up (heap, small N) so the first measured run
    // doesn't pay JIT/stream-machinery init that the second one won't
    {
      val name = "state_soak_warmup"
      val src = MemoryStream[(Long, String, Long)]
      val q = StreamingEventAnalytics.userSteps(
        src.toDF().select(col("_1").as("user_id"), col("_2").as("event_type"),
          timestamp_micros(col("_3")).as("ts")))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        src.addData((0L until 1000L).map(u => (u, "view", base + u)))
        q.processAllAvailable()
      } finally q.stop()
    }

    val heap = run("heap")
    val rocks = StateBackends.withRocksDb(spark)(run("rocksdb"))
    println(s"""{"metric":"state_soak","users":$users,"providers":{${heap._1},${rocks._1}}}""")
    spark.stop()
  }
}
