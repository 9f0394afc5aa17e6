package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the streaming family.
  *
  * The default HDFS-backed provider keeps every key's working state
  * in executor HEAP (a hash map per partition, snapshotted to the
  * checkpoint); that is the right default for the bounded keyspaces
  * most of the streaming shapes here carry (players, frames). For
  * unbounded keyspaces — the TTL-less funnel/retention over a
  * growing user base, streaming exact-dedup over an open-ended
  * fingerprint space — state can outgrow heap, and Spark's bundled
  * RocksDB provider keeps working state off-heap/on-disk with the
  * same exactly-once checkpoint contract. Output is provider-
  * independent (StreamingStateBackendSpec pins dedup and funnel
  * parity); only memory residency changes.
  *
  * The provider is a per-QUERY choice snapshotted when the query
  * starts, so route it by setting the conf just before `start()` —
  * [[withRocksDb]] scopes that and restores the previous provider.
  *
  * At 100 TB scale: prefer RocksDB + a TTL together (the TTL bounds
  * disk, RocksDB bounds heap); `boundedMemoryMb` caps the combined
  * RocksDB block-cache/memtable budget per executor so a thousand
  * state partitions cannot OOM a worker from native memory.
  */
object StateBackends {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val DefaultProvider: String =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Route streaming queries started AFTER this call to RocksDB
    * state. `boundedMemoryMb` additionally caps the total RocksDB
    * memory (block cache + memtables, all instances on an executor). */
  def useRocksDb(spark: SparkSession, boundedMemoryMb: Option[Long] = None): Unit = {
    spark.conf.set(ProviderKey, RocksDbProvider)
    boundedMemoryMb.foreach { mb =>
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", mb.toString)
    }
  }

  /** Back to the heap-backed default provider. */
  def useDefault(spark: SparkSession): Unit =
    spark.conf.set(ProviderKey, DefaultProvider)

  /** Run `body` (typically: build + start + drain one streaming
    * query) with RocksDB state, restoring the previous provider
    * afterwards — queries already running are unaffected either way. */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    useRocksDb(spark)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
