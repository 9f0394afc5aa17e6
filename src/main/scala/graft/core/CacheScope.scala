package graft.core

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Tracks the lazy `.persist()` intermediates an operator call
  * registers, so the CALLER can unpersist exactly those once the
  * returned plans are materialized. Spark's CacheManager never GCs
  * entries: an API caller invoking an incremental operator per batch
  * would otherwise accumulate one set of cached intermediates per
  * call forever, and the blunt alternative — `catalog.clearCache()`
  * per trigger — evicts every unrelated cache in a shared session.
  *
  * Usage: pass a scope into the operator (`MinHash
  * .nearDuplicatesIncremental`, `IncrementalCuration.step`, …),
  * materialize the outputs you need (collect / write /
  * localCheckpoint), then `unpersistAll()`. The intermediates are
  * increment-sized by the operators' contracts, so holding them for
  * the duration of one step is bounded. [[CacheScope.untracked]] is
  * the default for callers that manage cache lifecycle themselves —
  * it persists without remembering (the pre-scope behavior). */
class CacheScope {
  private val tracked = ArrayBuffer.empty[DataFrame]

  /** Persist `df` (default storage level) and remember it. */
  def persist(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist()
  }

  /** Unpersist everything tracked and forget it. Safe to call more
    * than once. `blocking = true` frees the blocks synchronously —
    * use it when corpus-scale work follows immediately (a lazy free
    * leaves the evictions to race the next job's memory demand). */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
  }
}

object CacheScope {

  /** Persists without tracking — the default scope, preserving the
    * plain-`.persist()` behavior for callers that don't manage the
    * cache lifecycle. */
  val untracked: CacheScope = new CacheScope {
    override def persist(df: DataFrame): DataFrame = df.persist()
    override def unpersistAll(blocking: Boolean): Unit = ()
  }

  /** Run `f` with a fresh scope, unpersisting its intermediates in
    * `finally` — for callers that fully materialize inside `f`. */
  def withScope[A](f: CacheScope => A): A = {
    val scope = new CacheScope
    try f(scope) finally scope.unpersistAll()
  }
}
