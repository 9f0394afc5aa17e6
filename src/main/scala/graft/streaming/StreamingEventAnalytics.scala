package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel + retention — the continuous-ingest forms of the
  * batch `q_evt_funnel` / `q_evt_retention` analytics
  * ([[graft.queries.RelationalQueries]]).
  *
  * Both operators follow the family's state discipline: per-user state
  * with an explicit bound, exact parity with the batch query on the
  * same events (StreamingEventAnalyticsSpec), and a pinned late-data
  * contract.
  *
  * Design: each is a user-keyed `flatMapGroupsWithState` that emits a
  * versioned per-user SNAPSHOT on every update — an upsert sink keys
  * on user_id and overwrites in EMISSION order (the Update-mode
  * contract); `version` additionally orders snapshots within one
  * state incarnation for sinks that may reorder writes. Note that a
  * TTL restart (below) resets `version` to 1 — emission order, not
  * the version number, is the cross-incarnation tiebreaker. Plus a
  * batch rollup over the snapshot table that reproduces the batch
  * query's output. The
  * rollup runs per trigger (`foreachBatch`) exactly like the sketch
  * family's estimator-over-state pattern ([[StreamingSketch]]) — the
  * snapshot table is user-count-sized, so the rollup is a bounded
  * batch aggregation, never a second streaming aggregation.
  *
  * Late-data contract:
  *  - FUNNEL: exact under ARBITRARY arrival order — no event is ever
  *    dropped. The state keeps, besides the step timestamps, only the
  *    candidate clicks ≤ t2 and purchases ≤ t3 (anything above can
  *    never become the answer: t1 = min view only decreases, so
  *    t2 = min click > t1 and t3 = min purchase > t2 only decrease).
  *    State bound: 2 + |clicks ≤ t2| + |purchases ≤ t3| timestamps —
  *    in the worst case (clicks before any view) the user's full
  *    click history, in the common case a handful.
  *  - RETENTION: active days are kept as a day-offset bitmap of
  *    `horizonDays` bits anchored at the user's first-touch day;
  *    activity beyond the horizon after first touch is DROPPED
  *    (asserted in the spec) — the standard bounded-window retention
  *    contract (cohort reports read offsets ≤ horizon anyway). A late
  *    EARLIER event re-anchors the bitmap (shift; the far tail falls
  *    off the horizon), so cohort assignment is exact for any arrival
  *    order within the horizon.
  *  - STATE LIFETIME: by default state is kept for every user seen —
  *    right when the user keyspace is bounded. Both operators take an
  *    optional `idleTimeout` for unbounded keyspaces: a watermark is
  *    applied (inputs later than the TTL are dropped — the exactness
  *    contract narrows to the TTL window) and users idle past the TTL
  *    have their state removed via EventTimeTimeout; a returning user
  *    restarts fresh. State bound becomes |users active within TTL|.
  */
object StreamingEventAnalytics {

  /** Interval string → milliseconds (months at the 30-day convention,
    * matching watermark semantics closely enough for a state TTL). */
  private def ttlMillis(interval: Option[String]): Long =
    interval.map { d =>
      val i = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(d))
      i.months * 2592000000L + i.days * 86400000L + i.microseconds / 1000L
    }.getOrElse(0L)

  // ---------------------------------------------------------------- funnel

  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)

  case class FunnelState(
      minView: Option[Long],
      clicks: List[Long],
      purchases: List[Long],
      version: Long)

  case class FunnelSnapshot(
      user_id: Long,
      t1: Option[Long],
      t2: Option[Long],
      t3: Option[Long],
      version: Long)

  private def funnelStep(ttlMs: Long)(
      user: Long,
      it: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelSnapshot] = {
    if (state.hasTimedOut) {
      // idle past the TTL: the last emitted snapshot is already final;
      // drop the state (a returning user starts a fresh funnel)
      state.remove()
      return Iterator.empty
    }
    val evs = it.toSeq
    val s = state.getOption.getOrElse(FunnelState(None, Nil, Nil, 0L))
    val t1 = (s.minView.toList ++
      evs.collect { case e if e.event_type == "view" => e.ts_us }).minOption
    val clicks = s.clicks ++
      evs.collect { case e if e.event_type == "click" => e.ts_us }
    val purchases = s.purchases ++
      evs.collect { case e if e.event_type == "purchase" => e.ts_us }
    val t2 = t1.flatMap(v => clicks.filter(_ > v).minOption)
    val t3 = t2.flatMap(c => purchases.filter(_ > c).minOption)
    val keptClicks = t2.fold(clicks)(c2 => clicks.filter(_ <= c2)).distinct.sorted
    val keptPurch = t3.fold(purchases)(p3 => purchases.filter(_ <= p3)).distinct.sorted
    val version = s.version + 1
    state.update(FunnelState(t1, keptClicks, keptPurch, version))
    if (ttlMs > 0)
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
    Iterator.single(FunnelSnapshot(user, t1, t2, t3, version))
  }

  /** Per-user strict-sequence funnel state (view → click → purchase)
    * over a streaming (user_id, event_type, ts) feed; `ts` may be
    * TIMESTAMP or long micros. Emits a versioned snapshot per updated
    * user per trigger — run in Update mode, latest version wins.
    *
    * `idleTimeout = None` (default) keeps state for every user seen —
    * the exact-under-arbitrary-lateness contract, right when the user
    * keyspace is bounded (a product's account base). For unbounded
    * keyspaces pass a TTL (e.g. `Some("30 days")`): a watermark is
    * applied (so input later than the TTL is dropped — the exactness
    * contract narrows to the TTL window) and a user idle past it has
    * their state removed; if they return, the funnel restarts fresh.
    * State bound becomes |users active within TTL|. */
  def userSteps(
      events: DataFrame,
      idleTimeout: Option[String] = None): Dataset[FunnelSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
        expr("cast(ts as timestamp)").as("__event_time"))
    val wm = idleTimeout.fold(base)(d => base.withWatermark("__event_time", d))
    val ttlMs = ttlMillis(idleTimeout)
    wm.as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(funnelStep(ttlMs))
  }

  /** The batch rollup over the LATEST funnel snapshots: users reached
    * per step — the `q_evt_funnel` output shape. Apply per trigger to
    * the upserted snapshot table (or to max-version rows of an
    * append sink). */
  def funnelCounts(snapshots: DataFrame): DataFrame = {
    def one(cond: org.apache.spark.sql.Column, step: Int, name: String) =
      snapshots.filter(cond).agg(count(lit(1)).as("n_users"))
        .select(lit(step).cast("long").as("step"), lit(name).as("event_type"),
          col("n_users"))
    one(col("t1").isNotNull, 1, "view")
      .unionByName(one(col("t2").isNotNull, 2, "click"))
      .unionByName(one(col("t3").isNotNull, 3, "purchase"))
  }

  // ------------------------------------------------------------- retention

  case class RetentionEvent(user_id: Long, day: Long)

  case class RetentionState(day0: Long, words: Array[Long], version: Long)

  case class RetentionSnapshot(
      user_id: Long, day0: Long, active_days: Seq[Long], version: Long)

  /** Day-offset bitmap horizon: offsets in [0, HorizonDays) are
    * tracked; later activity is dropped (documented contract). */
  val HorizonDays: Int = 512

  private def setBit(words: Array[Long], off: Long): Unit =
    if (off >= 0 && off < HorizonDays)
      words((off / 64).toInt) |= (1L << (off % 64).toInt)

  private def retentionStep(ttlMs: Long)(
      user: Long,
      it: Iterator[RetentionEvent],
      state: GroupState[RetentionState]): Iterator[RetentionSnapshot] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val days = it.map(_.day).toSeq
    val prev = state.getOption
    val day0 = (prev.map(_.day0).toList ++ days).min
    val words = new Array[Long](HorizonDays / 64)
    prev.foreach { p =>
      // re-anchor the previous bitmap onto the (possibly lower) day0
      val shift = p.day0 - day0
      var w = 0
      while (w < p.words.length) {
        var b = 0
        while (b < 64) {
          if ((p.words(w) & (1L << b)) != 0L) setBit(words, w.toLong * 64 + b + shift)
          b += 1
        }
        w += 1
      }
    }
    days.foreach(d => setBit(words, d - day0))
    val version = prev.map(_.version).getOrElse(0L) + 1
    state.update(RetentionState(day0, words, version))
    if (ttlMs > 0)
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
    val active = (0 until HorizonDays).collect {
      case off if (words(off / 64) & (1L << (off % 64))) != 0L => day0 + off
    }
    Iterator.single(RetentionSnapshot(user, day0, active, version))
  }

  /** Per-user first-touch anchor + active-day bitmap over a streaming
    * (user_id, ts) feed. Emits versioned snapshots carrying the
    * absolute active days — run in Update mode, latest version wins.
    * `idleTimeout` as in [[userSteps]]: None = keep every user's
    * state (bounded keyspaces); Some(ttl) = watermark + state removal
    * for users idle past the TTL (a returning user re-cohorts). */
  def userActivity(
      events: DataFrame,
      idleTimeout: Option[String] = None): Dataset[RetentionSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .select(col("user_id").cast("long").as("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"),
        expr("cast(ts as timestamp)").as("__event_time"))
    val wm = idleTimeout.fold(base)(d => base.withWatermark("__event_time", d))
    val ttlMs = ttlMillis(idleTimeout)
    wm.as[RetentionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(retentionStep(ttlMs))
  }

  /** The batch rollup over the LATEST retention snapshots:
    * (cohort_week, week_offset, n_users) — the `q_evt_retention`
    * output shape (same integer `div` day/week arithmetic). */
  def retentionCohorts(snapshots: DataFrame): DataFrame =
    snapshots
      .select(col("user_id"), col("day0"), explode(col("active_days")).as("day"))
      .select(col("user_id"), expr("day0 div 7").as("cohort_week"),
        expr("(day - day0) div 7").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
}
