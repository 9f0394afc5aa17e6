package graft.streaming

import graft.tracking.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bridges the canonical table's period-relative `timestamp` (long
  * micros since period start — `Cols.Timestamp`) to the absolute
  * event-time axis the frame-keyed streaming operators watermark on.
  *
  * Why this exists: Spark's watermark is a single global event-time
  * low-water mark. A feed whose event time is period-relative
  * regresses to ~0 at every period boundary (half-time), so the
  * watermark — already at period-1-end minus lateness — classifies
  * the whole second period as late and the stateful operators drop or
  * mis-emit it. The streaming ops therefore take an `abs_ts` column
  * (long micros since epoch, monotone across the whole match) as
  * event time, and keep the canonical period-relative `timestamp` as
  * a data column so outputs stay batch-comparable.
  *
  * Two bridges, in preference order:
  *
  *  1. [[withAbsTs]] — provider wall-clock: join the tiny per-(game,
  *     period) `section_start_utc` table (e.g.
  *     [[graft.tracking.SportecEvents.sectionStarts]], or any
  *     provider field mapped to the same shape) and add
  *     `abs_ts = section_start_utc + timestamp`. The lookup side is a
  *     handful of rows per match — broadcast, so the stream never
  *     shuffles.
  *  2. [[fromPeriodSpan]] — for providers with no wall clock: a
  *     synthetic axis `abs_ts = (period_id - 1) * span + timestamp`.
  *     Monotone as long as `span` exceeds every real period length
  *     (stoppage time included), which the caller must guarantee —
  *     3 hours is safely above any football period.
  */
object AbsoluteTime {

  val AbsTs = "abs_ts"

  /** Wall-clock bridge. `sectionStarts` must have columns
    * (game_id, period_id, section_start_utc: long micros since epoch)
    * with one row per (game, period) — see
    * [[graft.tracking.SportecEvents.sectionStarts]]. Works on static
    * and streaming `tracking` alike (stream–static broadcast join). */
  def withAbsTs(tracking: DataFrame, sectionStarts: DataFrame): DataFrame =
    tracking
      .join(broadcast(sectionStarts), Seq(Cols.GameId, Cols.PeriodId))
      .withColumn(AbsTs, col("section_start_utc") + col(Cols.Timestamp))
      .drop("section_start_utc")

  /** Synthetic-axis bridge for wall-clock-less providers. `spanMicros`
    * MUST exceed the longest real period (default 3 h); a period that
    * outruns it would fold into the next period's range and break
    * monotonicity. */
  def fromPeriodSpan(
      tracking: DataFrame,
      spanMicros: Long = 3L * 3600L * 1000000L): DataFrame =
    tracking.withColumn(AbsTs,
      (col(Cols.PeriodId).cast("long") - lit(1L)) * lit(spanMicros) +
        col(Cols.Timestamp))
}
