package graft.streaming

import graft.tracking.{Cols, TrackingSettings}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming Pressing Intensity: per-frame TTI/PTI pairs
  * from a live kinematics feed (e.g. [[StreamingKinematics]] output
  * joined back to positions), emitted when the watermark closes the
  * frame — the streaming form of the batch
  * [[graft.models.PressingIntensity]] pair pipeline for live pressing
  * dashboards.
  *
  * The batch model is a within-frame self-join; a stream-stream
  * self-join would force two shuffles of the same feed plus state on
  * both sides, so the streaming form keys ONE state store by frame and
  * evaluates the ≤23×23 pair arithmetic in the emit callback (a frame
  * is bounded by squad size, so the callback is O(1) work — the same
  * bounded-kernel argument the batch pair join makes per frame). State
  * per key is one frame's rows, dropped on emission; the shuffle key
  * (game, period, frame) matches the batch shuffle.
  *
  * TTI/PTI arithmetic is shared with the batch engine's formula
  * (`models/utils.py:4-99` semantics: teams method, ball side included
  * on the possession side, reaction time + capped-speed closing term;
  * see [[graft.models.PressingIntensity]] for the formula scaladoc) —
  * replay parity with the batch pair table is asserted in
  * StreamingPressingSpec.
  */
object StreamingPressing {

  /** `abs_ts` = absolute event-time micros (monotone across periods,
    * see [[AbsoluteTime]]); `timestamp` stays canonical
    * period-relative. */
  final case class KinRow(
      game_id: String, period_id: Int, frame_id: Long, timestamp: Long,
      abs_ts: Long,
      id: String, team_id: String, ball_owning_team_id: String,
      x: Double, y: Double, z: Double,
      vx: Double, vy: Double, vz: Double)

  final case class PressPair(
      game_id: String, period_id: Int, frame_id: Long,
      row_id: String, col_id: String, tti: Double, pti: Double)

  /** One (defender row, possession col) TTI — identical arithmetic to
    * the batch column expression in PressingIntensity.pairs. */
  private[streaming] def tti(
      r: KinRow, c: KinRow, reactionTime: Double, vMax: Double): Double = {
    val ux = c.vx; val uy = c.vy; val uz = c.vz
    val uMag = math.sqrt(ux * ux + uy * uy + uz * uz)
    val d2x = r.x + r.vx; val d2y = r.y + r.vy; val d2z = r.z + r.vz
    val vxx = d2x - c.x; val vyy = d2y - c.y; val vzz = d2z - c.z
    val vMag = math.sqrt(vxx * vxx + vyy * vyy + vzz * vzz)
    val angle = math.acos((ux * vxx + uy * vyy + uz * vzz) / (uMag * vMag + 1e-10))
    val dx = d2x - (c.x + c.vx * reactionTime)
    val dy = d2y - (c.y + c.vy * reactionTime)
    val dz = d2z - (c.z + c.vz * reactionTime)
    val dMag = math.sqrt(dx * dx + dy * dy + dz * dz)
    uMag * angle / math.Pi + reactionTime + dMag / vMax
  }

  private[streaming] def pti(
      t: Double, timeThreshold: Double, sigma: Double): Double = {
    val arg = -math.Pi / math.sqrt(3.0) / sigma * (timeThreshold - t)
    1.0 / (1.0 + math.exp(math.min(math.max(arg, -700.0), 700.0)))
  }

  private[streaming] def framePairs(
      rows: Seq[KinRow], settings: TrackingSettings,
      reactionTime: Double, timeThreshold: Double, sigma: Double): Seq[PressPair] = {
    // batch parity: the pair join's === / =!= on a null owning team
    // filters every row to false, so dead-ball frames emit no pairs
    if (rows.isEmpty || rows.head.ball_owning_team_id == null ||
        rows.head.ball_owning_team_id.isEmpty) Seq.empty
    else {
      val owning = rows.head.ball_owning_team_id
      val colSide = rows.filter(r => r.team_id == owning || r.team_id == Cols.Ball)
      val rowSide = rows.filter(r => r.team_id != owning && r.team_id != Cols.Ball)
      for (r <- rowSide; c <- colSide) yield {
        val t = tti(r, c, reactionTime, settings.maxPlayerSpeed)
        PressPair(r.game_id, r.period_id, r.frame_id, r.id, c.id,
          t, pti(t, timeThreshold, sigma))
      }
    }
  }

  /** Frame-keyed TTI/PTI pair stream; frames emit when the watermark
    * passes their event time (same completion contract as
    * [[StreamingGraphs]]). */
  def pairs(
      rows: Dataset[KinRow],
      settings: TrackingSettings = TrackingSettings(),
      lateness: String = "10 seconds",
      reactionTime: Double = 0.7,
      timeThreshold: Double = 1.5,
      sigma: Double = 0.45): Dataset[PressPair] = {
    import rows.sparkSession.implicits._
    rows
      .withColumn("event_time", timestamp_micros(col("abs_ts")))
      .withWatermark("event_time", lateness)
      .as[KinRow]
      .groupByKey(r => (r.game_id, r.period_id, r.frame_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (String, Int, Long), it: Iterator[KinRow], state: GroupState[Seq[KinRow]]) => {
          if (state.hasTimedOut) {
            val buffered = state.getOption.getOrElse(Seq.empty)
            state.remove()
            framePairs(buffered.sortBy(_.id), settings,
              reactionTime, timeThreshold, sigma).iterator
          } else {
            val buffered = state.getOption.getOrElse(Seq.empty) ++ it
            state.update(buffered)
            // clamp past the watermark: a row admitted by the late-data
            // predicate whose ms-truncated time fell below the eviction
            // watermark would otherwise make setTimeoutTimestamp throw
            state.setTimeoutTimestamp(math.max(
              buffered.map(_.abs_ts / 1000L).max,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
        })
  }
}
