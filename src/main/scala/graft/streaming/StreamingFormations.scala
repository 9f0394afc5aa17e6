package graft.streaming

import graft.models.formations.{Efpi, Templates}
import graft.tracking.Cols
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming EFPI: per-frame formation detection with the
  * keep-or-update hysteresis, for live tactical dashboards — the
  * streaming form of `Efpi.fit(every="frame")`.
  *
  * The hysteresis is the engine's one genuinely sequential model
  * (state carries across frames per game), so the stream keys ONE
  * state store by game and does both halves inside it:
  *
  *  1. '''frame completion''' — incoming rows buffer per frame until
  *     the watermark passes the frame's event time (same completion
  *     contract as [[StreamingGraphs]]/[[StreamingPressing]]);
  *  2. '''ordered fold''' — completed frames are processed in
  *     (period, frame) order through the exact batch fold body
  *     ([[Efpi.foldStep]]): parallel detection per frame (≤23 rows, a
  *     bounded kernel), then the keep-or-update decision against the
  *     running per-team state.
  *
  * Emission waits for the watermark, so replaying a feed converges to
  * the batch `fit` output — asserted in StreamingFormationsSpec.
  *
  * State per game = the per-team formation state (a few rows) plus
  * the pending-frame buffer, which is bounded by the lateness window:
  * at 25 fps × 23 objects × a 10 s watermark that is ~5.8k small rows
  * per live game. The shuffle key is the game — the same
  * one-task-per-game ceiling the per-game kinematics windows and the
  * batch hysteresis repartition already set; detection work per state
  * invocation is physics-bounded per frame.
  */
object StreamingFormations {

  /** `abs_ts` = absolute event-time micros (monotone across periods,
    * see [[AbsoluteTime]]); `timestamp` stays canonical
    * period-relative. */
  final case class FrameRow(
      game_id: String, period_id: Int, frame_id: Long, timestamp: Long,
      abs_ts: Long,
      id: String, team_id: String, position_name: String,
      x: Double, y: Double, ball_owning_team_id: String)

  /** Encoder-friendly snapshot of one team's hysteresis state. */
  final case class TeamStateRow(
      team_id: String, is_attack: Boolean, formation: String, cost: Double,
      ids: Seq[String], label_keys: Seq[String], label_vals: Seq[String])

  final case class GameState(teams: Seq[TeamStateRow], pending: Seq[FrameRow])

  private def thaw(rows: Seq[TeamStateRow]): scala.collection.mutable.Map[String, Efpi.TeamState] =
    scala.collection.mutable.Map(rows.map(r =>
      r.team_id -> Efpi.TeamState(r.is_attack, r.formation, r.cost,
        r.ids.toSet, r.label_keys.zip(r.label_vals).toMap)): _*)

  private def freeze(m: scala.collection.mutable.Map[String, Efpi.TeamState]): Seq[TeamStateRow] =
    m.toSeq.sortBy(_._1).map { case (team, st) =>
      val labels = st.labelsDict.toSeq.sortBy(_._1)
      TeamStateRow(team, st.isAttack, st.formation, st.cost,
        st.ids.toSeq.sorted, labels.map(_._1), labels.map(_._2))
    }

  /** Per-frame formation labels; frames emit in order when the
    * watermark passes their event time. Output rows match the batch
    * `Efpi.fit(every="frame")` schema with `segment_id = frame_id`. */
  def frameFormations(
      rows: Dataset[FrameRow],
      cfg: Efpi.Config = Efpi.Config(every = "frame"),
      lateness: String = "10 seconds"): Dataset[Efpi.OutRow] = {
    import rows.sparkSession.implicits._
    require(cfg.every == "frame", "streaming EFPI supports every='frame'")
    val lib = cfg.customTemplates.getOrElse(Templates.library(cfg.formations))

    rows
      .withColumn("event_time", timestamp_micros(col("abs_ts")))
      .withWatermark("event_time", lateness)
      .as[FrameRow]
      .groupByKey(_.game_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (game: String, it: Iterator[FrameRow], state: GroupState[GameState]) => {
          val st = state.getOption.getOrElse(GameState(Nil, Nil))
          val pending = st.pending ++ it
          val wm = state.getCurrentWatermarkMs()
          // frames whose FULL event time is strictly below the
          // watermark are final: no admissible late row can still join
          // them (ms-truncated compares would release frames up to
          // 999us early)
          val (ready, still) = pending.partition(_.abs_ts < wm * 1000L)
          val teamState = thaw(st.teams)
          // period before frame: frame ids may restart per period, and
          // the fold must never interleave periods (matches the batch
          // fold's (game, period, segment) sortWithinPartitions)
          val out = ready
            .groupBy(r => (r.period_id, r.frame_id))
            .toSeq.sortBy(_._1)
            .flatMap { case ((period, frame), rws) =>
              val owning = rws.head.ball_owning_team_id
              // batch parity: fit drops exactly the NULL-owning rows
              // before segmentation (empty strings flow through like
              // any other id), so only those frames emit nothing
              if (owning == null) Nil
              else {
                val segRows = rws.sortBy(_.id).map(r => Efpi.SegRow(
                  r.game_id, r.period_id, r.frame_id, r.id, r.team_id,
                  r.position_name, r.x, r.y, r.ball_owning_team_id))
                val cands = Efpi.detectSegment(segRows, lib)
                Efpi.foldStep(teamState, game, period, frame, owning,
                  cands, segRows.map(r => (r.id, r.team_id)), cfg)
              }
            }
          state.update(GameState(freeze(teamState), still))
          // re-arm only while frames are pending: an idle game keeps
          // its hysteresis state (needed when play resumes) without
          // being re-invoked on every watermark advance
          if (still.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(still.map(_.abs_ts / 1000L).min, wm + 1))
          out.iterator
        })
  }
}
