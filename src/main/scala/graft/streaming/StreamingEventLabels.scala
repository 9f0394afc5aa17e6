package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming event-label attach: the streaming form of
  * [[graft.tracking.SportecEvents.attach]] (W6) for live feeds — every
  * tracking frame is stamped with the latest event at or before its
  * absolute time, with both the frame stream and the event stream
  * arriving out of order within the lateness window.
  *
  * Both inputs ride ONE union stream (tagged rows) so a single
  * game-keyed `flatMapGroupsWithState` sees them in arrival order and
  * the watermark gives the correctness argument: when the watermark
  * passes a frame's event time, every admissible event at or before
  * that instant has already been admitted (later ones would be dropped
  * as late), so the frame's label is final — the same completion
  * contract as [[StreamingGraphs]]/[[StreamingFormations]].
  *
  * State per game = the pending-frame buffer (bounded by the lateness
  * window, like the other streaming operators) plus the event list,
  * which is PRUNED on every emission to the events still ahead of the
  * emitted frontier plus the single latest behind it — so it holds
  * O(events-per-lateness-window) entries, not the whole match.
  *
  * Frames that arrive after the watermark already passed their
  * timestamp (i.e. past the declared lateness) see only the pruned
  * event state — standard late-data semantics; the engine's late
  * filter drops most such rows before they reach the operator.
  */
object StreamingEventLabels {

  /** A frame key on the events' absolute clock (for Sportec, abs =
    * section start + period-relative timestamp — see
    * [[graft.tracking.SportecEvents.sectionStarts]]). */
  final case class FrameTick(
      game_id: String, period_id: Int, frame_id: Long, abs_ts: Long)

  final case class EventTick(
      game_id: String, abs_ts: Long, event_id: String, event_type: String,
      event_team_id: String, event_player_id: String)

  final case class LabeledFrame(
      game_id: String, period_id: Int, frame_id: Long,
      event_id: String, event_type: String,
      event_team_id: String, event_player_id: String)

  final case class AttachState(events: Seq[EventTick], pending: Seq[FrameTick])

  /** Internal union-row shape (public only because Dataset encoders
    * generate constructor calls that cannot target private classes). */
  final case class Tagged(
      game_id: String, abs_ts: Long, is_frame: Boolean,
      period_id: Int, frame_id: Long,
      event_id: String, event_type: String,
      event_team_id: String, event_player_id: String)

  /** Labeled frame stream; frames emit when the watermark passes their
    * absolute time. Events at a frame's exact instant label it
    * (at-or-before is inclusive); equal-timestamp events tie-break on
    * event id, like the batch attach. */
  def attach(
      frames: Dataset[FrameTick],
      events: Dataset[EventTick],
      lateness: String = "10 seconds"): Dataset[LabeledFrame] = {
    import frames.sparkSession.implicits._
    val taggedFrames = frames.map(f =>
      Tagged(f.game_id, f.abs_ts, is_frame = true, f.period_id, f.frame_id,
        null, null, null, null))
    val taggedEvents = events.map(e =>
      Tagged(e.game_id, e.abs_ts, is_frame = false, 0, 0L,
        e.event_id, e.event_type, e.event_team_id, e.event_player_id))

    taggedFrames.union(taggedEvents)
      .withColumn("event_time", timestamp_micros(col("abs_ts")))
      .withWatermark("event_time", lateness)
      .as[Tagged]
      .groupByKey(_.game_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (game: String, it: Iterator[Tagged], state: GroupState[AttachState]) => {
          val st = state.getOption.getOrElse(AttachState(Nil, Nil))
          val (newFrames, newEvents) = it.toSeq.partition(_.is_frame)
          val allEvents = (st.events ++ newEvents.map(t =>
            EventTick(t.game_id, t.abs_ts, t.event_id, t.event_type,
              t.event_team_id, t.event_player_id)))
            .sortBy(e => (e.abs_ts, e.event_id))
          val pending = st.pending ++ newFrames.map(t =>
            FrameTick(t.game_id, t.period_id, t.frame_id, t.abs_ts))
          val wm = state.getCurrentWatermarkMs()
          // micros-exact finality: a frame is final only when its FULL
          // timestamp is strictly below the watermark — comparing
          // ms-truncated values would emit frames up to 999us early,
          // inside the window where an admissible event can still
          // arrive
          val (ready, still) = pending.partition(_.abs_ts < wm * 1000L)

          val out = ready.sortBy(f => (f.abs_ts, f.frame_id)).map { f =>
            // latest event at or before the frame (events pre-sorted)
            val latest = allEvents.takeWhile(_.abs_ts <= f.abs_ts).lastOption
            LabeledFrame(game, f.period_id, f.frame_id,
              latest.map(_.event_id).orNull, latest.map(_.event_type).orNull,
              latest.map(_.event_team_id).orNull, latest.map(_.event_player_id).orNull)
          }

          // prune events behind BOTH the emitted frontier and the
          // watermark (any future admissible frame has ts >= watermark,
          // so of the events at-or-below it only the latest can ever be
          // an as-of label) — bounds event state by the lateness window
          // even when the frame stream stalls
          val frontier = math.max(
            if (ready.nonEmpty) ready.map(_.abs_ts).max else Long.MinValue,
            wm * 1000L - 1L)
          val (behind, ahead) = allEvents.partition(_.abs_ts <= frontier)
          state.update(AttachState(behind.lastOption.toSeq ++ ahead, still))

          // re-arm only while frames are pending: an idle game keeps
          // its (tiny) as-of state but is not re-invoked on every
          // subsequent watermark advance
          if (still.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(still.map(_.abs_ts / 1000L).min, wm + 1))
          out.iterator
        })
  }
}
