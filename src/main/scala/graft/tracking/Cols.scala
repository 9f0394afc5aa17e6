package graft.tracking

/** Canonical long-format tracking column names.
  * Mirrors the reference's registry (`unravel/soccer/dataset/objects.py:5-33`).
  */
object Cols {
  val GameId = "game_id"
  val PeriodId = "period_id"
  val FrameId = "frame_id"
  val Timestamp = "timestamp" // long microseconds since period start
  val ObjectId = "id"
  val TeamId = "team_id"
  val PositionName = "position_name"
  val X = "x"; val Y = "y"; val Z = "z"
  val Vx = "vx"; val Vy = "vy"; val Vz = "vz"; val Speed = "v"
  val Ax = "ax"; val Ay = "ay"; val Az = "az"; val Acceleration = "a"
  val BallState = "ball_state"
  val BallOwningTeamId = "ball_owning_team_id"
  val BallOwningPlayerId = "ball_owning_player_id"
  val IsBallCarrier = "is_ball_carrier"
  val Label = "label"
  val GraphId = "graph_id"

  /** Ball sentinel object/team id (`objects.py:1-2`). */
  val Ball = "ball"

  val ByFrame: Seq[String] = Seq(GameId, PeriodId, FrameId)
  val ByFrameTeam: Seq[String] = Seq(GameId, PeriodId, FrameId, TeamId)
  /** Reference groups by (id, period) only (single-game frames);
    * we add game_id so multi-game tables stay correct. */
  val ByObjectPeriod: Seq[String] = Seq(GameId, ObjectId, PeriodId)
}
