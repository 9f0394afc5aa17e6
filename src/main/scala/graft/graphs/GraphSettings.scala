package graft.graphs

import graft.tracking.PitchDimensions

/** Graph conversion settings. Mirrors the reference's
  * `DefaultGraphSettings`/`GraphSettingsPolars`
  * (`unravel/utils/objects/default_graph_settings.py:13-117`,
  * `unravel/soccer/graphs/graph_settings.py:13-67`). */
final case class GraphSettings(
    adjacencyMatrixType: String = GraphSettings.SplitByTeam,
    adjacencyMatrixConnectType: String = GraphSettings.ConnectBall,
    defendingTeamNodeValue: Double = 0.1,
    pad: Boolean = true,
    pitch: PitchDimensions = PitchDimensions(),
    maxPlayerSpeed: Double = 12.0,
    maxBallSpeed: Double = 28.0,
    goalkeeperId: String = "GK") {
  import GraphSettings._
  require(Set(Dense, DenseAp, DenseDp, SplitByTeam, Delaunay)(adjacencyMatrixType),
    "Please specify an existing AdjacencyMatrixType...")
  require(Set(ConnectBall, ConnectBallCarrier, ConnectNone)(adjacencyMatrixConnectType),
    "Please specify an existing AdjacenyMatrixConnectType...")
  // Delaunay: the reference's active polars path raises here
  // (adjacency_matrix_pl.py:32-33), but its legacy numpy path defines
  // the semantics (adjacency_matrix.py:60-124) and we implement them
  // (graphs/Delaunay.scala) — a strict superset of the reference.

  /** √(L²+W²) — distance normalizer (`graph_settings.py:55-60`). */
  def maxDistance: Double = math.sqrt(
    pitch.length * pitch.length + pitch.width * pitch.width)
  def maxGoalDistance: Double = maxDistance
  /** (x_max, y_mid, 0) (`graph_settings.py:61-65`). */
  def goalMouth: (Double, Double, Double) = (pitch.xMax, (pitch.yMax + pitch.yMin) / 2, 0.0)

  /** Max theoretical edges under padding (`default_graph_settings.py:75-114`). */
  def maxPaddedEdges: Int = {
    val n = 11
    val ballEdges = adjacencyMatrixConnectType match {
      case ConnectBall => (n * 2) * 2 + 1
      case ConnectBallCarrier => 2 + 1
      case ConnectNone => 0
    }
    val playerEdges = adjacencyMatrixType match {
      case SplitByTeam => n * n * 2
      case Dense => (n + n) * (n + n)
      case DenseAp | DenseDp => n * n
      case _ => 0
    }
    ballEdges + playerEdges
  }
}

object GraphSettings {
  val Dense = "dense"
  val DenseAp = "dense_ap"
  val DenseDp = "dense_dp"
  val SplitByTeam = "split_by_team"
  val Delaunay = "delaunay"
  val ConnectBall = "ball"
  val ConnectBallCarrier = "ball_carrier"
  val ConnectNone = "no_connection"
}
