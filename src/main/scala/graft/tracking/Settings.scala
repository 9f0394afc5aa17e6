package graft.tracking

/** Pitch geometry (meters, origin at pitch center).
  * Reference: `unravel/utils/objects/default_settings.py:33-64`. */
final case class PitchDimensions(
    length: Double = 105.0,
    width: Double = 68.0) {
  def xMin: Double = -length / 2
  def xMax: Double = length / 2
  def yMin: Double = -width / 2
  def yMax: Double = width / 2
  /** Pitch diagonal — the max-distance normalizer used by features. */
  def maxDistance: Double = math.sqrt(length * length + width * width)
}

/** Engine settings (speed caps in m/s, accelerations in m/s²).
  * Defaults mirror `default_settings.py:33-64` and
  * `kloppy_polars.py:156-186`. Broadcast-safe plain case class. */
final case class TrackingSettings(
    pitch: PitchDimensions = PitchDimensions(),
    homeTeamId: Option[String] = None,
    awayTeamId: Option[String] = None,
    maxPlayerSpeed: Double = 12.0,
    maxBallSpeed: Double = 28.0,
    maxPlayerAcceleration: Double = 6.0,
    maxBallAcceleration: Double = 13.5,
    ballCarrierThreshold: Double = 25.0,
    frameRate: Int = 25)

/** American-football pitch: 120x53.3 yards, end zone 10 from x_max
  * (`default_settings.py:14-31`). */
final case class AmericanFootballPitch(
    length: Double = 120.0,
    width: Double = 53.3) {
  def endZone: Double = length - 10.0
}
