package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for DFL/Sportec event XML plus the
  * event→tracking label-attachment journey.
  *
  * The reference repo ships `tests/files/sportec_events.xml` and its
  * README workflows load it through kloppy's event deserializer to
  * label tracking frames/graphs; the per-player forward-fill idiom is
  * `_example_helpers/utils.py:33-38` (W6). Here both halves are
  * declarative Spark:
  *
  *  - [[events]] reads `rowTag=Event` with a declared string schema
  *    (same corruption-resilient pattern as [[SportecSource]]: strings
  *    + try_cast, no inference pass) and canonicalizes the one-child-
  *    per-event union into flat columns. Event families kloppy also
  *    maps (passes, shots, tackles, set pieces, substitutions, cards,
  *    claims) keep their team/player/recipient/outcome attributes;
  *    anything else degrades to `event_type='other'` with the shared
  *    envelope (id, time, position) — mirroring kloppy's GENERIC
  *    events.
  *  - [[attach]] stamps every tracking row with the latest event at or
  *    before the frame's absolute time: frames and events are unioned
  *    on one absolute-micros axis per game and a single
  *    `last(ignoreNulls)` window forward-fills the event columns — no
  *    range join, one game-keyed shuffle; per-game window state is one
  *    row. Events sharing a frame's exact timestamp sort before the
  *    frame, so "at or before" is inclusive.
  *
  * Timestamps: `Event@EventTime` is absolute wall-clock with zone
  * offset; the canonical tracking table carries period-relative
  * micros, so [[sectionStarts]] extracts each game section's first
  * frame wall-clock from the tracking XML (a tiny per-(game, period)
  * aggregate over the FrameSets' first array elements — no frame
  * explode) to place frames on the events' absolute axis.
  */
object SportecEvents {
  import Cols._

  // ---- declared schema (strings + try_cast; see SportecSource note on
  // PERMISSIVE-mode truncation). One struct per canonicalized child
  // element; an Event row populates exactly one of them.

  private def s(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  private val playType: StructType = s(
    "_Team" -> StringType, "_Player" -> StringType,
    "_Recipient" -> StringType, "_Evaluation" -> StringType,
    "Pass" -> s("_FreeKickLayup" -> StringType),
    "Cross" -> s("_VALUE" -> StringType))

  private def setPieceType: StructType = s(
    "_Team" -> StringType, "_GameSection" -> StringType,
    "Play" -> playType)

  val eventSchema: StructType = s(
    "_EventId" -> StringType,
    "_EventTime" -> StringType,
    "_MatchId" -> StringType,
    "_X-Position" -> StringType,
    "_Y-Position" -> StringType,
    "Play" -> playType,
    "KickOff" -> setPieceType,
    "ThrowIn" -> setPieceType,
    "FreeKick" -> setPieceType,
    "GoalKick" -> setPieceType,
    "CornerKick" -> setPieceType,
    "ShotAtGoal" -> s(
      "_Team" -> StringType, "_Player" -> StringType,
      "SuccessfulShot" -> s("_VALUE" -> StringType),
      "SavedShot" -> s("_GoalKeeper" -> StringType),
      "BlockedShot" -> s("_VALUE" -> StringType),
      "ShotWide" -> s("_VALUE" -> StringType),
      "OtherShot" -> s("_VALUE" -> StringType)),
    "TacklingGame" -> s(
      "_WinnerTeam" -> StringType, "_Winner" -> StringType,
      "_LoserTeam" -> StringType, "_Loser" -> StringType,
      "_PossessionChange" -> StringType, "_Type" -> StringType),
    "OtherBallAction" -> s("_Team" -> StringType, "_Player" -> StringType),
    "BallClaiming" -> s(
      "_Team" -> StringType, "_Player" -> StringType, "_Type" -> StringType),
    "Foul" -> s(
      "_TeamFouler" -> StringType, "_Fouler" -> StringType,
      "_TeamFouled" -> StringType, "_Fouled" -> StringType),
    "Substitution" -> s(
      "_Team" -> StringType, "_PlayerOut" -> StringType,
      "_PlayerIn" -> StringType, "_PlayingPosition" -> StringType),
    "Caution" -> s(
      "_Team" -> StringType, "_Player" -> StringType,
      "_CardColor" -> StringType, "_Reason" -> StringType),
    "FinalWhistle" -> s("_GameSection" -> StringType),
    "Delete" -> s("_VALUE" -> StringType))

  /** Families in canonicalization priority order: (event_type, struct
    * column). Exactly one struct is non-null per row in valid data. */
  private val families: Seq[String] = Seq(
    "Play", "KickOff", "ThrowIn", "FreeKick", "GoalKick", "CornerKick",
    "ShotAtGoal", "TacklingGame", "OtherBallAction", "BallClaiming",
    "Foul", "Substitution", "Caution", "FinalWhistle", "Delete")

  /** Canonical event table: one row per Event element with columns
    * `game_id, event_id, event_ts_utc (long micros since epoch),
    * event_type, sub_type, team_id, player_id, recipient_id, x, y,
    * evaluation, possession_change, section`. */
  def events(spark: SparkSession, eventsPath: String): DataFrame = {
    val raw = spark.read.format("xml")
      .option("rowTag", "Event")
      .schema(eventSchema)
      .load(eventsPath)

    def fam(n: String) = col(n)
    val eventType = families.foldRight(lit("other")) { (n, rest) =>
      when(fam(n).isNotNull, lit(n)).otherwise(rest)
    }
    // nested set-piece Play (KickOff/ThrowIn/FreeKick/GoalKick/CornerKick)
    def nested(f: String) = col(s"$f.Play")
    val setPieces = Seq("KickOff", "ThrowIn", "FreeKick", "GoalKick", "CornerKick")
    def fromPlay(attr: String) = coalesce(
      (col(s"Play.$attr") +: setPieces.map(f => nested(f).getField(attr))): _*)
    val shotResult = Seq("SuccessfulShot", "SavedShot", "BlockedShot",
      "ShotWide", "OtherShot").foldRight(lit(null).cast(StringType)) { (n, rest) =>
      when(col(s"ShotAtGoal.$n").isNotNull, lit(n)).otherwise(rest)
    }
    val passOrCross = coalesce(
      (Seq(
        when(col("Play.Pass").isNotNull, "Pass"),
        when(col("Play.Cross").isNotNull, "Cross")) ++
        setPieces.flatMap(f => Seq(
          when(nested(f).getField("Pass").isNotNull, "Pass"),
          when(nested(f).getField("Cross").isNotNull, "Cross")))): _*)

    raw.select(
      col("_MatchId").as(GameId),
      col("_EventId").as("event_id"),
      unix_micros(col("_EventTime").try_cast(TimestampType)).as("event_ts_utc"),
      eventType.as("event_type"),
      coalesce(passOrCross, shotResult).as("sub_type"),
      coalesce((fromPlay("_Team") +: setPieces.map(f => col(s"$f._Team"))) ++ Seq(
        col("ShotAtGoal._Team"), col("TacklingGame._WinnerTeam"),
        col("OtherBallAction._Team"), col("BallClaiming._Team"),
        col("Foul._TeamFouler"), col("Substitution._Team"),
        col("Caution._Team")): _*).as(TeamId),
      coalesce(fromPlay("_Player"),
        col("ShotAtGoal._Player"), col("TacklingGame._Winner"),
        col("OtherBallAction._Player"), col("BallClaiming._Player"),
        col("Foul._Fouler"), col("Substitution._PlayerOut"),
        col("Caution._Player")).as("player_id"),
      coalesce(fromPlay("_Recipient"), col("TacklingGame._Loser"),
        col("Foul._Fouled"), col("Substitution._PlayerIn")).as("recipient_id"),
      col("`_X-Position`").try_cast(DoubleType).as(X),
      col("`_Y-Position`").try_cast(DoubleType).as(Y),
      fromPlay("_Evaluation").as("evaluation"),
      col("TacklingGame._PossessionChange").try_cast(BooleanType)
        .as("possession_change"),
      coalesce(col("KickOff._GameSection"), col("FinalWhistle._GameSection"))
        .as("section"))
      .filter(col("event_id").isNotNull)
  }

  /** Per-(game, period) wall-clock of the section's first frame, long
    * micros since epoch — the bridge between the canonical table's
    * period-relative timestamps and the events' absolute axis. Reads
    * only each FrameSet's FIRST frame element (no explode): a tiny
    * aggregate, broadcast it. */
  def sectionStarts(spark: SparkSession, trackingPath: String): DataFrame = {
    val first = SportecSource.frameSets(spark, trackingPath)
      .select(
        col("_MatchId").as(GameId),
        SportecSource.sectionToPeriod(col("_GameSection")).as(PeriodId),
        try_element_at(col("Frame"), lit(1)).getField("_N").try_cast(LongType).as("n0"),
        unix_micros(try_element_at(col("Frame"), lit(1)).getField("_T")
          .try_cast(TimestampType)).as("t0"))
      .filter(col("n0").isNotNull && col("t0").isNotNull)
    first.groupBy(col(GameId), col(PeriodId))
      .agg(min(struct(col("n0"), col("t0"))).as("f"))
      .select(col(GameId), col(PeriodId), col("f.t0").as("section_start_utc"))
  }

  /** W6 label journey: stamp every tracking row with the latest event
    * at or before the frame's absolute time. Adds `event_id,
    * event_type, event_team_id, event_player_id` (null before the
    * first event of a game).
    *
    * Shape: distinct frame keys and events union onto one absolute
    * axis; one `last(ignoreNulls)` window per game forward-fills; one
    * broadcast join re-attaches to the full row set. The window
    * partitions by game only — a full match is ~135k frame keys + ~1.6k
    * events per game, and state is one row, so the single-task-per-game
    * ceiling is the same one the per-game kinematics windows already
    * set. */
  def attach(
      tracking: DataFrame,
      events: DataFrame,
      sectionStarts: DataFrame): DataFrame = {
    val frames = tracking
      .select(col(GameId), col(PeriodId), col(FrameId), col(Timestamp))
      .distinct()
      .join(broadcast(sectionStarts), Seq(GameId, PeriodId))
      .select(col(GameId), col(PeriodId), col(FrameId),
        (col("section_start_utc") + col(Timestamp)).as("__abs"),
        lit(1).as("__isf"),
        lit(null).cast(StringType).as("__eid"),
        lit(null).cast(StringType).as("__etype"),
        lit(null).cast(StringType).as("__eteam"),
        lit(null).cast(StringType).as("__eplayer"))
    val evs = events.select(col(GameId),
      lit(null).cast(IntegerType).as(PeriodId),
      lit(null).cast(LongType).as(FrameId),
      col("event_ts_utc").as("__abs"), lit(0).as("__isf"),
      col("event_id").as("__eid"), col("event_type").as("__etype"),
      col(TeamId).as("__eteam"), col("player_id").as("__eplayer"))

    // events sort before frames at the same instant (inclusive at-or-
    // before); equal-timestamp events tie-break on event id so the
    // fill is deterministic across engines
    val w = Window.partitionBy(col(GameId))
      .orderBy(col("__abs"), col("__isf"), coalesce(col("__eid"), lit("")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = frames.unionByName(evs)
      .select(col(GameId), col(PeriodId), col(FrameId), col("__isf"),
        last(col("__eid"), ignoreNulls = true).over(w).as("event_id"),
        last(col("__etype"), ignoreNulls = true).over(w).as("event_type"),
        last(col("__eteam"), ignoreNulls = true).over(w).as("event_team_id"),
        last(col("__eplayer"), ignoreNulls = true).over(w).as("event_player_id"))
      .filter(col("__isf") === 1)
      .drop("__isf")

    // no broadcast hint: filled is frame-cardinality (big over a
    // season) — the frame-key equi-join shuffles both sides on the key
    // they already share downstream, and AQE still broadcasts when one
    // match's worth actually is small
    tracking.join(filled, Seq(GameId, PeriodId, FrameId), "left")
  }
}
