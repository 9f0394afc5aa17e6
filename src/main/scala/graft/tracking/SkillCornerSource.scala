package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for SkillCorner broadcast-tracking JSON — the
  * reference's second real-world provider (S1).
  *
  * The reference loads SkillCorner through kloppy
  * (`tests/test_soccer.py:120-133`: `skillcorner.load(raw_data=
  * structured_data, meta_data=match_data, ...)`) and then canonicalizes
  * via `KloppyPolarsDataset` exactly as for Sportec. A match ships as
  * two files (SkillCorner's public open-data layout,
  * github.com/SkillCorner/opendata):
  *  - `match_data.json` — one JSON object: teams, squad (players with
  *    `trackable_object` tracking ids and `player_role` position
  *    codes), the ball's trackable id, pitch size;
  *  - `structured_data.json[.gz]` — one JSON array of frames:
  *    `{frame, period, timestamp "H:MM:SS.mmm", possession:
  *    {trackable_object, group}, data: [{track_id, trackable_object,
  *    x, y, z?}, ...]}`, 10 fps, meters, center origin.
  *
  * Both are read with the built-in JSON source under declared schemas
  * (`multiLine` — one task per match file; a season scales across
  * files, and each file is frame-exploded immediately). Output is the
  * same canonical long contract as [[SportecSource.load]].
  *
  * Mirrored kloppy semantics: frames with a null period or no tracked
  * objects are dropped (`include_empty_frames=False`, the reference's
  * setting); timestamps are rebased to the period start (first frame
  * of the period, same rule as Sportec's section offsets); possession
  * `group` ("home team"/"away team") becomes `ball_owning_team_id`;
  * anonymous detections (no `trackable_object`) and referees (ids not
  * in the squad) are dropped; STATIC_HOME_AWAY orientation via
  * [[Orientation.staticHomeAway]]. SkillCorner publishes no ball-state
  * channel, so `ball_state` is "alive" when a possession group is
  * recorded and null otherwise (kloppy leaves it null too; the
  * downstream possession filter keys on `ball_owning_team_id`).
  */
object SkillCornerSource {
  import Cols._

  // ---- declared schemas

  private val teamType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("short_name", StringType),
    StructField("acronym", StringType)))

  private val roleType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("acronym", StringType)))

  private val playerType = StructType(Seq(
    StructField("id", LongType),
    StructField("team_id", LongType),
    StructField("trackable_object", LongType),
    StructField("number", LongType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("player_role", roleType),
    StructField("start_time", StringType),
    StructField("end_time", StringType)))

  val matchDataSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("home_team", teamType),
    StructField("away_team", teamType),
    StructField("ball", StructType(Seq(StructField("trackable_object", LongType)))),
    StructField("pitch_length", DoubleType),
    StructField("pitch_width", DoubleType),
    StructField("players", ArrayType(playerType))))

  private val detectionType = StructType(Seq(
    StructField("track_id", LongType),
    StructField("trackable_object", LongType),
    StructField("is_visible", BooleanType),
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("z", DoubleType)))

  val structuredSchema: StructType = StructType(Seq(
    StructField("frame", LongType),
    StructField("period", IntegerType),
    StructField("timestamp", StringType),
    StructField("possession", StructType(Seq(
      StructField("trackable_object", LongType),
      StructField("group", StringType)))),
    StructField("data", ArrayType(detectionType))))

  /** One row per match: ids, names, ball trackable id, pitch size. */
  def games(spark: SparkSession, matchDataPath: String): DataFrame =
    spark.read.option("multiLine", true).schema(matchDataSchema)
      .json(matchDataPath)
      .select(
        col("id").cast(StringType).as(GameId),
        col("home_team.id").cast(StringType).as("home_team_id"),
        col("away_team.id").cast(StringType).as("away_team_id"),
        col("home_team.name").as("home_team_name"),
        col("away_team.name").as("away_team_name"),
        col("ball.trackable_object").as("ball_trackable_object"),
        coalesce(col("pitch_length"), lit(105.0)).as("pitch_length"),
        coalesce(col("pitch_width"), lit(68.0)).as("pitch_width"))

  /** One row per (match, player), keyed by the tracking-side
    * `trackable_object` id. `position_name` is the `player_role`
    * acronym (GK/LCB/RM/... — already kloppy-style); SUB (bench) rows
    * keep their acronym so callers can filter. */
  def roster(spark: SparkSession, matchDataPath: String): DataFrame =
    spark.read.option("multiLine", true).schema(matchDataSchema)
      .json(matchDataPath)
      .select(
        col("id").cast(StringType).as(GameId),
        col("home_team.id").cast(StringType).as("home_team_id"),
        explode(col("players")).as("p"))
      .select(
        col(GameId),
        col("p.trackable_object").cast(StringType).as(ObjectId),
        col("p.id").as("player_id"),
        col("p.team_id").cast(StringType).as(TeamId),
        (col("p.team_id").cast(StringType) === col("home_team_id")).as("is_home"),
        when(col("p.player_role.acronym") === "SUB", lit(null).cast(StringType))
          .otherwise(col("p.player_role.acronym")).as(PositionName),
        col("p.player_role.acronym").as("role_acronym"),
        col("p.number").as("shirt_number"),
        col("p.last_name").as("name"),
        col("p.start_time").isNotNull.as("starting"))

  /** "H:MM:SS.ff" → micros. SkillCorner clock strings vary in hour
    * digits and fraction length, so split-and-scale beats a strict
    * datetime pattern; stays in codegen (no UDF). try_element_at: a
    * malformed short clock ("0:00") nulls instead of failing the scan
    * (Spark 4 element_at throws on out-of-bounds); try_cast: a
    * non-numeric component ("a:00:00.0") likewise nulls the clock
    * instead of throwing under ANSI mode. */
  private def clockMicros(c: org.apache.spark.sql.Column) = {
    val p = split(c, ":")
    ((try_element_at(p, lit(1)).try_cast(LongType) * 3600L +
      try_element_at(p, lit(2)).try_cast(LongType) * 60L)
      .cast("double") * 1000000.0 +
      try_element_at(p, lit(3)).try_cast("double") * 1000000.0).cast(LongType)
  }

  /** Full load of one match (tracking + match data) into the canonical
    * long table. See object scaladoc for the mirrored semantics. */
  def load(
      spark: SparkSession,
      structuredPath: String,
      matchDataPath: String,
      includeEmptyFrames: Boolean = false,
      orientation: String = "static_home_away"): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")

    val gamesDf = games(spark, matchDataPath)
    val rosterDf = roster(spark, matchDataPath)
      .select(col(GameId).as("r_game"), col(ObjectId).as("r_id"),
        col(TeamId).as("r_team"), col("is_home"), col(PositionName).as("r_pos"))

    val frames0 = spark.read.option("multiLine", true).schema(structuredSchema)
      .json(structuredPath)
    val frames =
      if (includeEmptyFrames) frames0
      else frames0.filter(col("period").isNotNull && size(col("data")) > 0)

    val exploded = frames
      .select(
        col("frame").as(FrameId),
        col("period").as(PeriodId),
        clockMicros(col("timestamp")).as("clock"),
        col("possession.group").as("poss_group"),
        explode(col("data")).as("d"))
      .filter(col("d.trackable_object").isNotNull) // anonymous tracks dropped
      // a frame whose clock failed to parse has no usable time — drop
      // it like the corrupt-coordinate paths in the other readers
      .filter(col("clock").isNotNull)
      .select(col(FrameId), col(PeriodId), col("clock"), col("poss_group"),
        col("d.trackable_object").cast(StringType).as("to_id"),
        col("d.x").as(X), col("d.y").as(Y),
        coalesce(col("d.z"), lit(0.0)).as(Z))

    // single-match files: stamp game/team ids from the (1-row) match
    // data. The crossJoin is only sound with exactly one match row — a
    // glob/directory of several match_data files would silently
    // duplicate every frame per match with wrong game_id stamping, so
    // fail fast instead (the structured frames carry no match id to
    // key a real join on). The count is a driver-side action on a tiny
    // metadata JSON.
    val nGames = gamesDf.limit(2).count()
    require(nGames == 1,
      s"matchDataPath must resolve to exactly one SkillCorner match_data " +
        s"document (found ${if (nGames == 0) "none" else "several"}: " +
        s"$matchDataPath); load one match at a time and union the results")
    val withGame = exploded.crossJoin(broadcast(
      gamesDf.select(col(GameId), col("home_team_id"), col("away_team_id"),
        col("ball_trackable_object").cast(StringType).as("ball_to"))))

    // period-start rebase: tiny per-(game, period) aggregate, broadcast
    val offsets = withGame.groupBy(col(GameId), col(PeriodId))
      .agg(min(col("clock")).as("clock0"))

    val joined = withGame
      .join(broadcast(offsets), Seq(GameId, PeriodId))
      .join(broadcast(rosterDf),
        col(GameId) === col("r_game") && col("to_id") === col("r_id"), "left")
      .filter(col("to_id") === col("ball_to") || col("r_team").isNotNull) // referees dropped

    val isBallRow = col("to_id") === col("ball_to")
    val base = joined.select(
      col(GameId), col(PeriodId), col(FrameId),
      (col("clock") - col("clock0")).cast(LongType).as(Timestamp),
      when(isBallRow, lit(Ball)).otherwise(col("to_id")).as(ObjectId),
      when(isBallRow, lit(Ball)).otherwise(col("r_team")).as(TeamId),
      when(isBallRow, lit(Ball)).otherwise(col("r_pos")).as(PositionName),
      col(X), col(Y),
      when(isBallRow, col(Z)).otherwise(lit(0.0)).as(Z),
      when(col("poss_group").isNotNull, "alive")
        .otherwise(lit(null).cast(StringType)).as(BallState),
      when(col("poss_group") === "home team", col("home_team_id"))
        .when(col("poss_group") === "away team", col("away_team_id"))
        .otherwise(lit(null).cast(StringType)).as(BallOwningTeamId),
      isBallRow.as("is_ball_row"), col("is_home"))

    val oriented = orientation match {
      case "raw" => base
      case _ =>
        // detect from the pre-join relation to keep source scans
        // bounded (see Orientation scaladoc / PlanAuditSpec)
        val ltrSrc = withGame.filter(col("to_id") =!= col("ball_to"))
          .join(broadcast(rosterDf),
            col(GameId) === col("r_game") && col("to_id") === col("r_id"))
        val ltr = Orientation.detectHomeLtr(ltrSrc, col("is_home"), lit(false))
        Orientation.staticHomeAway(base, ltr)
    }
    oriented.select(GameId, PeriodId, FrameId, Timestamp, ObjectId, TeamId,
      PositionName, X, Y, Z, BallState, BallOwningTeamId)
  }
}
