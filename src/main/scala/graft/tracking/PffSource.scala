package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for PFF (GradientSports) tracking — one of the
  * ~9 providers the reference accepts through kloppy
  * (`/root/reference/README.md:36`, `kloppy_polars.py:194-218`;
  * kloppy's PFF deserializer). No public fixture ships with the
  * reference, so like the Tracab/SecondSpectrum/Metrica/StatsPerform
  * readers the format contract is pinned by a synthetic round-trip
  * ([[writeTracking]] → [[load]], `PffSourceSpec`) and the DuckDB
  * oracle re-parses the same JSON text (`q_pff_load`).
  *
  * Three inputs, mirroring the provider's delivery (roster + metadata
  * + frame JSONL — PFF ships the frames bz2-compressed; Spark's text
  * codecs handle that transparently on a real feed):
  *
  *  - '''frames''' (JSONL, one frame object per line):
  *    {{{ {"frameNum":1234,"period":1,"periodGameClockTime":12.34,
  *         "homePlayers":[{"jerseyNum":7,"x":-12.3,"y":4.5},…],
  *         "awayPlayers":[…],"balls":[{"x":..,"y":..,"z":..}],
  *         "ballInPlay":true,"possession":{"team":"home"}} }}}
  *    Coordinates are meters, center origin (the canonical system
  *    already). `periodGameClockTime` is seconds since period start —
  *    exactly the canonical clock. `balls` is a list (PFF can track
  *    candidate balls); the first entry is the tracked ball, like
  *    kloppy. `ballInPlay`/`possession` are the minimal projection of
  *    PFF's game_event/possession_event stream onto the two canonical
  *    columns; a real feed derives them from the event objects.
  *  - '''roster''' (JSON array): `[{"player":{"id","nickname"},
  *    "team":{"id"},"shirtNumber":7,"positionGroupType":"DF"},…]` —
  *    the public PFF roster shape. Frames carry only jersey numbers;
  *    the roster join recovers stable player ids and position groups.
  *  - '''meta''' (single JSON object): `{"id","homeTeam":{"id","name"},
  *    "awayTeam":{"id","name"},"pitchLength","pitchWidth","fps"}` —
  *    the minimal slice of PFF's match metadata the canonical table
  *    needs.
  *
  * A player whose jersey number is missing from the roster keeps a
  * deterministic `<side>_<jerseyNum>` id rather than being dropped —
  * roster gaps are a data-quality signal, not a reason to lose frames.
  *
  * Scale shape: one splittable JSONL scan (declared schema, no
  * inference), two explodes (home/away arrays), broadcast joins for
  * the 1-row match doc and the squad-sized roster, and the shared
  * per-(game, period) STATIC_HOME_AWAY flip. No shuffle of frame data.
  */
object PffSource {
  import Cols._

  private val playerType = StructType(Seq(
    StructField("jerseyNum", IntegerType),
    StructField("x", DoubleType),
    StructField("y", DoubleType)))

  val frameSchema: StructType = StructType(Seq(
    StructField("frameNum", LongType),
    StructField("period", IntegerType),
    StructField("periodGameClockTime", DoubleType),
    StructField("homePlayers", ArrayType(playerType)),
    StructField("awayPlayers", ArrayType(playerType)),
    StructField("balls", ArrayType(StructType(Seq(
      StructField("x", DoubleType),
      StructField("y", DoubleType),
      StructField("z", DoubleType))))),
    StructField("ballInPlay", BooleanType),
    StructField("possession", StructType(Seq(
      StructField("team", StringType))))))

  /** Element schema of the roster array — Spark's JSON reader explodes
    * a top-level array into one row per element. */
  val rosterSchema: StructType = StructType(Seq(
    StructField("player", StructType(Seq(
      StructField("id", StringType),
      StructField("nickname", StringType)))),
    StructField("team", StructType(Seq(
      StructField("id", StringType)))),
    StructField("shirtNumber", IntegerType),
    StructField("positionGroupType", StringType)))

  val metaSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("homeTeam", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))),
    StructField("awayTeam", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))),
    StructField("pitchLength", DoubleType),
    StructField("pitchWidth", DoubleType),
    StructField("fps", DoubleType)))

  /** One row per match. Tiny — broadcast it. */
  def games(spark: SparkSession, metaPath: String): DataFrame =
    spark.read.option("multiLine", true).schema(metaSchema).json(metaPath)
      .select(col("id").as(GameId),
        col("homeTeam.id").as("homeTeamId"),
        col("awayTeam.id").as("awayTeamId"),
        coalesce(col("pitchLength"), lit(105.0)).as("pitch_length"),
        coalesce(col("pitchWidth"), lit(68.0)).as("pitch_width"))

  /** Squad-sized roster: (team id, jersey) → stable player id +
    * position group. Broadcast side of the frame join. */
  def roster(spark: SparkSession, rosterPath: String): DataFrame =
    spark.read.option("multiLine", true).schema(rosterSchema).json(rosterPath)
      .select(col("team.id").as("r_team"),
        col("shirtNumber").as("r_jersey"),
        col("player.id").as("r_id"),
        col("positionGroupType").as("r_pos"))
      .filter(col("r_team").isNotNull && col("r_jersey").isNotNull)

  /** Full load of one match (frames JSONL glob + roster + meta) into
    * the canonical long table (same contract as
    * [[SportecSource.load]]). */
  def load(
      spark: SparkSession,
      framesPath: String,
      rosterPath: String,
      metaPath: String,
      orientation: String = "static_home_away",
      onlyInPlay: Boolean = false): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    val gamesDf = games(spark, metaPath)
    val nGames = gamesDf.limit(2).count()
    require(nGames == 1,
      s"metaPath must describe exactly one PFF match (found " +
        s"${if (nGames == 0) "none" else "several"}: $metaPath); frame lines " +
        "carry no match id, so load one match at a time")

    val frames0 = spark.read.schema(frameSchema).json(framesPath)
      .filter(col("period").isNotNull && col("frameNum").isNotNull &&
        col("periodGameClockTime").isNotNull)
    val frames = if (onlyInPlay) frames0.filter(col("ballInPlay") === true) else frames0

    def sideRows(arrCol: String, homeSide: Boolean): DataFrame =
      frames
        .select(col("period").as(PeriodId), col("frameNum").as(FrameId),
          col("periodGameClockTime").as("clock_s"),
          col("ballInPlay"), col("possession.team").as("poss_team"),
          explode(col(arrCol)).as("p"))
        .select(col(PeriodId), col(FrameId), col("clock_s"),
          col("ballInPlay"), col("poss_team"),
          col("p.jerseyNum").as("jersey"),
          lit(homeSide).as("is_home_side"),
          col("p.x").as(X), col("p.y").as(Y), lit(0.0).as(Z),
          lit(false).as("is_ball_row"))
        // truncated/corrupt player objects drop instead of leaking
        // null coordinates (shared provider contract)
        .filter(col("jersey").isNotNull && col(X).isNotNull && col(Y).isNotNull)

    val ballRows = frames
      .select(col("period").as(PeriodId), col("frameNum").as(FrameId),
        col("periodGameClockTime").as("clock_s"),
        col("ballInPlay"), col("possession.team").as("poss_team"),
        try_element_at(col("balls"), lit(1)).as("b"))
      .select(col(PeriodId), col(FrameId), col("clock_s"),
        col("ballInPlay"), col("poss_team"),
        lit(null).cast(IntegerType).as("jersey"),
        lit(false).as("is_home_side"),
        col("b.x").as(X), col("b.y").as(Y),
        coalesce(col("b.z"), lit(0.0)).as(Z),
        lit(true).as("is_ball_row"))
      .filter(col(X).isNotNull && col(Y).isNotNull)

    val withGame = sideRows("homePlayers", homeSide = true)
      .unionByName(sideRows("awayPlayers", homeSide = false))
      .unionByName(ballRows)
      .crossJoin(broadcast(gamesDf.select(col(GameId),
        col("homeTeamId"), col("awayTeamId"))))

    val sideTeam = when(col("is_home_side"), col("homeTeamId"))
      .otherwise(col("awayTeamId"))
    val withRoster = withGame
      .join(broadcast(roster(spark, rosterPath)),
        sideTeam === col("r_team") && col("jersey") === col("r_jersey"), "left")

    val base = withRoster.select(
      col(GameId), col(PeriodId), col(FrameId),
      round(col("clock_s") * 1000000.0).cast(LongType).as(Timestamp),
      when(col("is_ball_row"), lit(Ball))
        .otherwise(coalesce(col("r_id"),
          concat(when(col("is_home_side"), lit("home_")).otherwise(lit("away_")),
            col("jersey")))).as(ObjectId),
      when(col("is_ball_row"), lit(Ball)).otherwise(sideTeam).as(TeamId),
      when(col("is_ball_row"), lit(Ball)).otherwise(col("r_pos")).as(PositionName),
      col(X), col(Y), col(Z),
      when(col("ballInPlay") === true, "alive")
        .when(col("ballInPlay") === false, "dead")
        .otherwise(lit(null).cast(StringType)).as(BallState),
      when(col("poss_team") === "home", col("homeTeamId"))
        .when(col("poss_team") === "away", col("awayTeamId"))
        .otherwise(lit(null).cast(StringType)).as(BallOwningTeamId),
      col("is_ball_row"), col("is_home_side"))

    val oriented = orientation match {
      case "raw" => base
      case _ =>
        val ltr = Orientation.detectHomeLtr(base,
          col("is_home_side"), col("is_ball_row"))
        Orientation.staticHomeAway(base, ltr)
    }
    oriented.select(GameId, PeriodId, FrameId, Timestamp, ObjectId, TeamId,
      PositionName, X, Y, Z, BallState, BallOwningTeamId)
  }

  /** Round-trip fixture generator: canonical long table → frames JSONL
    * + roster JSON + meta JSON under `outDir` (`frames/part-*.txt`,
    * `roster.json`, `meta.json`). A TEST/fixture tool for one match;
    * team ids in the input must be literal "home"/"away" (the
    * synthetic convention). Jersey numbers are assigned per team by
    * id order and the roster carries the mapping back, so
    * [[load]] recovers the original object ids exactly. */
  def writeTracking(df: DataFrame, outDir: String): Unit = {
    val isBall = col(TeamId) === Ball
    // per-team jersey assignment: dense rank of id within team; the
    // roster carries each id's position so load() round-trips
    // position_name through positionGroupType
    val ids = df.filter(!isBall)
      .groupBy(col(TeamId), col(ObjectId))
      .agg(first(col(PositionName), ignoreNulls = true).as("r_pos"))
      .withColumn("jersey", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(TeamId)).orderBy(col(ObjectId))))
    val withJersey = df.join(ids, Seq(TeamId, ObjectId), "left")

    def player = struct(col("jersey").as("jerseyNum"),
      col(X).as("x"), col(Y).as("y"))
    val lines = withJersey
      .groupBy(col(PeriodId), col(FrameId))
      .agg(
        first(col(Timestamp)).as("ts0"),
        max(when(col(BallState) === "alive", true)
          .when(col(BallState) === "dead", false)).as("ballInPlay"),
        max(when(col(BallOwningTeamId) === "home", "home")
          .when(col(BallOwningTeamId) === "away", "away")).as("poss"),
        array_sort(collect_list(when(!isBall && col(TeamId) === "home", player)))
          .as("homePlayers"),
        array_sort(collect_list(when(!isBall && col(TeamId) === "away", player)))
          .as("awayPlayers"),
        max(when(isBall, struct(col(X).as("x"), col(Y).as("y"), col(Z).as("z"))))
          .as("ball"))
    lines.select(to_json(struct(
        col(FrameId).as("frameNum"), col(PeriodId).as("period"),
        (col("ts0") / 1000000.0).as("periodGameClockTime"),
        col("homePlayers"), col("awayPlayers"),
        array(col("ball")).as("balls"),
        col("ballInPlay"),
        when(col("poss").isNotNull, struct(col("poss").as("team"))).as("possession")))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$outDir/frames")

    val rosterJson = ids.orderBy(col(TeamId), col("jersey"))
      .collect() // squad-sized: ≤ ~23 ids per team by frame physics
      .map { r =>
        val team = r.getString(0); val id = r.getString(1)
        val pos = Option(r.getString(2)).map(p => s""""$p"""").getOrElse("null")
        val j = r.getInt(3)
        s"""{"player": {"id": "$id", "nickname": "$id"}, "team": {"id": "$team"}, "shirtNumber": $j, "positionGroupType": $pos}"""
      }.mkString("[\n", ",\n", "\n]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/roster.json"), rosterJson.getBytes("UTF-8"))

    val game = df.select(col(GameId)).head().getString(0)
    val meta =
      s"""{"id": "$game", "homeTeam": {"id": "home", "name": "Home"},
         | "awayTeam": {"id": "away", "name": "Away"},
         | "pitchLength": 105.0, "pitchWidth": 68.0, "fps": 25.0}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/meta.json"), meta.getBytes("UTF-8"))
  }
}
