package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for SecondSpectrum JSONL tracking — the
  * provider whose coordinate system (center origin, meters) the
  * reference's canonical table is literally defined in
  * (`kloppy_polars.py:194-218` requests
  * `coordinates="secondspectrum"` for every provider).
  *
  * Frame lines (public format, one JSON object per line, as consumed
  * by kloppy's `SecondSpectrumDeserializer`):
  * {{{ {"period":1,"frameIdx":1000,"gameClock":12.34,"wallClock":...,
  *      "live":true,"lastTouch":"home",
  *      "homePlayers":[{"playerId":"p1","number":7,"xyz":[x,y,z],"speed":s},…],
  *      "awayPlayers":[…],"ball":{"xyz":[x,y,z],"speed":s}} }}}
  * `period` and `gameClock` (seconds since period start) ride every
  * line, so no period-range metadata is needed; `lastTouch` maps to
  * the owning team and `live` to ball_state, like kloppy.
  *
  * Metadata: a compact single-object JSON
  * `{"gameId","homeTeamId","awayTeamId","pitchLength","pitchWidth",
  *   "players":[{"playerId","teamId","position"}…]}` (the roster is
  * optional — positions join on when present). The provider's full
  * metadata variants (XML or JSON) carry strictly more; this is the
  * minimal contract the canonical table needs, documented here
  * because no public fixture ships with the reference. The format is
  * pinned by the synthetic round-trip in `SecondSpectrumSourceSpec`
  * and the `q_2spectrum_load` oracle, where DuckDB re-reads the same
  * JSONL with its own reader.
  *
  * Scale shape: one splittable JSONL scan (declared schema, no
  * inference), two explodes (home/away player arrays), broadcast
  * joins for the 1-row match doc and squad-sized roster, and the
  * shared per-(game, period) orientation flip. No shuffle of frame
  * data.
  */
object SecondSpectrumSource {
  import Cols._

  private val playerType = StructType(Seq(
    StructField("playerId", StringType),
    StructField("number", IntegerType),
    StructField("xyz", ArrayType(DoubleType)),
    StructField("speed", DoubleType)))

  val frameSchema: StructType = StructType(Seq(
    StructField("period", IntegerType),
    StructField("frameIdx", LongType),
    StructField("gameClock", DoubleType),
    StructField("wallClock", LongType),
    StructField("live", BooleanType),
    StructField("lastTouch", StringType),
    StructField("homePlayers", ArrayType(playerType)),
    StructField("awayPlayers", ArrayType(playerType)),
    StructField("ball", StructType(Seq(
      StructField("xyz", ArrayType(DoubleType)),
      StructField("speed", DoubleType))))))

  val metaSchema: StructType = StructType(Seq(
    StructField("gameId", StringType),
    StructField("homeTeamId", StringType),
    StructField("awayTeamId", StringType),
    StructField("pitchLength", DoubleType),
    StructField("pitchWidth", DoubleType),
    StructField("players", ArrayType(StructType(Seq(
      StructField("playerId", StringType),
      StructField("teamId", StringType),
      StructField("position", StringType)))))))

  /** One row per match. Tiny — broadcast it. */
  def games(spark: SparkSession, metaPath: String): DataFrame =
    spark.read.option("multiLine", true).schema(metaSchema).json(metaPath)
      .select(col("gameId").as(GameId),
        col("homeTeamId"), col("awayTeamId"),
        coalesce(col("pitchLength"), lit(105.0)).as("pitch_length"),
        coalesce(col("pitchWidth"), lit(68.0)).as("pitch_width"),
        col("players"))

  /** Full load of one match: JSONL glob + metadata JSON → canonical
    * long table (same contract as [[SportecSource.load]]). */
  def load(
      spark: SparkSession,
      jsonlPath: String,
      metaPath: String,
      orientation: String = "static_home_away",
      onlyAlive: Boolean = false): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    val gamesDf = games(spark, metaPath)
    val nGames = gamesDf.limit(2).count()
    require(nGames == 1,
      s"metaPath must describe exactly one SecondSpectrum match (found " +
        s"${if (nGames == 0) "none" else "several"}: $metaPath); frame lines " +
        "carry no match id, so load one match at a time")

    // kloppy's SecondSpectrumDeserializer defaults only_alive=True;
    // ours defaults false so dead-ball analysis stays possible
    val frames0 = spark.read.schema(frameSchema).json(jsonlPath)
      .filter(col("period").isNotNull && col("frameIdx").isNotNull)
    val frames = if (onlyAlive) frames0.filter(col("live") === true) else frames0

    def sideRows(arrCol: String, homeSide: Boolean): DataFrame =
      frames
        .select(col("period").as(PeriodId), col("frameIdx").as(FrameId),
          col("gameClock"), col("live"), col("lastTouch"),
          explode(col(arrCol)).as("p"))
        .select(col(PeriodId), col(FrameId), col("gameClock"),
          col("live"), col("lastTouch"),
          col("p.playerId").as(ObjectId),
          lit(homeSide).as("is_home_side"),
          try_element_at(col("p.xyz"), lit(1)).as(X),
          try_element_at(col("p.xyz"), lit(2)).as(Y),
          lit(0.0).as(Z),
          lit(false).as("is_ball_row"))
        // corrupt records with missing/truncated xyz drop instead of
        // leaking null coordinates (wide-CSV melt contract)
        .filter(col(X).isNotNull && col(Y).isNotNull)

    val ballRows = frames
      .filter(col("ball").isNotNull && col("ball.xyz").isNotNull)
      .select(col("period").as(PeriodId), col("frameIdx").as(FrameId),
        col("gameClock"), col("live"), col("lastTouch"),
        lit(Ball).as(ObjectId),
        lit(false).as("is_home_side"),
        try_element_at(col("ball.xyz"), lit(1)).as(X),
        try_element_at(col("ball.xyz"), lit(2)).as(Y),
        coalesce(try_element_at(col("ball.xyz"), lit(3)), lit(0.0)).as(Z),
        lit(true).as("is_ball_row"))
      .filter(col(X).isNotNull && col(Y).isNotNull)

    val roster = gamesDf
      .select(col(GameId).as("r_game"), explode_outer(col("players")).as("p"))
      .select(col("r_game"), col("p.playerId").as("r_id"),
        col("p.position").as("r_pos"))

    val withGame = sideRows("homePlayers", homeSide = true)
      .unionByName(sideRows("awayPlayers", homeSide = false))
      .unionByName(ballRows)
      .crossJoin(broadcast(gamesDf.select(col(GameId),
        col("homeTeamId"), col("awayTeamId"))))
      .join(broadcast(roster),
        col(GameId) === col("r_game") && col(ObjectId) === col("r_id"), "left")

    val base = withGame.select(
      col(GameId), col(PeriodId), col(FrameId),
      round(col("gameClock") * 1000000.0).cast(LongType).as(Timestamp),
      col(ObjectId),
      when(col("is_ball_row"), lit(Ball))
        .when(col("is_home_side"), col("homeTeamId"))
        .otherwise(col("awayTeamId")).as(TeamId),
      when(col("is_ball_row"), lit(Ball)).otherwise(col("r_pos")).as(PositionName),
      col(X), col(Y), col(Z),
      when(col("live") === true, "alive")
        .when(col("live") === false, "dead")
        .otherwise(lit(null).cast(StringType)).as(BallState),
      when(col("lastTouch") === "home", col("homeTeamId"))
        .when(col("lastTouch") === "away", col("awayTeamId"))
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

  /** Round-trip fixture generator: canonical long table → JSONL +
    * metadata JSON under `outDir` (`frames/part-*.txt`, `meta.json`).
    * A TEST/fixture tool for one match; team ids in the input must be
    * literal "home"/"away" (the synthetic convention) — they become
    * the side arrays and the meta ids. */
  def writeJsonl(df: DataFrame, outDir: String): Unit = {
    val isBall = col(TeamId) === Ball
    def player = struct(col(ObjectId).as("playerId"),
      array(col(X), col(Y), col(Z)).as("xyz"))
    val lines = df
      .groupBy(col(PeriodId), col(FrameId))
      .agg(
        first(col(Timestamp)).as("ts0"),
        max(when(col(BallState) === "alive", true)
          .when(col(BallState) === "dead", false)).as("live"),
        max(when(col(BallOwningTeamId) === "home", "home")
          .when(col(BallOwningTeamId) === "away", "away")).as("lastTouch"),
        array_sort(collect_list(when(!isBall && col(TeamId) === "home", player))).as("homePlayers"),
        array_sort(collect_list(when(!isBall && col(TeamId) === "away", player))).as("awayPlayers"),
        max(when(isBall, struct(array(col(X), col(Y), col(Z)).as("xyz")))).as("ball"))
    val jsonLines = lines.select(to_json(struct(
      col(PeriodId).as("period"), col(FrameId).as("frameIdx"),
      (col("ts0") / 1000000.0).as("gameClock"),
      col("live"), col("lastTouch"),
      col("homePlayers"), col("awayPlayers"), col("ball"))).as("value"))
    jsonLines.coalesce(1).write.mode("overwrite").text(s"$outDir/frames")

    val game = df.select(col(GameId)).head().getString(0)
    val meta =
      s"""{"gameId": "$game", "homeTeamId": "home", "awayTeamId": "away",
         | "pitchLength": 105.0, "pitchWidth": 68.0}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/meta.json"), meta.getBytes("UTF-8"))
  }
}
