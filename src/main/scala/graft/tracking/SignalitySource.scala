package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for Signality tracking — the last of the ~9
  * providers the reference accepts through kloppy
  * (`/root/reference/README.md:36`, `kloppy_polars.py:194-218`;
  * kloppy's Signality deserializer, alpha). No public fixture ships
  * with the reference, so like the other fixture-less providers the
  * format contract is pinned by a synthetic round-trip
  * ([[writeFeeds]] → [[load]], `SignalitySourceSpec`) and the DuckDB
  * oracle re-parses the same JSON (`q_signality_load`).
  *
  * Signality delivers one raw-data JSON document PER PERIOD (a
  * top-level array of frame objects — Spark's JSON reader maps a
  * top-level array to one row per element under multiLine), plus a
  * match-info document with the rosters:
  *
  *  - '''raw feed''' (`p1.json`, `p2.json`; one frame object per
  *    element):
  *    {{{ {"utc_time":1698000000000,
  *         "ball":{"position":[x,y,z]},
  *         "home_team":[{"jersey_number":7,"position":[x,y]},…],
  *         "away_team":[…]} }}}
  *  - '''meta''' (single object): `{"id","team_home_name",
  *    "team_away_name","team_home_players":[{"jersey_number","name"}],
  *    "team_away_players":[…],"pitch_size":[length,width]}` — the
  *    minimal slice of Signality's match-info + venue documents the
  *    canonical table needs.
  *
  * Coordinates are meters with a CORNER origin (`[0..length] ×
  * [0..width]`); the loader centers them onto the canonical
  * center-origin system (`x - length/2`, `y - width/2`). `utc_time`
  * is epoch milliseconds; the loader rebases it per (game, period) to
  * canonical micros-since-period-start. Frames carry no frame
  * numbers: frame ids are derived from `utc_time` at the capture rate
  * (`fps`, default 25), which makes them globally monotone across
  * periods (the canonical-schema invariant the streaming/EFPI folds
  * rely on). Frames identify players by (side, jersey_number); the
  * roster join recovers the stable `name` id. The alpha feed carries
  * no position roles or ball-status stream, so `position_name` (for
  * players), `ball_state` and `ball_owning_team_id` are null, as with
  * kloppy.
  *
  * Scale shape: one declared-schema multiLine scan per period feed
  * (Spark parallelizes by file; a two-file match is bounded by the
  * bigger period either way), two explodes (home/away arrays),
  * broadcast joins for the 1-row match doc and squad-sized roster,
  * and the shared per-(game, period) STATIC_HOME_AWAY flip. No
  * shuffle of frame data.
  */
object SignalitySource {
  import Cols._

  private val playerType = StructType(Seq(
    StructField("jersey_number", IntegerType),
    StructField("position", ArrayType(DoubleType))))

  /** Element schema of a period feed — the reader explodes the
    * top-level array into one row per frame. */
  val frameSchema: StructType = StructType(Seq(
    StructField("utc_time", LongType),
    StructField("ball", StructType(Seq(
      StructField("position", ArrayType(DoubleType))))),
    StructField("home_team", ArrayType(playerType)),
    StructField("away_team", ArrayType(playerType))))

  val metaSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("team_home_name", StringType),
    StructField("team_away_name", StringType),
    StructField("team_home_players", ArrayType(StructType(Seq(
      StructField("jersey_number", IntegerType),
      StructField("name", StringType))))),
    StructField("team_away_players", ArrayType(StructType(Seq(
      StructField("jersey_number", IntegerType),
      StructField("name", StringType))))),
    StructField("pitch_size", ArrayType(DoubleType))))

  /** One row per match. Tiny — broadcast it. Team "ids" are the
    * Signality team names (the document carries no separate id). */
  def games(spark: SparkSession, metaPath: String): DataFrame =
    spark.read.option("multiLine", true).schema(metaSchema).json(metaPath)
      .select(col("id").as(GameId),
        col("team_home_name").as("homeTeamId"),
        col("team_away_name").as("awayTeamId"),
        coalesce(try_element_at(col("pitch_size"), lit(1)), lit(105.0))
          .as("pitch_length"),
        coalesce(try_element_at(col("pitch_size"), lit(2)), lit(68.0))
          .as("pitch_width"),
        col("team_home_players"), col("team_away_players"))

  /** Squad-sized roster: (home side?, jersey) → stable player name.
    * Broadcast side of the frame join. */
  private def roster(gamesDf: DataFrame): DataFrame = {
    def side(arr: String, home: Boolean): DataFrame = gamesDf
      .select(explode_outer(col(arr)).as("p"))
      .select(lit(home).as("r_home"),
        col("p.jersey_number").as("r_jersey"),
        col("p.name").as("r_name"))
      .filter(col("r_jersey").isNotNull && col("r_name").isNotNull)
    side("team_home_players", home = true)
      .unionByName(side("team_away_players", home = false))
  }

  /** Full load of one match (per-period feed files + meta) into the
    * canonical long table (same contract as [[SportecSource.load]]).
    *
    * @param feeds (period_id, path) per raw-data document — Signality
    *              ships one per period, so the period is carried by
    *              the file, not the frame
    */
  def load(
      spark: SparkSession,
      feeds: Seq[(Int, String)],
      metaPath: String,
      fps: Int = 25,
      orientation: String = "static_home_away"): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    require(fps > 0, "fps must be positive")
    require(feeds.nonEmpty, "at least one (period, path) feed is required")
    require(feeds.map(_._1).distinct.size == feeds.size,
      "one feed per period: duplicate period ids in feeds")
    val gamesDf = games(spark, metaPath)
    val nGames = gamesDf.limit(2).count()
    require(nGames == 1,
      s"metaPath must describe exactly one Signality match (found " +
        s"${if (nGames == 0) "none" else "several"}: $metaPath); feed files " +
        "carry no match id, so load one match at a time")

    val frames = feeds.map { case (period, path) =>
      spark.read.option("multiLine", true).schema(frameSchema).json(path)
        .filter(col("utc_time").isNotNull)
        .withColumn(PeriodId, lit(period))
    }.reduce(_ unionByName _)

    def sideRows(arrCol: String, homeSide: Boolean): DataFrame =
      frames
        .select(col(PeriodId), col("utc_time"), explode(col(arrCol)).as("p"))
        .select(col(PeriodId), col("utc_time"),
          col("p.jersey_number").as("jersey"),
          lit(homeSide).as("is_home_side"),
          try_element_at(col("p.position"), lit(1)).as(X),
          try_element_at(col("p.position"), lit(2)).as(Y),
          lit(0.0).as(Z),
          lit(false).as("is_ball_row"))
        // truncated/corrupt player objects drop instead of leaking
        // null coordinates (shared provider contract)
        .filter(col("jersey").isNotNull && col(X).isNotNull && col(Y).isNotNull)

    val ballRows = frames
      .filter(col("ball").isNotNull && col("ball.position").isNotNull)
      .select(col(PeriodId), col("utc_time"),
        lit(null).cast(IntegerType).as("jersey"),
        lit(false).as("is_home_side"),
        try_element_at(col("ball.position"), lit(1)).as(X),
        try_element_at(col("ball.position"), lit(2)).as(Y),
        coalesce(try_element_at(col("ball.position"), lit(3)), lit(0.0)).as(Z),
        lit(true).as("is_ball_row"))
      .filter(col(X).isNotNull && col(Y).isNotNull)

    val all = sideRows("home_team", homeSide = true)
      .unionByName(sideRows("away_team", homeSide = false))
      .unionByName(ballRows)
      .crossJoin(broadcast(gamesDf.select(col(GameId),
        col("homeTeamId"), col("awayTeamId"),
        col("pitch_length"), col("pitch_width"))))
      .join(broadcast(roster(gamesDf)),
        col("is_home_side") === col("r_home") &&
          col("jersey") === col("r_jersey"), "left")

    // per-(game, period) clock rebase: epoch ms → micros since period
    // start (tiny per-period table, broadcast back)
    val base0 = all.groupBy(col(GameId), col(PeriodId))
      .agg(min(col("utc_time")).as("utc0"))
    val rebased = all.join(broadcast(base0), Seq(GameId, PeriodId))

    val frameUs = 1000000.0 / fps
    val base = rebased.select(
      col(GameId), col(PeriodId),
      // frame id from the epoch clock at the capture rate: globally
      // monotone across periods (the canonical-schema invariant)
      round(col("utc_time").cast(DoubleType) * 1000.0 / frameUs)
        .cast(LongType).as(FrameId),
      ((col("utc_time") - col("utc0")) * 1000L).as(Timestamp),
      when(col("is_ball_row"), lit(Ball))
        .otherwise(coalesce(col("r_name"),
          concat(when(col("is_home_side"), lit("home_")).otherwise(lit("away_")),
            col("jersey")))).as(ObjectId),
      when(col("is_ball_row"), lit(Ball))
        .when(col("is_home_side"), col("homeTeamId"))
        .otherwise(col("awayTeamId")).as(TeamId),
      // the alpha feed carries no position roles
      when(col("is_ball_row"), lit(Ball))
        .otherwise(lit(null).cast(StringType)).as(PositionName),
      // corner origin → canonical center origin
      (col(X) - col("pitch_length") / 2).as(X),
      (col(Y) - col("pitch_width") / 2).as(Y),
      col(Z),
      // no ball-status or possession stream in the public sample shape
      lit(null).cast(StringType).as(BallState),
      lit(null).cast(StringType).as(BallOwningTeamId),
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

  /** Round-trip fixture generator: canonical long table → per-period
    * raw-data JSON arrays + meta JSON under `outDir` (`p<period>.json`,
    * `meta.json`). A TEST/fixture tool for one match; team ids in the
    * input must be literal "home"/"away" (the synthetic convention) —
    * they become the side arrays and the meta team names. Jersey
    * numbers are assigned per team by id order and the roster carries
    * each id back as the player `name`, so [[load]] recovers the
    * original object ids exactly. `utc_time` is written as epoch ms
    * `EpochBase + (period-1)*45min + timestamp`, exercising the
    * per-period rebase; coordinates are written corner-origin,
    * exercising the centering. Assumes the canonical 25 fps synthetic
    * table (timestamps on 40 ms ticks), so the ms clock is exact. */
  val EpochBase: Long = 1700000000000L

  def writeFeeds(df: DataFrame, outDir: String): Unit = {
    val isBall = col(TeamId) === Ball
    val ids = df.filter(!isBall)
      .groupBy(col(TeamId), col(ObjectId)).agg(count(lit(1)).as("__n"))
      .withColumn("jersey", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(TeamId)).orderBy(col(ObjectId))))
      .drop("__n")
    val withJersey = df.join(ids, Seq(TeamId, ObjectId), "left")
      .withColumn("utc_time",
        lit(EpochBase) + (col(PeriodId).cast(LongType) - 1L) * (45L * 60000L) +
          (col(Timestamp) / 1000L).cast(LongType))

    def player = struct(col("jersey").as("jersey_number"),
      array(col(X) + 52.5, col(Y) + 34.0).as("position"))
    val frames = withJersey
      .groupBy(col(PeriodId), col("utc_time"))
      .agg(
        array_sort(collect_list(when(!isBall && col(TeamId) === "home", player)))
          .as("home_team"),
        array_sort(collect_list(when(!isBall && col(TeamId) === "away", player)))
          .as("away_team"),
        max(when(isBall,
          struct(array(col(X) + 52.5, col(Y) + 34.0, col(Z)).as("position"))))
          .as("ball"))
      .select(col(PeriodId), col("utc_time"), to_json(struct(
        col("utc_time"), col("ball"), col("home_team"), col("away_team")))
        .as("doc"))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // one array document per period: match-length frame counts — a
    // fixture-sized driver collect, like the other writer tools
    frames.collect().groupBy(_.getInt(0)).foreach { case (period, rows) =>
      val body = rows.sortBy(_.getLong(1)).map(_.getString(2))
        .mkString("[\n", ",\n", "\n]")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/p$period.json"),
        body.getBytes("UTF-8"))
    }

    // squad-sized: ≤ ~23 ids per team by frame physics
    val idRows = ids.orderBy(col(TeamId), col("jersey")).collect()
    def teamArr(team: String): String = idRows.filter(_.getString(0) == team)
      .map(r => s"""{"jersey_number": ${r.getInt(2)}, "name": "${r.getString(1)}"}""")
      .mkString("[", ", ", "]")

    val game = df.select(col(GameId)).head().getString(0)
    val meta =
      s"""{"id": "$game", "team_home_name": "home", "team_away_name": "away",
         | "team_home_players": ${teamArr("home")},
         | "team_away_players": ${teamArr("away")},
         | "pitch_size": [105.0, 68.0]}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/meta.json"), meta.getBytes("UTF-8"))
  }
}
