package graft.tracking

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for DFL/Sportec position XML — the reference's
  * primary real-world provider format (S1).
  *
  * The reference delegates parsing to kloppy
  * (`unravel/soccer/dataset/kloppy_polars.py:194-218`:
  * `sportec.load_tracking(raw_data, meta_data,
  * coordinates="secondspectrum", ...)`), then unpivots kloppy's frame
  * objects into the canonical long table (`kloppy_polars.py:830-839`).
  * Here the whole journey is declarative Spark: the tracking XML is read
  * with the built-in XML source (`rowTag=FrameSet`, declared schema — no
  * inference pass), frames are exploded once, and the per-frame ball
  * attributes / period offsets / orientation flips are attached with one
  * frame-key window plus two broadcast joins against tiny per-match
  * aggregates. No driver-side parsing: a 100 TB season of matches scales
  * with the number of FrameSet elements (one per player per period),
  * and every downstream consumer (kinematics, possession, PI, EFPI,
  * graphs) takes this table as-is.
  *
  * Output contract (one row per object per frame, center-origin meters):
  * `game_id, period_id, frame_id, timestamp (micros since period start),
  * id, team_id, position_name, x, y, z, ball_state,
  * ball_owning_team_id` — the same raw-load contract the reference
  * produces before kinematics (`kloppy_polars.py:830-839`).
  *
  * Semantics mirrored from the fixtures
  * (`tests/files/sportec_tracking.xml`, `sportec_meta.xml`) and the
  * reference tests (`tests/test_soccer.py:135-145,514-567`):
  *  - `FrameSet@TeamId="BALL"` carries the ball track plus the
  *    per-frame `BallPossession` ("1" home / "2" guest) and
  *    `BallStatus` ("1" alive) attributes;
  *  - players' z is 0.0, the ball's z comes from `Frame@Z`;
  *  - ball rows use the `"ball"` sentinel for id/team/position
  *    (`objects.py:1-2`);
  *  - `timestamp = (N - min(N) over the game section) / fps`, stored as
  *    micros (Sportec half-starts reset N per section; fps defaults
  *    to Sportec's 25);
  *  - `GameSection` maps firstHalf→1, secondHalf→2, firstHalfExtra→3,
  *    secondHalfExtra→4.
  *
  * Orientation: the reference requests STATIC_HOME_AWAY (home attacks
  * left→right in every period, `kloppy_polars.py:194-218`). Kloppy
  * detects the raw direction PER (game, period) from the mean x of
  * each team in that period's first frame (home lower = home attacks
  * LTR) and rotates exactly the periods where home attacks RTL 180°
  * (x,y negated). We replicate that rule. All
  * distance/angle-derived quantities (kinematics magnitudes, TTI/PTI)
  * are invariant under the rotation, which is what the reference's own
  * fixture goldens pin; pass `orientation="raw"` to keep provider
  * coordinates untouched.
  */
object SportecSource {
  import Cols._

  // ---- declared schemas (never inferred — a scan at scale must not
  // pay an inference pass). Numeric attributes are declared STRING and
  // cast downstream: under the XML source's PERMISSIVE mode a single
  // malformed typed attribute silently truncates the rest of the
  // record's Frame array (the remainder of a player's half!), whereas
  // a string parse always succeeds and the cast nulls only the one
  // bad value.

  private val frameType = StructType(Seq(
    StructField("_N", StringType),
    StructField("_T", StringType),
    StructField("_X", StringType),
    StructField("_Y", StringType),
    StructField("_Z", StringType),
    StructField("_D", StringType),
    StructField("_S", StringType),
    StructField("_A", StringType),
    StructField("_M", StringType),
    StructField("_BallPossession", StringType),
    StructField("_BallStatus", StringType)))

  val frameSetSchema: StructType = StructType(Seq(
    StructField("_GameSection", StringType),
    StructField("_MatchId", StringType),
    StructField("_TeamId", StringType),
    StructField("_PersonId", StringType),
    StructField("Frame", ArrayType(frameType))))

  private val playerType = StructType(Seq(
    StructField("_PersonId", StringType),
    StructField("_ShirtNumber", StringType),
    StructField("_FirstName", StringType),
    StructField("_LastName", StringType),
    StructField("_Shortname", StringType),
    StructField("_Starting", StringType),
    StructField("_PlayingPosition", StringType),
    StructField("_TeamLeader", StringType)))

  private val teamType = StructType(Seq(
    StructField("_TeamId", StringType),
    StructField("_TeamName", StringType),
    StructField("_Role", StringType),
    StructField("_LineUp", StringType),
    StructField("Players", StructType(Seq(
      StructField("Player", ArrayType(playerType)))))))

  val matchInfoSchema: StructType = StructType(Seq(
    StructField("General", StructType(Seq(
      StructField("_MatchId", StringType),
      StructField("_HomeTeamId", StringType),
      StructField("_GuestTeamId", StringType),
      StructField("_HomeTeamName", StringType),
      StructField("_GuestTeamName", StringType),
      StructField("_KickoffTime", StringType)))),
    StructField("Environment", StructType(Seq(
      StructField("_PitchX", StringType),
      StructField("_PitchY", StringType)))),
    StructField("Teams", StructType(Seq(
      StructField("Team", ArrayType(teamType)))))))

  /** Sportec `PlayingPosition` → kloppy position code, pinned by the
    * reference's own processed-frame fixture
    * (`tests/files/test_frame.json` position_name vs
    * `sportec_meta.xml` PlayingPosition, matched per player by
    * coordinates). Note kloppy's quirks preserved verbatim: DMZ is
    * absent from its table (falls through to UNK), STR→ST but STL→LF.
    * Codes not observable from the fixtures (IVZ, RM, LM, HL, HR) are
    * mapped to their natural kloppy codes. */
  val PositionCodes: Map[String, String] = Map(
    "TW" -> "GK",
    "IVR" -> "RCB", "IVL" -> "LCB", "IVZ" -> "CB",
    "RV" -> "RB", "LV" -> "LB",
    "DMR" -> "RDM", "DML" -> "LDM",
    "RM" -> "RM", "LM" -> "LM", "ZO" -> "CAM",
    "ORM" -> "RM", "OLM" -> "LM",
    "STZ" -> "ST", "STR" -> "ST", "STL" -> "LF",
    "HL" -> "LF", "HR" -> "RF")

  private val UnknownPosition = "UNK"

  /** Raw FrameSet scan: one row per (match, game section, object). */
  def frameSets(spark: SparkSession, trackingPath: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "FrameSet")
      .schema(frameSetSchema)
      .load(trackingPath)

  /** One row per match: ids, names, pitch size. Tiny — broadcast it. */
  def games(spark: SparkSession, metaPath: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "MatchInformation")
      .schema(matchInfoSchema)
      .load(metaPath)
      .select(
        col("General._MatchId").as(GameId),
        col("General._HomeTeamId").as("home_team_id"),
        col("General._GuestTeamId").as("away_team_id"),
        col("General._HomeTeamName").as("home_team_name"),
        col("General._GuestTeamName").as("away_team_name"),
        coalesce(col("Environment._PitchX").try_cast(DoubleType), lit(105.0)).as("pitch_length"),
        coalesce(col("Environment._PitchY").try_cast(DoubleType), lit(68.0)).as("pitch_width"))

  /** One row per (match, player): id, team, mapped position code.
    * Tiny (squad-sized per match) — broadcast it. */
  def roster(spark: SparkSession, metaPath: String): DataFrame = {
    val posMap = typedLit(PositionCodes)
    spark.read.format("xml")
      .option("rowTag", "MatchInformation")
      .schema(matchInfoSchema)
      .load(metaPath)
      .select(col("General._MatchId").as(GameId),
        col("General._HomeTeamId").as("home_team_id"),
        explode(col("Teams.Team")).as("t"))
      .select(col(GameId),
        col("t._TeamId").as(TeamId),
        (col("t._TeamId") === col("home_team_id")).as("is_home"),
        col("t._TeamName").as("team_name"),
        explode(col("t.Players.Player")).as("p"))
      .select(
        col(GameId),
        col("p._PersonId").as(ObjectId),
        col(TeamId),
        col("is_home"),
        col("team_name"),
        when(col("p._PlayingPosition").isNull, lit(null).cast(StringType))
          .otherwise(coalesce(element_at(posMap, col("p._PlayingPosition")),
            lit(UnknownPosition)))
          .as(PositionName),
        col("p._ShirtNumber").try_cast(IntegerType).as("shirt_number"),
        col("p._LastName").as("name"),
        col("p._Starting").try_cast(BooleanType).as("starting"))
  }

  private[tracking] def sectionToPeriod(section: Column): Column =
    when(section === "firstHalf", 1)
      .when(section === "secondHalf", 2)
      .when(section === "firstHalfExtra", 3)
      .when(section === "secondHalfExtra", 4)
      .otherwise(5)

  /** Full load: canonical long table ready for [[Kinematics]] /
    * [[Possession]] / the models. See object scaladoc for contract. */
  def load(
      spark: SparkSession,
      trackingPath: String,
      metaPath: String,
      fps: Int = 25,
      onlyAlive: Boolean = false,
      orientation: String = "static_home_away"): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    val microsPerFrame = 1000000L / fps

    val raw = frameSets(spark, trackingPath)
      .select(
        col("_MatchId").as(GameId),
        sectionToPeriod(col("_GameSection")).as(PeriodId),
        (col("_TeamId") === "BALL").as("is_ball_row"),
        col("_TeamId").as("fs_team"),
        col("_PersonId").as("fs_person"),
        explode(col("Frame")).as("f"))
      .select(col(GameId), col(PeriodId), col("is_ball_row"), col("fs_team"),
        col("fs_person"),
        col("f._N").try_cast(LongType).as(FrameId),
        col("f._X").try_cast(DoubleType).as(X),
        col("f._Y").try_cast(DoubleType).as(Y),
        col("f._Z").try_cast(DoubleType).as("raw_z"),
        col("f._BallPossession").as("raw_poss"),
        col("f._BallStatus").as("raw_status"))
      // a frame whose N itself is corrupt has no identity — drop it
      .filter(col(FrameId).isNotNull)

    // Per-frame ball attributes live on the single BALL row of each
    // frame; one frame-key window fans them out to every object without
    // a second scan or a join.
    val wFrame = Window.partitionBy(col(GameId), col(PeriodId), col(FrameId))
    val withAttrs = raw
      .withColumn("poss", max(when(col("is_ball_row"), col("raw_poss"))).over(wFrame))
      .withColumn("status", max(when(col("is_ball_row"), col("raw_status"))).over(wFrame))

    // Tiny per-(game, section) frame offsets — broadcast back.
    val offsets = raw.groupBy(col(GameId), col(PeriodId))
      .agg(min(col(FrameId)).as("min_n"))
    val gamesDf = games(spark, metaPath)

    val rosterDf = roster(spark, metaPath)
      .select(col(GameId).as("r_game"), col(ObjectId).as("r_id"),
        col("is_home"), col(PositionName))

    val joined = withAttrs
      .join(broadcast(offsets), Seq(GameId, PeriodId))
      .join(broadcast(gamesDf.select(col(GameId), col("home_team_id"), col("away_team_id"))), Seq(GameId))
      .join(broadcast(rosterDf),
        col(GameId) === col("r_game") && col("fs_person") === col("r_id"), "left")

    val base = joined.select(
      col(GameId), col(PeriodId), col(FrameId),
      ((col(FrameId) - col("min_n")) * lit(microsPerFrame)).cast(LongType).as(Timestamp),
      when(col("is_ball_row"), lit(Ball)).otherwise(col("fs_person")).as(ObjectId),
      when(col("is_ball_row"), lit(Ball)).otherwise(col("fs_team")).as(TeamId),
      when(col("is_ball_row"), lit(Ball)).otherwise(col(PositionName)).as(PositionName),
      col(X), col(Y),
      when(col("is_ball_row"), coalesce(col("raw_z"), lit(0.0))).otherwise(lit(0.0)).as(Z),
      when(col("status") === "1", "alive")
        .when(col("status").isNotNull, "dead")
        .otherwise(lit(null).cast(StringType)).as(BallState),
      when(col("poss") === "1", col("home_team_id"))
        .when(col("poss") === "2", col("away_team_id"))
        .otherwise(lit(null).cast(StringType)).as(BallOwningTeamId),
      col("is_ball_row"), col("is_home"), col("min_n"))

    val oriented = orientation match {
      case "raw" => base
      case _ =>
        // detect the flip from the CHEAP upstream relation (raw +
        // roster, tiny aggregates) — detecting from `base` would
        // re-expand the whole joined lineage per reference and
        // multiply source scans (PlanAuditSpec pins the bound)
        val ltrSrc = raw.filter(!col("is_ball_row"))
          .join(broadcast(rosterDf),
            col(GameId) === col("r_game") && col("fs_person") === col("r_id"), "left")
        val ltr = Orientation.detectHomeLtr(ltrSrc, col("is_home"), lit(false))
        Orientation.staticHomeAway(base, ltr)
    }

    val filtered = if (onlyAlive) oriented.filter(col(BallState) === "alive") else oriented
    filtered.select(GameId, PeriodId, FrameId, Timestamp, ObjectId, TeamId,
      PositionName, X, Y, Z, BallState, BallOwningTeamId)
  }
}
