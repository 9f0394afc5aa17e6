package graft.football

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NFL BigDataBowl CSV ingest (S2/S3) and canonicalization, mirroring
  * `american_football/dataset/dataset.py:180-391` Spark-first:
  * header-resolved columns (no positional schema — real BDB exports
  * vary: `club` vs `team`, `position` vs `officialPosition`, optional
  * time/jerseyNumber/dis/event columns), "NA"/empty null markers, the
  * left-play rotation to a single attacking direction (M10-NFL),
  * degree→(-π,π] radian conversion, height/weight regexp extraction
  * with 10 cm / 10 kg privacy rounding (F2/F8), frame-id synthesis
  * `play_id·100000 + frameId`, the `s`→`v` speed rename
  * (`dataset.py:318` — the loaded table's speed column is `v`), and
  * broadcast metadata joins (J3).
  *
  * Everything is row-local column algebra over a lazy CSV scan —
  * Spark pushes the projection into the scan, and the only shuffles
  * are the two broadcast joins (players ~2k rows, plays ~1 row per
  * play), which broadcast. At 100 TB of tracking rows the pipeline
  * stays a single scan + map.
  */
object BigDataBowl {

  val PitchLength = 120.0
  val PitchWidth = 53.3
  val Football = "football"

  private def csv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path) // all columns StringType; typed casts by name below
    // reference null markers: null_values=["NA","NULL",""] (dataset.py:193)
    raw.select(raw.columns.map(c =>
      when(col(c).isin("NA", "NULL", ""), lit(null)).otherwise(col(c)).as(c)): _*)
  }

  private def castByName(df: DataFrame, casts: (String, String)*): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(t)) else d
    }

  /** Height "6-2" → cm, weight lbs → kg, both privacy-rounded to
    * 10 cm / 10 kg (`dataset.py:358-391`). */
  def withMetricHeightWeight(players: DataFrame): DataFrame =
    players
      .withColumn("feet", regexp_extract(col("height"), "(\\d+)", 1).cast("double"))
      .withColumn("inches", regexp_extract(col("height"), "\\d+-(\\d+)", 1).cast("double"))
      .withColumn("height_cm",
        round((col("feet") * 30.48 + col("inches") * 2.54) / 10.0, 0) * 10.0)
      .withColumn("weight_kg", round(col("weight") * 0.453592 / 10.0, 0) * 10.0)
      .drop("height", "feet", "inches", "weight")

  /** Degrees → radians wrapped to (-π, π] (`dataset.py:221-231`). */
  private def toRadians(c: Column) =
    ((c * math.Pi / 180.0) + math.Pi) % (2 * math.Pi) - math.Pi

  /** Full load from the three BDB files (tracking, players, plays) —
    * the reference's constructor surface (`dataset.py:131-160`).
    * Output: canonical long table with (game_id, play_id, frame_id,
    * id, team_id, position_name, x, y, v, a, o, dir, height_cm,
    * weight_kg, ball_owning_team_id) plus any provider extras
    * (time, jerseyNumber, dis, event) passed through typed. All plays
    * are rotated to attack left→right and centered on the pitch
    * midpoint (`dataset.py:204-249`). */
  def load(
      spark: SparkSession,
      trackingPath: String,
      playersPath: String,
      playsPath: String): DataFrame = {
    val raw = csv(spark, trackingPath)
    val teamSrc = if (raw.columns.contains("club")) "club" else "team"
    val typed = castByName(
      raw.withColumnRenamed(teamSrc, "club"),
      "gameId" -> "long", "playId" -> "long", "frameId" -> "long",
      "nflId" -> "double", "x" -> "double", "y" -> "double",
      "s" -> "double", "a" -> "double", "o" -> "double", "dir" -> "double",
      "dis" -> "double", "jerseyNumber" -> "double", "time" -> "timestamp")

    val left = col("playDirection") === "left"
    val tracking = typed
      .withColumn("o", when(left, col("o") + 180.0).otherwise(col("o")))
      .withColumn("dir", when(left, col("dir") + 180.0).otherwise(col("dir")))
      .withColumn("x", col("x") - PitchLength / 2.0)
      .withColumn("y", col("y") - PitchWidth / 2.0)
      .withColumn("o", toRadians(col("o")))
      .withColumn("dir", toRadians(col("dir")))
      .withColumn("x", when(left, col("x") * -1.0).otherwise(col("x")))
      .withColumn("y", when(left, col("y") * -1.0).otherwise(col("y")))
      .withColumn("nflId", when(col("club") === Football, lit(-9999.9)).otherwise(col("nflId")))
      .withColumn("playDirection", lit("left"))

    val rawPlayers = csv(spark, playersPath)
    val posSrc = if (rawPlayers.columns.contains("position")) "position" else "officialPosition"
    val players = withMetricHeightWeight(
      castByName(rawPlayers.withColumnRenamed(posSrc, "position"), "weight" -> "double"))
      .withColumn("nflId", col("nflId").cast("double"))
      .select("nflId", "position", "height_cm", "weight_kg")

    val plays = csv(spark, playsPath)
      .select(col("gameId").cast("long").as("game_id"),
        col("playId").cast("long").as("play_id"),
        col("possessionTeam").as("ball_owning_team_id"))

    tracking
      .join(broadcast(players), Seq("nflId"), "left")
      .withColumnRenamed("nflId", "id")
      .withColumnRenamed("gameId", "game_id")
      .withColumnRenamed("playId", "play_id")
      .withColumnRenamed("club", "team_id")
      .withColumnRenamed("position", "position_name")
      .withColumnRenamed("s", "v")
      .join(broadcast(plays), Seq("game_id", "play_id"), "left")
      .withColumn("frame_id", col("play_id") * 100000L + col("frameId"))
      .drop("frameId")
  }

  /** Convenience: load from a root laid out as the synthetic fixture
    * generator writes it (tracking/, players/, plays/ subdirs). */
  def load(spark: SparkSession, root: String): DataFrame =
    load(spark, AfSynthetic.trackingGlob(root),
      AfSynthetic.playersGlob(root), AfSynthetic.playsGlob(root))

  /** AF frame completeness (G9-AF, `graph_converter.py:206-272`):
    * drop frames with <10 objects, then frames with no football row. */
  def removeIncompleteFrames(df: DataFrame): DataFrame = {
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("game_id"), col("play_id"), col("frame_id"))
    df.withColumn("__size", count(lit(1)).over(wf))
      .withColumn("__footballs", sum((col("team_id") === Football).cast("int")).over(wf))
      .filter(col("__size") >= 10 && col("__footballs") > 0)
      .drop("__size", "__footballs")
  }
}
