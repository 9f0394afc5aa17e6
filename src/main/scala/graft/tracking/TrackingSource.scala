package graft.tracking

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Provider wide-format tracking reader (S1/S2 + R1): one CSV row per
  * frame with per-object coordinate columns (`<id>_x`, `<id>_y`, …) —
  * the shape kloppy's `to_df` emits before the reference unpivots it
  * (`kloppy_polars.py:293-311`, `:493-544`).
  *
  * The reference melts per object and coordinate (N unpivots + three
  * horizontal concats). Here the wide row becomes long in ONE
  * projection: build an `array(struct(id, x, y, z))` over the known
  * object list and `explode` it — a single pass, no joins, no
  * positional concat hazards; the projection is codegen'd and the
  * operator preserves the source partitioning (the only later shuffle
  * is whatever the downstream pipeline chooses).
  */
object TrackingSource {

  /** Declared schema for a wide tracking CSV: frame keys + per-object
    * coordinate columns. Players carry (x, y); the ball carries
    * (x, y, z) (`kloppy_polars.py:507-529`). */
  def wideSchema(playerIds: Seq[String]): StructType = {
    val keys = Seq(
      StructField("game_id", StringType), StructField("period_id", IntegerType),
      StructField("frame_id", LongType), StructField("timestamp", LongType))
    val perPlayer = playerIds.flatMap(id => Seq(
      StructField(s"${id}_x", DoubleType), StructField(s"${id}_y", DoubleType)))
    val ball = Seq(StructField("ball_x", DoubleType),
      StructField("ball_y", DoubleType), StructField("ball_z", DoubleType))
    StructType(keys ++ perPlayer ++ ball)
  }

  /** Lazy CSV scan with the declared schema (projection pushes into the
    * scan; nothing is read eagerly). */
  def scanWide(spark: SparkSession, path: String, playerIds: Seq[String]): DataFrame =
    spark.read.schema(wideSchema(playerIds))
      .option("header", "true")
      .option("nullValue", "NA")
      .csv(path)

  /** Same declared-schema scan over JSON-lines (one frame object per
    * line, `<id>_x`-style keys) — the raw shape of JSON tracking
    * providers (e.g. SkillCorner structured data before kloppy's
    * normalization). Absent keys read as null and drop in [[toLong]],
    * like CSV "NA"s. */
  def scanWideJson(spark: SparkSession, path: String, playerIds: Seq[String]): DataFrame =
    spark.read.schema(wideSchema(playerIds)).json(path)

  /** Wide → canonical long format in one explode. Null-position objects
    * (absent from the frame) are dropped, like the reference's
    * `drop_nulls` after melt (`kloppy_polars.py:894`). */
  def toLong(wide: DataFrame, playerIds: Seq[String]): DataFrame = {
    def obj(id: String, team: Column, x: Column, y: Column, z: Column) =
      struct(lit(id).as("id"), team.as("team_id"), x.as("x"), y.as("y"), z.as("z"))
    val objects = playerIds.map { id =>
      val team = if (id.startsWith("h")) lit("home") else lit("away")
      obj(id, team, col(s"${id}_x"), col(s"${id}_y"), lit(0.0))
    } :+ obj(Cols.Ball, lit(Cols.Ball), col("ball_x"), col("ball_y"), col("ball_z"))

    wide
      .select(col("game_id"), col("period_id"), col("frame_id"), col("timestamp"),
        explode(array(objects: _*)).as("o"))
      .select(col("game_id"), col("period_id"), col("frame_id"), col("timestamp"),
        col("o.id").as(Cols.ObjectId), col("o.team_id").as(Cols.TeamId),
        col("o.x").as(Cols.X), col("o.y").as(Cols.Y), col("o.z").as(Cols.Z))
      .filter(col(Cols.X).isNotNull && col(Cols.Y).isNotNull)
  }
}
