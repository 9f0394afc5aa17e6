package graft.tracking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Velocity / acceleration / capping over the canonical long table.
  *
  * Reference semantics (`kloppy_polars.py:382-491`, `soccer/dataset/
  * utils.py:6-39`):
  *  - dt in seconds is derived from *milliseconds* (duration truncated
  *    to ms, then /1000);
  *  - vx = Δx/Δt per (object, period), first row filled with 0;
  *  - optional Savitzky-Golay smoothing of vx/vy/vz with separate
  *    player/ball params (defaults (7,1)/(3,1));
  *  - v = √(vx²+vy²+vz²) from the (smoothed) components;
  *  - ax = Δvx/Δt with the *same* dt column; a = magnitude;
  *  - only the magnitudes v and a are capped (components untouched).
  *
  * Everything is expressed over one window spec (game, id, period ordered
  * by timestamp) so Spark plans a single shuffle + sort for the whole
  * kinematics chain; all arithmetic stays in whole-stage codegen.
  */
object Kinematics {
  import Cols._

  private def wObj = Window.partitionBy(ByObjectPeriod.map(col): _*).orderBy(col(Timestamp))
  private def wObjAll = Window.partitionBy(ByObjectPeriod.map(col): _*)

  private def mag(a: Column, b: Column, c: Column): Column = sqrt(a * a + b * b + c * c)

  def withVelocity(
      df: DataFrame,
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame = {
    val w = wObj
    // Polars dt.total_milliseconds() truncates to ms; replicate exactly.
    val sec = (col(Timestamp).cast("long") / 1000L).cast("long") / lit(1000.0)
    // the four lags share one window spec and are mutually independent —
    // defining them in ONE select plans ONE Window pass (chained
    // withColumns would interleave Projects and leave four)
    val raw = df
      .select(col("*"),
        lag(sec, 1).over(w).as("__lsec"),
        lag(col(X), 1).over(w).as("__lx"),
        lag(col(Y), 1).over(w).as("__ly"),
        lag(col(Z), 1).over(w).as("__lz"))
      .withColumn("__dt", sec - col("__lsec"))
      .withColumn(Vx, coalesce((col(X) - col("__lx")) / col("__dt"), lit(0.0)))
      .withColumn(Vy, coalesce((col(Y) - col("__ly")) / col("__dt"), lit(0.0)))
      .withColumn(Vz, coalesce((col(Z) - col("__lz")) / col("__dt"), lit(0.0)))
      .drop("__lsec", "__lx", "__ly", "__lz")

    val smoothed =
      if (playerSmoothing.isEmpty && ballSmoothing.isEmpty) raw
      else {
        val n = count(lit(1)).over(wObjAll)
        val rn = row_number().over(wObj)
        val withIdx = raw.withColumn("__n", n).withColumn("__rn", rn)
        def smooth(c: String): Column = {
          val pl = playerSmoothing.map(_.expr(col(c), wObj, col("__n"), col("__rn"))).getOrElse(col(c))
          val bl = ballSmoothing.map(_.expr(col(c), wObj, col("__n"), col("__rn"))).getOrElse(col(c))
          when(col(ObjectId) === Ball, bl).otherwise(pl)
        }
        Seq(Vx, Vy, Vz).foldLeft(withIdx)((d, c) => d.withColumn(c, smooth(c)))
          .drop("__n", "__rn")
      }
    smoothed.withColumn(Speed, mag(col(Vx), col(Vy), col(Vz)))
  }

  /** Requires the `__dt` helper column from [[withVelocity]]. */
  def withAcceleration(df: DataFrame): DataFrame = {
    val w = wObj
    // one select = one Window pass for the three velocity lags
    df.select(col("*"),
        lag(col(Vx), 1).over(w).as("__lvx"),
        lag(col(Vy), 1).over(w).as("__lvy"),
        lag(col(Vz), 1).over(w).as("__lvz"))
      .withColumn(Ax, coalesce((col(Vx) - col("__lvx")) / col("__dt"), lit(0.0)))
      .withColumn(Ay, coalesce((col(Vy) - col("__lvy")) / col("__dt"), lit(0.0)))
      .withColumn(Az, coalesce((col(Vz) - col("__lvz")) / col("__dt"), lit(0.0)))
      .withColumn(Acceleration, mag(col(Ax), col(Ay), col(Az)))
      .drop("__lvx", "__lvy", "__lvz")
  }

  /** Magnitude capping (`soccer/dataset/utils.py:6-39`): ball and player
    * caps differ; components are left as-is. */
  def capSpeedAcceleration(df: DataFrame, s: TrackingSettings): DataFrame = {
    val isBall = col(ObjectId) === Ball
    df.withColumn(Speed,
        when(isBall && col(Speed) > s.maxBallSpeed, s.maxBallSpeed)
          .when(!isBall && col(Speed) > s.maxPlayerSpeed, s.maxPlayerSpeed)
          .otherwise(col(Speed)))
      .withColumn(Acceleration,
        when(isBall && col(Acceleration) > s.maxBallAcceleration, s.maxBallAcceleration)
          .when(!isBall && col(Acceleration) > s.maxPlayerAcceleration, s.maxPlayerAcceleration)
          .otherwise(col(Acceleration)))
  }

  /** Full kinematics chain of the reference `load()` steps 5-8
    * (`kloppy_polars.py:882-894`): velocity (+smoothing), acceleration,
    * caps, drop helper cols and null-position rows. */
  def apply(
      df: DataFrame,
      settings: TrackingSettings = TrackingSettings(),
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame = {
    val v = withVelocity(df, playerSmoothing, ballSmoothing)
    val a = withAcceleration(v)
    capSpeedAcceleration(a, settings)
      .drop("__dt")
      .filter(!(col(X).isNull && col(Y).isNull))
  }
}
