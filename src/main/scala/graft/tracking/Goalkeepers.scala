package graft.tracking

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Goalkeeper inference (M9, `kloppy_polars.py:669-723`): per (frame,
  * team) the player closest to the relevant goal is labeled "GK" —
  * the left goal for the possessing team, the right goal otherwise
  * (orientation is already possession-normalized upstream). Equality
  * with the per-(frame, team) window min replicates the reference
  * exactly, including its multi-GK behavior on exact ties. Ball rows
  * pass through untouched. */
object Goalkeepers {
  import Cols._

  def infer(df: DataFrame, settings: TrackingSettings = TrackingSettings()): DataFrame = {
    val goalX = settings.pitch.length / 2
    val isBall = col(TeamId) === Ball
    val dl = sqrt((col(X) - lit(-goalX)) * (col(X) - lit(-goalX)) + col(Y) * col(Y))
    val dr = sqrt((col(X) - lit(goalX)) * (col(X) - lit(goalX)) + col(Y) * col(Y))
    val wft = Window.partitionBy(ByFrameTeam.map(col): _*)
    df.withColumn("__dl", when(isBall, lit(null).cast("double")).otherwise(dl))
      .withColumn("__dr", when(isBall, lit(null).cast("double")).otherwise(dr))
      .withColumn("__mdl", min(col("__dl")).over(wft))
      .withColumn("__mdr", min(col("__dr")).over(wft))
      .withColumn(PositionName,
        when(isBall, col(PositionName)).otherwise(
          when(col(TeamId) === col(BallOwningTeamId),
            when(col("__dl") === col("__mdl"), lit("GK")).otherwise(lit(null).cast("string")))
            .otherwise(
              when(col("__dr") === col("__mdr"), lit("GK")).otherwise(lit(null).cast("string")))))
      .drop("__dl", "__dr", "__mdl", "__mdr")
  }
}
