package graft.tracking

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Orientation normalization (M10, `kloppy_polars.py:725-782`): flip
  * x, y, vx, vy, ax, ay by -1 whenever the ball-owning team is not the
  * home team, so the attacking team always plays left→right. Pure
  * row-local conditional arithmetic — fully codegen'd, no shuffle. */
object Orientation {
  import Cols._
  private val FlipCols = Seq(X, Y, Vx, Vy, Ax, Ay)

  def toBallOwning(df: DataFrame, homeTeamId: String): DataFrame = {
    val flip = col(BallOwningTeamId).cast("string") =!= lit(homeTeamId)
    FlipCols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, when(flip, col(c) * -1).otherwise(col(c)))
    }
  }
}
