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

  /** Kloppy's STATIC_HOME_AWAY normalization, shared by the provider
    * readers ([[SportecSource]], [[SkillCornerSource]]): home attacks
    * left→right in every period. The raw direction is detected from
    * team mean x at the first frame of period 1 (home lower = home
    * already LTR), sides are assumed to alternate each period, and the
    * periods where home would attack RTL are rotated 180° (x and y
    * negated — kloppy's flip is a point reflection, not a mirror).
    *
    * `df` must carry the canonical game/period/frame/x/y columns plus
    * a boolean `is_home` column for player rows (null/false for the
    * ball). The detection aggregate is one extra pruned scan reduced
    * to a row per game, broadcast back — no wide shuffle. Distances,
    * angles and all magnitude-derived quantities (kinematics v/a,
    * TTI/PTI) are invariant under the rotation. */
  def staticHomeAway(df: DataFrame, isHome: org.apache.spark.sql.Column,
      isBall: org.apache.spark.sql.Column): DataFrame = {
    val p1 = df.filter(col(PeriodId) === 1 && !isBall)
    val firstFrame = p1.groupBy(col(GameId)).agg(min(col(FrameId)).as("__fn"))
    val ltr = p1.join(broadcast(firstFrame), Seq(GameId))
      .filter(col(FrameId) === col("__fn"))
      .groupBy(col(GameId))
      .agg((avg(when(isHome, col(X))) < avg(when(!isHome, col(X)))).as("__ltr"))
    df.join(broadcast(ltr), Seq(GameId), "left")
      .withColumn("__flip",
        when(coalesce(col("__ltr"), lit(true)), col(PeriodId) % 2 === 0)
          .otherwise(col(PeriodId) % 2 === 1))
      .withColumn(X, when(col("__flip"), -col(X)).otherwise(col(X)))
      .withColumn(Y, when(col("__flip"), -col(Y)).otherwise(col(Y)))
      .drop("__ltr", "__flip")
  }
}
