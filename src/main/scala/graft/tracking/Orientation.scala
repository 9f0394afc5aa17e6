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
    * left→right in every period. Matching kloppy, the raw direction is
    * detected PER (game, period) from team mean x at each period's
    * first frame (home lower = home already LTR in that period), and
    * exactly the periods where home attacks RTL are rotated 180° (x
    * and y negated — kloppy's flip is a point reflection, not a
    * mirror). No alternation is assumed: already-normalized feeds and
    * extra-time direction after a coin toss come out right. Distances,
    * angles and all magnitude-derived quantities (kinematics v/a,
    * TTI/PTI) are invariant under the rotation.
    *
    * Split in two so readers keep their source-scan count bounded:
    * [[detectHomeLtr]] builds the per-(game, period) decision table
    * (callers should feed it the CHEAPEST upstream relation that has
    * game/period/frame/x/is_home — re-deriving it from the fully
    * joined table would re-expand the whole load lineage per
    * reference, the re-scan trap PlanAuditSpec pins); [[staticHomeAway]]
    * applies it with one broadcast join. */
  def detectHomeLtr(df: DataFrame, isHome: org.apache.spark.sql.Column,
      isBall: org.apache.spark.sql.Column): DataFrame =
    // ONE pruned scan: per-(game, period, frame) team means, then an
    // order-free struct-min picks the first frame's row per period
    df.filter(!isBall)
      .groupBy(col(GameId), col(PeriodId), col(FrameId))
      .agg(avg(when(isHome, col(X))).as("__hx"),
        avg(when(!isHome, col(X))).as("__ax"))
      .groupBy(col(GameId), col(PeriodId))
      .agg(min(struct(col(FrameId), col("__hx"), col("__ax"))).as("__f"))
      .select(col(GameId), col(PeriodId),
        (col("__f.__hx") < col("__f.__ax")).as("home_ltr"))

  /** Applies the [[detectHomeLtr]] table: rotate the periods detected
    * as home-attacking right-to-left. Periods absent from the decision
    * table (no player rows) pass through unflipped. */
  def staticHomeAway(df: DataFrame, homeLtr: DataFrame): DataFrame =
    df.join(
        broadcast(homeLtr.select(col(GameId), col(PeriodId), col("home_ltr"))),
        Seq(GameId, PeriodId), "left")
      .withColumn("__flip", !coalesce(col("home_ltr"), lit(true)))
      .withColumn(X, when(col("__flip"), -col(X)).otherwise(col(X)))
      .withColumn(Y, when(col("__flip"), -col(Y)).otherwise(col(Y)))
      .drop("home_ltr", "__flip")

  /** Convenience: detect from `df` itself (re-reads `df`'s lineage —
    * fine for cached/canonical tables, avoid inside readers). */
  def staticHomeAway(df: DataFrame, isHome: org.apache.spark.sql.Column,
      isBall: org.apache.spark.sql.Column): DataFrame =
    staticHomeAway(df, detectHomeLtr(df, isHome, isBall))
}
