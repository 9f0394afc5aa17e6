package graft.tracking

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ball-owning team / ball-carrier inference (M8,
  * `kloppy_polars.py:546-667`).
  *
  * Reference shape: split players/ball, join ball xyz per frame, two
  * join-aggregates ("arg-min with threshold"), re-join, flag carrier,
  * drop frames without possession.
  *
  * Spark-first shape: **zero joins.** The per-frame ball position is a
  * window aggregate over the frame key, and both arg-mins are
  * row_number + conditional-max window passes over the *same* partition
  * key — so the whole inference is one shuffle by frame key followed by
  * in-partition sorts, which survives any scale-up that partitions by
  * game/frame. Ties broken by (distance, id) — deterministic, unlike the
  * reference's insertion-order `first()`.
  */
object Possession {
  import Cols._

  def inferBallCarrier(df: DataFrame, settings: TrackingSettings = TrackingSettings()): DataFrame = {
    val theta = settings.ballCarrierThreshold
    val wf = Window.partitionBy(ByFrame.map(col): _*)
    val isBall = col(TeamId) === Ball

    // per-frame ball position via conditional window agg (no join)
    val withBall = df
      .withColumn("__bx", max(when(isBall, col(X))).over(wf))
      .withColumn("__by", max(when(isBall, col(Y))).over(wf))
      .withColumn("__bz", max(when(isBall, col(Z))).over(wf))
      .withColumn("__dist",
        when(isBall, lit(null).cast("double")).otherwise(
          sqrt((col(X) - col("__bx")) * (col(X) - col("__bx"))
            + (col(Y) - col("__by")) * (col(Y) - col("__by"))
            + (col(Z) - col("__bz")) * (col(Z) - col("__bz")))))

    // pass 1: nearest player overall → candidate owning team
    val o1 = Window.partitionBy(ByFrame.map(col): _*)
      .orderBy(col("__dist").asc_nulls_last, col(ObjectId))
    val p1 = withBall
      .withColumn("__cand",
        max(when(row_number().over(o1) === 1 && col("__dist") < theta, col(TeamId))).over(wf))
      .withColumn(BallOwningTeamId, coalesce(col(BallOwningTeamId), col("__cand")))

    // pass 2: nearest player *on the owning team* → carrier
    val onOwning = col(TeamId) === col(BallOwningTeamId)
    val o2 = Window.partitionBy(ByFrame.map(col): _*)
      .orderBy(when(onOwning, col("__dist")).asc_nulls_last, col(ObjectId))
    val p2 = p1
      .withColumn("__carrier",
        max(when(row_number().over(o2) === 1 && onOwning && col("__dist") < theta,
          col(ObjectId))).over(wf))
      .withColumn(IsBallCarrier, coalesce(col(ObjectId) === col("__carrier"), lit(false)))

    p2.filter(col(BallOwningTeamId).isNotNull)
      .drop("__bx", "__by", "__bz", "__dist", "__cand", "__carrier")
  }
}
