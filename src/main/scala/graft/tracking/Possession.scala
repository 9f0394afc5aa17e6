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
  * Spark-first shape: **zero joins, zero sorts.** The per-frame ball
  * position is a window aggregate over the frame key, and both arg-mins
  * are unordered `min(struct(dist, id, …))` window aggregates over the
  * *same* partition key — lexicographic struct minima replace the
  * row_number formulation (the minimum over threshold-passing rows
  * equals the global arg-min whenever that arg-min passes the
  * threshold, and is null exactly when it doesn't), so the whole
  * inference is ONE shuffle by frame key with no in-partition sort at
  * all. Survives any scale-up that partitions by game/frame. Ties
  * broken by (distance, id) — deterministic, unlike the reference's
  * insertion-order `first()`.
  */
object Possession {
  import Cols._

  def inferBallCarrier(df: DataFrame, settings: TrackingSettings = TrackingSettings()): DataFrame = {
    val theta = settings.ballCarrierThreshold
    val wf = Window.partitionBy(ByFrame.map(col): _*)
    val isBall = col(TeamId) === Ball

    // per-frame ball position via conditional window agg (no join).
    // All three aggregates are defined in ONE select so Catalyst plans
    // ONE Window node (sequential withColumns interleave Projects that
    // block the CollapseWindow rule → three single-expression Window
    // passes over every row).
    val withBall = df
      .select(col("*"),
        max(when(isBall, col(X))).over(wf).as("__bx"),
        max(when(isBall, col(Y))).over(wf).as("__by"),
        max(when(isBall, col(Z))).over(wf).as("__bz"))
      .withColumn("__dist",
        when(isBall, lit(null).cast("double")).otherwise(
          sqrt((col(X) - col("__bx")) * (col(X) - col("__bx"))
            + (col(Y) - col("__by")) * (col(Y) - col("__by"))
            + (col(Z) - col("__bz")) * (col(Z) - col("__bz")))))

    // pass 1: nearest player overall → candidate owning team
    val p1 = withBall
      .withColumn("__cand",
        min(when(col("__dist") < theta,
          struct(col("__dist"), col(ObjectId), col(TeamId)))).over(wf)
          .getField(TeamId))
      .withColumn(BallOwningTeamId, coalesce(col(BallOwningTeamId), col("__cand")))

    // pass 2: nearest player *on the owning team* → carrier
    val onOwning = col(TeamId) === col(BallOwningTeamId)
    val p2 = p1
      .withColumn("__carrier",
        min(when(onOwning && col("__dist") < theta,
          struct(col("__dist"), col(ObjectId)))).over(wf)
          .getField(ObjectId))
      .withColumn(IsBallCarrier, coalesce(col(ObjectId) === col("__carrier"), lit(false)))

    p2.filter(col(BallOwningTeamId).isNotNull)
      .drop("__bx", "__by", "__bz", "__dist", "__cand", "__carrier")
  }
}
