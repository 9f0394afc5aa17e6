package graft.tracking

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic tracking table derived from `lineitem`, used
  * to oracle-check the tracking operators against DuckDB: the SQL CTE
  * below performs the *same* integer/IEEE arithmetic, so results must
  * hash-match exactly. One lineitem row = one (frame, object) row;
  * line 7 plays the ball. Positions are pseudo-random but reproducible
  * pitch coordinates; frames step 40 ms apart per orderkey.
  */
object SyntheticTracking {
  import Cols._

  def df(spark: SparkSession, sfDir: String): DataFrame = {
    // The synthetic lineitem has duplicate (orderkey, linenumber) pairs;
    // a tracking table needs one row per (frame, object). Deterministic
    // representative: smallest (partkey, suppkey, extendedprice) —
    // expressed as a partial-aggregable min(struct) groupBy (map-side
    // combine, no sort) rather than a row_number window: every value
    // below derives from (orderkey, linenumber, partkey, suppkey), so
    // the lexicographic struct minimum IS the row_number=1 row.
    val li = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(struct(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))).as("__m"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("__m.l_partkey").as("l_partkey"), col("__m.l_suppkey").as("l_suppkey"))
    li.select(
      (col("l_orderkey") % 3).cast("string").as(GameId),
      (col("l_orderkey") % 2 + 1).cast("int").as(PeriodId),
      col("l_orderkey").cast("long").as(FrameId),
      (col("l_orderkey") * 40000L).cast("long").as(Timestamp),
      when(col("l_linenumber") === 7, lit(Ball))
        .otherwise(col("l_linenumber").cast("string")).as(ObjectId),
      when(col("l_linenumber") === 7, lit(Ball))
        .when(col("l_linenumber") % 2 === 0, lit("home"))
        .otherwise(lit("away")).as(TeamId),
      lit(null).cast("string").as(PositionName),
      ((col("l_partkey") % 1050).cast("double") / 10.0 - 52.5).as(X),
      (((col("l_suppkey") * 97 + col("l_partkey") * 31) % 680).cast("double") / 10.0 - 34.0).as(Y),
      when(col("l_linenumber") === 7, (col("l_partkey") % 30).cast("double") / 10.0)
        .otherwise(lit(0.0)).as(Z),
      lit("alive").as(BallState),
      lit(null).cast("string").as(BallOwningTeamId))
  }

  /** DuckDB CTE computing the identical table (timestamp named ts_us —
    * only output column names must match the Spark side). */
  val cte: String =
    """tracking AS (
      |  SELECT
      |    CAST(l_orderkey % 3 AS VARCHAR) AS game_id,
      |    CAST(l_orderkey % 2 + 1 AS INTEGER) AS period_id,
      |    CAST(l_orderkey AS BIGINT) AS frame_id,
      |    CAST(l_orderkey * 40000 AS BIGINT) AS ts_us,
      |    CASE WHEN l_linenumber = 7 THEN 'ball' ELSE CAST(l_linenumber AS VARCHAR) END AS id,
      |    CASE WHEN l_linenumber = 7 THEN 'ball'
      |         WHEN l_linenumber % 2 = 0 THEN 'home' ELSE 'away' END AS team_id,
      |    CAST(NULL AS VARCHAR) AS position_name,
      |    CAST(l_partkey % 1050 AS DOUBLE)/10.0 - 52.5 AS x,
      |    CAST((l_suppkey*97 + l_partkey*31) % 680 AS DOUBLE)/10.0 - 34.0 AS y,
      |    CASE WHEN l_linenumber = 7 THEN CAST(l_partkey % 30 AS DOUBLE)/10.0 ELSE 0.0 END AS z
      |  FROM lineitem
      |  QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
      |    ORDER BY l_partkey, l_suppkey, l_extendedprice) = 1
      |)""".stripMargin

  /** Velocity/acceleration CTEs replicating Kinematics (no smoothing):
    * appends `vel` with vx..a columns (v/a capped). */
  val velCte: String =
    """vbase AS (
      |  SELECT *, CAST(ts_us // 1000 AS BIGINT)/1000.0 AS sec FROM tracking
      |),
      |vdiff AS (
      |  SELECT *,
      |    sec - lag(sec) OVER w AS dt,
      |    x - lag(x) OVER w AS dx,
      |    y - lag(y) OVER w AS dy,
      |    z - lag(z) OVER w AS dz
      |  FROM vbase
      |  WINDOW w AS (PARTITION BY game_id, id, period_id ORDER BY ts_us)
      |),
      |vcomp AS (
      |  SELECT *,
      |    coalesce(dx/dt, 0.0) AS vx,
      |    coalesce(dy/dt, 0.0) AS vy,
      |    coalesce(dz/dt, 0.0) AS vz
      |  FROM vdiff
      |),
      |vmag AS (
      |  SELECT *, sqrt(vx*vx + vy*vy + vz*vz) AS v_raw FROM vcomp
      |),
      |acomp AS (
      |  SELECT *,
      |    coalesce((vx - lag(vx) OVER w)/dt, 0.0) AS ax,
      |    coalesce((vy - lag(vy) OVER w)/dt, 0.0) AS ay,
      |    coalesce((vz - lag(vz) OVER w)/dt, 0.0) AS az
      |  FROM vmag
      |  WINDOW w AS (PARTITION BY game_id, id, period_id ORDER BY ts_us)
      |),
      |amag AS (
      |  SELECT *, sqrt(ax*ax + ay*ay + az*az) AS a_raw FROM acomp
      |),
      |vel AS (
      |  SELECT *,
      |    CASE WHEN id = 'ball' AND v_raw > 28.0 THEN 28.0
      |         WHEN id <> 'ball' AND v_raw > 12.0 THEN 12.0
      |         ELSE v_raw END AS v,
      |    CASE WHEN id = 'ball' AND a_raw > 13.5 THEN 13.5
      |         WHEN id <> 'ball' AND a_raw > 6.0 THEN 6.0
      |         ELSE a_raw END AS a
      |  FROM amag
      |)""".stripMargin

  /** Possession/carrier inference CTEs replicating Possession: appends
    * `poss` (rows with inferred ball_owning_team_id, is_ball_carrier). */
  val possessionCte: String =
    """pball AS (
      |  SELECT *,
      |    max(CASE WHEN team_id = 'ball' THEN x END) OVER wfb AS bx,
      |    max(CASE WHEN team_id = 'ball' THEN y END) OVER wfb AS by,
      |    max(CASE WHEN team_id = 'ball' THEN z END) OVER wfb AS bz
      |  FROM tracking
      |  WINDOW wfb AS (PARTITION BY game_id, period_id, frame_id)
      |),
      |pdist AS (
      |  SELECT *, CASE WHEN team_id = 'ball' THEN NULL
      |    ELSE sqrt((x-bx)*(x-bx) + (y-by)*(y-by) + (z-bz)*(z-bz)) END AS dist
      |  FROM pball
      |),
      |prn1 AS (
      |  SELECT *, row_number() OVER (PARTITION BY game_id, period_id, frame_id
      |    ORDER BY dist ASC NULLS LAST, id) AS rn1
      |  FROM pdist
      |),
      |p1 AS (
      |  SELECT *, max(CASE WHEN rn1 = 1 AND dist < 25.0 THEN team_id END) OVER wfo AS owning
      |  FROM prn1
      |  WINDOW wfo AS (PARTITION BY game_id, period_id, frame_id)
      |),
      |prn2 AS (
      |  SELECT *, row_number() OVER (PARTITION BY game_id, period_id, frame_id
      |    ORDER BY (CASE WHEN team_id = owning THEN dist END) ASC NULLS LAST, id) AS rn2
      |  FROM p1
      |),
      |poss AS (
      |  SELECT *, max(CASE WHEN rn2 = 1 AND team_id = owning AND dist < 25.0 THEN id END) OVER wfc AS carrier
      |  FROM prn2
      |  WINDOW wfc AS (PARTITION BY game_id, period_id, frame_id)
      |)""".stripMargin
}
