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

  def df(spark: SparkSession, sfDir: String): DataFrame = df(spark, sfDir, Nil)

  /** As [[df]], but pre-clustered: when `clusterBy` (a subset of this
    * table's key columns, e.g. [[Cols.ByObjectPeriod]] or
    * [[Cols.ByFrame]]) names the partitioning the FIRST downstream
    * window/aggregation needs, one explicit repartition serves both the
    * dedup groupBy and that window — the plan carries exactly one
    * exchange up to the first window instead of two (dedup key, window
    * key), and the single-task parquet scan stage (the sf0.1 file is
    * one row group) sheds its per-row aggregation work entirely.
    *
    * Why this is safe: every clusterable key derives from `l_orderkey`
    * alone (`game_id`/`period_id`/`frame_id`) or from `(l_orderkey,
    * l_linenumber)` (`id`), so ANY partitioning over them co-locates
    * all duplicates of a given (orderkey, linenumber) pair; the dedup
    * groupBy lists the derived key columns (bijective in (orderkey,
    * linenumber)) so Catalyst can prove the clustering is satisfied.
    *
    * The dedup itself takes `min(l_partkey*2^32 + l_suppkey)` — a
    * plain BIGINT min (hash-aggregable, codegen) instead of the former
    * `min(struct(partkey, suppkey, extendedprice))`, which forced a
    * SortAggregate (struct buffers are not hash-agg mutable types) and
    * a full in-task sort. Dropping `l_extendedprice` from the minimum
    * is exact: the emitted values read only partkey/suppkey, and the
    * lexicographic (partkey, suppkey, extendedprice) minimum has the
    * same (partkey, suppkey) as the (partkey, suppkey) minimum. */
  def df(spark: SparkSession, sfDir: String, clusterBy: Seq[String]): DataFrame = {
    // The synthetic lineitem has duplicate (orderkey, linenumber) pairs;
    // a tracking table needs one row per (frame, object). Deterministic
    // representative: smallest (partkey, suppkey) — see scaladoc above.
    val keyed = Tables.lineitem(spark, sfDir).select(
      (col("l_orderkey") % 3).cast("string").as(GameId),
      (col("l_orderkey") % 2 + 1).cast("int").as(PeriodId),
      col("l_orderkey").cast("long").as(FrameId),
      when(col("l_linenumber") === 7, lit(Ball))
        .otherwise(col("l_linenumber").cast("string")).as(ObjectId),
      when(col("l_linenumber") === 7, lit(Ball))
        .when(col("l_linenumber") % 2 === 0, lit("home"))
        .otherwise(lit("away")).as(TeamId),
      (col("l_partkey") * 4294967296L + col("l_suppkey")).as("__pksk"))
    val parted =
      if (clusterBy.nonEmpty) keyed.repartition(clusterBy.map(col): _*) else keyed
    val dedup = parted
      .groupBy(col(GameId), col(PeriodId), col(FrameId), col(ObjectId), col(TeamId))
      .agg(min(col("__pksk")).as("__m"))
    val pk = shiftright(col("__m"), 32)
    val sk = col("__m").bitwiseAND(4294967295L)
    dedup.select(
      col(GameId),
      col(PeriodId),
      col(FrameId),
      (col(FrameId) * 40000L).cast("long").as(Timestamp),
      col(ObjectId),
      col(TeamId),
      lit(null).cast("string").as(PositionName),
      ((pk % 1050).cast("double") / 10.0 - 52.5).as(X),
      (((sk * 97 + pk * 31) % 680).cast("double") / 10.0 - 34.0).as(Y),
      when(col(ObjectId) === Ball, (pk % 30).cast("double") / 10.0)
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
