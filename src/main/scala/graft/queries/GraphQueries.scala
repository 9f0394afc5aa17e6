package graft.queries

import graft.core.{GraftQuery, QueryModule}
import graft.graphs.{GraphConverter, GraphSettings}
import graft.tracking._
import org.apache.spark.sql.functions._

/** Graph-construction operators (SURVEY.md §2.9) oracled in long format;
  * the nested tensor form is a rows-only query + ScalaTest. All float
  * features are rounded to 6 decimals (atan2/sin/cos/acos are libm-
  * dependent). */
object GraphQueries extends QueryModule {
  import Cols._

  /** pidat (kinematics+possession) filtered to complete frames, with the
    * reference node ordering index. */
  private val gIdxCte: String =
    """g3 AS (
      |  SELECT * FROM (
      |    SELECT *, count(DISTINCT team_id) OVER (PARTITION BY game_id, period_id, frame_id) AS nteams
      |    FROM pidat)
      |  WHERE nteams = 3
      |),
      |gidx AS (
      |  SELECT *, row_number() OVER (PARTITION BY game_id, period_id, frame_id
      |    ORDER BY (CAST(team_id = 'ball' AS INT)*2
      |              - CAST((ball_owning_team_id = team_id AND team_id <> 'ball') AS INT)) ASC,
      |             id ASC) - 1 AS node_idx
      |  FROM g3
      |)""".stripMargin

  private val pidatCte: String =
    """pidat AS (
      |  SELECT vel.game_id, vel.period_id, vel.frame_id, vel.id, vel.team_id,
      |         vel.position_name, vel.x, vel.y, vel.z, vel.vx, vel.vy, vel.vz, vel.v,
      |         q.ball_owning_team_id, q.is_ball_carrier
      |  FROM vel
      |  JOIN (SELECT game_id, period_id, frame_id, id, owning AS ball_owning_team_id,
      |               coalesce(id = carrier, false) AS is_ball_carrier
      |        FROM poss WHERE owning IS NOT NULL) q
      |  USING (game_id, period_id, frame_id, id)
      |)""".stripMargin

  private def withAll(extra: String)(select: String): String =
    s"""WITH ${SyntheticTracking.cte},
       |${SyntheticTracking.velCte},
       |${SyntheticTracking.possessionCte},
       |$pidatCte,
       |$extra
       |$select""".stripMargin

  private def pipeline(s: org.apache.spark.sql.SparkSession, d: String) = {
    val trk = SyntheticTracking.df(s, d)
    val kin = Kinematics(trk, TrackingSettings(), None, None)
    val dat = Possession.inferBallCarrier(kin, TrackingSettings())
    GraphConverter.removeIncompleteFrames(dat)
  }

  override def queries: Seq[GraftQuery] = Seq(
    // ----- G1: adjacency (split_by_team + ball connect) as pair list -----
    GraftQuery(
      "q_graph_adjacency",
      (s, d) => GraphConverter.pairs(pipeline(s, d), GraphSettings(pad = false))
        .select(col(GameId), col(PeriodId), col(FrameId),
          col(s"i_$ObjectId").as("i_id"), col(s"j_$ObjectId").as("j_id"),
          col("i_node_idx"), col("j_node_idx"), col("a")),
      Some(withAll(gIdxCte)(
        """SELECT i.game_id, i.period_id, i.frame_id,
          |  i.id AS i_id, j.id AS j_id, i.node_idx AS i_node_idx, j.node_idx AS j_node_idx,
          |  CAST((i.team_id = j.team_id) OR i.team_id = 'ball' OR j.team_id = 'ball' AS INT) AS a
          |FROM gidx i JOIN gidx j USING (game_id, period_id, frame_id)""".stripMargin))),

    // ----- G2: the 12 node feature functions (15 columns) -----
    GraftQuery(
      "q_graph_nodes",
      (s, d) => {
        val nf = GraphConverter.withNodeFeatures(pipeline(s, d), GraphSettings(pad = false))
        val names = Seq("x_n", "y_n", "v_n", "vc_sin", "vc_cos", "dgoal", "dball",
          "poss", "gk", "ball", "ag_sin", "ag_cos", "ab_sin", "ab_cos", "carrier")
        nf.select(Seq(col(GameId), col(PeriodId), col(FrameId),
          col(ObjectId).as("id"), col("node_idx")) ++
          names.zipWithIndex.map { case (n, i) =>
            round(element_at(col("x_features"), i + 1), 6).as(n)
          }: _*)
      },
      Some(withAll(gIdxCte +
        """,
          |gball AS (
          |  SELECT *,
          |    coalesce(max(CASE WHEN team_id = 'ball' THEN x END) OVER wf, 0.0) AS bx,
          |    coalesce(max(CASE WHEN team_id = 'ball' THEN y END) OVER wf, 0.0) AS gby,
          |    coalesce(max(CASE WHEN team_id = 'ball' THEN z END) OVER wf, 0.0) AS bz
          |  FROM gidx
          |  WINDOW wf AS (PARTITION BY game_id, period_id, frame_id)
          |),
          |gmag AS (
          |  SELECT *, sqrt(vx*vx + vy*vy + vz*vz) AS vmag FROM gball
          |),
          |gm AS (
          |  SELECT *, CASE WHEN vmag = 0.0 THEN 1.0 ELSE vmag END AS vm,
          |    ((atan2(vy/(CASE WHEN vmag = 0.0 THEN 1.0 ELSE vmag END),
          |            vx/(CASE WHEN vmag = 0.0 THEN 1.0 ELSE vmag END)) - (-pi())) * 1.0) / (2*pi()) AS va
          |  FROM gmag
          |)""".stripMargin)(
        """SELECT game_id, period_id, frame_id, id, node_idx,
          |  round((x - (-52.5)) / (52.5 - (-52.5)), 6) AS x_n,
          |  round((y - (-34.0)) / (34.0 - (-34.0)), 6) AS y_n,
          |  round(CASE WHEN team_id = 'ball' THEN least(greatest(v/28.0, 0.0), 1.0)
          |        ELSE least(greatest(v/12.0, 0.0), 1.0) END, 6) AS v_n,
          |  round((sin(va) + 1.0)/2.0, 6) AS vc_sin,
          |  round((cos(va) + 1.0)/2.0, 6) AS vc_cos,
          |  round(sqrt((x - 52.5)*(x - 52.5) + (y - 0.0)*(y - 0.0) + z*z)
          |        / sqrt(105.0*105.0 + 68.0*68.0), 6) AS dgoal,
          |  round(sqrt((x - bx)*(x - bx) + (y - gby)*(y - gby) + (z - bz)*(z - bz))
          |        / sqrt(105.0*105.0 + 68.0*68.0), 6) AS dball,
          |  CAST(CASE WHEN team_id = ball_owning_team_id THEN 1.0 ELSE 0.1 END AS DOUBLE) AS poss,
          |  CAST(CASE WHEN position_name = 'GK' THEN 1.0 ELSE 0.1 END AS DOUBLE) AS gk,
          |  CAST(CASE WHEN team_id = 'ball' THEN 1.0 ELSE 0.1 END AS DOUBLE) AS ball,
          |  round((sin(atan2(0.0 - y, 52.5 - x)) + 1.0)/2.0, 6) AS ag_sin,
          |  round((cos(atan2(0.0 - y, 52.5 - x)) + 1.0)/2.0, 6) AS ag_cos,
          |  round((sin(atan2(gby - y, bx - x)) + 1.0)/2.0, 6) AS ab_sin,
          |  round((cos(atan2(gby - y, bx - x)) + 1.0)/2.0, 6) AS ab_cos,
          |  CAST(CASE WHEN is_ball_carrier THEN 1.0 ELSE 0.1 END AS DOUBLE) AS carrier
          |FROM gm""".stripMargin))),

    // ----- G3: the 4 edge feature functions (6 columns) on A=1 pairs -----
    GraftQuery(
      "q_graph_edges",
      (s, d) => {
        val p = GraphConverter.pairs(pipeline(s, d), GraphSettings(pad = false))
          .filter(col("a") === 1)
        val names = Seq("dist", "vdiff", "pa_cos", "pa_sin", "va_cos", "va_sin")
        p.select(Seq(col(GameId), col(PeriodId), col(FrameId),
          col(s"i_$ObjectId").as("i_id"), col(s"j_$ObjectId").as("j_id")) ++
          names.zipWithIndex.map { case (n, i) =>
            val v = element_at(col("e_features"), i + 1)
            // +0.0 normalizes the -0.0 that clip*sign produces for
            // negative speed diffs (both engines do the same)
            val vv = if (n == "vdiff") v + lit(0.0) else v
            round(vv, 6).as(n)
          }: _*)
      },
      Some(withAll(gIdxCte +
        """,
          |epair AS (
          |  SELECT i.game_id, i.period_id, i.frame_id, i.id AS i_id, j.id AS j_id,
          |    i.x AS ix, i.y AS iy, i.z AS iz, j.x AS jx, j.y AS jy, j.z AS jz,
          |    i.vx AS ivx, i.vy AS ivy, j.vx AS jvx, j.vy AS jvy,
          |    i.v AS iv, j.v AS jv, i.team_id AS i_team,
          |    CAST((i.team_id = j.team_id) OR i.team_id = 'ball' OR j.team_id = 'ball' AS INT) AS a
          |  FROM gidx i JOIN gidx j USING (game_id, period_id, frame_id)
          |),
          |eun AS (
          |  SELECT *,
          |    sqrt((ix-jx)*(ix-jx) + (iy-jy)*(iy-jy)) AS n1,
          |    sqrt((jvx-ivx)*(jvx-ivx) + (jvy-ivy)*(jvy-ivy)) AS n2
          |  FROM epair WHERE a = 1
          |),
          |eu AS (
          |  SELECT *,
          |    CASE WHEN n1 = 0.0 THEN 0.0 ELSE (ix-jx)/n1 END AS u1x,
          |    CASE WHEN n1 = 0.0 THEN 0.0 ELSE (iy-jy)/n1 END AS u1y,
          |    CASE WHEN n2 = 0.0 THEN 0.0 ELSE (jvx-ivx)/n2 END AS u2x,
          |    CASE WHEN n2 = 0.0 THEN 0.0 ELSE (jvy-ivy)/n2 END AS u2y
          |  FROM eun
          |),
          |ea AS (
          |  SELECT *, acos(least(greatest(u1x*u2x + u1y*u2y, -1.0), 1.0)) AS vangle,
          |    atan2(iy - jy, ix - jx) AS pangle,
          |    jv - iv AS sdiff,
          |    CASE WHEN i_team = 'ball' THEN 28.0 ELSE 12.0 END AS smax
          |  FROM eu
          |)""".stripMargin)(
        """SELECT game_id, period_id, frame_id, i_id, j_id,
          |  round(sqrt((ix-jx)*(ix-jx) + (iy-jy)*(iy-jy) + (iz-jz)*(iz-jz))
          |        / sqrt(105.0*105.0 + 68.0*68.0), 6) AS dist,
          |  round(least(greatest(sdiff/smax, 0.0), 1.0) * sign(sdiff) + 0.0, 6) AS vdiff,
          |  round((cos(pangle) + 1.0)/2.0, 6) AS pa_cos,
          |  round((sin(pangle) + 1.0)/2.0, 6) AS pa_sin,
          |  round((cos(vangle) + 1.0)/2.0, 6) AS va_cos,
          |  round((sin(vangle) + 1.0)/2.0, 6) AS va_sin
          |FROM ea""".stripMargin))),

    // ----- G8 + full nested assembly (rows-only check) -----
    // The nested ARRAY<ARRAY<DOUBLE>> tensors are serialized with to_json
    // (floats rounded to 6 first) so the driver's pandas-side sort/hash
    // sees plain strings — numpy arrays are unhashable and crashed the
    // round-1 check. The tensor layout itself is golden-tested in
    // GraphConverterSpec.
    GraftQuery(
      "q_graph_frames",
      (s, d) => {
        val dat = Possession.inferBallCarrier(
          Kinematics(SyntheticTracking.df(s, d), TrackingSettings(), None, None),
          TrackingSettings())
        val g = GraphConverter.graphFrames(dat, GraphSettings(pad = true))
        def round2(c: String) =
          transform(col(c), r => transform(r, v => round(v, 6)))
        g.select(col(GameId), col(PeriodId), col(FrameId),
          to_json(round2("x")).as("x_json"),
          to_json(round2("e")).as("e_json"),
          to_json(col("a")).as("a_json"),
          to_json(col("object_ids")).as("object_ids_json"))
      },
      None,
      headline = true))
}
