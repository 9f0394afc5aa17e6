package graft.queries

import graft.core.{GraftQuery, QueryModule}
import graft.football.{AfFeatures, AfSynthetic, BigDataBowl}
import org.apache.spark.sql.functions._

/** American-football vertical (S2/S3 CSV ingest, F2/F8 height/weight
  * extraction, M10-NFL rotation, frame-id synthesis, G9-AF frame
  * filter, G4/G5 features), oracled against DuckDB reading the SAME
  * deterministic CSV fixtures — so the verified surface is the ingest
  * and transform pipeline, not the fixture generator. */
object FootballQueries extends QueryModule {

  /** DuckDB CTE chain mirroring BigDataBowl.load over the fixture CSVs. */
  private def loadCtes(root: String): String = {
    val rad = (c: String) => s"((($c * pi()/180.0) + pi()) % (2*pi())) - pi()"
    s"""aft AS (
       |  SELECT * FROM read_csv('${AfSynthetic.trackingGlob(root)}', header=true,
       |    nullstr=['NA',''],
       |    columns={'gameId':'BIGINT','playId':'BIGINT','frameId':'BIGINT',
       |             'nflId':'DOUBLE','club':'VARCHAR','playDirection':'VARCHAR',
       |             'x':'DOUBLE','y':'DOUBLE','s':'DOUBLE','a':'DOUBLE',
       |             'o':'DOUBLE','dir':'DOUBLE'})
       |),
       |afr AS (
       |  SELECT gameId AS game_id, playId AS play_id, frameId,
       |    CASE WHEN club = 'football' THEN -9999.9 ELSE nflId END AS id,
       |    club AS team_id, s, a,
       |    CASE WHEN playDirection = 'left' THEN (x - 120.0/2.0) * -1.0
       |         ELSE (x - 120.0/2.0) END AS x,
       |    CASE WHEN playDirection = 'left' THEN (y - 53.3/2.0) * -1.0
       |         ELSE (y - 53.3/2.0) END AS y,
       |    ${rad("(CASE WHEN playDirection = 'left' THEN o + 180.0 ELSE o END)")} AS o,
       |    ${rad("(CASE WHEN playDirection = 'left' THEN dir + 180.0 ELSE dir END)")} AS dir
       |  FROM aft
       |),
       |afp AS (
       |  SELECT * FROM read_csv('${AfSynthetic.playersGlob(root)}', header=true,
       |    nullstr=['NA',''],
       |    columns={'nflId':'BIGINT','height':'VARCHAR','weight':'DOUBLE',
       |             'position':'VARCHAR','birthDate':'DATE'})
       |),
       |afm AS (
       |  SELECT CAST(nflId AS DOUBLE) AS id, position AS position_name,
       |    round((TRY_CAST(regexp_extract(height, '(\\d+)', 1) AS DOUBLE) * 30.48
       |           + TRY_CAST(regexp_extract(height, '\\d+-(\\d+)', 1) AS DOUBLE) * 2.54) / 10.0, 0) * 10.0 AS height_cm,
       |    round(weight * 0.453592 / 10.0, 0) * 10.0 AS weight_kg
       |  FROM afp
       |),
       |afpl AS (
       |  SELECT gameId AS game_id, playId AS play_id,
       |    possessionTeam AS ball_owning_team_id
       |  FROM read_csv('${AfSynthetic.playsGlob(root)}', header=true,
       |    columns={'gameId':'BIGINT','playId':'BIGINT','possessionTeam':'VARCHAR'})
       |),
       |afload AS (
       |  SELECT r.game_id, r.play_id, r.play_id * 100000 + r.frameId AS frame_id,
       |    r.id, r.team_id, m.position_name, m.height_cm, m.weight_kg,
       |    r.x, r.y, r.s AS v, r.a, r.o, r.dir, p.ball_owning_team_id
       |  FROM afr r
       |  LEFT JOIN afm m ON m.id = r.id
       |  LEFT JOIN afpl p ON p.game_id = r.game_id AND p.play_id = r.play_id
       |),
       |afc AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER wf AS fsize,
       |      sum(CASE WHEN team_id = 'football' THEN 1 ELSE 0 END) OVER wf AS nfb
       |    FROM afload
       |    WINDOW wf AS (PARTITION BY game_id, play_id, frame_id))
       |  WHERE fsize >= 10 AND nfb > 0
       |)""".stripMargin
  }

  private val outCols = Seq("game_id", "play_id", "frame_id", "id", "team_id",
    "position_name", "height_cm", "weight_kg", "x", "y", "v", "a")

  /** Ball-position / unit-vector helper CTEs over `afc` (mirrors
    * AfFeatures.withNodeFeatures staging). */
  private val featCtes: String =
    """afb AS (
      |  SELECT *,
      |    max(CASE WHEN team_id = 'football' THEN x END) OVER wf AS bx,
      |    max(CASE WHEN team_id = 'football' THEN y END) OVER wf AS by
      |  FROM afc
      |  WINDOW wf AS (PARTITION BY game_id, play_id, frame_id)
      |),
      |afuv AS (
      |  SELECT *,
      |    coalesce(v, 0.0) * cos(coalesce(dir, 0.0)) AS svx,
      |    coalesce(v, 0.0) * sin(coalesce(dir, 0.0)) AS svy,
      |    coalesce(a, 0.0) * cos(coalesce(dir, 0.0)) AS avx,
      |    coalesce(a, 0.0) * sin(coalesce(dir, 0.0)) AS avy
      |  FROM afb
      |),
      |afn AS (
      |  -- frame-global Frobenius norms: the reference feeds whole-frame
      |  -- arrays to unit_vector_from_angle, so np.linalg.norm spans the
      |  -- frame, not the row (features/utils.py:150-166)
      |  SELECT *,
      |    sqrt(sum(coalesce(v, 0.0) * coalesce(v, 0.0))
      |      OVER (PARTITION BY game_id, play_id, frame_id)) AS snorm,
      |    sqrt(sum(coalesce(a, 0.0) * coalesce(a, 0.0))
      |      OVER (PARTITION BY game_id, play_id, frame_id)) AS anorm
      |  FROM afuv
      |)""".stripMargin

  /** The 20 node-feature expressions over `afn` columns, in
    * AfFeatures.NodeFeatureNames order. `+ 0.0` normalizes DuckDB's
    * `-0.0` round outputs to match Spark's BigDecimal-based round. */
  private val featureExprs: Seq[(String, String)] = Seq(
    "x_n" -> "round(coalesce((x - (-(120.0/2.0))) / ((120.0/2.0) - (-(120.0/2.0))), 0.0), 6) + 0.0",
    "y_n" -> "round(coalesce((y - (-(53.3/2.0))) / ((53.3/2.0) - (-(53.3/2.0))), 0.0), 6) + 0.0",
    "uv_sx" -> "round(coalesce(CASE WHEN snorm = 0.0 THEN 0.0 ELSE svx/snorm END, 0.0), 6) + 0.0",
    "uv_sy" -> "round(coalesce(CASE WHEN snorm = 0.0 THEN 0.0 ELSE svy/snorm END, 0.0), 6) + 0.0",
    "s_n" -> "round(coalesce(least(greatest(v / (CASE WHEN team_id = 'football' THEN 28.0 ELSE 12.0 END), 0.0), 1.0), 0.0), 6) + 0.0",
    "uv_ax" -> "round(coalesce(CASE WHEN anorm = 0.0 THEN 0.0 ELSE avx/anorm END, 0.0), 6) + 0.0",
    "uv_ay" -> "round(coalesce(CASE WHEN anorm = 0.0 THEN 0.0 ELSE avy/anorm END, 0.0), 6) + 0.0",
    "a_n" -> "round(coalesce(least(greatest(a / (CASE WHEN team_id = 'football' THEN 13.5 ELSE 6.0 END), -1.0), 1.0), 0.0), 6) + 0.0",
    "dir_sin" -> "round((coalesce(sin(dir), 0.0) + 1.0) / 2.0, 6) + 0.0",
    "dir_cos" -> "round((coalesce(cos(dir), 0.0) + 1.0) / 2.0, 6) + 0.0",
    "o_sin" -> "round((coalesce(sin(o), 0.0) + 1.0) / 2.0, 6) + 0.0",
    "o_cos" -> "round((coalesce(cos(o), 0.0) + 1.0) / 2.0, 6) + 0.0",
    "dgoal" -> ("round(coalesce(sqrt((x - 120.0/2.0)*(x - 120.0/2.0) + (y - 0.0)*(y - 0.0))" +
      " / sqrt(120.0*120.0 + 53.3*53.3), 0.0), 6) + 0.0"),
    "dball" -> ("round(coalesce(sqrt((x - bx)*(x - bx) + (y - by)*(y - by))" +
      " / sqrt(120.0*120.0 + 53.3*53.3), 0.0), 6) + 0.0"),
    "dend" -> "round(coalesce(((120.0/2.0 - 10.0) - x - 0.0) / (120.0 - 0.0), 0.0), 6) + 0.0",
    "poss" -> "CAST(round(coalesce(CASE WHEN team_id = ball_owning_team_id THEN 1.0 ELSE 0.1 END, 0.0), 6) AS DOUBLE)",
    "qb" -> ("CAST(round(coalesce(CASE WHEN position_name = 'QB' THEN 1.0" +
      " ELSE (CASE WHEN team_id = ball_owning_team_id THEN 0.1 ELSE 0.0 END) END, 0.0), 6) AS DOUBLE)"),
    "ball" -> "CAST(round(CASE WHEN team_id = 'football' THEN 1.0 ELSE 0.0 END, 6) AS DOUBLE)",
    "weight_n" -> "round(coalesce((weight_kg - 60.0) / (200.0 - 60.0), 0.0), 6) + 0.0",
    "height_n" -> "round(coalesce((height_cm - 150.0) / (225.0 - 150.0), 0.0), 6) + 0.0")

  override def queries: Seq[GraftQuery] = Seq(

    // ----- S2/S3 + F2/F8 + M10-NFL + frame synthesis + J3 -----
    GraftQuery(
      "q_af_load",
      (s, d) => {
        val root = AfSynthetic.dir(s, d)
        BigDataBowl.load(s, root).select(
          outCols.map(col) ++ Seq(
            round(col("o"), 6).as("o"), round(col("dir"), 6).as("dir"),
            col("ball_owning_team_id")): _*)
      },
      Some { // root path is deterministic per sfDir: mirror it
        s"""WITH ${loadCtes("__ROOT__")}
           |SELECT game_id, play_id, frame_id, id, team_id, position_name,
           |  height_cm, weight_kg, x, y, v, a,
           |  round(o, 6) AS o, round(dir, 6) AS dir, ball_owning_team_id
           |FROM afload""".stripMargin
      }),

    // ----- G9-AF frame completeness filter -----
    GraftQuery(
      "q_af_frame_filter",
      (s, d) => {
        val root = AfSynthetic.dir(s, d)
        BigDataBowl.removeIncompleteFrames(BigDataBowl.load(s, root))
          .groupBy(col("game_id"), col("play_id"), col("frame_id"))
          .agg(count(lit(1)).as("n_objects"),
            sum((col("team_id") === "football").cast("long")).as("n_football"))
      },
      Some(s"""WITH ${loadCtes("__ROOT__")}
              |SELECT game_id, play_id, frame_id,
              |  count(*) AS n_objects,
              |  CAST(sum(CASE WHEN team_id = 'football' THEN 1 ELSE 0 END) AS BIGINT) AS n_football
              |FROM afc GROUP BY game_id, play_id, frame_id""".stripMargin)),

    // ----- G4: 20 AF node features -----
    GraftQuery(
      "q_af_nodes",
      (s, d) => {
        val root = AfSynthetic.dir(s, d)
        val dat = BigDataBowl.removeIncompleteFrames(BigDataBowl.load(s, root))
        AfFeatures.withNodeFeatures(dat).select(
          Seq(col("game_id"), col("play_id"), col("frame_id"), col("id")) ++
            AfFeatures.NodeFeatureNames.map(n => round(col(n), 6).as(n)): _*)
      },
      Some(s"""WITH ${loadCtes("__ROOT__")},
              |$featCtes
              |SELECT game_id, play_id, frame_id, id,
              |  ${featureExprs.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")}
              |FROM afn""".stripMargin)),

    // ----- AF nested node-tensor assembly (x matrix + object_ids),
    // verifying the reference node-order contract for AF (same sort as
    // soccer: possession first, football last, id within group) -----
    GraftQuery(
      "q_af_graph",
      (s, d) => {
        val root = AfSynthetic.dir(s, d)
        val dat = BigDataBowl.removeIncompleteFrames(BigDataBowl.load(s, root))
        AfFeatures.graphFrames(dat)
          .select(Seq(col("game_id"), col("play_id"), col("frame_id")) :+
            posexplode(arrays_zip(col("x"), col("object_ids"))).as(Seq("node_idx", "node")): _*)
          .select(Seq(col("game_id"), col("play_id"), col("frame_id"),
            col("node_idx").cast("long").as("node_idx"),
            col("node.object_ids").as("id")) :+
            posexplode(col("node.x")).as(Seq("feature_idx", "value")): _*)
          .select(col("game_id"), col("play_id"), col("frame_id"), col("node_idx"),
            col("id"), col("feature_idx").cast("long").as("feature_idx"), col("value"))
      },
      Some {
        val arms = featureExprs.zipWithIndex
          .map { case ((n, _), i) => s"WHEN ${i + 1} THEN $n" }.mkString(" ")
        s"""WITH ${loadCtes("__ROOT__")},
           |$featCtes,
           |afx AS (
           |  SELECT game_id, play_id, frame_id, id, team_id, ball_owning_team_id,
           |    ${featureExprs.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")}
           |  FROM afn
           |),
           |afi AS (
           |  SELECT *, row_number() OVER (PARTITION BY game_id, play_id, frame_id
           |    ORDER BY (CAST(team_id = 'football' AS INT)*2
           |              - CAST(ball_owning_team_id = team_id AND team_id <> 'football' AS INT)) ASC,
           |             id ASC) - 1 AS node_idx
           |  FROM afx
           |)
           |SELECT game_id, play_id, frame_id, node_idx, id, k - 1 AS feature_idx,
           |  CASE k ${arms} END AS value
           |FROM afi CROSS JOIN (SELECT unnest(generate_series(1, ${featureExprs.size})) AS k) ks""".stripMargin
      }),

    // ----- G5: 9 AF edge features on A=1 pairs -----
    GraftQuery(
      "q_af_edges",
      (s, d) => {
        val root = AfSynthetic.dir(s, d)
        val dat = BigDataBowl.removeIncompleteFrames(BigDataBowl.load(s, root))
        AfFeatures.pairs(dat).filter(col("a") === 1).select(
          Seq(col("game_id"), col("play_id"), col("frame_id"),
            col("i_id"), col("j_id")) ++
            AfFeatures.EdgeFeatureNames.map(n => round(col(n), 6).as(n)): _*)
      },
      Some(s"""WITH ${loadCtes("__ROOT__")},
              |afe AS (
              |  SELECT i.game_id, i.play_id, i.frame_id, i.id AS i_id, j.id AS j_id,
              |    i.x AS ix, i.y AS iy, j.x AS jx, j.y AS jy,
              |    i.v AS i_s, j.v AS j_s, i.a AS i_a, j.a AS j_a,
              |    i.o AS i_o, j.o AS j_o, i.dir AS i_dir, j.dir AS j_dir,
              |    i.team_id AS i_team,
              |    CASE WHEN i.team_id = 'football' THEN 28.0 ELSE 12.0 END AS smax,
              |    CASE WHEN i.team_id = 'football' THEN 13.5 ELSE 6.0 END AS amax
              |  FROM afc i JOIN afc j
              |    ON i.game_id = j.game_id AND i.play_id = j.play_id AND i.frame_id = j.frame_id
              |  WHERE i.team_id = j.team_id OR i.team_id = 'football' OR j.team_id = 'football'
              |),
              |afd AS (
              |  SELECT *, coalesce(j_s - i_s, 0.0) AS sdiff, coalesce(j_a - i_a, 0.0) AS adiff,
              |    atan2(iy - jy, ix - jx) AS pang, j_dir - i_dir AS ddiff, j_o - i_o AS odiff
              |  FROM afe
              |)
              |SELECT game_id, play_id, frame_id, i_id, j_id,
              |  round(coalesce(sqrt((ix-jx)*(ix-jx) + (iy-jy)*(iy-jy))
              |        / sqrt(120.0*120.0 + 53.3*53.3), 0.0), 6) AS dist_n,
              |  round(coalesce(least(greatest(sdiff / smax, 0.0), 1.0) * sign(sdiff) + 0.0, 0.0), 6) AS sdiff_n,
              |  round(coalesce(least(greatest(adiff / amax, -1.0), 1.0), 0.0), 6) + 0.0 AS adiff_n,
              |  round((coalesce(cos(pang), 0.0) + 1.0) / 2.0, 6) AS pos_cos,
              |  round((coalesce(sin(pang), 0.0) + 1.0) / 2.0, 6) AS pos_sin,
              |  round((coalesce(cos(ddiff), 0.0) + 1.0) / 2.0, 6) AS dir_cos,
              |  round((coalesce(sin(ddiff), 0.0) + 1.0) / 2.0, 6) AS dir_sin,
              |  round((coalesce(cos(odiff), 0.0) + 1.0) / 2.0, 6) AS o_cos,
              |  round((coalesce(sin(odiff), 0.0) + 1.0) / 2.0, 6) AS o_sin
              |FROM afd""".stripMargin))
  ).map(injectRoot)

  /** The oracle SQL is built before the fixture root is known (it
    * depends on sfDir at run time), so queries carry a `__ROOT__`
    * placeholder... except the driver snapshots oracle SQL statically.
    * The root path is a pure function of sfDir, so resolve it for the
    * sf0.01 dir the driver verifies against; Verify always runs the
    * Spark side first, which generates the fixtures for that dir. */
  private def injectRoot(q: GraftQuery): GraftQuery =
    q.copy(oracle = q.oracle.map(_.replace("__ROOT__",
      "/tmp/graft_af__root_testdata_sf0.01")))
}
