package graft.queries

import graft.core.{GraftQuery, QueryModule}
import graft.tracking.{SkillCornerSource, SportecSource, SyntheticTracking, TrackingSource}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format queries: the provider wide-CSV → long unpivot (S1/S2 +
  * R1). A deterministic wide CSV is pivoted out of the synthetic
  * tracking table once per scale factor; Spark ingests it through
  * [[TrackingSource]] (declared schema + single-explode melt) while the
  * oracle re-reads the same file in DuckDB and unpivots with UNION ALL
  * — missing objects (null coordinates) must drop on both sides. */
object SourceQueries extends QueryModule {

  val PlayerIds: Seq[String] = Seq("h1", "h2", "h3", "a1", "a2", "a3")

  /** Original object id ('1'..'6') for a wide player id: even
    * linenumbers were home. */
  private val sourceOf: Map[String, Int] =
    Map("h1" -> 2, "h2" -> 4, "h3" -> 6, "a1" -> 1, "a2" -> 3, "a3" -> 5)

  private val generated = scala.collection.concurrent.TrieMap.empty[String, String]

  def dir(spark: SparkSession, sfDir: String): String =
    generated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_wide_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val trk = SyntheticTracking.df(spark, sfDir)
      def coord(obj: String, c: String) =
        max(when(col("id") === (if (obj == "ball") "ball" else sourceOf(obj).toString),
          col(c))).as(s"${obj}_$c")
      val cols =
        PlayerIds.flatMap(p => Seq(coord(p, "x"), coord(p, "y"))) ++
          Seq(coord("ball", "x"), coord("ball", "y"), coord("ball", "z"))
      trk.groupBy(col("game_id"), col("period_id"), col("frame_id"), col("timestamp"))
        .agg(cols.head, cols.tail: _*)
        .orderBy(col("game_id"), col("frame_id"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(s"$out/tracking")
      out
    })

  override def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_src_wide_long",
      (s, d) => {
        val root = dir(s, d)
        TrackingSource.toLong(
          TrackingSource.scanWide(s, s"$root/tracking/*.csv", PlayerIds), PlayerIds)
      },
      Some {
        val root = "/tmp/graft_wide__root_testdata_sf0.01"
        val colSpec = (Seq(
          "'game_id':'VARCHAR'", "'period_id':'INTEGER'",
          "'frame_id':'BIGINT'", "'timestamp':'BIGINT'") ++
          PlayerIds.flatMap(p => Seq(s"'${p}_x':'DOUBLE'", s"'${p}_y':'DOUBLE'")) ++
          Seq("'ball_x':'DOUBLE'", "'ball_y':'DOUBLE'", "'ball_z':'DOUBLE'"))
          .mkString(", ")
        val arms = PlayerIds.map { p =>
          val team = if (p.startsWith("h")) "home" else "away"
          s"""SELECT game_id, period_id, frame_id, timestamp, '$p' AS id,
             |  '$team' AS team_id, ${p}_x AS x, ${p}_y AS y, 0.0 AS z FROM wide""".stripMargin
        } :+
          s"""SELECT game_id, period_id, frame_id, timestamp, 'ball' AS id,
             |  'ball' AS team_id, ball_x AS x, ball_y AS y, ball_z AS z FROM wide""".stripMargin
        s"""WITH wide AS (
           |  SELECT * FROM read_csv('$root/tracking/*.csv', header=true,
           |    nullstr=['NA',''], columns={$colSpec})
           |)
           |SELECT * FROM (${arms.mkString("\nUNION ALL\n")})
           |WHERE x IS NOT NULL AND y IS NOT NULL""".stripMargin
      }),

    // Real provider ingestion (the true S1): DFL/Sportec position XML →
    // canonical long table via the built-in XML source. DuckDB has no
    // XML reader, so the oracle reads the committed golden parquet
    // (goldens/sportec_load.parquet, written by graft.tools.GoldenGen)
    // — an independent regression anchor whose VALUES are pinned by
    // SportecFixtureGoldensSpec against the reference's own test
    // goldens (483 rows, kloppy position codes, first-frame
    // kinematics, TTI 2.6428493704618106): if the loader ever drifts,
    // the hash compare fails the round.
    GraftQuery(
      "q_sportec_load",
      (s, _) => {
        val files = "/root/reference/tests/files"
        SportecSource.load(s, s"$files/sportec_tracking.xml", s"$files/sportec_meta.xml")
      },
      Some("SELECT * FROM read_parquet('/root/repo/goldens/sportec_load.parquet')")),

    // SkillCorner match-data (squad) parsing over the reference's real
    // fixture, hash-matched against DuckDB's own JSON reader.
    GraftQuery(
      "q_skillcorner_roster",
      (s, _) => SkillCornerSource.roster(
        s, "/root/reference/tests/files/skillcorner_match_data.json"),
      Some {
        """SELECT cast(m.id AS VARCHAR) AS game_id,
          |  cast(p.trackable_object AS VARCHAR) AS id,
          |  p.id AS player_id,
          |  cast(p.team_id AS VARCHAR) AS team_id,
          |  p.team_id = m.home_team.id AS is_home,
          |  CASE WHEN p.player_role.acronym = 'SUB' THEN NULL
          |       ELSE p.player_role.acronym END AS position_name,
          |  p.player_role.acronym AS role_acronym,
          |  p.number AS shirt_number,
          |  p.last_name AS name,
          |  p.start_time IS NOT NULL AS starting
          |FROM read_json('/root/reference/tests/files/skillcorner_match_data.json') m,
          |     unnest(m.players) AS t(p)""".stripMargin
      }))
}
