package graft.queries

import graft.core.{GraftQuery, QueryModule}
import graft.tracking.{HawkEyeSource, MetricaSource, PffSource, SecondSpectrumSource, SignalitySource, SkillCornerSource, SportecEvents, SportecSource, StatsPerformSource, SyntheticTracking, TracabSource, TrackingSource}
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
  private val tracabGenerated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-match Tracab DAT fixture generated from the synthetic table
    * (game '0'), once per (sfDir, JVM). */
  def tracabDir(spark: SparkSession, sfDir: String): String =
    tracabGenerated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_tracab_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      TracabSource.writeDat(
        SyntheticTracking.df(spark, sfDir).filter(col("game_id") === "0"), out)
      out
    })

  private val spectrumGenerated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-match SecondSpectrum JSONL fixture generated from the
    * synthetic table (game '1'), once per (sfDir, JVM). */
  def spectrumDir(spark: SparkSession, sfDir: String): String =
    spectrumGenerated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_2spectrum_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      SecondSpectrumSource.writeJsonl(
        SyntheticTracking.df(spark, sfDir).filter(col("game_id") === "1"), out)
      out
    })

  private val statsperformGenerated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-match StatsPerform MA25/MA1 fixture generated from the
    * synthetic table (game '0'), once per (sfDir, JVM). */
  def statsperformDir(spark: SparkSession, sfDir: String): String =
    statsperformGenerated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_statsperform_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      StatsPerformSource.writeMa25(
        SyntheticTracking.df(spark, sfDir).filter(col("game_id") === "0"), out)
      out
    })

  private val pffGenerated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-match PFF frames/roster/meta fixture generated from the
    * synthetic table (game '1'), once per (sfDir, JVM). */
  def pffDir(spark: SparkSession, sfDir: String): String =
    pffGenerated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_pff_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      PffSource.writeTracking(
        SyntheticTracking.df(spark, sfDir).filter(col("game_id") === "1"), out)
      out
    })

  private val hawkeyeGenerated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-match HawkEye per-minute ball/centroid fixture generated from
    * the synthetic table (game '2'), once per (sfDir, JVM). */
  def hawkeyeDir(spark: SparkSession, sfDir: String): String =
    hawkeyeGenerated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_hawkeye_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      HawkEyeSource.writeFeeds(
        SyntheticTracking.df(spark, sfDir).filter(col("game_id") === "2"), out)
      out
    })

  private val signalityGenerated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-match Signality per-period array-feed fixture generated from
    * the synthetic table (game '1'), once per (sfDir, JVM). */
  def signalityDir(spark: SparkSession, sfDir: String): String =
    signalityGenerated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_signality_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      SignalitySource.writeFeeds(
        SyntheticTracking.df(spark, sfDir).filter(col("game_id") === "1"), out)
      out
    })

  private val metricaGenerated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-match Metrica home/away CSV fixture generated from the
    * synthetic table (game '2'), once per (sfDir, JVM). */
  def metricaDir(spark: SparkSession, sfDir: String): String =
    metricaGenerated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_metrica_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      MetricaSource.writeCsv(
        SyntheticTracking.df(spark, sfDir).filter(col("game_id") === "2"), out)
      out
    })

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

    // Metrica open-data CSV pair → canonical long table. Same
    // fully-recomputed oracle pattern: DuckDB re-reads the generated
    // home/away CSVs (skip=3 headers), unpivots with UNION ALL arms,
    // denormalizes the [0,1] top-left coordinates to center-origin
    // meters with the y flip, rebases the continuous match clock per
    // period, and replays the static flip.
    GraftQuery(
      "q_metrica_load",
      (s, d) => {
        val root = metricaDir(s, d)
        MetricaSource.load(s, s"$root/home/tracking.csv",
          s"$root/away/tracking.csv", gameId = "2")
      },
      Some {
        val root = "/tmp/graft_metrica__root_testdata_sf0.01"
        def cols(js: Seq[Int]) =
          (Seq("'period':'INTEGER'", "'frame':'BIGINT'", "'t':'DOUBLE'") ++
            js.flatMap(j => Seq(s"'x$j':'DOUBLE'", s"'y$j':'DOUBLE'")) ++
            Seq("'bx':'DOUBLE'", "'by':'DOUBLE'")).mkString(", ")
        def arms(side: String, js: Seq[Int], tbl: String) =
          js.map(j =>
            s"""SELECT period, frame, t, '${side}_$j' AS id, '$side' AS team_id,
               |  x$j AS xn, y$j AS yn FROM $tbl""".stripMargin)
        val armsAll = (arms("home", Seq(2, 4, 6), "h") ++
          Seq("""SELECT period, frame, t, 'ball' AS id, 'ball' AS team_id,
                |  bx AS xn, by AS yn FROM h""".stripMargin) ++
          arms("away", Seq(1, 3, 5), "a")).mkString("\nUNION ALL\n")
        s"""WITH h AS (
           |  SELECT * FROM read_csv('$root/home/tracking.csv', skip=3,
           |    header=false, nullstr='', columns={${cols(Seq(2, 4, 6))}})
           |),
           |a AS (
           |  SELECT * FROM read_csv('$root/away/tracking.csv', skip=3,
           |    header=false, nullstr='', columns={${cols(Seq(1, 3, 5))}})
           |),
           |long AS (
           |  SELECT * FROM ($armsAll)
           |  WHERE xn IS NOT NULL AND yn IS NOT NULL
           |),
           |offs AS (SELECT period, min(t) AS t0 FROM long GROUP BY period),
           |canon AS (
           |  SELECT '2' AS game_id, l.period AS period_id, l.frame AS frame_id,
           |    CAST(round((l.t - o.t0) * 1000000.0) AS BIGINT) AS "timestamp",
           |    l.id, l.team_id,
           |    CASE WHEN l.team_id = 'ball' THEN 'ball' END AS position_name,
           |    (l.xn - 0.5) * 105.0 AS x, (0.5 - l.yn) * 68.0 AS y,
           |    CAST(0.0 AS DOUBLE) AS z,
           |    CAST(NULL AS VARCHAR) AS ball_state,
           |    CAST(NULL AS VARCHAR) AS ball_owning_team_id
           |  FROM long l JOIN offs o ON o.period = l.period
           |),
           |pm AS (
           |  SELECT period_id, frame_id,
           |    avg(CASE WHEN team_id = 'home' THEN x END) AS hx,
           |    avg(CASE WHEN team_id = 'away' THEN x END) AS ax
           |  FROM canon WHERE team_id <> 'ball'
           |  GROUP BY period_id, frame_id
           |),
           |ltr AS (
           |  SELECT period_id, (hx < ax) AS home_ltr FROM pm
           |  QUALIFY row_number() OVER (PARTITION BY period_id ORDER BY frame_id) = 1
           |)
           |SELECT c.game_id, c.period_id, c.frame_id, c."timestamp", c.id,
           |  c.team_id, c.position_name,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.x ELSE c.x END AS x,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.y ELSE c.y END AS y,
           |  c.z, c.ball_state, c.ball_owning_team_id
           |FROM canon c LEFT JOIN ltr l USING (period_id)""".stripMargin
      }),

    // SecondSpectrum JSONL → canonical long table. Like Tracab, no
    // reference fixture ships, so the JSONL is generated once per
    // scale factor from the synthetic table (game '1') and BOTH
    // engines parse the same text independently — DuckDB with its own
    // JSON reader, including the lastTouch/live mapping, the
    // gameClock→micros conversion and the per-period static flip.
    GraftQuery(
      "q_2spectrum_load",
      (s, d) => {
        val root = spectrumDir(s, d)
        SecondSpectrumSource.load(s, s"$root/frames/*.txt", s"$root/meta.json")
      },
      Some {
        val root = "/tmp/graft_2spectrum__root_testdata_sf0.01"
        s"""WITH j AS (
           |  SELECT * FROM read_json('$root/frames/*.txt',
           |    format='newline_delimited',
           |    columns={'period':'INTEGER','frameIdx':'BIGINT','gameClock':'DOUBLE',
           |      'live':'BOOLEAN','lastTouch':'VARCHAR',
           |      'homePlayers':'STRUCT(playerId VARCHAR, xyz DOUBLE[])[]',
           |      'awayPlayers':'STRUCT(playerId VARCHAR, xyz DOUBLE[])[]',
           |      'ball':'STRUCT(xyz DOUBLE[])'})
           |),
           |sides AS (
           |  SELECT period, frameIdx, gameClock, live, lastTouch,
           |    unnest(homePlayers) AS p, TRUE AS is_home FROM j
           |  UNION ALL
           |  SELECT period, frameIdx, gameClock, live, lastTouch,
           |    unnest(awayPlayers) AS p, FALSE AS is_home FROM j
           |),
           |pl AS (
           |  SELECT period, frameIdx, gameClock, live, lastTouch,
           |    p.playerId AS id, is_home,
           |    p.xyz[1] AS x, p.xyz[2] AS y, 0.0 AS z, FALSE AS is_ball
           |  FROM sides WHERE p.xyz[1] IS NOT NULL AND p.xyz[2] IS NOT NULL
           |),
           |bl AS (
           |  SELECT period, frameIdx, gameClock, live, lastTouch,
           |    'ball' AS id, FALSE AS is_home,
           |    ball.xyz[1] AS x, ball.xyz[2] AS y,
           |    coalesce(ball.xyz[3], 0.0) AS z, TRUE AS is_ball
           |  FROM j WHERE ball IS NOT NULL AND ball.xyz IS NOT NULL
           |    AND ball.xyz[1] IS NOT NULL AND ball.xyz[2] IS NOT NULL
           |),
           |canon AS (
           |  SELECT '1' AS game_id, period AS period_id, frameIdx AS frame_id,
           |    CAST(round(gameClock * 1000000.0) AS BIGINT) AS "timestamp",
           |    id,
           |    CASE WHEN is_ball THEN 'ball' WHEN is_home THEN 'home'
           |         ELSE 'away' END AS team_id,
           |    CASE WHEN is_ball THEN 'ball' END AS position_name,
           |    x, y, z, is_home, is_ball,
           |    CASE WHEN live THEN 'alive' WHEN NOT live THEN 'dead' END AS ball_state,
           |    CASE WHEN lastTouch = 'home' THEN 'home'
           |         WHEN lastTouch = 'away' THEN 'away' END AS ball_owning_team_id
           |  FROM (SELECT * FROM pl UNION ALL SELECT * FROM bl)
           |),
           |pm AS (
           |  SELECT period_id, frame_id,
           |    avg(CASE WHEN is_home THEN x END) AS hx,
           |    avg(CASE WHEN NOT is_home THEN x END) AS ax
           |  FROM canon WHERE NOT is_ball
           |  GROUP BY period_id, frame_id
           |),
           |ltr AS (
           |  SELECT period_id, (hx < ax) AS home_ltr FROM pm
           |  QUALIFY row_number() OVER (PARTITION BY period_id ORDER BY frame_id) = 1
           |)
           |SELECT c.game_id, c.period_id, c.frame_id, c."timestamp", c.id,
           |  c.team_id, c.position_name,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.x ELSE c.x END AS x,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.y ELSE c.y END AS y,
           |  c.z, c.ball_state, c.ball_owning_team_id
           |FROM canon c LEFT JOIN ltr l USING (period_id)""".stripMargin
      }),

    // Tracab/ChyronHego DAT → canonical long table. No reference
    // fixture exists, so the DAT is generated once per scale factor
    // from the synthetic tracking table (game '0', TracabSource
    // .writeDat) and BOTH engines parse the same text independently:
    // Spark through TracabSource.load, DuckDB with its own string
    // splitting — a fully recomputed oracle of the parser, period
    // range mapping, centimeter conversion, clock rebase AND the
    // per-period STATIC_HOME_AWAY flip (replayed in SQL via the same
    // first-frame mean-x rule).
    GraftQuery(
      "q_tracab_load",
      (s, d) => {
        val root = tracabDir(s, d)
        TracabSource.load(s, s"$root/dat/*.txt", s"$root/meta.xml")
      },
      Some {
        val root = "/tmp/graft_tracab__root_testdata_sf0.01"
        val off = 10000000L
        s"""WITH lines AS (
           |  SELECT line FROM read_csv('$root/dat/*.txt', header=false,
           |    delim='|', quote='', columns={'line':'VARCHAR'})
           |),
           |seg AS (SELECT string_split(line, ':') AS s FROM lines),
           |fr AS (
           |  SELECT CAST(s[1] AS BIGINT) AS n, s[2] AS tgt,
           |    string_split(string_split(s[3], ';')[1], ',') AS b
           |  FROM seg WHERE try_cast(s[1] AS BIGINT) IS NOT NULL
           |),
           |frf AS (SELECT *, b[5] AS own_flag, b[6] AS status_flag FROM fr),
           |tf AS (
           |  SELECT n, own_flag, status_flag, string_split(t, ',') AS a
           |  FROM (SELECT n, own_flag, status_flag,
           |          unnest(string_split(tgt, ';')) AS t FROM frf)
           |  WHERE t <> ''
           |),
           |pl AS (
           |  SELECT n, a[2] AS id,
           |    CASE WHEN a[1] = '1' THEN 'home' ELSE 'away' END AS team_id,
           |    CAST(NULL AS VARCHAR) AS position_name,
           |    TRY_CAST(a[4] AS INTEGER)/100.0 AS x, TRY_CAST(a[5] AS INTEGER)/100.0 AS y,
           |    0.0 AS z,
           |    own_flag, status_flag
           |  FROM tf WHERE a[1] IN ('0','1')
           |    AND TRY_CAST(a[4] AS INTEGER) IS NOT NULL
           |    AND TRY_CAST(a[5] AS INTEGER) IS NOT NULL
           |),
           |bl AS (
           |  SELECT n, 'ball' AS id, 'ball' AS team_id, 'ball' AS position_name,
           |    TRY_CAST(b[1] AS INTEGER)/100.0 AS x, TRY_CAST(b[2] AS INTEGER)/100.0 AS y,
           |    TRY_CAST(b[3] AS INTEGER)/100.0 AS z,
           |    own_flag, status_flag
           |  FROM frf
           |  WHERE len(b) >= 6
           |    AND TRY_CAST(b[1] AS INTEGER) IS NOT NULL
           |    AND TRY_CAST(b[2] AS INTEGER) IS NOT NULL
           |),
           |allr AS (SELECT * FROM pl UNION ALL SELECT * FROM bl),
           |withp AS (
           |  SELECT *, CASE WHEN n >= $off THEN 2 ELSE 1 END AS period_id FROM allr
           |),
           |ts AS (SELECT *, min(n) OVER (PARTITION BY period_id) AS start_n FROM withp),
           |canon AS (
           |  SELECT '0' AS game_id, period_id, n AS frame_id,
           |    CAST((n - start_n) * 40000 AS BIGINT) AS "timestamp",
           |    id, team_id, position_name, x, y, z,
           |    CASE WHEN status_flag = 'Alive' THEN 'alive'
           |         WHEN status_flag = 'Dead' THEN 'dead' END AS ball_state,
           |    CASE WHEN own_flag = 'H' THEN 'home'
           |         WHEN own_flag = 'A' THEN 'away' END AS ball_owning_team_id
           |  FROM ts
           |),
           |pm AS (
           |  SELECT period_id, frame_id,
           |    avg(CASE WHEN team_id = 'home' THEN x END) AS hx,
           |    avg(CASE WHEN team_id = 'away' THEN x END) AS ax
           |  FROM canon WHERE team_id <> 'ball'
           |  GROUP BY period_id, frame_id
           |),
           |ltr AS (
           |  SELECT period_id, (hx < ax) AS home_ltr FROM pm
           |  QUALIFY row_number() OVER (PARTITION BY period_id ORDER BY frame_id) = 1
           |)
           |SELECT c.game_id, c.period_id, c.frame_id, c."timestamp", c.id,
           |  c.team_id, c.position_name,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.x ELSE c.x END AS x,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.y ELSE c.y END AS y,
           |  c.z, c.ball_state, c.ball_owning_team_id
           |FROM canon c LEFT JOIN ltr l USING (period_id)""".stripMargin
      }),

    // Sportec event XML → canonical event table over the reference's
    // real fixture (1504 events). Same golden mechanism as
    // q_sportec_load: DuckDB reads the committed golden parquet, so the
    // hash row pins the parser against drift; the golden's values are
    // spec-anchored (SportecEventsSpec checks counts per family and the
    // kickoff/pass envelope against the raw XML).
    GraftQuery(
      "q_sportec_events",
      (s, _) => SportecEvents.events(
        s, "/root/reference/tests/files/sportec_events.xml"),
      Some("SELECT * FROM read_parquet('/root/repo/goldens/sportec_events.parquet')")),

    // The W6 label journey: every tracking row stamped with the latest
    // event at or before its absolute frame time. This one is a REAL
    // recomputed oracle, not a re-dump: DuckDB takes the two committed
    // goldens (canonical tracking + canonical events) as inputs and
    // independently replays the forward-fill with its own window
    // machinery; only the section-start bridge table is golden-read.
    GraftQuery(
      "q_sportec_event_labels",
      (s, _) => {
        val files = "/root/reference/tests/files"
        val trk = SportecSource.load(
          s, s"$files/sportec_tracking.xml", s"$files/sportec_meta.xml")
        val ev = SportecEvents.events(s, s"$files/sportec_events.xml")
        val starts = SportecEvents.sectionStarts(s, s"$files/sportec_tracking.xml")
        SportecEvents.attach(trk, ev, starts)
          .select(col("game_id"), col("period_id"), col("frame_id"),
            col("id"), col("team_id"),
            col("event_id"), col("event_type"),
            col("event_team_id"), col("event_player_id"))
      },
      Some {
        """WITH t AS (SELECT * FROM read_parquet('/root/repo/goldens/sportec_load.parquet')),
          |e AS (SELECT * FROM read_parquet('/root/repo/goldens/sportec_events.parquet')),
          |st AS (SELECT * FROM read_parquet('/root/repo/goldens/sportec_section_starts.parquet')),
          |f AS (SELECT DISTINCT game_id, period_id, frame_id, timestamp FROM t),
          |fa AS (
          |  SELECT f.game_id, f.period_id, f.frame_id,
          |    st.section_start_utc + f.timestamp AS abs
          |  FROM f JOIN st USING (game_id, period_id)
          |),
          |u AS (
          |  SELECT game_id, period_id, frame_id, abs, 1 AS isf,
          |    CAST(NULL AS VARCHAR) AS eid, CAST(NULL AS VARCHAR) AS etype,
          |    CAST(NULL AS VARCHAR) AS eteam, CAST(NULL AS VARCHAR) AS eplayer
          |  FROM fa
          |  UNION ALL
          |  SELECT game_id, NULL, NULL, event_ts_utc, 0,
          |    event_id, event_type, team_id, player_id
          |  FROM e
          |),
          |filled AS (
          |  SELECT game_id, period_id, frame_id, isf,
          |    last_value(eid IGNORE NULLS) OVER w AS event_id,
          |    last_value(etype IGNORE NULLS) OVER w AS event_type,
          |    last_value(eteam IGNORE NULLS) OVER w AS event_team_id,
          |    last_value(eplayer IGNORE NULLS) OVER w AS event_player_id
          |  FROM u
          |  WINDOW w AS (PARTITION BY game_id
          |               ORDER BY abs, isf, coalesce(eid, '')
          |               ROWS UNBOUNDED PRECEDING)
          |)
          |SELECT t.game_id, t.period_id, t.frame_id, t.id, t.team_id,
          |  fl.event_id, fl.event_type, fl.event_team_id, fl.event_player_id
          |FROM t
          |LEFT JOIN (SELECT * FROM filled WHERE isf = 1) fl
          |  ON fl.game_id = t.game_id AND fl.period_id = t.period_id
          |  AND fl.frame_id = t.frame_id""".stripMargin
      }),

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
      }),

    // HawkEye ingestion (the eighth native provider): per-minute ball
    // and centroid JSON documents → canonical table; DuckDB re-parses
    // the same JSON — the double unnest, the match-global-minute →
    // per-period clock rebase, the capture-rate frame derivation, and
    // the first-frame mean-x STATIC_HOME_AWAY flip.
    GraftQuery(
      "q_hawkeye_load",
      (s, d) => {
        val root = hawkeyeDir(s, d)
        // fps=25: the synthetic canonical table is a 25 fps clock
        HawkEyeSource.load(s, s"$root/ball/*.json", s"$root/people/*.json",
          s"$root/meta.json", fps = 25)
      },
      Some {
        val root = "/tmp/graft_hawkeye__root_testdata_sf0.01"
        s"""WITH bj AS (
           |  SELECT * FROM read_json('$root/ball/*.json', format='unstructured',
           |    columns={'details':'STRUCT(period INTEGER, minute INTEGER)',
           |      'samples':'STRUCT(ball STRUCT("time" DOUBLE, pos DOUBLE[])[])'})
           |),
           |pj AS (
           |  SELECT * FROM read_json('$root/people/*.json', format='unstructured',
           |    columns={'details':'STRUCT(period INTEGER, minute INTEGER)',
           |      'samples':'STRUCT(people STRUCT(personId VARCHAR,
           |        role STRUCT(name VARCHAR), teamId VARCHAR,
           |        centroid STRUCT("time" DOUBLE, pos DOUBLE[])[])[])'})
           |),
           |bs AS (
           |  SELECT details.period AS period_id, details.minute AS minute,
           |    unnest(samples.ball) AS s
           |  FROM bj
           |),
           |ball AS (
           |  SELECT period_id,
           |    CAST(round(((minute - 1) * 60.0 + s."time") * 1000000.0) AS BIGINT)
           |      AS raw_us,
           |    'ball' AS id, 'ball' AS team_id, 'ball' AS position_name,
           |    s.pos[1] AS x, s.pos[2] AS y, coalesce(s.pos[3], 0.0) AS z,
           |    FALSE AS is_home, TRUE AS is_ball
           |  FROM bs
           |  WHERE s.pos[1] IS NOT NULL AND s.pos[2] IS NOT NULL
           |),
           |pp AS (
           |  SELECT details.period AS period_id, details.minute AS minute,
           |    unnest(samples.people) AS p
           |  FROM pj
           |),
           |pc AS (
           |  SELECT period_id, minute, p.personId AS id, p.teamId AS tid,
           |    p.role.name AS role_name, unnest(p.centroid) AS s
           |  FROM pp
           |),
           |ppl AS (
           |  SELECT period_id,
           |    CAST(round(((minute - 1) * 60.0 + s."time") * 1000000.0) AS BIGINT)
           |      AS raw_us,
           |    id, tid AS team_id, role_name AS position_name,
           |    s.pos[1] AS x, s.pos[2] AS y, 0.0 AS z,
           |    (tid = 'home') AS is_home, FALSE AS is_ball
           |  FROM pc
           |  WHERE id IS NOT NULL AND s.pos[1] IS NOT NULL AND s.pos[2] IS NOT NULL
           |),
           |allr AS (SELECT * FROM ball UNION ALL SELECT * FROM ppl),
           |reb AS (
           |  SELECT *, min(raw_us) OVER (PARTITION BY period_id) AS raw0 FROM allr
           |),
           |canon AS (
           |  SELECT '2' AS game_id, period_id,
           |    CAST(round(raw_us / 40000.0) AS BIGINT) AS frame_id,
           |    raw_us - raw0 AS "timestamp",
           |    id, team_id, position_name, x, y, z, is_home, is_ball,
           |    CAST(NULL AS VARCHAR) AS ball_state,
           |    CAST(NULL AS VARCHAR) AS ball_owning_team_id
           |  FROM reb
           |),
           |pm AS (
           |  SELECT period_id, frame_id,
           |    avg(CASE WHEN is_home THEN x END) AS hx,
           |    avg(CASE WHEN NOT is_home THEN x END) AS ax
           |  FROM canon WHERE NOT is_ball
           |  GROUP BY period_id, frame_id
           |),
           |ltr AS (
           |  SELECT period_id, (hx < ax) AS home_ltr FROM pm
           |  QUALIFY row_number() OVER (PARTITION BY period_id ORDER BY frame_id) = 1
           |)
           |SELECT c.game_id, c.period_id, c.frame_id, c."timestamp", c.id,
           |  c.team_id, c.position_name,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.x ELSE c.x END AS x,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.y ELSE c.y END AS y,
           |  c.z, c.ball_state, c.ball_owning_team_id
           |FROM canon c LEFT JOIN ltr l USING (period_id)""".stripMargin
      }),

    // Signality ingestion (the ninth native provider — the full
    // README provider list): per-period JSON array feeds → canonical
    // table; DuckDB re-parses the same JSON — the per-period array
    // unnest, the jersey→roster name resolution, the corner→center
    // coordinate shift, the epoch-ms per-period rebase, the
    // capture-rate frame derivation, and the first-frame mean-x
    // STATIC_HOME_AWAY flip.
    GraftQuery(
      "q_signality_load",
      (s, d) => {
        val root = signalityDir(s, d)
        SignalitySource.load(s,
          Seq(1 -> s"$root/p1.json", 2 -> s"$root/p2.json"), s"$root/meta.json")
      },
      Some {
        val root = "/tmp/graft_signality__root_testdata_sf0.01"
        val frameCols = "{'utc_time':'BIGINT'," +
          "'ball':'STRUCT(position DOUBLE[])'," +
          "'home_team':'STRUCT(jersey_number INTEGER, position DOUBLE[])[]'," +
          "'away_team':'STRUCT(jersey_number INTEGER, position DOUBLE[])[]'}"
        s"""WITH f1 AS (
           |  SELECT 1 AS period_id, * FROM read_json('$root/p1.json',
           |    format='array', columns=$frameCols)
           |),
           |f2 AS (
           |  SELECT 2 AS period_id, * FROM read_json('$root/p2.json',
           |    format='array', columns=$frameCols)
           |),
           |frames AS (
           |  SELECT * FROM f1 UNION ALL SELECT * FROM f2
           |),
           |meta AS (
           |  SELECT * FROM read_json('$root/meta.json', format='unstructured',
           |    columns={'id':'VARCHAR','team_home_name':'VARCHAR',
           |      'team_away_name':'VARCHAR',
           |      'team_home_players':'STRUCT(jersey_number INTEGER, name VARCHAR)[]',
           |      'team_away_players':'STRUCT(jersey_number INTEGER, name VARCHAR)[]',
           |      'pitch_size':'DOUBLE[]'})
           |),
           |roster AS (
           |  SELECT TRUE AS r_home, p.jersey_number AS r_jersey, p.name AS r_name
           |  FROM meta, unnest(team_home_players) AS t(p)
           |  UNION ALL
           |  SELECT FALSE, p.jersey_number, p.name
           |  FROM meta, unnest(team_away_players) AS t(p)
           |),
           |sides AS (
           |  SELECT period_id, utc_time, TRUE AS is_home,
           |    p.jersey_number AS jersey, p.position AS pos
           |  FROM frames, unnest(home_team) AS t(p)
           |  UNION ALL
           |  SELECT period_id, utc_time, FALSE, p.jersey_number, p.position
           |  FROM frames, unnest(away_team) AS t(p)
           |),
           |players AS (
           |  SELECT s.period_id, s.utc_time,
           |    coalesce(r.r_name,
           |      concat(CASE WHEN s.is_home THEN 'home_' ELSE 'away_' END,
           |        s.jersey)) AS id,
           |    CASE WHEN s.is_home THEN 'home' ELSE 'away' END AS team_id,
           |    CAST(NULL AS VARCHAR) AS position_name,
           |    s.pos[1] - 52.5 AS x, s.pos[2] - 34.0 AS y,
           |    CAST(0.0 AS DOUBLE) AS z,
           |    s.is_home, FALSE AS is_ball
           |  FROM sides s LEFT JOIN roster r
           |    ON s.is_home = r.r_home AND s.jersey = r.r_jersey
           |  WHERE s.jersey IS NOT NULL
           |    AND s.pos[1] IS NOT NULL AND s.pos[2] IS NOT NULL
           |),
           |balls AS (
           |  SELECT period_id, utc_time, 'ball' AS id, 'ball' AS team_id,
           |    'ball' AS position_name,
           |    ball.position[1] - 52.5 AS x, ball.position[2] - 34.0 AS y,
           |    coalesce(ball.position[3], 0.0) AS z,
           |    FALSE AS is_home, TRUE AS is_ball
           |  FROM frames
           |  WHERE ball.position[1] IS NOT NULL AND ball.position[2] IS NOT NULL
           |),
           |allr AS (SELECT * FROM players UNION ALL SELECT * FROM balls),
           |reb AS (
           |  SELECT *, min(utc_time) OVER (PARTITION BY period_id) AS utc0
           |  FROM allr
           |),
           |canon AS (
           |  SELECT '1' AS game_id, period_id,
           |    CAST(round(utc_time * 1000.0 / 40000.0) AS BIGINT) AS frame_id,
           |    (utc_time - utc0) * 1000 AS "timestamp",
           |    id, team_id, position_name, x, y, z, is_home, is_ball,
           |    CAST(NULL AS VARCHAR) AS ball_state,
           |    CAST(NULL AS VARCHAR) AS ball_owning_team_id
           |  FROM reb
           |),
           |pm AS (
           |  SELECT period_id, frame_id,
           |    avg(CASE WHEN is_home THEN x END) AS hx,
           |    avg(CASE WHEN NOT is_home THEN x END) AS ax
           |  FROM canon WHERE NOT is_ball
           |  GROUP BY period_id, frame_id
           |),
           |ltr AS (
           |  SELECT period_id, (hx < ax) AS home_ltr FROM pm
           |  QUALIFY row_number() OVER (PARTITION BY period_id ORDER BY frame_id) = 1
           |)
           |SELECT c.game_id, c.period_id, c.frame_id, c."timestamp", c.id,
           |  c.team_id, c.position_name,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.x ELSE c.x END AS x,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.y ELSE c.y END AS y,
           |  c.z, c.ball_state, c.ball_owning_team_id
           |FROM canon c LEFT JOIN ltr l USING (period_id)""".stripMargin
      }),

    // PFF (GradientSports) ingestion (the seventh native provider):
    // frames JSONL + roster + meta → canonical table; DuckDB re-parses
    // the same JSON — jersey→roster resolution, balls-list head,
    // clock→micros, ballInPlay/possession mapping, and the first-frame
    // mean-x STATIC_HOME_AWAY flip.
    GraftQuery(
      "q_pff_load",
      (s, d) => {
        val root = pffDir(s, d)
        PffSource.load(s, s"$root/frames/*.txt", s"$root/roster.json",
          s"$root/meta.json")
      },
      Some {
        val root = "/tmp/graft_pff__root_testdata_sf0.01"
        s"""WITH j AS (
           |  SELECT * FROM read_json('$root/frames/*.txt',
           |    format='newline_delimited',
           |    columns={'frameNum':'BIGINT','period':'INTEGER',
           |      'periodGameClockTime':'DOUBLE',
           |      'homePlayers':'STRUCT(jerseyNum INTEGER, x DOUBLE, y DOUBLE)[]',
           |      'awayPlayers':'STRUCT(jerseyNum INTEGER, x DOUBLE, y DOUBLE)[]',
           |      'balls':'STRUCT(x DOUBLE, y DOUBLE, z DOUBLE)[]',
           |      'ballInPlay':'BOOLEAN','possession':'STRUCT(team VARCHAR)'})
           |),
           |ros AS (
           |  SELECT * FROM read_json('$root/roster.json', format='array',
           |    columns={'player':'STRUCT(id VARCHAR, nickname VARCHAR)',
           |      'team':'STRUCT(id VARCHAR)','shirtNumber':'INTEGER',
           |      'positionGroupType':'VARCHAR'})
           |),
           |sides AS (
           |  SELECT frameNum, period, periodGameClockTime, ballInPlay,
           |    possession.team AS poss, unnest(homePlayers) AS p, TRUE AS is_home
           |  FROM j
           |  UNION ALL
           |  SELECT frameNum, period, periodGameClockTime, ballInPlay,
           |    possession.team AS poss, unnest(awayPlayers) AS p, FALSE AS is_home
           |  FROM j
           |),
           |pl AS (
           |  SELECT s.frameNum, s.period, s.periodGameClockTime, s.ballInPlay,
           |    s.poss, s.is_home,
           |    coalesce(r.player.id,
           |      concat(CASE WHEN s.is_home THEN 'home_' ELSE 'away_' END,
           |             s.p.jerseyNum)) AS id,
           |    r.positionGroupType AS pos,
           |    s.p.x AS x, s.p.y AS y, 0.0 AS z, FALSE AS is_ball
           |  FROM sides s
           |  LEFT JOIN ros r
           |    ON r."team".id = (CASE WHEN s.is_home THEN 'home' ELSE 'away' END)
           |   AND r.shirtNumber = s.p.jerseyNum
           |  WHERE s.p.jerseyNum IS NOT NULL
           |    AND s.p.x IS NOT NULL AND s.p.y IS NOT NULL
           |),
           |bl AS (
           |  SELECT frameNum, period, periodGameClockTime, ballInPlay,
           |    possession.team AS poss, FALSE AS is_home,
           |    'ball' AS id, 'ball' AS pos,
           |    balls[1].x AS x, balls[1].y AS y,
           |    coalesce(balls[1].z, 0.0) AS z, TRUE AS is_ball
           |  FROM j
           |  WHERE len(balls) >= 1 AND balls[1].x IS NOT NULL
           |    AND balls[1].y IS NOT NULL
           |),
           |canon AS (
           |  SELECT '1' AS game_id, period AS period_id, frameNum AS frame_id,
           |    CAST(round(periodGameClockTime * 1000000.0) AS BIGINT) AS "timestamp",
           |    id,
           |    CASE WHEN is_ball THEN 'ball' WHEN is_home THEN 'home'
           |         ELSE 'away' END AS team_id,
           |    pos AS position_name, x, y, z, is_home, is_ball,
           |    CASE WHEN ballInPlay THEN 'alive'
           |         WHEN NOT ballInPlay THEN 'dead' END AS ball_state,
           |    CASE WHEN poss = 'home' THEN 'home'
           |         WHEN poss = 'away' THEN 'away' END AS ball_owning_team_id
           |  FROM (SELECT * FROM pl UNION ALL SELECT * FROM bl)
           |),
           |pm AS (
           |  SELECT period_id, frame_id,
           |    avg(CASE WHEN is_home THEN x END) AS hx,
           |    avg(CASE WHEN NOT is_home THEN x END) AS ax
           |  FROM canon WHERE NOT is_ball
           |  GROUP BY period_id, frame_id
           |),
           |ltr AS (
           |  SELECT period_id, (hx < ax) AS home_ltr FROM pm
           |  QUALIFY row_number() OVER (PARTITION BY period_id ORDER BY frame_id) = 1
           |)
           |SELECT c.game_id, c.period_id, c.frame_id, c."timestamp", c.id,
           |  c.team_id, c.position_name,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.x ELSE c.x END AS x,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.y ELSE c.y END AS y,
           |  c.z, c.ball_state, c.ball_owning_team_id
           |FROM canon c LEFT JOIN ltr l USING (period_id)""".stripMargin
      }),

    // StatsPerform MA25/MA1 ingestion (the sixth native provider): the
    // loader parses the MA25 frame lines + MA1 lineup JSON into the
    // canonical table; DuckDB independently re-parses the same text —
    // header split, player-chunk unnest, cm→m scaling, per-period
    // running-clock rebase, and the first-frame mean-x STATIC_HOME_AWAY
    // flip (same recomputed-oracle shape as q_tracab_load).
    GraftQuery(
      "q_statsperform_load",
      (s, d) => {
        val root = statsperformDir(s, d)
        StatsPerformSource.load(s, s"$root/ma25/*.txt", s"$root/ma1.json")
      },
      Some {
        val root = "/tmp/graft_statsperform__root_testdata_sf0.01"
        s"""WITH lines AS (
           |  SELECT line FROM read_csv('$root/ma25/*.txt', header=false,
           |    delim='|', quote='', columns={'line':'VARCHAR'})
           |),
           |seg AS (SELECT string_split(line, ':') AS s FROM lines),
           |fr AS (
           |  SELECT string_split(s[1], ';') AS hdr, s[2] AS pstr,
           |    string_split(s[3], ',') AS b
           |  FROM seg
           |),
           |hd AS (
           |  SELECT TRY_CAST(hdr[2] AS BIGINT) AS n,
           |    TRY_CAST(string_split(hdr[3], ',')[1] AS INTEGER) AS period_id,
           |    TRY_CAST(string_split(hdr[3], ',')[2] AS BIGINT) AS clock_ms,
           |    string_split(hdr[3], ',')[3] AS status_flag,
           |    string_split(hdr[3], ',')[4] AS own_flag,
           |    pstr, b
           |  FROM fr
           |  WHERE TRY_CAST(hdr[2] AS BIGINT) IS NOT NULL
           |    AND TRY_CAST(string_split(hdr[3], ',')[1] AS INTEGER) IS NOT NULL
           |    AND TRY_CAST(string_split(hdr[3], ',')[2] AS BIGINT) IS NOT NULL
           |),
           |tf AS (
           |  SELECT n, period_id, clock_ms, own_flag, status_flag,
           |    string_split(t, ',') AS a
           |  FROM (SELECT n, period_id, clock_ms, own_flag, status_flag,
           |          unnest(string_split(pstr, ';')) AS t FROM hd)
           |  WHERE t <> ''
           |),
           |pl AS (
           |  SELECT n, period_id, clock_ms, own_flag, status_flag,
           |    a[2] AS id, (a[1] = '0') AS is_home_side,
           |    TRY_CAST(a[4] AS INTEGER)/100.0 AS x,
           |    TRY_CAST(a[5] AS INTEGER)/100.0 AS y, 0.0 AS z
           |  FROM tf WHERE a[1] IN ('0','1')
           |    AND TRY_CAST(a[4] AS INTEGER) IS NOT NULL
           |    AND TRY_CAST(a[5] AS INTEGER) IS NOT NULL
           |),
           |bl AS (
           |  SELECT n, period_id, clock_ms, own_flag, status_flag,
           |    'ball' AS id, CAST(NULL AS BOOLEAN) AS is_home_side,
           |    TRY_CAST(b[1] AS INTEGER)/100.0 AS x,
           |    TRY_CAST(b[2] AS INTEGER)/100.0 AS y,
           |    TRY_CAST(b[3] AS INTEGER)/100.0 AS z
           |  FROM hd
           |  WHERE len(b) >= 3
           |    AND TRY_CAST(b[1] AS INTEGER) IS NOT NULL
           |    AND TRY_CAST(b[2] AS INTEGER) IS NOT NULL
           |),
           |allr AS (SELECT * FROM pl UNION ALL SELECT * FROM bl),
           |cb AS (SELECT *, min(clock_ms) OVER (PARTITION BY period_id) AS clock0
           |       FROM allr),
           |canon AS (
           |  SELECT '0' AS game_id, period_id, n AS frame_id,
           |    CAST((clock_ms - clock0) * 1000 AS BIGINT) AS "timestamp",
           |    id,
           |    CASE WHEN id = 'ball' THEN 'ball'
           |         WHEN is_home_side THEN 'home' ELSE 'away' END AS team_id,
           |    CASE WHEN id = 'ball' THEN 'ball' END AS position_name,
           |    x, y, z,
           |    CASE WHEN status_flag = '1' THEN 'alive'
           |         WHEN status_flag = '0' THEN 'dead' END AS ball_state,
           |    CASE WHEN own_flag = 'H' THEN 'home'
           |         WHEN own_flag = 'A' THEN 'away' END AS ball_owning_team_id
           |  FROM cb
           |),
           |pm AS (
           |  SELECT period_id, frame_id,
           |    avg(CASE WHEN team_id = 'home' THEN x END) AS hx,
           |    avg(CASE WHEN team_id = 'away' THEN x END) AS ax
           |  FROM canon WHERE team_id <> 'ball'
           |  GROUP BY period_id, frame_id
           |),
           |ltr AS (
           |  SELECT period_id, (hx < ax) AS home_ltr FROM pm
           |  QUALIFY row_number() OVER (PARTITION BY period_id ORDER BY frame_id) = 1
           |)
           |SELECT c.game_id, c.period_id, c.frame_id, c."timestamp", c.id,
           |  c.team_id, c.position_name,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.x ELSE c.x END AS x,
           |  CASE WHEN NOT coalesce(l.home_ltr, TRUE) THEN -c.y ELSE c.y END AS y,
           |  c.z, c.ball_state, c.ball_owning_team_id
           |FROM canon c LEFT JOIN ltr l USING (period_id)""".stripMargin
      }))
}
