package graft.queries

import graft.core.{GraftQuery, QueryModule}
import graft.models.formations.{Efpi, Templates}
import graft.tracking.{Cols, Orientation, Possession, SyntheticTracking}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EFPI formation-detection queries (M5-M7) oracled against DuckDB on
  * the synthetic 3-a-side tracking table.
  *
  * The oracle brute-forces the assignment problem: with ≤3 outfield
  * players per team it enumerates all ≤6 slot permutations in the SAME
  * lexicographic order as [[graft.models.formations.Hungarian.bruteForce]],
  * computes costs with the identical expression tree (same parenthesis
  * order, template constants inlined at 17 significant digits so both
  * engines parse the same doubles), and picks the row-number-1 row by
  * (cost, formation order, permutation id) — the exact tie-break the
  * Scala side uses. Full-size (10-player) matching can't be expressed
  * in SQL (10! permutations); it is covered by the
  * Hungarian-vs-brute-force property tests in HungarianSpec and the
  * pipeline tests in EfpiSpec.
  */
object FormationQueries extends QueryModule {

  /** Small-sided formation set: covers 1, 2 and 3 outfield players
    * (synthetic teams field at most 3). Order defines form_ord. */
  val SmallFormations: Seq[String] = Seq("111", "21", "12", "2", "11", "1")

  private def efpiInput(s: SparkSession, d: String): DataFrame =
    Orientation.toBallOwning(
      Possession.inferBallCarrier(SyntheticTracking.df(s, d, Cols.ByFrame)), "home")

  // =====================================================================
  // Oracle SQL generation
  // =====================================================================

  private def dbl(x: Double): String = {
    val s = "%.17g".formatLocal(java.util.Locale.ROOT, x)
    if (s.contains("e") || s.contains("E") || s.contains(".")) s else s + ".0"
  }

  /** Template VALUES rows: one per (dir, count, formation) with joint
    * bounds and up to 3 slot coordinates+labels. */
  private def tplValues(lib: Templates.Library): String = {
    val rows = for {
      ltr <- Seq(true, false)
      n <- lib.byCount.keys.toSeq.sorted
      (tpl, ord) <- lib.templates(n, ltr).zipWithIndex
    } yield {
      val (gxMin, gyMin, gxMax, gyMax) = lib.boundsFor(n, ltr)
      val slotCols = (0 until 3).map { j =>
        if (j < tpl.n) {
          val sl = tpl.slots(j)
          s"${dbl(sl.x)}, ${dbl(sl.y)}, '${sl.label}'"
        } else "NULL, NULL, NULL"
      }.mkString(", ")
      s"('${if (ltr) "ltr" else "rtl"}', $n, $ord, '${tpl.name}', " +
        s"${dbl(gxMin)}, ${dbl(gxMax - gxMin)}, ${dbl(gyMin)}, ${dbl(gyMax - gyMin)}, $slotCols)"
    }
    rows.mkString(",\n    ")
  }

  /** Permutation VALUES: lexicographic perms of 1..n for n = 1..3,
    * pid in enumeration order (matches Scala `.permutations`). */
  private val permValues: String =
    (1 to 3).flatMap { n =>
      (1 to n).permutations.zipWithIndex.map { case (p, pid) =>
        val a = (0 until 3).map(i => if (i < n) p(i).toString else "NULL").mkString(", ")
        s"($n, $pid, $a)"
      }
    }.mkString(",\n    ")

  /** Assignment SQL over a `spl` CTE with columns
    * (game_id, period_id, segment_id, id, team_id, x, y, owning) and a
    * `sball` CTE with (game_id, period_id, segment_id) ball rows.
    * Output: per-player position/formation + ball rows. */
  private def assignSql(lib: Templates.Library): String = {
    def sx(k: Int) = s"((fx$k - gxmin) * (CASE WHEN gxr <> 0 THEN (mxx - mnx) / gxr ELSE 1.0 END) + mnx)"
    def sy(k: Int) = s"((fy$k - gymin) * (CASE WHEN gyr <> 0 THEN (mxy - mny) / gyr ELSE 1.0 END) + mny)"
    def d(k: Int) = s"sqrt((x$k - ${sx(k)}) * (x$k - ${sx(k)}) + (y$k - ${sy(k)}) * (y$k - ${sy(k)}))"
    s"""pl AS (
       |  SELECT *, row_number() OVER (PARTITION BY game_id, period_id, segment_id, owning, team_id ORDER BY id) AS rn
       |  FROM spl
       |),
       |teamp AS (
       |  SELECT game_id, period_id, segment_id, team_id, owning, count(*) AS np,
       |    max(CASE WHEN rn=1 THEN x END) AS x1, max(CASE WHEN rn=1 THEN y END) AS y1,
       |    max(CASE WHEN rn=2 THEN x END) AS x2, max(CASE WHEN rn=2 THEN y END) AS y2,
       |    max(CASE WHEN rn=3 THEN x END) AS x3, max(CASE WHEN rn=3 THEN y END) AS y3,
       |    max(CASE WHEN rn=1 THEN id END) AS id1, max(CASE WHEN rn=2 THEN id END) AS id2,
       |    max(CASE WHEN rn=3 THEN id END) AS id3,
       |    min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
       |  FROM pl GROUP BY game_id, period_id, segment_id, team_id, owning
       |),
       |tpl(dir, n, form_ord, formation, gxmin, gxr, gymin, gyr,
       |    tx1, ty1, lb1, tx2, ty2, lb2, tx3, ty3, lb3) AS (VALUES
       |    ${tplValues(lib)}
       |),
       |perm(pn, pid, a1, a2, a3) AS (VALUES
       |    $permValues
       |),
       |cand AS (
       |  SELECT t.*, f.formation, f.form_ord, p.pid, p.a1, p.a2, p.a3,
       |    f.lb1, f.lb2, f.lb3, f.gxmin, f.gxr, f.gymin, f.gyr,
       |    CASE p.a1 WHEN 1 THEN f.tx1 WHEN 2 THEN f.tx2 ELSE f.tx3 END AS fx1,
       |    CASE p.a1 WHEN 1 THEN f.ty1 WHEN 2 THEN f.ty2 ELSE f.ty3 END AS fy1,
       |    CASE p.a2 WHEN 1 THEN f.tx1 WHEN 2 THEN f.tx2 ELSE f.tx3 END AS fx2,
       |    CASE p.a2 WHEN 1 THEN f.ty1 WHEN 2 THEN f.ty2 ELSE f.ty3 END AS fy2,
       |    CASE p.a3 WHEN 1 THEN f.tx1 WHEN 2 THEN f.tx2 ELSE f.tx3 END AS fx3,
       |    CASE p.a3 WHEN 1 THEN f.ty1 WHEN 2 THEN f.ty2 ELSE f.ty3 END AS fy3
       |  FROM teamp t
       |  JOIN tpl f ON f.n = t.np
       |    AND f.dir = (CASE WHEN t.team_id = t.owning THEN 'ltr' ELSE 'rtl' END)
       |  JOIN perm p ON p.pn = t.np
       |),
       |scored AS (
       |  SELECT *,
       |    CASE np WHEN 1 THEN ${d(1)}
       |            WHEN 2 THEN (${d(1)} + ${d(2)})
       |            ELSE ((${d(1)} + ${d(2)}) + ${d(3)}) END AS cost
       |  FROM cand
       |),
       |sel AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY game_id, period_id, segment_id, owning, team_id
       |                                 ORDER BY cost ASC, form_ord ASC, pid ASC) AS brn
       |    FROM scored) WHERE brn = 1
       |),
       |outp AS (
       |  SELECT game_id, period_id, segment_id,
       |    CASE k WHEN 1 THEN id1 WHEN 2 THEN id2 ELSE id3 END AS id,
       |    team_id,
       |    CASE (CASE k WHEN 1 THEN a1 WHEN 2 THEN a2 ELSE a3 END)
       |         WHEN 1 THEN lb1 WHEN 2 THEN lb2 ELSE lb3 END AS position,
       |    formation,
       |    (team_id = owning) AS is_attacking
       |  FROM sel CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS k) ks
       |  WHERE k <= np
       |),
       |ballout AS (
       |  SELECT game_id, period_id, segment_id, 'ball' AS id, 'ball' AS team_id,
       |    'ball' AS position, 'ball' AS formation, CAST(NULL AS BOOLEAN) AS is_attacking
       |  FROM sball
       |)""".stripMargin
  }

  /** Orientation-flipped, possession-filtered player/ball rows, built
    * on the proven possession CTE chain. */
  private val flippedCte: String =
    """flipped AS (
      |  SELECT game_id, period_id, frame_id, ts_us, id, team_id,
      |    CASE WHEN owning <> 'home' THEN -x ELSE x END AS x,
      |    CASE WHEN owning <> 'home' THEN -y ELSE y END AS y,
      |    owning
      |  FROM poss WHERE owning IS NOT NULL
      |)""".stripMargin

  private def withCtes(parts: String*)(select: String): String =
    s"WITH ${parts.mkString(",\n")}\n$select"

  private lazy val lib = Templates.library(SmallFormations)

  /** Possession sessionization → per-segment mean coordinates, shared
    * by the possession-mode and hysteresis queries. */
  private val possessionSegCtes: String =
    """pframes AS (SELECT DISTINCT game_id, period_id, frame_id, owning FROM flipped),
      |pchg AS (
      |  SELECT game_id, period_id, frame_id,
      |    CASE WHEN coalesce((owning <> lag(owning) OVER w)
      |              OR (period_id <> lag(period_id) OVER w), TRUE)
      |         THEN 1 ELSE 0 END AS chg
      |  FROM pframes
      |  WINDOW w AS (PARTITION BY game_id ORDER BY frame_id)
      |),
      |pseg AS (
      |  SELECT game_id, period_id, frame_id,
      |    CAST(sum(chg) OVER (PARTITION BY game_id ORDER BY frame_id
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS segment_id
      |  FROM pchg
      |),
      |segd AS (
      |  SELECT f.*, g.segment_id FROM flipped f
      |  JOIN pseg g USING (game_id, period_id, frame_id)
      |),
      |spl AS (
      |  SELECT game_id, period_id, segment_id, id,
      |    max(team_id) AS team_id,
      |    round(avg(x), 9) AS x, round(avg(y), 9) AS y, owning
      |  FROM segd WHERE team_id <> 'ball'
      |  GROUP BY game_id, period_id, owning, id, segment_id
      |),
      |sball AS (
      |  SELECT game_id, period_id, segment_id
      |  FROM (SELECT DISTINCT game_id, period_id, owning, segment_id
      |        FROM segd WHERE team_id = 'ball')
      |)""".stripMargin

  private val finalSelect =
    """SELECT game_id, period_id, segment_id, id, team_id, position, formation, is_attacking
      |FROM (SELECT * FROM outp UNION ALL SELECT * FROM ballout)""".stripMargin

  override def queries: Seq[GraftQuery] = Seq(

    // ----- M5 + frame-mode M7: per-frame formation assignment -----
    GraftQuery(
      "q_efpi_frame",
      (s, d) => Efpi.fit(s, efpiInput(s, d),
        Efpi.Config(every = "frame", formations = SmallFormations))
        .withColumnRenamed("segment_id", "frame_id"),
      Some(withCtes(
        SyntheticTracking.cte, SyntheticTracking.possessionCte, flippedCte,
        """spl AS (
          |  SELECT game_id, period_id, frame_id AS segment_id, id, team_id, x, y, owning
          |  FROM flipped WHERE team_id <> 'ball'
          |),
          |sball AS (
          |  SELECT game_id, period_id, frame_id AS segment_id FROM flipped WHERE team_id = 'ball'
          |)""".stripMargin,
        assignSql(lib))(
        """SELECT game_id, period_id, segment_id AS frame_id, id, team_id,
          |       position, formation, is_attacking
          |FROM (SELECT * FROM outp UNION ALL SELECT * FROM ballout)""".stripMargin)),
      headline = true),

    // ----- M7 "5m" time-bucket segmentation + mean positions -----
    GraftQuery(
      "q_efpi_5m",
      (s, d) => Efpi.fit(s, efpiInput(s, d),
        Efpi.Config(every = "5m", formations = SmallFormations)),
      Some(withCtes(
        SyntheticTracking.cte, SyntheticTracking.possessionCte, flippedCte,
        """segd AS (
          |  SELECT *, ts_us - (ts_us % 300000000) AS segment_id FROM flipped
          |),
          |spl AS (
          |  SELECT game_id, period_id, segment_id, id,
          |    max(team_id) AS team_id,
          |    round(avg(x), 9) AS x, round(avg(y), 9) AS y, owning
          |  FROM segd WHERE team_id <> 'ball'
          |  GROUP BY game_id, period_id, owning, id, segment_id
          |),
          |sball AS (
          |  SELECT game_id, period_id, segment_id
          |  FROM (SELECT DISTINCT game_id, period_id, owning, segment_id
          |        FROM segd WHERE team_id = 'ball')
          |)""".stripMargin,
        assignSql(lib))(finalSelect))),

    // ----- M7 period segmentation + mean positions -----
    GraftQuery(
      "q_efpi_period",
      (s, d) => Efpi.fit(s, efpiInput(s, d),
        Efpi.Config(every = "period", formations = SmallFormations)),
      Some(withCtes(
        SyntheticTracking.cte, SyntheticTracking.possessionCte, flippedCte,
        """segd AS (
          |  SELECT *, CAST(period_id AS BIGINT) AS segment_id FROM flipped
          |),
          |spl AS (
          |  SELECT game_id, period_id, segment_id, id,
          |    max(team_id) AS team_id,
          |    round(avg(x), 9) AS x, round(avg(y), 9) AS y, owning
          |  FROM segd WHERE team_id <> 'ball'
          |  GROUP BY game_id, period_id, owning, id, segment_id
          |),
          |sball AS (
          |  SELECT game_id, period_id, segment_id
          |  FROM (SELECT DISTINCT game_id, period_id, owning, segment_id
          |        FROM segd WHERE team_id = 'ball')
          |)""".stripMargin,
        assignSql(lib))(finalSelect))),

    // ----- M7 possession segmentation (sessionization) -----
    GraftQuery(
      "q_efpi_possession",
      (s, d) => Efpi.fit(s, efpiInput(s, d),
        Efpi.Config(every = "possession", formations = SmallFormations)),
      Some(withCtes(
        SyntheticTracking.cte, SyntheticTracking.possessionCte, flippedCte,
        possessionSegCtes, assignSql(lib))(finalSelect))),

    // ----- M6 hysteresis fold (changeThreshold set). The keep-or-
    // update decision is the one genuinely sequential computation in
    // the engine; the oracle replays it as a DuckDB RECURSIVE CTE over
    // the segment-ordered candidates: state per (game, team) is the
    // segment of the last update plus its cost, advanced one segment
    // per recursion step with the same two update triggers: the player
    // set changed (objects drop out of frames in the synthetic data,
    // so rosters genuinely vary; fingerprinted as the sorted id list)
    // or the relative improvement beats the threshold
    // ((prev_cost - cost)/cost > θ). changeAfterPossession=false keeps
    // possession flips from forcing an update every segment, which
    // would degenerate the fold to always-update.
    // Kept segments resolve labels/formation from the last-update
    // segment's candidate — exactly the reference's stale-dict
    // semantics (detection.py:129-148).
    // `selc AS MATERIALIZED`: the recursive fold joins selc once per
    // recursion step, and without the hint DuckDB re-evaluates the
    // whole candidate pipeline (the permutation brute force) each
    // step — measured 778 s at sf0.01 vs 10 s materialized, identical
    // rows. This one oracle otherwise dominates the driver's entire
    // correctness sweep. -----
    GraftQuery(
      "q_efpi_hysteresis",
      (s, d) => Efpi.fit(s, efpiInput(s, d),
        Efpi.Config(every = "possession", formations = SmallFormations,
          changeAfterPossession = false, changeThreshold = Some(0.1))),
      Some {
        val parts = Seq(
          SyntheticTracking.cte, SyntheticTracking.possessionCte, flippedCte,
          possessionSegCtes, assignSql(lib),
          """tids AS (
            |  SELECT game_id, team_id, segment_id,
            |    string_agg(id, ',' ORDER BY id) AS ids_fp
            |  FROM spl GROUP BY game_id, team_id, segment_id
            |),
            |selc AS MATERIALIZED (
            |  SELECT s.game_id, s.team_id, s.period_id, s.segment_id, s.owning,
            |    s.cost, t.ids_fp,
            |    row_number() OVER (PARTITION BY s.game_id, s.team_id
            |                       ORDER BY s.period_id, s.segment_id) AS ord
            |  FROM sel s
            |  JOIN tids t ON t.game_id = s.game_id AND t.team_id = s.team_id
            |             AND t.segment_id = s.segment_id
            |),
            |fold AS (
            |  SELECT game_id, team_id, ord, segment_id,
            |    cost AS st_cost, segment_id AS st_seg, ids_fp AS st_ids
            |  FROM selc WHERE ord = 1
            |  UNION ALL
            |  SELECT c.game_id, c.team_id, c.ord, c.segment_id,
            |    CASE WHEN c.ids_fp <> f.st_ids OR (f.st_cost - c.cost) / c.cost > 0.1
            |         THEN c.cost ELSE f.st_cost END,
            |    CASE WHEN c.ids_fp <> f.st_ids OR (f.st_cost - c.cost) / c.cost > 0.1
            |         THEN c.segment_id ELSE f.st_seg END,
            |    CASE WHEN c.ids_fp <> f.st_ids OR (f.st_cost - c.cost) / c.cost > 0.1
            |         THEN c.ids_fp ELSE f.st_ids END
            |  FROM fold f
            |  JOIN selc c ON c.game_id = f.game_id AND c.team_id = f.team_id
            |             AND c.ord = f.ord + 1
            |),
            |hout AS (
            |  SELECT f.game_id, sc.period_id, f.segment_id, o.id, o.team_id,
            |    o.position, o.formation,
            |    (o.team_id = sc.owning) AS is_attacking
            |  FROM fold f
            |  JOIN selc sc ON sc.game_id = f.game_id AND sc.team_id = f.team_id
            |              AND sc.segment_id = f.segment_id
            |  JOIN outp o ON o.game_id = f.game_id AND o.team_id = f.team_id
            |             AND o.segment_id = f.st_seg
            |)""".stripMargin)
        s"""WITH RECURSIVE ${parts.mkString(",\n")}
           |SELECT game_id, period_id, segment_id, id, team_id, position,
           |       formation, is_attacking
           |FROM (SELECT * FROM hout UNION ALL SELECT * FROM ballout)""".stripMargin
      }),

    // ----- M7 segment metadata table -----
    GraftQuery(
      "q_efpi_segments",
      (s, d) => Efpi.segments(efpiInput(s, d), Efpi.Config(every = "5m")),
      Some(withCtes(
        SyntheticTracking.cte, SyntheticTracking.possessionCte, flippedCte,
        """segd AS (
          |  SELECT *, ts_us - (ts_us % 300000000) AS segment_id FROM flipped
          |)""".stripMargin)(
        """SELECT DISTINCT segment_id, n_frames, start_timestamp, end_timestamp,
          |       start_frame_id, end_frame_id
          |FROM (
          |  SELECT game_id, period_id, owning, id, segment_id,
          |    count(DISTINCT frame_id) AS n_frames,
          |    min(ts_us) AS start_timestamp, max(ts_us) AS end_timestamp,
          |    min(frame_id) AS start_frame_id, max(frame_id) AS end_frame_id
          |  FROM segd
          |  GROUP BY game_id, period_id, owning, id, segment_id)""".stripMargin)))
  )
}
