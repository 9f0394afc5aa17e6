package graft.models

import graft.SparkTestSession
import graft.models.formations.{Efpi, Templates}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EfpiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- templates -----------------------------------------------------

  test("template generator: 442 has 10 outfield slots with familiar labels") {
    val t = Templates.generate("442")
    assert(t.n === 10)
    assert(t.slots.map(_.label) ===
      Vector("RB", "RCB", "LCB", "LB", "RM", "RCM", "LCM", "LM", "RF", "LF"))
    // back line nearest own goal (smallest x), forwards furthest
    assert(t.slots.take(4).forall(_.x < t.slots.last.x))
  }

  test("shaw-glickman list loads for counts 8/9/10 and rtl mirrors") {
    val lib = Templates.library(Templates.ShawGlickman)
    assert(lib.byCount.keySet === Set(10))
    assert(lib.byCount(10).size === Templates.ShawGlickman.size)
    val t = lib.byCount(10).head
    val r = lib.rtlByCount(10).head
    assert(r.slots.head.x === 1.0 - t.slots.head.x)
    assert(r.slots.head.y === 1.0 - t.slots.head.y)
  }

  // ---- detection -----------------------------------------------------

  test("assignFormation: exact recovery when players sit on the template") {
    // single-template library: joint bounds == own bounds, so the
    // bbox-scaled slots coincide with the players exactly
    val lib = Templates.library(Seq("442"))
    val tpl = lib.byCount(10).head
    val coords = tpl.slots.map(s => (s.x * 105.0, s.y * 68.0)).toArray
    val (labels, formation, cost) =
      Efpi.assignFormation(coords, 10, lib.byCount(10), lib.boundsFor(10, ltr = true))
    assert(formation === "442")
    assert(cost < 1e-9)
    assert(labels.toSeq === tpl.slots.map(_.label))
  }

  test("assignFormation: discriminates between candidate formations") {
    val lib = Templates.library(Seq("442", "433", "352"))
    val tpl = lib.byCount(10).head // 442
    val coords = tpl.slots.map(s => (s.x * 105.0, s.y * 68.0)).toArray
    val (labels, formation, _) =
      Efpi.assignFormation(coords, 10, lib.byCount(10), lib.boundsFor(10, ltr = true))
    assert(formation === "442")
    assert(labels.toSeq === tpl.slots.map(_.label))
  }

  private def mkRows(seg: Long, owning: String, coords: Seq[(String, String, Double, Double)]) =
    coords.map { case (id, team, x, y) =>
      Efpi.SegRow("g1", 1, seg, id, team, null, x, y, owning)
    }

  test("detectSegment: attack LTR, defend RTL, ball excluded, GK appended") {
    val lib = Templates.library(Seq("21", "12", "111"))
    val rows = mkRows(1L, "home", Seq(
      ("h1", "home", 10.0, 10.0), ("h2", "home", 10.0, 40.0), ("h3", "home", 30.0, 25.0),
      ("a1", "away", 60.0, 10.0), ("a2", "away", 60.0, 40.0), ("a3", "away", 40.0, 25.0),
      ("b", "ball", 25.0, 25.0))) :+
      Efpi.SegRow("g1", 1, 1L, "hgk", "home", "GK", 0.0, 25.0, "home")
    val cands = Efpi.detectSegment(rows, lib)
    assert(cands.size === 2)
    val att = cands.find(_.is_attack).get
    val dfd = cands.find(!_.is_attack).get
    assert(att.team_id === "home" && dfd.team_id === "away")
    // home: two backs + one forward = "21"; away mirrored ("21" in rtl space)
    assert(att.formation === "21")
    assert(dfd.formation === "21")
    assert(att.ids.contains("hgk") && att.labels(att.ids.indexOf("hgk")) === "GK")
    assert(!att.ids.contains("b") && !dfd.ids.contains("b"))
  }

  // ---- segmentation --------------------------------------------------

  private def trackingDf(rows: Seq[(String, Int, Long, Long, String, String, Double, Double, String)]) =
    rows.toDF("game_id", "period_id", "frame_id", "timestamp", "id", "team_id",
      "x", "y", "ball_owning_team_id")
      .withColumn("position_name", lit(null).cast("string"))

  test("possession segmentation increments on owning or period change") {
    val df = trackingDf(Seq(
      ("g", 1, 1L, 0L, "p", "home", 0.0, 0.0, "home"),
      ("g", 1, 2L, 40L, "p", "home", 0.0, 0.0, "home"),
      ("g", 1, 3L, 80L, "p", "home", 0.0, 0.0, "away"),
      ("g", 2, 4L, 120L, "p", "home", 0.0, 0.0, "away")))
    val seg = Efpi.addSegmentId(df, "possession")
      .select("frame_id", "segment_id").as[(Long, Long)].collect().toMap
    assert(seg === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("duration segmentation buckets by integer micros") {
    val df = trackingDf(Seq(
      ("g", 1, 1L, 0L, "p", "home", 0.0, 0.0, "home"),
      ("g", 1, 2L, 299999999L, "p", "home", 0.0, 0.0, "home"),
      ("g", 1, 3L, 300000000L, "p", "home", 0.0, 0.0, "home")))
    val seg = Efpi.addSegmentId(df, "5m")
      .select("frame_id", "segment_id").as[(Long, Long)].collect().toMap
    assert(seg === Map(1L -> 0L, 2L -> 0L, 3L -> 300000000L))
    assertThrows[IllegalArgumentException](Efpi.addSegmentId(df, "5x"))
  }

  test("malformed every-duration raises, like the reference (test_soccer.py:1591-1604)") {
    val df = trackingDf(Seq(("g", 1, 1L, 40000L, "h1", "home", 1.0, 1.0, "home")))
    intercept[IllegalArgumentException] {
      Efpi.fit(spark, df, Efpi.Config(every = "5mm"))
    }
    intercept[IllegalArgumentException] {
      Efpi.fit(spark, df, Efpi.Config(every = "m5"))
    }
  }

  test("substitution drop removes shortest-appearing players beyond 11") {
    // 12 outfield players in one segment; p12 appears least
    val rows = (1 to 12).flatMap { p =>
      val frames = if (p == 12) Seq(1L) else Seq(1L, 2L, 3L)
      frames.map(f => ("g", 1, f, f * 40L, s"p$p", "home", 0.0, 0.0, "home"))
    }
    val df = Efpi.addSegmentId(trackingDf(rows), "period")
    val kept = Efpi.dropOverlappingSubstitutions(df)
      .select("id").distinct().as[String].collect().toSet
    assert(!kept.contains("p12") && kept.size === 11)
  }

  // ---- hysteresis ----------------------------------------------------

  test("hysteresis keeps formation until cost improves past threshold") {
    val cfg = Efpi.Config(every = "possession", formations = Seq("21", "12"),
      changeAfterPossession = false, changeThreshold = Some(0.5))
    def cand(seg: Long, form: String, cost: Double) =
      Efpi.Candidate("g", 1, seg, "home", is_attack = true, form, cost,
        Seq("p1", "p2", "p3"), Seq("A", "B", "C"))
    val present = Seq(("p1", "home"), ("p2", "home"), ("p3", "home"))
    val segs = Iterator(
      (1L, 1, "home", Seq(cand(1, "21", 10.0)), present),
      (2L, 1, "home", Seq(cand(2, "12", 9.0)), present),   // 11% better: keep 21
      (3L, 1, "home", Seq(cand(3, "12", 5.0)), present))   // 100% better: switch
    val out = Efpi.hysteresisFold("g", segs, cfg).toSeq
    val bySeg = out.groupBy(_.segment_id).view.mapValues(_.head.formation).toMap
    assert(bySeg === Map(1L -> "21", 2L -> "21", 3L -> "12"))
  }

  test("hysteresis updates on player-set change regardless of threshold") {
    val cfg = Efpi.Config(changeThreshold = Some(10.0), changeAfterPossession = false)
    def cand(seg: Long, form: String, ids: Seq[String]) =
      Efpi.Candidate("g", 1, seg, "home", is_attack = true, form, 10.0,
        ids, ids.map(_ => "X"))
    val segs = Iterator(
      (1L, 1, "home", Seq(cand(1, "21", Seq("p1", "p2", "p3"))),
        Seq(("p1", "home"), ("p2", "home"), ("p3", "home"))),
      (2L, 1, "home", Seq(cand(2, "12", Seq("p1", "p2", "p4"))),
        Seq(("p1", "home"), ("p2", "home"), ("p4", "home"))))
    val out = Efpi.hysteresisFold("g", segs, cfg).toSeq
    assert(out.filter(_.segment_id == 2L).forall(_.formation === "12"))
  }

  test("fit with changeThreshold produces same schema as stateless path") {
    val rows = (1L to 6L).flatMap { f =>
      Seq(
        ("g", 1, f, f * 40000L, "h1", "home", 10.0 + f, 10.0, "home"),
        ("g", 1, f, f * 40000L, "h2", "home", 12.0, 30.0, "home"),
        ("g", 1, f, f * 40000L, "a1", "away", 60.0, 10.0, "home"),
        ("g", 1, f, f * 40000L, "a2", "away", 62.0, 30.0, "home"),
        ("g", 1, f, f * 40000L, "ball", "ball", 30.0, 20.0, "home"))
    }
    val df = trackingDf(rows)
    val cfg0 = Efpi.Config(every = "frame", formations = Seq("2", "11"))
    val stateless = Efpi.fit(spark, df, cfg0)
    val hyst = Efpi.fit(spark, df, cfg0.copy(changeThreshold = Some(0.2)))
    assert(stateless.columns.toSeq === hyst.columns.toSeq)
    assert(stateless.count() === 30L && hyst.count() === 30L)
    // first segment must agree (no prior state to keep)
    val f1a = stateless.filter($"segment_id" === 1L).orderBy("id").collect().toSeq
    val f1b = hyst.filter($"segment_id" === 1L).orderBy("id").collect().toSeq
    assert(f1a === f1b)
  }

  test("full-squad end-to-end: shaw-glickman templates over 11v11 frames") {
    // two teams of 10 outfield + GK, roughly in a 442 and a 433, plus ball
    def squad(team: String, attackLtr: Boolean, form: Seq[Int], gk: String) = {
      val sign = if (attackLtr) 1.0 else -1.0
      val slots = for {
        (k, i) <- form.zipWithIndex
        j <- 0 until k
      } yield (s"$team${i}_$j", team,
        sign * (-45.0 + (i + 1) * 20.0), -30.0 + (j + 1) * 60.0 / (k + 1))
      slots :+ ((gk, team, sign * -50.0, 0.0))
    }
    val frames = (1L to 3L).flatMap { f =>
      (squad("H", attackLtr = true, Seq(4, 4, 2), "Hgk") ++
        squad("A", attackLtr = false, Seq(4, 3, 3), "Agk") :+
        (("ball", "ball", 0.0, 0.0))).map { case (id, team, x, y) =>
        (("g", 1, f, f * 40000L, id, team,
          if (id.endsWith("gk")) "GK" else null, x + f * 0.01, y, "H"))
      }
    }
    val df = frames.toDF("game_id", "period_id", "frame_id", "timestamp",
      "id", "team_id", "position_name", "x", "y", "ball_owning_team_id")
    val out = Efpi.fit(spark, df, Efpi.Config(every = "frame",
      formations = Templates.ShawGlickman))
    val rows = out.collect()
    assert(rows.length === 23 * 3)
    val home = rows.filter(r => r.getString(4) == "H" && r.getLong(2) == 1L)
    assert(home.forall(_.getString(6) != null)) // every player labeled
    assert(Templates.ShawGlickman.contains(home.head.getString(6)))
    // GKs keep their GK label; ball rows are sentinel
    assert(rows.filter(_.getString(3).endsWith("gk")).forall(_.getString(5) == "GK"))
    assert(rows.filter(_.getString(3) == "ball").forall(_.getString(5) == "ball"))
    // home attacks LTR with a 4-4-2 shape: expect 442 detected
    assert(home.head.getString(6) === "442")
    val away = rows.filter(r => r.getString(4) == "A" && r.getLong(2) == 1L)
    assert(away.head.getString(6) === "433")

    // analysis-window filter (efpi.py:342-344): frames 2-3 of period 1
    val scoped = Efpi.fit(spark, df, Efpi.Config(every = "frame"),
      timeRange = Some((2L * 40000L, 3L * 40000L, 1)))
    assert(scoped.select("segment_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
  }

  test("user-supplied template table: same geometry reproduces the names-based fit, custom labels flow through") {
    val rows = (1L to 3L).flatMap { f =>
      Seq(
        ("g", 1, f, f * 40000L, "h1", "home", 10.0 + f, 10.0, "home"),
        ("g", 1, f, f * 40000L, "h2", "home", 12.0, 30.0, "home"),
        ("g", 1, f, f * 40000L, "a1", "away", 60.0, 10.0, "home"),
        ("g", 1, f, f * 40000L, "a2", "away", 62.0, 30.0, "home"),
        ("g", 1, f, f * 40000L, "ball", "ball", 30.0, 20.0, "home"))
    }
    val df = trackingDf(rows)
    val names = Seq("2", "11")

    // (a) a table carrying the generator's own geometry must be
    // indistinguishable from the names-based library
    val slotRows = names.flatMap { n =>
      Templates.generate(n).slots.map(s => (n, s.x, s.y, s.label))
    }
    val tdf = slotRows.toDF("formation", "slot_x", "slot_y", "label")
    val baseline = Efpi.fit(spark, df, Efpi.Config(every = "frame", formations = names))
      .orderBy("segment_id", "id").collect().toSeq
    val viaTable = Efpi.fit(spark, df, Efpi.Config(every = "frame",
      customTemplates = Some(Templates.library(tdf))))
      .orderBy("segment_id", "id").collect().toSeq
    assert(viaTable === baseline)

    // (b) deployment-specific labels (e.g. mplsoccer's) surface verbatim
    val custom = slotRows.map { case (n, x, y, l) => (n, x, y, s"X_$l") }
      .toDF("formation", "slot_x", "slot_y", "label")
    val relabeled = Efpi.fit(spark, df, Efpi.Config(every = "frame",
      customTemplates = Some(Templates.library(custom))))
    val positions = relabeled.filter($"team_id" =!= "ball" && $"position" =!= "GK")
      .select("position").distinct().collect().map(_.getString(0)).toSet
    assert(positions.nonEmpty && positions.forall(_.startsWith("X_")))
  }
}
