package graft.api

import graft.SparkTestSession
import graft.graphs.GraphSettings
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end user journey: wide CSV on disk → load → graphs →
  * split → sink → read back. */
class SoccerPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val players = Seq("h1", "h2", "a1", "a2")

  /** Writes a 2-frame-per-period wide CSV and returns its path. */
  private def writeCsv(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline").toFile
    val f = new java.io.File(dir, "wide.csv")
    val header = "game_id,period_id,frame_id,timestamp," +
      players.flatMap(id => Seq(s"${id}_x", s"${id}_y")).mkString(",") +
      ",ball_x,ball_y,ball_z"
    val rows = (0 until 6).map { i =>
      val t = i * 40000L
      // ball sits on h1 so possession resolves to home
      s"g,1,$i,$t,${1.0 + i * 0.1},2.0,3.0,4.0,-1.0,-2.0,-3.0,-4.0,${1.0 + i * 0.1},2.0,0.1"
    }
    val w = new java.io.PrintWriter(f)
    try { w.println(header); rows.foreach(w.println) } finally w.close()
    f.getAbsolutePath
  }

  test("load -> graphs -> split -> sink round-trips") {
    val path = writeCsv()
    val prepared = SoccerPipeline.load(spark, path, players,
      playerSmoothing = None, ballSmoothing = None)
    assert(prepared.count() === 30) // 6 frames x 5 objects, all possessed
    assert(prepared.filter(col("ball_owning_team_id") === "home").count() === 30)

    val g = SoccerPipeline.graphs(prepared, GraphSettings(pad = false))
    val frames = g.collect()
    assert(frames.length === 6)
    // 5 nodes per frame, 15 features per node
    assert(frames.forall(_.getSeq[Seq[Double]](frames.head.fieldIndex("x")).length === 5))

    val split = SoccerPipeline.withSplit(g, 0.6, 0.3, 0.1)
    assert(split.select("split").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("train", "test", "validation")))

    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    SoccerPipeline.sink(split, out)
    val back = spark.read.parquet(out)
    assert(back.count() === 6)
    assert(back.columns.contains("x") && back.columns.contains("a"))
  }

  test("model entry points: PI matrices and EFPI formations off one prepared table") {
    val prepared = SoccerPipeline.load(spark, writeCsv(), players,
      playerSmoothing = None, ballSmoothing = None)
    val pi = SoccerPipeline.pressingIntensity(prepared,
      timeRange = Some((40000L, 120000L, 1)))
    val piRows = pi.collect()
    assert(piRows.length === 3) // ts 40000..120000 inclusive -> frames 1,2,3
    assert(pi.columns.contains("time_to_intercept"))

    val efpi = SoccerPipeline.formations(spark, prepared)
    assert(efpi.count() > 0)
  }

  test("loadSkillCorner: provider JSON through the facade (sample structured data)") {
    // reuse the spec sample written by SkillCornerSourceSpec's schema
    val structured = "/tmp/graft_skillcorner_sample.json"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(structured))) {
      // minimal two-frame sample if the other spec hasn't run yet
      java.nio.file.Files.write(java.nio.file.Paths.get(structured),
        """[{"frame":1,"period":1,"timestamp":"0:00:00.00","possession":{"trackable_object":2405,"group":"home team"},
          | "data":[{"track_id":1,"trackable_object":2405,"x":-20.0,"y":5.0},
          |         {"track_id":4,"trackable_object":55,"x":0.5,"y":0.2,"z":0.11}]},
          |{"frame":2,"period":1,"timestamp":"0:00:00.10","possession":{"trackable_object":2405,"group":"home team"},
          | "data":[{"track_id":1,"trackable_object":2405,"x":-19.9,"y":5.0},
          |         {"track_id":4,"trackable_object":55,"x":0.6,"y":0.2,"z":0.11}]}]""".stripMargin.getBytes("UTF-8"))
    }
    val prepared = SoccerPipeline.loadSkillCorner(spark, structured,
      "/root/reference/tests/files/skillcorner_match_data.json",
      playerSmoothing = None, ballSmoothing = None)
    assert(prepared.count() > 0)
    assert(prepared.columns.contains("v") && prepared.columns.contains("is_ball_carrier"))
    assert(prepared.select("game_id").distinct().head().getString(0) === "2417")
  }

  test("loadSportec: provider XML through the full facade journey") {
    val files = "/root/reference/tests/files"
    val prepared = SoccerPipeline.loadSportec(spark,
      s"$files/sportec_tracking.xml", s"$files/sportec_meta.xml")
    assert(prepared.count() === 483L)
    assert(prepared.columns.contains("is_ball_carrier"))
    assert(prepared.columns.contains("v") && prepared.columns.contains("a"))
    // graphs run off it directly
    val g = SoccerPipeline.graphs(prepared,
      graft.graphs.GraphSettings(pad = false), orientHome = "DFL-CLU-00000P")
    assert(g.count() === 21L)
  }
}
