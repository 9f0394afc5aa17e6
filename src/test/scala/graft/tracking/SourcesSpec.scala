package graft.tracking

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("wide -> long melt: one row per present object, teams by prefix") {
    val ids = Seq("h1", "a1")
    val wide = Seq(
      ("g", 1, 1L, 0L, Some(10.0), Some(5.0), -10.0, -5.0, 0.5, 0.6, 0.2),
      ("g", 1, 2L, 40L, None, None, -9.0, -4.0, 0.7, 0.8, 0.0))
      .toDF("game_id", "period_id", "frame_id", "timestamp",
        "h1_x", "h1_y", "a1_x", "a1_y", "ball_x", "ball_y", "ball_z")
    val long = TrackingSource.toLong(wide, ids)
    val rows = long.collect().map(r => (r.getLong(2), r.getString(4), r.getString(5)))
    // frame 1: h1, a1, ball; frame 2: h1 dropped (null coords)
    assert(rows.count(_._1 == 1L) === 3)
    assert(rows.count(_._1 == 2L) === 2)
    assert(!rows.exists(t => t._1 == 2L && t._2 == "h1"))
    assert(rows.filter(_._2 == "h1").forall(_._3 == "home"))
    assert(rows.filter(_._2 == "a1").forall(_._3 == "away"))
    // single explode: no join/exchange in the plan
    val plan = long.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("searchSorted: first frame timestamp >= each target, null past end") {
    val frames = Seq(("g", 0L), ("g", 40L), ("g", 80L), ("g2", 100L))
      .toDF(Cols.GameId, Cols.Timestamp)
    val targets = Seq(("g", 0L), ("g", 41L), ("g", 80L), ("g", 99L), ("g2", 10L))
      .toDF(Cols.GameId, "target")
    val r = TimeIndex.searchSorted(frames, targets)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> Option(x.get(2))).toMap
    assert(r(("g", 0L)) === Some(0L))
    assert(r(("g", 41L)) === Some(80L))
    assert(r(("g", 80L)) === Some(80L))
    assert(r(("g", 99L)) === None)
    assert(r(("g2", 10L)) === Some(100L))
  }

  test("toLocalGraphs streams every row") {
    val df = (1 to 100).toDF("v")
    val it = graft.graphs.GraphDataset.toLocalGraphs(df)
    assert(it.map(_.getInt(0)).sum === 5050)
  }

  test("wide JSON-lines source melts identically to CSV; absent keys drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "wide.jsonl")
    val w = new java.io.PrintWriter(f)
    try {
      w.println("""{"game_id":"g","period_id":1,"frame_id":1,"timestamp":0,""" +
        """"h1_x":10.0,"h1_y":5.0,"a1_x":-10.0,"a1_y":-5.0,""" +
        """"ball_x":0.5,"ball_y":0.6,"ball_z":0.2}""")
      w.println("""{"game_id":"g","period_id":1,"frame_id":2,"timestamp":40,""" +
        """"a1_x":-9.0,"a1_y":-4.0,"ball_x":0.7,"ball_y":0.8,"ball_z":0.0}""")
    } finally w.close()
    val long = TrackingSource.toLong(
      TrackingSource.scanWideJson(spark, f.getAbsolutePath, Seq("h1", "a1")),
      Seq("h1", "a1"))
    val rows = long.collect().map(r => (r.getLong(2), r.getString(4)))
    assert(rows.count(_._1 == 1L) === 3)
    assert(rows.count(_._1 == 2L) === 2) // h1 absent -> dropped
    assert(!rows.contains((2L, "h1")))
  }

  test("GraphSink writes split-partitioned subtrees") {
    val df = Seq(("m1", "train", 1L, 1.0), ("m1", "test", 2L, 2.0))
      .toDF("game_id", "split", "frame_id", "v")
    val out = java.nio.file.Files.createTempDirectory("graft_sink_split").toString
    graft.graphs.GraphSink.write(df, out, partitionCols = Seq("split", "game_id"))
    assert(new java.io.File(s"$out/split=train/game_id=m1").exists())
    val train = spark.read.parquet(out).filter(col("split") === "train")
    assert(train.count() === 1)
  }
}
