package graft.graphs

import graft.SparkTestSession
import graft.tracking.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-golden parity: the reference repo ships an
  * engine-independent 23-object frame (`tests/files/test_frame.json` —
  * plain arrays of kinematic inputs) plus NumPy goldens for the node
  * features (23×15), adjacency (23×23) and edge features (287×6)
  * computed from it (`tests/test_soccer.py:407-507`, compared at
  * rtol=1e-3). This spec feeds the SAME frame through graft's feature
  * pipeline and compares against the SAME `.npy` files — ground-truth
  * parity with the reference implementation, not just with our own
  * oracle.
  *
  * Node order: the fixture's array position IS the node order (the
  * reference feeds the arrays as-is), so `node_idx` is pre-assigned
  * positionally and `withNodeIndex`'s idempotence keeps it.
  */
class GoldenFixturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import Cols._

  private val files = "/root/reference/tests/files"
  private val Rtol = 1e-3

  /** test_frame.json → long DataFrame with positional node_idx. */
  private lazy val frame: DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(s"$files/test_frame.json")
    val zipped = raw.select(posexplode(arrays_zip(
      col("x"), col("y"), col("z"), col("v"), col("vx"), col("vy"), col("vz"),
      col("team_id"), col("position_name"), col("ball_owning_team_id"),
      col("is_ball_carrier"))).as(Seq("node_idx", "o")))
    zipped.select(
      lit("g").as(GameId), lit(1).as(PeriodId), lit(10000L).as(FrameId),
      lit(0L).as(Timestamp), col("node_idx"),
      concat(lit("obj"), col("node_idx")).as(ObjectId),
      col("o.team_id").as(TeamId),
      when(col("o.team_id") === Ball, lit(Ball)).otherwise(col("o.position_name")).as(PositionName),
      col("o.x").as(X), col("o.y").as(Y), col("o.z").as(Z),
      col("o.vx").as(Vx), col("o.vy").as(Vy), col("o.vz").as(Vz), col("o.v").as(Speed),
      col("o.ball_owning_team_id").as(BallOwningTeamId),
      col("o.is_ball_carrier").as(IsBallCarrier))
  }

  private def approx(actual: Double, expected: Double): Boolean =
    math.abs(actual - expected) <= Rtol * math.abs(expected) + 1e-5

  test("node features match the reference node_features.npy (23x15, rtol 1e-3)") {
    val golden = NpyReader.read(s"$files/node_features.npy")
    assert(golden.shape === Seq(23, 15))
    val x = GraphConverter.withNodeFeatures(frame, GraphSettings(pad = false))
      .orderBy("node_idx")
      .select("x_features").collect().map(_.getSeq[Double](0))
    assert(x.length === 23)
    for (i <- 0 until 23; j <- 0 until 15) {
      val exp = golden.doubles(i * 15 + j)
      assert(approx(x(i)(j), exp),
        s"node $i feature $j: got ${x(i)(j)} expected $exp")
    }
  }

  test("adjacency matches the reference adjacency_matrix.npy (23x23)") {
    val golden = NpyReader.read(s"$files/adjacency_matrix.npy")
    assert(golden.shape === Seq(23, 23))
    val a = GraphConverter.pairs(frame, GraphSettings(pad = false))
      .select("i_node_idx", "j_node_idx", "a").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    for (i <- 0 until 23; j <- 0 until 23)
      assert(a((i, j)).toDouble === golden.doubles(i * 23 + j),
        s"adjacency ($i,$j)")
  }

  test("edge features match the reference edge_features.npy (287x6, rtol 1e-3)") {
    val golden = NpyReader.read(s"$files/edge_features.npy")
    assert(golden.shape === Seq(287, 6))
    val edges = GraphConverter.pairs(frame, GraphSettings(pad = false))
      .filter(col("a") === 1)
      .orderBy("i_node_idx", "j_node_idx")
      .select("e_features").collect().map(_.getSeq[Double](0))
    assert(edges.length === 287)
    for (k <- edges.indices; j <- 0 until 6) {
      val exp = golden.doubles(k * 6 + j)
      val got = edges(k)(j) + 0.0 // normalize -0.0 like the query path
      assert(approx(got, exp), s"edge $k feature $j: got $got expected $exp")
    }
  }
}
