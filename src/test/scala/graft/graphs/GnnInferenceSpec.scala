package graft.graphs

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CGConv forward-pass parity: the distributed plan must reproduce a
  * plain-loop implementation of PyG's CGConv (sum aggregation) +
  * global mean pool + dense head to double precision, plus a
  * fully-hand-computed single-edge case and a smoke pass over the real
  * Sportec fixture graphs. */
class GnnInferenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import GnnInference._

  // ---- plain-loop reference implementation ----
  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))
  private def softplus(x: Double) = math.max(x, 0.0) + math.log1p(math.exp(-math.abs(x)))
  private def matvec(z: Seq[Double], w: Seq[Seq[Double]], b: Seq[Double]): Seq[Double] =
    b.indices.map(k => b(k) + z.indices.map(m => z(m) * w(m)(k)).sum)

  private def refCgconv(
      x: Map[Int, Seq[Double]], edges: Seq[(Int, Int, Seq[Double])],
      l: CgLayer): Map[Int, Seq[Double]] =
    x.map { case (i, xi) =>
      val msgs = edges.filter(_._1 == i).map { case (_, j, e) =>
        val z = xi ++ x(j) ++ e
        val g = matvec(z, l.wf, l.bf).map(sigmoid)
        val s = matvec(z, l.ws, l.bs).map(softplus)
        g.zip(s).map { case (a, b) => a * b }
      }
      i -> msgs.foldLeft(xi)((acc, m) => acc.zip(m).map { case (a, b) => a + b })
    }

  private def refForward(
      x: Map[Int, Seq[Double]], edges: Seq[(Int, Int, Seq[Double])],
      convs: Seq[CgLayer], head: Seq[DenseLayer]): Seq[Double] = {
    val conv = convs.foldLeft(x)((acc, l) => refCgconv(acc, edges, l))
    val pooled = conv.values.transpose.map(col => col.sum / conv.size).toSeq
    head.foldLeft(pooled) { (v, l) =>
      val raw = matvec(v, l.w, l.b)
      l.activation match {
        case "relu" => raw.map(math.max(_, 0.0))
        case "sigmoid" => raw.map(sigmoid)
        case _ => raw
      }
    }
  }

  private def nodesDf(x: Map[Int, Seq[Double]], g: String = "g") = {
    import spark.implicits._
    x.toSeq.map { case (i, xs) => (g, i, xs) }.toDF("graph_id", "idx", "x")
  }
  private def edgesDf(edges: Seq[(Int, Int, Seq[Double])], g: String = "g") = {
    import spark.implicits._
    edges.map { case (i, j, e) => (g, i, j, e) }.toDF("graph_id", "i", "j", "e")
  }

  test("hand-computed single message: gate * softplus lands on the target node") {
    // nodes x0=[1], x1=[2]; directed edge 0<-1 only (i=0 receives from j=1)
    val l = CgLayer(
      wf = Seq(Seq(0.1), Seq(0.2), Seq(0.3)), bf = Seq(0.05),
      ws = Seq(Seq(-0.1), Seq(0.4), Seq(0.2)), bs = Seq(0.0))
    val out = cgconv(
      nodesDf(Map(0 -> Seq(1.0), 1 -> Seq(2.0))),
      edgesDf(Seq((0, 1, Seq(0.5)))),
      Seq("graph_id"), l)
      .collect().map(r => r.getInt(1) -> r.getSeq[Double](2)).toMap
    // z = [1, 2, 0.5] -> gate = sigmoid(0.1+0.4+0.15+0.05)=sigmoid(0.7)
    //                    soft = softplus(-0.1+0.8+0.1)=softplus(0.8)
    val expected = 1.0 + sigmoid(0.7) * softplus(0.8)
    assert(math.abs(out(0).head - expected) < 1e-12)
    assert(out(1) === Seq(2.0)) // no incoming edge: x passes through
  }

  test("multi-layer + pool + head parity vs the loop implementation") {
    val rnd = new scala.util.Random(5)
    def mat(r: Int, c: Int) = Seq.fill(r)(Seq.fill(c)(rnd.nextDouble() - 0.5))
    def vec(n: Int) = Seq.fill(n)(rnd.nextDouble() - 0.5)
    val F = 3; val E = 2; val z = 2 * F + E
    val x = (0 until 5).map(i => i -> vec(F)).toMap
    // symmetric random graph (both directions), self-loops excluded
    val undirected = for {
      i <- 0 until 5; j <- 0 until i; if rnd.nextDouble() < 0.7
    } yield (i, j, vec(E))
    val edges = undirected.flatMap { case (i, j, e) => Seq((i, j, e), (j, i, e)) }
    val convs = Seq(
      CgLayer(mat(z, F), vec(F), mat(z, F), vec(F)),
      CgLayer(mat(z, F), vec(F), mat(z, F), vec(F)))
    val head = Seq(
      DenseLayer(mat(F, 4), vec(4), "relu"),
      DenseLayer(mat(4, 1), vec(1), "sigmoid"))

    val got = forward(nodesDf(x), edgesDf(edges), Seq("graph_id"), convs, head)
      .head().getSeq[Double](1)
    val want = refForward(x, edges, convs, head)
    assert(got.size === 1 && want.size === 1)
    assert(math.abs(got.head - want.head) < 1e-9, s"got $got want $want")
  }

  test("smoke: scores every Sportec fixture frame through the converter's long tables") {
    val files = "/root/reference/tests/files"
    val prepared = graft.api.SoccerPipeline.loadSportec(
      spark, s"$files/sportec_tracking.xml", s"$files/sportec_meta.xml")
    val oriented = graft.tracking.Orientation.toBallOwning(prepared, "DFL-CLU-00000P")
    val settings = GraphSettings(pad = false)
    val keys = Seq("game_id", "period_id", "frame_id")
    val nodes = GraphConverter.withNodeFeatures(
      GraphConverter.removeIncompleteFrames(oriented), settings)
      .select((keys.map(col) :+ col("node_idx").as("idx") :+ col("x_features").as("x")): _*)
    val edges = GraphConverter.pairs(
      GraphConverter.removeIncompleteFrames(oriented), settings)
      .filter(col("a") === 1 && col("i_node_idx") =!= col("j_node_idx"))
      .select((keys.map(col) :+ col("i_node_idx").as("i") :+ col("j_node_idx").as("j")
        :+ col("e_features").as("e")): _*)

    val F = 15; val E = 6; val z = 2 * F + E
    val rnd = new scala.util.Random(7)
    def mat(r: Int, c: Int) = Seq.fill(r)(Seq.fill(c)(rnd.nextDouble() * 0.1 - 0.05))
    def vec(n: Int) = Seq.fill(n)(0.0)
    val convs = Seq.fill(3)(CgLayer(mat(z, F), vec(F), mat(z, F), vec(F)))
    val head = Seq(DenseLayer(mat(F, 1), Seq(0.0), "sigmoid"))

    val scores = forward(nodes, edges, keys, convs, head).collect()
    assert(scores.length === 21) // one score per fixture frame
    scores.foreach { r =>
      val s = r.getSeq[Double](3)
      assert(s.size === 1 && s.head > 0.0 && s.head < 1.0)
    }
  }
}
