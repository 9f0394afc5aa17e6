package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Weight interchange: a JSON document round-trips through
  * toJson/fromJson bit-exactly, a torch-layout document transposes
  * into the row-major layers, and a loaded model scores graphs
  * identically to the directly-constructed layer stack. */
class GnnWeightsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import GnnInference._

  private val rnd = new scala.util.Random(13)
  private def mat(r: Int, c: Int) = Seq.fill(r)(Seq.fill(c)(rnd.nextDouble() - 0.5))
  private def vec(n: Int) = Seq.fill(n)(rnd.nextDouble() - 0.5)

  private val F = 3; private val E = 2; private val z = 2 * F + E
  private val convs = Seq(
    CgLayer(mat(z, F), vec(F), mat(z, F), vec(F)),
    CgLayer(mat(z, F), vec(F), mat(z, F), vec(F)))
  private val head = Seq(
    DenseLayer(mat(F, 4), vec(4), "relu"),
    DenseLayer(mat(4, 1), vec(1), "sigmoid"))

  test("row_major round trip is exact") {
    val (c2, h2) = GnnWeights.fromJson(GnnWeights.toJson(convs, head))
    assert(c2 === convs)
    assert(h2 === head)
  }

  test("torch layout transposes Linear weights into row-major") {
    // torch Linear.weight is (out, in): a 1-conv doc with out=2, in=3
    val json =
      """{"layout":"torch",
        |"convs":[{"wf":[[1,2,3],[4,5,6]],"bf":[0.1,0.2],
        |          "ws":[[7,8,9],[10,11,12]],"bs":[0.3,0.4]}],
        |"head":[{"w":[[1,0],[0,1]],"b":[0,0],"activation":"linear"}]}""".stripMargin
    val (cs, hs) = GnnWeights.fromJson(json)
    assert(cs.head.wf === Seq(Seq(1.0, 4.0), Seq(2.0, 5.0), Seq(3.0, 6.0)))
    assert(cs.head.ws === Seq(Seq(7.0, 10.0), Seq(8.0, 11.0), Seq(9.0, 12.0)))
    assert(cs.head.bf === Seq(0.1, 0.2))
    assert(hs.head.w === Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
  }

  test("malformed documents are rejected with a dimension message") {
    // bias length 3 vs weight columns 2
    val bad =
      """{"convs":[{"wf":[[1,2],[3,4]],"bf":[1,2,3],
        |           "ws":[[1,2],[3,4]],"bs":[1,2]}]}""".stripMargin
    val e = intercept[IllegalArgumentException](GnnWeights.fromJson(bad))
    assert(e.getMessage.contains("bias length"))
    intercept[IllegalArgumentException](GnnWeights.fromJson("{}"))
    intercept[IllegalArgumentException](
      GnnWeights.fromJson("""{"layout":"column_major","convs":[]}"""))
    intercept[IllegalArgumentException](GnnWeights.fromJson(
      """{"head":[{"w":[[1]],"b":[1],"activation":"tanh"}]}"""))
  }

  test("a loaded model scores graphs identically to the constructed stack") {
    import spark.implicits._
    val x = (0 until 5).map(i => i -> vec(F)).toMap
    val undirected = for {
      i <- 0 until 5; j <- 0 until i; if rnd.nextDouble() < 0.7
    } yield (i, j, vec(E))
    val edges = undirected.flatMap { case (i, j, e) => Seq((i, j, e), (j, i, e)) }
    val nodes = x.toSeq.map { case (i, xs) => ("g", i, xs) }.toDF("graph_id", "idx", "x")
    val edgeDf = edges.map { case (i, j, e) => ("g", i, j, e) }.toDF("graph_id", "i", "j", "e")

    val path = java.nio.file.Files.createTempFile("graft_gnn_weights", ".json")
    java.nio.file.Files.write(path, GnnWeights.toJson(convs, head).getBytes("UTF-8"))
    val (lc, lh) = GnnWeights.load(path.toString)

    val direct = GnnInference.forward(nodes, edgeDf, Seq("graph_id"), convs, head)
      .head().getSeq[Double](1)
    val loaded = GnnInference.forward(nodes, edgeDf, Seq("graph_id"), lc, lh)
      .head().getSeq[Double](1)
    assert(direct === loaded) // bit-exact: same doubles through the same plan
  }
}
