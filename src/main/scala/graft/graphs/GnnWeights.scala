package graft.graphs

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Weight exchange for [[GnnInference]] — closes the train-in-PyG →
  * score-in-Spark journey (`crystal_graph_pyg.py:84-146` trains the
  * CrystalGraphClassifier; this loads its exported weights so Spark
  * scores a whole season distributively).
  *
  * Interchange format: one JSON document
  * {{{
  * { "layout": "row_major" | "torch",
  *   "convs": [ {"wf": [[..]], "bf": [..], "ws": [[..]], "bs": [..]}, .. ],
  *   "head":  [ {"w": [[..]], "b": [..], "activation": "relu"}, .. ] }
  * }}}
  * `layout` describes the 2-D weight orientation:
  *  - `row_major` (default): `w(m)(k)` multiplies input m into output
  *    k — [[GnnInference.CgLayer]]'s native layout (inDim × outDim).
  *  - `torch`: PyTorch `Linear.weight` layout (outDim × inDim), the
  *    shape `model.state_dict()[...].tolist()` produces for CGConv's
  *    `lin_f`/`lin_s` and the head's `Linear`s. The loader transposes,
  *    so a PyG export script is four `.tolist()` calls and no
  *    reshaping.
  *
  * Parsing uses the Jackson shipped inside Spark (no new dependency);
  * weights are KBs and load driver-side — they ride the plan closure
  * exactly like hand-constructed layers. */
object GnnWeights {
  import GnnInference.{CgLayer, DenseLayer}

  private def mat(n: JsonNode): Seq[Seq[Double]] =
    n.elements().asScala.map(row =>
      row.elements().asScala.map(_.asDouble()).toSeq).toSeq

  private def vec(n: JsonNode): Seq[Double] =
    n.elements().asScala.map(_.asDouble()).toSeq

  private def transpose(m: Seq[Seq[Double]]): Seq[Seq[Double]] =
    if (m.isEmpty) m else m.head.indices.map(k => m.map(_(k)))

  /** Parse a weight document. Throws IllegalArgumentException on a
    * malformed document (missing fields, ragged matrices, dimension
    * mismatches between a layer's weights and biases). */
  def fromJson(json: String): (Seq[CgLayer], Seq[DenseLayer]) = {
    val root = new ObjectMapper().readTree(json)
    val torch = Option(root.get("layout")).map(_.asText()) match {
      case Some("torch") => true
      case Some("row_major") | None => false
      case Some(other) =>
        throw new IllegalArgumentException(s"unknown layout '$other'")
    }
    def orient(m: Seq[Seq[Double]]): Seq[Seq[Double]] =
      if (torch) transpose(m) else m
    def checked(w: Seq[Seq[Double]], b: Seq[Double], what: String): Unit = {
      require(w.nonEmpty && w.forall(_.size == b.size),
        s"$what: weight columns (${w.headOption.fold(0)(_.size)}) must match " +
          s"bias length ${b.size}")
      require(w.map(_.size).distinct.size == 1, s"$what: ragged weight matrix")
    }
    val convs = Option(root.get("convs")).toSeq
      .flatMap(_.elements().asScala).map { c =>
        val l = CgLayer(
          orient(mat(c.get("wf"))), vec(c.get("bf")),
          orient(mat(c.get("ws"))), vec(c.get("bs")))
        checked(l.wf, l.bf, "conv wf")
        checked(l.ws, l.bs, "conv ws")
        require(l.wf.size == l.ws.size && l.bf.size == l.bs.size,
          "conv: gate and source transforms must share dimensions")
        l
      }
    val head = Option(root.get("head")).toSeq
      .flatMap(_.elements().asScala).map { h =>
        val act = Option(h.get("activation")).map(_.asText()).getOrElse("linear")
        require(Set("relu", "sigmoid", "softplus", "linear")(act),
          s"unknown activation '$act'")
        val l = DenseLayer(orient(mat(h.get("w"))), vec(h.get("b")), act)
        checked(l.w, l.b, "dense")
        l
      }
    require(convs.nonEmpty || head.nonEmpty, "empty weight document")
    (convs, head)
  }

  /** Load from a local or Hadoop-visible path (driver-side; weight
    * documents are KBs). */
  def load(path: String): (Seq[CgLayer], Seq[DenseLayer]) =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  /** Serialize layers back to the row_major interchange form — the
    * round-trip half used by specs and by model snapshotting. */
  def toJson(convs: Seq[CgLayer], head: Seq[DenseLayer]): String = {
    def jm(m: Seq[Seq[Double]]) =
      m.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    def jv(v: Seq[Double]) = v.mkString("[", ",", "]")
    val cs = convs.map(c =>
      s"""{"wf":${jm(c.wf)},"bf":${jv(c.bf)},"ws":${jm(c.ws)},"bs":${jv(c.bs)}}""")
      .mkString("[", ",", "]")
    val hs = head.map(h =>
      s"""{"w":${jm(h.w)},"b":${jv(h.b)},"activation":"${h.activation}"}""")
      .mkString("[", ",", "]")
    s"""{"layout":"row_major","convs":$cs,"head":$hs}"""
  }
}
