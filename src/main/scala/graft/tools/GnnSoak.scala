package graft.tools

import graft.SparkEntry
import graft.graphs.GnnInference
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Honest A/B of the codegen'd [[graft.functions.MatVecAffine]] vs
  * the interpreted-HOF affine on a REFERENCE-SIZED CGConv model.
  *
  * `q_gnn_forward`'s A/B (HonestOne with SPARK_GRAFT_GNN_HOF=1) is
  * diluted: its toy model (F=2, E=1 → 5×2 matvecs) spends the honest
  * time in the pair join, not the arithmetic. The reference's soccer
  * model is F=15 node features / E=6 edge features (z = 36 per edge,
  * 36×15 weight matrices), where the interpreted chain evaluates
  * F·(2F+E) lambda steps per edge per gate — this soak times ONE
  * CGConv layer + head at that width over synthetic padded frames
  * (23 nodes, dense pairs — the real per-frame shape), both arms in
  * one session, min-of-3, hash-every-column sink.
  *
  * Prints {"metric":"gnn_soak","native":s,"hof":s,"speedup":x,…}.
  */
object GnnSoak {
  def main(args: Array[String]): Unit = {
    val nGraphs = args.headOption.map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val F = 15; val E = 6; val Z = 2 * F + E
    // deterministic synthetic weights/features (no RNG — replayable)
    def wm(rows: Int, cols: Int, salt: Int): Seq[Seq[Double]] =
      (0 until rows).map(m => (0 until cols).map(k =>
        ((m * 31 + k * 17 + salt) % 97) / 97.0 - 0.5))
    val conv = GnnInference.CgLayer(
      wf = wm(Z, F, 1), bf = (0 until F).map(_ * 0.01),
      ws = wm(Z, F, 2), bs = (0 until F).map(_ * -0.01))
    val head = GnnInference.DenseLayer(wm(F, 1, 3), Seq(0.1), "sigmoid")

    // 23 nodes per graph, dense directed pairs (23×22 edges/graph)
    val nodes = spark.range(nGraphs.toLong * 23)
      .select((col("id") / 23).cast("long").as("graph_id"),
        (col("id") % 23).cast("int").as("idx"))
      .withColumn("x", expr(
        s"transform(sequence(0, ${F - 1}), d -> " +
          "CAST((graph_id * 7 + idx * 13 + d * 5) % 89 AS DOUBLE) / 89.0)"))
    val l = nodes.select(col("graph_id"), col("idx").as("i"))
    val r = nodes.select(col("graph_id"), col("idx").as("j"))
    val edges = l.join(r, "graph_id").filter(col("i") =!= col("j"))
      .withColumn("e", expr(
        s"transform(sequence(0, ${E - 1}), d -> " +
          "CAST((graph_id * 3 + i * 11 + j * 19 + d) % 83 AS DOUBLE) / 83.0)"))

    nodes.persist(); edges.persist()
    nodes.count(); edges.count()

    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
        .agg(sum(col("__h").cast("decimal(38,0)"))).collect()
    def run(): org.apache.spark.sql.DataFrame =
      GnnInference.forward(nodes, edges, Seq("graph_id"), Seq(conv), Seq(head))
        .select(col("graph_id"), element_at(col("score"), 1).as("score"))

    // which arm the session runs is env-driven (affine reads it at
    // plan-build time), so the A/B is two invocations of this main
    val arm = if (sys.env.contains("SPARK_GRAFT_GNN_HOF")) "hof" else "native"
    consume(run()) // warm-up
    val t = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      consume(run())
      (System.nanoTime() - t0) / 1e9
    }.min
    println(s"""{"metric":"gnn_soak","arm":"$arm","sec":${math.rint(t * 1000) / 1000},""" +
      s""""graphs":$nGraphs,"edges":${nGraphs * 23 * 22}}""")
    spark.stop()
  }
}
