package graft.llm

import graft.SparkTestSession
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the relational oracle trainers against their
  * MLlib production counterparts ([[MlBridge]]): same init, same pass
  * count ⇒ the same model up to double-summation order. */
class MlBridgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf)

  test("kmeans: MLlib Lloyd's from the md5 init matches KMeansLite centroid-for-centroid") {
    val k = 8; val iters = 2
    val (liteCents, _) = KMeansLite.fit(emb, "vec_id", "embedding", k, iters)
    val lite = liteCents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val (mlCents, _) = MlBridge.kmeansFit(emb, "vec_id", "embedding", k, iters)
    assert(lite.size === k && mlCents.length === k)
    for (c <- 0 until k) {
      val d = math.sqrt(lite(c.toLong).zip(mlCents(c))
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      // DECIMAL(20,9)-rounded means vs double axpy sums: agreement to
      // well under any assignment-flipping distance
      assert(d < 1e-6, s"cluster $c centroid drift $d")
    }
  }

  test("kmeans: assignments under the final centers agree >= 99%") {
    val k = 8; val iters = 2
    val (liteCents, _) = KMeansLite.fit(emb, "vec_id", "embedding", k, iters)
    val liteAsg = KMeansLite.assign(emb, liteCents, "vec_id", "embedding")
      .select(col("vec_id").cast("long"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (_, mlAsg) = MlBridge.kmeansFit(emb, "vec_id", "embedding", k, iters)
    val ml = mlAsg.collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(ml.keySet === liteAsg.keySet)
    val agree = ml.count { case (id, c) => liteAsg(id) == c }
    assert(agree.toDouble / ml.size >= 0.99,
      s"only $agree/${ml.size} assignments agree")
  }

  test("kmeans: the two models report the same clustering cost") {
    val k = 8; val iters = 2
    val (liteCents, _) = KMeansLite.fit(emb, "vec_id", "embedding", k, iters)
    val liteCost = KMeansLite.assign(emb, liteCents, "vec_id", "embedding")
      .join(liteCents, "cluster")
      .agg(sum(KMeansLite.l2sqFold(col("embedding"), col("__cent"))))
      .head.getDouble(0)
    val (mlCents, mlAsg) = MlBridge.kmeansFit(emb, "vec_id", "embedding", k, iters)
    val centRows = mlCents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
    val centDf = spark.createDataFrame(centRows).toDF("cluster", "__cent")
    val mlCost = mlAsg.withColumn("cluster", col("cluster").cast("long"))
      .join(emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding")), "vec_id")
      .join(centDf, "cluster")
      .agg(sum(KMeansLite.l2sqFold(col("embedding"), col("__cent"))))
      .head.getDouble(0)
    assert(math.abs(liteCost - mlCost) / liteCost < 1e-6,
      s"cost diverged: lite $liteCost vs mllib $mlCost")
  }

  test("train-anywhere, serve-here: an MLlib-trained codebook drives IVF search like KMeansLite's") {
    val k = 4; val iters = 2
    // same init, same pass count => near-identical centroids (proved
    // above), so the float codebooks and hence the served top-k match
    val (liteCents, _) = KMeansLite.fit(emb, "vec_id", "embedding", k, iters)
    val liteBook = KMeansLite.asFloatCodebook(liteCents)
    val (mlCents, _) = MlBridge.kmeansFit(emb, "vec_id", "embedding", k, iters)
    val mlBook = spark.createDataFrame(
      mlCents.zipWithIndex.map { case (c, i) => (i.toLong, c.map(_.toFloat).toSeq) })
      .toDF("cell", "__cent")
    def serve(book: org.apache.spark.sql.DataFrame) =
      Similarity.topKCosineIvfTrained(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 3, book)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(serve(liteBook) === serve(mlBook))
  }

  test("gnn head: trained layer serves through GnnInference.forward; twin agrees") {
    import spark.implicits._
    import graft.graphs.GnnInference
    // 40 single-node "graphs" with controlled 2-dim pooled embeddings:
    // class 1 near (0.8, 0.8), class 0 near (0.2, 0.2), deterministic
    // jitter — cleanly separable, so LR and the least-squares twin
    // must make identical keep decisions
    val nodes = (0L until 40L).map { g =>
      val base = if (g % 2 == 0) 0.8 else 0.2
      val jit = (g % 7).toDouble / 100.0
      (g, 0, Seq(base + jit, base - jit))
    }.toDF("graph_id", "idx", "x")
    val edges = Seq.empty[(Long, Int, Int, Seq[Double])]
      .toDF("graph_id", "i", "j", "e")
    val keys = Seq("graph_id")
    val pooled = GnnInference.pooledEmbeddings(nodes, edges, keys, Nil)
    val label = element_at(col("score"), 1) > 0.5

    val (layer, scored) = MlBridge.gnnHeadFit(pooled, keys, label)
    // serve-side round-trip: the SAME pooled features through
    // GnnInference.forward with the trained head reproduce the
    // model's own probabilities
    val served = GnnInference.forward(nodes, edges, keys, Nil, Seq(layer))
      .select(col("graph_id"), element_at(col("score"), 1).as("fwd"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served.keySet === direct.keySet)
    served.foreach { case (g, s) =>
      assert(math.abs(s - direct(g)) < 1e-9, s"graph $g: forward $s vs transform ${direct(g)}")
    }
    // perfect separation on this corpus, and the closed-form twin
    // (the q_gnn_head oracle path) reaches the same decisions
    val want = (0L until 40L).map(g => g -> (g % 2 == 0)).toMap
    val lrKeep = scored.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val lsqKeep = MlBridge.gnnHeadLsq2(pooled, keys, label)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(lrKeep === want, "LR must separate the two classes")
    assert(lsqKeep === want, "the least-squares twin must separate them too")
  }

  test("gnn head twin: degenerate Gram (constant features) fails fast, not NaN") {
    import spark.implicits._
    // every pooled embedding identical => XᵀX is rank-1, det = 0; the
    // fit must raise the named error instead of scoring everything NaN
    val pooled = (0L until 10L).map(g => (g, Seq(0.5, 0.5)))
      .toDF("graph_id", "score")
    val ex = intercept[Exception] {
      MlBridge.gnnHeadLsq2(pooled, Seq("graph_id"),
        col("graph_id") % 2 === 0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("degenerate Gram matrix")),
      s"wanted the det=0 fail-fast, got: ${messages(ex).mkString(" | ")}")
  }

  test("quality classifier: the trained LR path behaves like the closed form") {
    val docs = Tables.documents(spark, sf)
    val seed = col("source").isin("src1", "src4", "src7")
    val lr = MlBridge.qualityScored(docs, "doc_id", "text", seed)
    val nDocs = docs.count()
    assert(lr.count() === nDocs)
    // probabilities, not log-odds
    assert(lr.filter(col("score") < 0 || col("score") > 1).count() === 0L)
    // the model must have learned the seed direction: seed docs score
    // strictly higher on average than the rest
    val seedScore = docs.select(col("doc_id").cast("long").as("doc_id"), seed.as("s"))
      .join(lr, "doc_id")
      .groupBy(col("s")).agg(avg(col("score")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(seedScore(true) > seedScore(false) + 0.05,
      s"seed ${seedScore(true)} vs rest ${seedScore(false)}")
    // and its RANKING correlates with the closed-form NB's: the two
    // models put different class-prior mass into their thresholds
    // (LR's intercept absorbs the seed fraction; NB's score>0 is a
    // pure likelihood-ratio rule), so compare median-calibrated
    // decisions — each model's own top half — which removes the
    // operating-point offset and leaves the learned direction
    val nb = QualityClassifier.scored(docs, "doc_id", "text", seed)
      .select(col("doc_id"), col("score").as("nb_score"))
    val both = lr.join(nb, "doc_id")
    val lrCut = both.stat.approxQuantile("score", Array(0.5), 0.0).head
    val nbCut = both.stat.approxQuantile("nb_score", Array(0.5), 0.0).head
    val agree = both.filter(
      (col("score") >= lrCut) === (col("nb_score") >= nbCut)).count()
    assert(agree.toDouble / nDocs > 0.7,
      s"LR/NB median-split agreement only $agree/$nDocs")
  }
}
