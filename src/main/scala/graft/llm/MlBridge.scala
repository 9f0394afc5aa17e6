package graft.llm

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.mllib.clustering.{KMeans => MllibKMeans, KMeansModel => MllibKMeansModel}
import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bridges into Spark MLlib for the two trainers graft also implements
  * in closed relational form — the production-scale variants and the
  * cross-checks of each other.
  *
  * Why both paths exist: the relational trainers ([[KMeansLite]],
  * [[QualityClassifier]]) are DECIMAL-exact and therefore DuckDB-
  * replayable — they carry the oracles. MLlib's trainers are the
  * battle-tested distributed implementations (norm-pruned Lloyd's,
  * L-BFGS logistic regression) but accumulate in doubles with
  * platform/partition-order-dependent last-ulp behavior, which puts
  * them outside bit-exact cross-engine replay (the same reason the
  * seeded-shuffle O3 stayed spec-only until the md5 rewrite). So:
  * MLlib = production variant, relational = oracle variant,
  * MlBridgeSpec = the proof they agree.
  *
  * Scale shape: both MLlib paths are the library's own distributed
  * implementations (broadcast centers + treeAggregate per Lloyd's
  * pass; hashed features avoid any vocabulary collect for the
  * classifier — the fastText trick, no CountVectorizer driver vocab).
  */
object MlBridge {

  /** MLlib Lloyd's seeded with the SAME deterministic md5-sample init
    * as [[KMeansLite.fit]] and forced to the same fixed iteration
    * count (epsilon = 0 disables early convergence). With identical
    * init, identical pass count, and the same lowest-index tie rule,
    * the two implementations walk the same centroid trajectory up to
    * double-summation order (~1e-9) — asserted in MlBridgeSpec.
    *
    * Returns (centers indexed by cluster id, assignments
    * (idCol, cluster) under the FINAL centers). */
  def kmeansFit(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2): (Array[Array[Double]], DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val initCenters = KMeansLite.mdInit(emb, idCol, vecCol, k)
      .orderBy("cluster").collect()
      .map(r => Vectors.dense(r.getSeq[Double](1).toArray))
    val data = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .rdd.map { case (id, v) => (id, Vectors.dense(v.map(_.toDouble))) }
    data.cache()
    val model = new MllibKMeans()
      .setK(k)
      .setMaxIterations(iters)
      .setEpsilon(0.0)
      .setInitialModel(new MllibKMeansModel(initCenters))
      .run(data.values)
    val asg = data.mapValues(model.predict).toDF(idCol, "cluster")
    data.unpersist(blocking = false)
    (model.clusterCenters.map(_.toArray), asg)
  }

  /** The fastText-analog trained quality classifier: hashed
    * bag-of-words (no vocabulary materialization — the trick that
    * keeps fastText linear at corpus scale) into an L2-regularized
    * logistic regression, same tokenizer and same seed contract as
    * the closed-form [[QualityClassifier.scored]]. Output matches its
    * shape: (doc_id, score = P(seed|doc), keep = score > 0.5).
    *
    * Production variant only — L-BFGS puts it outside the DuckDB
    * oracle; `q_doc_quality_clf` stays on the closed form. */
  def qualityScored(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seed: Column,
      numFeatures: Int = 1 << 15,
      maxIter: Int = 20,
      regParam: Double = 1e-4): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      seed.cast("double").as("label"),
      Shingles.tokens(col(textCol)).as("toks"))
    val featurized = new HashingTF()
      .setInputCol("toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(toks)
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(featurized)
    model.transform(featurized)
      .select(col("doc_id"),
        vector_to_array(col("probability")).getItem(1).as("score"))
      .withColumn("keep", col("score") > 0.5)
  }

  /** The GNN head TRAINER: MLlib logistic regression over the pooled
    * graph embeddings [[graft.graphs.GnnInference.pooledEmbeddings]]
    * emits. The learned (coefficients, intercept) come back as a
    * [[graft.graphs.GnnInference.DenseLayer]] with sigmoid activation,
    * so the trained head serves through `GnnInference.forward`
    * unchanged — train here, score a 100 TB season there, one model.
    *
    * Production variant only (L-BFGS, like [[qualityScored]]); the
    * closed-form least-squares twin [[gnnHeadLsq2]] carries the
    * `q_gnn_head` oracle, MlBridgeSpec proves the serve-side
    * round-trip and the twin agreement on separable data.
    *
    * Returns (the trained head layer, the per-graph scored table
    * (keys…, score = P(label=1), keep = score > 0.5)). */
  def gnnHeadFit(
      pooled: DataFrame,
      keys: Seq[String],
      labelCol: Column,
      maxIter: Int = 50,
      regParam: Double = 0.0): (graft.graphs.GnnInference.DenseLayer, DataFrame) = {
    val data = pooled.select((keys.map(col) :+
      org.apache.spark.ml.functions.array_to_vector(col("score")).as("features") :+
      labelCol.cast("double").as("label")): _*)
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(data)
    val layer = graft.graphs.GnnInference.DenseLayer(
      w = model.coefficients.toArray.toSeq.map(c => Seq(c)),
      b = Seq(model.intercept),
      activation = "sigmoid")
    val scored = model.transform(data)
      .select((keys.map(col) :+
        vector_to_array(col("probability")).getItem(1).as("score")): _*)
      .withColumn("keep", col("score") > 0.5)
    (layer, scored)
  }

  /** Closed-form least-squares twin of [[gnnHeadFit]] for 2-feature
    * pooled embeddings (the `q_gnn_forward` model size): the linear
    * probability model β = (XᵀX)⁻¹Xᵀy with an intercept, solved by
    * Cramer's rule on the 3×3 normal equations — every sum
    * accumulates as DECIMAL(20,9) over features pre-rounded to 6
    * decimals, so the Gram matrix is exact and merge-order-free and
    * the whole fit replays bit-for-bit in the DuckDB oracle
    * (`q_gnn_head`). Decisions (`keep` = score > 0.5) agree with the
    * logistic trainer on separable data (MlBridgeSpec).
    *
    * Output: (keys…, score round 6, keep). */
  def gnnHeadLsq2(
      pooled: DataFrame,
      keys: Seq[String],
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d6(c: Column): Column = round(c.cast(DecimalType(20, 9)), 6).cast("double")
    def dec(c: Column): Column = c.cast(DecimalType(20, 9))
    val ft = pooled.select((keys.map(col) :+
      d6(element_at(col("score"), 1)).as("p1") :+
      d6(element_at(col("score"), 2)).as("p2") :+
      labelCol.cast("double").as("y")): _*)
    val g = ft.agg(
      count(lit(1)).cast("double").as("n"),
      sum(dec(col("p1"))).cast("double").as("s1"),
      sum(dec(col("p2"))).cast("double").as("s2"),
      sum(dec(col("p1") * col("p1"))).cast("double").as("s11"),
      sum(dec(col("p1") * col("p2"))).cast("double").as("s12"),
      sum(dec(col("p2") * col("p2"))).cast("double").as("s22"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum(dec(col("p1") * col("y"))).cast("double").as("s1y"),
      sum(dec(col("p2") * col("y"))).cast("double").as("s2y"))
    // first-row cofactor expansions, mirrored verbatim in the oracle
    val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 = col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 = col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    // degenerate Gram (constant features, or fewer distinct (p1,p2)
    // points than parameters) makes det exactly 0 under the DECIMAL-
    // exact sums — fail fast with a named error instead of emitting
    // NaN scores on both engines
    val detSafe = when(det === lit(0.0),
      raise_error(lit("gnnHeadLsq2: degenerate Gram matrix (det=0) — " +
        "features are constant/collinear; the 3-parameter head needs " +
        "at least 3 affinely independent (p1,p2) points")).cast("double"))
      .otherwise(det)
    val beta = g.select((det0 / detSafe).as("b0"), (det1 / detSafe).as("b1"),
      (det2 / detSafe).as("b2"))
    ft.crossJoin(broadcast(beta))
      .withColumn("__s", col("b0") + col("b1") * col("p1") + col("b2") * col("p2"))
      .select((keys.map(col) :+
        (round(col("__s").cast(DecimalType(20, 9)), 6).cast("double") + lit(0.0)).as("score") :+
        (col("__s") > 0.5).as("keep")): _*)
  }
}
