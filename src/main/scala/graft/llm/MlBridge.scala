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
}
