package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an `ARRAY<FLOAT>` embedding
  * column — the trainer that produces the coarse codebooks
  * [[Similarity.topKCosineIvf]], [[Similarity.semDeDup]] and [[Pq]]
  * document as their production drop-in (those operators ship with a
  * deterministic hash-sample codebook; this closes the loop).
  *
  * Everything is fixed-point reproducible, so the full algorithm —
  * init, every assignment pass, every centroid update — replays
  * bit-for-bit in the DuckDB oracle (`q_emb_kmeans`):
  *  - init: the k corpus rows with the smallest md5(id) (the same
  *    distributed TakeOrdered sample as the static codebooks);
  *  - assignment: squared L2 as an index-ascending double fold, ties
  *    to the lowest cluster id;
  *  - update: per-dimension DECIMAL(20,9) sums (order-free across
  *    partition merges AND engines — the [[Similarity.groupCentroids]]
  *    pattern) divided by the cluster count; empty clusters keep their
  *    previous centroid;
  *  - a FIXED iteration count instead of a convergence test, so both
  *    engines run the identical number of passes.
  *
  * Scale shape per iteration: one broadcast product corpus × k (the
  * centroid table is k rows, always broadcast), one partial-aggregable
  * groupBy per vector for the argmin, one (cluster, dim)-keyed
  * partial-aggregable groupBy for the update — map-side combine
  * absorbs the dimension fan-out, nothing driver-side, no iteration
  * state beyond the k-row centroid table. Iterations are a Scala loop
  * over DataFrame transformations: the lineage stays a DAG of `iters`
  * stages, fine for the single-digit iteration counts codebook
  * training uses.
  *
  * The distance fold is a higher-order function (interpreted, not
  * codegen) because centroids are DOUBLE arrays after the first
  * update while the native [[graft.functions.VectorExpressions]] dot
  * requires float pairs — acceptable here: training touches the
  * corpus `iters` times total, unlike the serving paths which stay on
  * the codegen'd expression.
  */
object KMeansLite {

  /** Ordered squared-L2 fold between a FLOAT vector and a DOUBLE
    * centroid: sum_i (a_i - b_i)^2, index-ascending. */
  def l2sqFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** DuckDB mirror of [[l2sqFold]]. */
  def l2sqFoldSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), " +
      s"i -> (CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE)) * " +
      s"(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE)))), (acc, x) -> acc + x)"

  /** md5-sample init: k rows, centroid = the float vector cast to
    * double. Output: (cluster, __cent). `private[llm]` so
    * [[MlBridge.kmeansFit]] can seed MLlib with the identical init. */
  private[llm] def mdInit(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__h"))
    emb.select(col(idCol), col(vecCol))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h")).limit(k)
      .withColumn("cluster", (row_number().over(w) - 1).cast("long"))
      .select(col("cluster"),
        transform(col(vecCol), _.cast("double")).as("__cent"))
  }

  /** One assignment pass: nearest centroid by [[l2sqFold]], ties to
    * the lowest cluster id. Output: (idCol, vecCol, cluster). */
  def assign(emb: DataFrame, cents: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .withColumn("__d", l2sqFold(col(vecCol), col("__cent")))
      .groupBy(col(idCol), col(vecCol))
      .agg(min_by(col("cluster"), struct(col("__d"), col("cluster"))).as("cluster"))

  /** Centroid update: per-cluster exact member mean; empty clusters
    * keep their previous centroid. */
  private def updated(prev: DataFrame, asg: DataFrame, vecCol: String): DataFrame = {
    val means = Similarity.groupCentroids(asg, "cluster", vecCol)
      .select(col("cluster"), col("centroid").as("__new"))
    prev.join(means, Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("__new"), col("__cent")).as("__cent"))
  }

  /** Fixed-iteration Lloyd's (`iters` assignment passes). Returns
    * (centroids, assignments): assignments = the final assignment
    * pass; centroids = (cluster, __cent ARRAY<DOUBLE>), the exact
    * member means OF that final assignment — the conventional trainer
    * contract (each reported centroid is the mean of the rows labeled
    * with it). */
  def fit(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2): (DataFrame, DataFrame) = {
    var cents = mdInit(emb, idCol, vecCol, k)
    var asg = assign(emb, cents, idCol, vecCol)
    for (_ <- 1 until iters) {
      cents = updated(cents, asg, vecCol)
      asg = assign(emb, cents, idCol, vecCol)
    }
    (updated(cents, asg, vecCol), asg)
  }

  /** The trained centroids as a FLOAT codebook in the (cell, __cent)
    * shape [[Similarity]]'s serving paths consume — the float cast is
    * the standard serve-time quantization of a double-trained model. */
  def asFloatCodebook(cents: DataFrame): DataFrame =
    cents.select(col("cluster").as("cell"),
      transform(col("__cent"), _.cast("float")).as("__cent"))
}
