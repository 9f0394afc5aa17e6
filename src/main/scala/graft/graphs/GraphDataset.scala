package graft.graphs

import graft.tracking.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test/validation splitting and label balancing (M12/O3/O4,
  * `unravel/utils/objects/graph_dataset.py:120-384`).
  *
  * The reference shuffles id lists in the driver. Here split assignment
  * is **row-local seeded hash-bucketing**: every key deterministically
  * lands in one of 10 000 buckets via a seeded hash, and bucket ranges
  * define the splits. No count() action, no global sort, no join, no
  * shuffle at all — the assignment is a codegen'd projection that scales
  * to any input size, and keying by graph_id keeps every frame of a
  * graph in one split (leakage control). Fractions are honored in
  * expectation (hash-proportional), the same contract a seeded
  * permutation gives on large N.
  */
object GraphDataset {
  import Cols._

  private val Buckets = 10000L

  /** Seeded bucket in [0, 10000): production path (xxhash64, one
    * codegen'd call). */
  def hashBucket(keys: Seq[Column], seed: Long): Column =
    pmod(xxhash64(keys :+ lit(seed): _*), lit(Buckets))

  /** Oracle-expressible bucket: polynomial rolling hash of the joined
    * key string (mirrors [[graft.llm.TextHash.polyHash]], which has an
    * exact DuckDB twin). Same algebra, swap-in replacement. */
  def polyHashBucket(keys: Seq[Column], seed: Long): Column =
    pmod(graft.llm.TextHash.polyHash(
      concat_ws("|", (keys :+ lit(seed.toString)): _*)), lit(Buckets))

  /** Adds a `split` column ∈ {train, test, validation}.
    * @param byGraphId split on graph_id (leakage control) vs frame keys
    * @param exactHash use the oracle-expressible hash (slower per char;
    *                  the default xxhash64 is the production path) */
  def withSplit(
      df: DataFrame,
      trainFrac: Double,
      testFrac: Double,
      valFrac: Double,
      byGraphId: Boolean = false,
      seed: Long = 42L,
      exactHash: Boolean = false): DataFrame = {
    require(math.abs(trainFrac + testFrac + valFrac - 1.0) < 1e-9,
      "split fractions must sum to 1")
    require(trainFrac >= testFrac && testFrac >= valFrac,
      "expected train >= test >= validation")
    val keys = (if (byGraphId) Seq(GraphId) else Seq(GameId, PeriodId, FrameId)).map(col)
    val bucket = if (exactHash) polyHashBucket(keys, seed) else hashBucket(keys, seed)
    df.withColumn("split",
      when(bucket < (trainFrac * Buckets).toLong, "train")
        .when(bucket < ((trainFrac + testFrac) * Buckets).toLong, "test")
        .otherwise("validation"))
  }

  /** Exact-count split — the reference's permutation semantics
    * (`graph_dataset.py:168-175`): `num_train = floor(train_pct · n)`,
    * `num_test = floor(test_pct · n)` when a validation split is
    * requested (else the remainder), validation takes what is left,
    * over a seeded permutation of the distinct split keys.
    *
    * Scale shape: the permutation is hash-order, realized WITHOUT a
    * global single-partition sort — keys bucket by hash (bounded
    * groups), rank inside each bucket with a bucket-local window, and
    * add the (tiny, driver-cumulated, broadcast) bucket offsets. One
    * shuffle over the distinct-key table + one key join back. Use
    * [[withSplit]] (shuffle-free, proportional in expectation) for
    * production-size corpora; exact mode is for research datasets where
    * per-split cardinality must match the reference bit-for-bit. */
  def withSplitExact(
      df: DataFrame,
      trainFrac: Double,
      testFrac: Double,
      valFrac: Double,
      byGraphId: Boolean = false,
      seed: Long = 42L,
      exactHash: Boolean = false): DataFrame = {
    require(math.abs(trainFrac + testFrac + valFrac - 1.0) < 1e-9,
      "split fractions must sum to 1")
    require(trainFrac >= testFrac && testFrac >= valFrac,
      "expected train >= test >= validation")
    val keyNames = if (byGraphId) Seq(GraphId) else Seq(GameId, PeriodId, FrameId)
    val keyCols = keyNames.map(col)
    val hash =
      if (exactHash) graft.llm.TextHash.polyHash(
        concat_ws("|", (keyCols :+ lit(seed.toString)): _*))
      else xxhash64((keyCols :+ lit(seed)): _*)

    val nBuckets = 1024
    val bucketed = df.select(keyCols: _*).distinct()
      .withColumn("__h", hash)
      .withColumn("__b", pmod(col("__h"), lit(nBuckets.toLong)).cast("int"))

    // tiny: ≤ nBuckets rows to the driver → cumulative offsets
    val counts = bucketed.groupBy(col("__b")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val nTrain = (trainFrac * n).toLong
    val nTest = if (valFrac > 0) (testFrac * n).toLong else n - nTrain

    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h") +: keyCols: _*)
    val rank = element_at(typedLit(offsets), col("__b")) +
      row_number().over(wB).cast("long") - 1L
    val assigned = bucketed
      .withColumn("split",
        when(rank < nTrain, "train")
          .when(rank < nTrain + nTest, "test")
          .otherwise("validation"))
      .select(keyCols :+ col("split"): _*)
    df.join(assigned, keyNames)
  }

  /** O4: down-sample the majority class so positive/negative labels
    * match the requested ratio (`graph_dataset.py:318-384`). Sampling
    * keys are taken from the data's own label values, so any integral
    * label type works. */
  def balanced(df: DataFrame, labelCol: String = Label, ratio: Double = 1.0, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    if (counts.size < 2) df
    else {
      def classOf(k: Any): Long = k match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(s"non-numeric label $other")
      }
      val pos = counts.collect { case (k, v) if classOf(k) == 1L => v }.sum.toDouble
      val neg = counts.collect { case (k, v) if classOf(k) == 0L => v }.sum.toDouble
      val (posFrac, negFrac) =
        if (pos > ratio * neg) (ratio * neg / pos, 1.0) else (1.0, pos / (ratio * neg))
      val fractions: Map[Any, Double] = counts.keys.map { k =>
        k -> (if (classOf(k) == 1L) posFrac else negFrac)
      }.toMap
      df.stat.sampleBy(col(labelCol), fractions, seed)
    }
  }

  /** O4, exact-count oracle-expressible form: instead of [[balanced]]'s
    * Bernoulli `sampleBy(seed)` (not replayable outside Spark), keep
    * exactly the first `target(class)` rows of each class in md5 order
    * of the salted row key — the same keep-count arithmetic as
    * [[balanced]] (`graph_dataset.py:318-384`), deterministic across
    * engines (`q_split_balanced`). The per-class rank is a window
    * partitioned by label (2 partitions): fine for the research-dataset
    * sizes this op serves — [[balanced]] remains the shuffle-free
    * production path, the same duality as [[withSplit]]/[[withSplitExact]]. */
  def balancedExact(
      df: DataFrame,
      labelCol: String = Label,
      keyCols: Seq[String] = Seq(GameId, PeriodId, FrameId, ObjectId),
      ratio: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    if (counts.size < 2) df
    else {
      def classOf(k: Any): Long = k match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(s"non-numeric label $other")
      }
      val pos = counts.collect { case (k, v) if classOf(k) == 1L => v }.sum
      val neg = counts.collect { case (k, v) if classOf(k) != 1L => v }.sum
      val (posKeep, negKeep) =
        if (pos > ratio * neg) ((ratio * neg).toLong, neg)
        else (pos, (pos / ratio).toLong)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(labelCol))
        .orderBy(md5(concat_ws("|", lit(salt) +: keyCols.map(col): _*)) +:
          keyCols.map(col): _*)
      df.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= when(col(labelCol).cast("long") === 1L,
          lit(posKeep)).otherwise(lit(negKeep)))
        .drop("__rk")
    }
  }

  /** S7 in-memory ML handoff: stream rows (e.g. the nested graph
    * schema) to a driver-side consumer one partition at a time —
    * the scalable replacement for the reference's `iter_slices`
    * chunked materialization (`default_graph_converter.py:389-393`);
    * a PyG/Spektral adapter consumes this iterator. */
  def toLocalGraphs(df: DataFrame): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }

  /** O3: deterministic permutation (`default_graph_converter.py:152-162`).
    * Semantically a global sort — keep off hot paths; the reference uses
    * it only to randomize training-batch order. */
  def shuffled(df: DataFrame, seed: Long = 42L): DataFrame = df.orderBy(rand(seed))

  /** O3, oracle-expressible form: the permutation IS the md5 order of
    * the salted row key (the codebook-selection idiom from
    * [[graft.llm.Similarity]] — md5 is bit-identical across engines,
    * unlike `rand(seed)`, so `q_graph_shuffle` can replay it in
    * DuckDB). The emitted `shuffle_key` column both carries the order
    * and keeps the op verifiable without a global row index; the sort
    * itself is an ordinary distributed range-sort. Keys must uniquely
    * identify rows for a total order (ties broken by the keys
    * themselves). */
  def shuffledByHash(
      df: DataFrame, keyCols: Seq[String], salt: String = "graft"): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat_ws("|", lit(salt) +: keyCols.map(col): _*)))
      .orderBy(col("shuffle_key") +: keyCols.map(col): _*)

  /** Merge another graph table into this one
    * (`graph_dataset.py:101-108`): schemas must agree column-for-column;
    * a plain union, no shuffle. */
  def add(df: DataFrame, other: DataFrame): DataFrame = {
    require(df.columns.sorted.sameElements(other.columns.sorted),
      s"graph schemas differ: ${df.columns.mkString(",")} vs ${other.columns.mkString(",")}")
    df.unionByName(other)
  }

  /** (N, F, S, n_out, n) of a nested graph table
    * (`graph_dataset.py:110-118`, `:438-445`): max nodes, node-feature
    * dim, edge-feature dim, distinct labels, graph count — ONE
    * partial-aggregable pass (no per-graph driver loop).
    *
    * `n_out` is the distinct-class count of a scalar label column (the
    * usual classification case); for regression or multi-dimensional
    * labels the reference's label dimensionality is a different number.
    * An empty table (all maxes null) yields zeros rather than an NPE. */
  def dimensions(df: DataFrame, labelCol: String = Label): (Int, Int, Int, Long, Long) = {
    val hasLabel = df.columns.contains(labelCol)
    val r = df.agg(
      max(size(col("x"))).as("n"),
      max(size(element_at(col("x"), 1))).as("f"),
      max(size(element_at(col("e"), 1))).as("s"),
      (if (hasLabel) countDistinct(col(labelCol)) else lit(0L)).as("n_out"),
      count(lit(1)).as("cnt")).head()
    def intAt(i: Int): Int = Option(r.getAs[Integer](i)).fold(0)(_.intValue())
    (intAt(0), intAt(1), intAt(2), r.getLong(3), r.getLong(4))
  }
}
