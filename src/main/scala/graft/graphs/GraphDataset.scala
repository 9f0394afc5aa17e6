package graft.graphs

import graft.tracking.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train/test/validation splitting and label balancing (M12/O3/O4,
  * `unravel/utils/objects/graph_dataset.py:120-384`).
  *
  * The reference shuffles id lists in the driver; here splits are
  * computed distributively: distinct split keys get a seeded random
  * order, a running index buckets them by fraction, and the assignment
  * broadcast-joins back — leakage-aware when keyed by graph_id (all
  * frames of a graph land in one split). */
object GraphDataset {
  import Cols._

  /** Adds a `split` column ∈ {train, test, validation}.
    * @param byGraphId split on graph_id (leakage control) vs frame keys */
  def withSplit(
      df: DataFrame,
      trainFrac: Double,
      testFrac: Double,
      valFrac: Double,
      byGraphId: Boolean = false,
      seed: Long = 42L): DataFrame = {
    require(math.abs(trainFrac + testFrac + valFrac - 1.0) < 1e-9,
      "split fractions must sum to 1")
    require(trainFrac >= testFrac && testFrac >= valFrac,
      "expected train >= test >= validation")
    val keys = if (byGraphId) Seq(GraphId) else Seq(GameId, PeriodId, FrameId)
    val ids = df.select(keys.map(col): _*).dropDuplicates()
    val w = Window.orderBy(rand(seed))
    val n = ids.count().toDouble
    val assigned = ids
      .withColumn("__rn", row_number().over(w))
      .withColumn("split",
        when(col("__rn") <= math.ceil(n * trainFrac), "train")
          .when(col("__rn") <= math.ceil(n * (trainFrac + testFrac)), "test")
          .otherwise("validation"))
      .drop("__rn")
    df.join(broadcast(assigned), keys, "left")
  }

  /** O4: down-sample classes so positive/negative labels match the
    * requested ratio within each split (`graph_dataset.py:318-384`). */
  def balanced(df: DataFrame, labelCol: String = Label, ratio: Double = 1.0, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(labelCol)).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    if (counts.size < 2) df
    else {
      val pos = counts.getOrElse(1L, 0L).toDouble
      val neg = counts.getOrElse(0L, 0L).toDouble
      // target: pos = ratio * neg — shrink the majority side
      val (posFrac, negFrac) =
        if (pos > ratio * neg) (ratio * neg / pos, 1.0) else (1.0, pos / (ratio * neg))
      df.stat.sampleBy(labelCol, Map(0 -> negFrac, 1 -> posFrac), seed)
    }
  }

  /** O3: deterministic permutation (`default_graph_converter.py:152-162`). */
  def shuffled(df: DataFrame, seed: Long = 42L): DataFrame = df.orderBy(rand(seed))
}
