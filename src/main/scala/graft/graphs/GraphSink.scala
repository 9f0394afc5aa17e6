package graft.graphs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 graph sink/source: the nested per-frame graph schema (a, x, e,
  * object_ids + keys) persists as parquet, replacing the reference's
  * compressed-pickle files (`default_graph_converter.py:250-278`,
  * `graph_dataset.py:18-66`) with a format any engine can scan.
  *
  * Output is partitioned by game_id: training jobs that read a subset
  * of matches prune partitions at the source, and a 1000-executor
  * write fans out without a shuffle (the frame rows are already
  * distributed; partitionBy only routes files).
  */
object GraphSink {

  /** `partitionCols` defaults to game_id; a split-assigned table
    * (GraphDataset.withSplit) typically writes
    * `Seq("split", "game_id")` so trainers read one split subtree
    * without touching the rest. */
  def write(
      graphFrames: DataFrame,
      path: String,
      mode: String = "overwrite",
      partitionCols: Seq[String] = Seq("game_id")): Unit =
    graphFrames.write
      .mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
