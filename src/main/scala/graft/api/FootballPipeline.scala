package graft.api

import graft.football.{AfFeatures, BigDataBowl}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-stop user journey for the American-football vertical — the
  * counterpart of the reference's `BigDataBowlDataset(...).load()` →
  * `AmericanFootballGraphConverter(dataset)` flow
  * (`american_football/dataset/dataset.py:189-292`,
  * `graphs/graph_converter.py:153-290`). */
object FootballPipeline {

  /** Tracking/players/plays CSVs under `root` → canonical long table
    * (play-direction rotation, metric height/weight, frame-id
    * synthesis, possession join). */
  def load(spark: SparkSession, root: String): DataFrame =
    BigDataBowl.load(spark, root)

  /** ≥10-objects + football-present frame filter (the AF
    * completeness rule). */
  def prepare(loaded: DataFrame): DataFrame =
    BigDataBowl.removeIncompleteFrames(loaded)

  /** Nested per-play-frame node tensors (x n×20 + object_ids) in
    * reference node order. */
  def graphs(prepared: DataFrame): DataFrame =
    AfFeatures.graphFrames(prepared)

  /** Long-format edge table on adjacency=1 pairs (9 features). */
  def edges(prepared: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    AfFeatures.pairs(prepared).filter(col("a") === 1)
  }
}
