package graft.api

import graft.graphs.{GraphConverter, GraphDataset, GraphSettings, GraphSink}
import graft.tracking._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-stop user journey for the soccer vertical — the Spark-native
  * counterpart of the reference's `KloppyPolarsDataset(...).load()` →
  * `SoccerGraphConverter(dataset).to_graph_frames()` flow
  * (`kloppy_polars.py:813-900`, `graph_converter.py:35-140`), for users
  * switching from the reference library.
  *
  * Reference call → here:
  *  - `KloppyPolarsDataset(kloppy_dataset).load()` →
  *    [[load]] (wide tracking CSV → canonical long table →
  *    kinematics → possession/carrier inference). Steps compose, so
  *    any stage can be swapped (e.g. a parquet source instead of CSV).
  *  - `SoccerGraphConverter(dataset, **settings)` → [[graphs]] with a
  *    [[graft.graphs.GraphSettings]].
  *  - `.to_graph_frames()` → the returned nested DataFrame (a/x/e +
  *    object_ids per frame); `.to_pytorch_graphs()`'s in-memory handoff
  *    → [[graft.graphs.GraphDataset.toLocalGraphs]].
  *  - `GraphDataset(...).split_test_train_validation()` →
  *    [[withSplit]] (seeded hash-bucketing, shuffle-free).
  *  - pickle sink → [[sink]] (game-partitioned nested parquet).
  *
  * Everything stays a lazy DataFrame until an action, so Catalyst sees
  * the whole journey as ONE plan: the CSV scan is pruned/filtered by
  * whatever the final consumer needs, and each stage's shuffles are the
  * ones documented on the stage object itself.
  */
object SoccerPipeline {

  /** CSV → canonical long table → kinematics → possession. The
    * reference's `load()` (steps 1-8, `kloppy_polars.py:813-900`). */
  def load(
      spark: SparkSession,
      wideCsvGlob: String,
      playerIds: Seq[String],
      settings: TrackingSettings = TrackingSettings(),
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame = {
    import org.apache.spark.sql.functions._
    val long = TrackingSource
      .toLong(TrackingSource.scanWide(spark, wideCsvGlob, playerIds), playerIds)
      .withColumn(Cols.PositionName, lit(null).cast("string"))
      .withColumn(Cols.BallState, lit("alive"))
      .withColumn(Cols.BallOwningTeamId, lit(null).cast("string"))
    val kin = Kinematics(long, settings, playerSmoothing, ballSmoothing)
    Possession.inferBallCarrier(kin, settings)
  }

  /** Sportec/DFL position XML → canonical long table → kinematics →
    * possession — the `KloppyPolarsDataset(sportec.load_tracking(...))`
    * journey (`tests/test_soccer.py:135-150`) as one declarative plan.
    * Returns the prepared table plus the per-match team ids needed by
    * the home/away-oriented models. */
  def loadSportec(
      spark: SparkSession,
      trackingXml: String,
      metaXml: String,
      settings: TrackingSettings = TrackingSettings(),
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame =
    prepare(SportecSource.load(spark, trackingXml, metaXml),
      settings, playerSmoothing, ballSmoothing)

  /** SkillCorner structured + match-data JSON → prepared table — the
    * `KloppyPolarsDataset(skillcorner.load(...))` journey. */
  def loadSkillCorner(
      spark: SparkSession,
      structuredJson: String,
      matchDataJson: String,
      settings: TrackingSettings = TrackingSettings(),
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame =
    prepare(SkillCornerSource.load(spark, structuredJson, matchDataJson),
      settings, playerSmoothing, ballSmoothing)

  /** Tracab/ChyronHego DAT + metadata XML → prepared table. */
  def loadTracab(
      spark: SparkSession,
      datGlob: String,
      metaXml: String,
      settings: TrackingSettings = TrackingSettings(),
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame =
    prepare(TracabSource.load(spark, datGlob, metaXml),
      settings, playerSmoothing, ballSmoothing)

  /** SecondSpectrum JSONL + metadata JSON → prepared table. */
  def loadSecondSpectrum(
      spark: SparkSession,
      jsonlGlob: String,
      metaJson: String,
      settings: TrackingSettings = TrackingSettings(),
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame =
    prepare(SecondSpectrumSource.load(spark, jsonlGlob, metaJson),
      settings, playerSmoothing, ballSmoothing)

  /** The event-label journey (README's label-real-graphs workflow):
    * stamp a prepared Sportec table with the latest event at or before
    * each frame — feed the result to [[graphs]] with an event-derived
    * label column. */
  def attachSportecEvents(
      spark: SparkSession,
      prepared: DataFrame,
      trackingXml: String,
      eventsXml: String): DataFrame =
    SportecEvents.attach(prepared,
      SportecEvents.events(spark, eventsXml),
      SportecEvents.sectionStarts(spark, trackingXml))

  /** An already-long tracking DataFrame → kinematics → possession
    * (for parquet/streaming sources that skip the CSV melt). */
  def prepare(
      long: DataFrame,
      settings: TrackingSettings = TrackingSettings(),
      playerSmoothing: Option[SavGol] = Some(SavGol.DefaultPlayer),
      ballSmoothing: Option[SavGol] = Some(SavGol.DefaultBall)): DataFrame =
    Possession.inferBallCarrier(
      Kinematics(long, settings, playerSmoothing, ballSmoothing), settings)

  /** Orientation flip + dummy labels/graph ids + nested graph tensors —
    * `SoccerGraphConverter(...).to_graph_frames()`. */
  def graphs(
      prepared: DataFrame,
      settings: GraphSettings = GraphSettings(),
      orientHome: String = "home"): DataFrame = {
    val oriented = Orientation.toBallOwning(prepared, orientHome)
    val labeled = Labels.addGraphIds(Labels.addDummyLabels(oriented))
    GraphConverter.graphFrames(labeled, settings)
  }

  /** Leakage-aware split column — `split_test_train_validation`. */
  def withSplit(
      graphs: DataFrame,
      train: Double = 0.8,
      test: Double = 0.1,
      validation: Double = 0.1,
      seed: Long = 42L): DataFrame =
    GraphDataset.withSplit(graphs, train, test, validation,
      byGraphId = true, seed = seed, exactHash = true)

  /** Game-partitioned nested-parquet sink (the pickle-file analog). */
  def sink(graphs: DataFrame, path: String): Unit =
    GraphSink.write(graphs, path)

  /** `PressingIntensity(dataset).fit(start_time=..., end_time=...,
    * period_id=...)` → the nested per-frame TTI/PTI matrices
    * (`pressing_intensity.py:339-565`). */
  def pressingIntensity(
      prepared: DataFrame,
      settings: TrackingSettings = TrackingSettings(),
      params: graft.models.PressingIntensity.Params = graft.models.PressingIntensity.Params(),
      timeRange: Option[(Long, Long, Int)] = None): DataFrame = {
    import graft.models.PressingIntensity
    val scoped = timeRange match {
      case Some((s0, e0, p)) => PressingIntensity.filterTimeRange(prepared, s0, e0, p)
      case None => prepared
    }
    PressingIntensity.matrices(PressingIntensity.pairs(scoped, settings, params))
  }

  /** `EFPI(dataset).fit(every=...)` → per-player formation labels per
    * segment (`efpi.py:340-748`). */
  def formations(
      spark: SparkSession,
      prepared: DataFrame,
      cfg: graft.models.formations.Efpi.Config = graft.models.formations.Efpi.Config(),
      timeRange: Option[(Long, Long, Int)] = None): DataFrame =
    graft.models.formations.Efpi.fit(spark, prepared, cfg, timeRange)
}
