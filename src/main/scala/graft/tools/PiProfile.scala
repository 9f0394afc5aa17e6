package graft.tools

import graft.SparkEntry
import graft.models.PressingIntensity
import graft.tracking.{Kinematics, Possession, SyntheticTracking, TrackingSettings}
import graft.tracking.Cols._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profile of the honest q_pi_pairs cost (VERDICT r9 #6): the
  * official bench reads ~2 s at sf0.1 but the honest consume-all
  * sink reads ~4.8 s — before attempting any reshape (the ball-merge
  * pre-join is a RECORDED dead end, SCALING.md), measure WHERE the
  * honest time goes by timing each prefix of the real pipeline under
  * the same sink:
  *
  *   upstream   — tracking + kinematics + possession (the input df)
  *   indexed    — + the side masks and the one frame-window index pass
  *   pair_join  — + the per-frame fan-out join (≤23×23 rows/frame)
  *   pairs_full — + TTI/PTI arithmetic, merge, mask, transpose
  *                (= the production operator, composed from the SAME
  *                stage functions — identical plans)
  *
  * Each stage is consumed with the HonestBench xxhash64-all-columns
  * sink, min-of-3 after a warm-up, caches dropped between runs. The
  * deltas between consecutive stages bound each stage's cost (the
  * earlier stages re-execute inside the later ones — Spark has no
  * free materialization — so delta = marginal cost of the added
  * stage under full pipelining).
  *
  * Prints one JSON line {"metric":"pi_profile","stages":{...},"sf":…}.
  */
object PiProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val settings = TrackingSettings()
    val params = PressingIntensity.Params()
    def upstream = {
      val trk = SyntheticTracking.df(spark, sfDir)
      val kin = Kinematics(trk, settings, None, None)
      Possession.inferBallCarrier(kin, settings)
    }
    def indexed = PressingIntensity.indexedBase(upstream, settings, params)
    def joined = PressingIntensity.pairJoin(indexed, params)
    def full = PressingIntensity.pairs(upstream, settings, params)
      .select(col(GameId), col(PeriodId), col(FrameId),
        col("row_id"), col("col_id"), col("row_idx"), col("col_idx"),
        round(col("tti"), 6).as("tti"), round(col("pti"), 6).as("pti"))

    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "upstream" -> (() => upstream),
      "indexed" -> (() => indexed),
      "pair_join" -> (() => joined),
      "pairs_full" -> (() => full))

    def consumeAll(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
        .agg(sum(col("__h").cast("decimal(38,0)"))).collect()

    val results = stages.map { case (name, mk) =>
      consumeAll(mk()) // warm-up
      spark.catalog.clearCache()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        consumeAll(mk())
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> math.rint(t * 1000) / 1000
    }
    val js = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"pi_profile","stages":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
