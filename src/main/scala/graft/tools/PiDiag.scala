package graft.tools

import graft.models.PressingIntensity
import graft.tracking._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic: show rows where fused pairs != staged pairs. */
object PiDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder(), "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val trk = SyntheticTracking.df(spark, "/root/testdata/sf0.001", Cols.ByObjectPeriod)
    val kin = Kinematics(trk, TrackingSettings(), None, None)
    val dat = Possession.inferBallCarrier(kin, TrackingSettings())
    val combos = Seq(
      ("teams_max", TrackingSettings(), PressingIntensity.Params()),
      ("full_excl", TrackingSettings(), PressingIntensity.Params(
        method = "full", ballMethod = "exclude", orient = "pressing")))
    combos.foreach { case (name, settings, params) =>
      val f = PressingIntensity.pairs(dat, settings, params)
        .withColumn("src", lit("fused"))
      val s = PressingIntensity.pairsStaged(dat, settings, params)
        .withColumn("src", lit("staged"))
      val all = f.unionByName(s)
        .groupBy("game_id", "period_id", "frame_id", "row_id", "col_id")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("row_idx")).as("nri"), countDistinct(col("col_idx")).as("nci"),
          countDistinct(col("tti")).as("nt"), countDistinct(col("pti")).as("np"),
          first(col("row_idx")).as("ri"), first(col("col_idx")).as("ci"))
        .filter(col("n") =!= 2 || col("nri") > 1 || col("nci") > 1 || col("nt") > 1 || col("np") > 1)
      println(s"=== $name mismatches: ${all.count()}")
      val bad = all.limit(1).collect()
      if (bad.nonEmpty) {
        val b = bad.head
        val cond = col("game_id") === b.getString(0) && col("period_id") === b.getInt(1) &&
          col("frame_id") === b.getLong(2) && col("row_id") === b.getString(3) && col("col_id") === b.getString(4)
        f.filter(cond).collect().foreach(r => println(
          s"fused  tti=${java.lang.Double.toHexString(r.getAs[Double]("tti"))} pti=${java.lang.Double.toHexString(r.getAs[Double]("pti"))}"))
        s.filter(cond).collect().foreach(r => println(
          s"staged tti=${java.lang.Double.toHexString(r.getAs[Double]("tti"))} pti=${java.lang.Double.toHexString(r.getAs[Double]("pti"))}"))
      }
    }
    spark.stop()
  }
}
