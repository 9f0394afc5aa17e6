package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug: run ONE headline query under the honest sink with the
  * exception surfaced (HonestBench records failures silently). */
object HonestOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = args.headOption.getOrElse("q_agg_pricing")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.allQueries.find(_.name == name).get
    def consume(): Unit = {
      val df = q.run(spark, sfDir)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
        .agg(sum(col("__h").cast("decimal(38,0)"))).collect()
    }
    consume() // warm-up
    spark.catalog.clearCache()
    val t = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      consume()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(s"[honest-one] $name ok rows=${q.run(spark, sfDir).count()} " +
      s"honest_min3=${math.rint(t * 1000) / 1000}s")
    spark.stop()
  }
}
