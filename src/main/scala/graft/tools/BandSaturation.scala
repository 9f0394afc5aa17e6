package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the 16-bit band-keyspace saturation bound the
  * [[graft.llm.ImageDedup]] doc prices — and the wide (32-bit-band)
  * remedy — on synthetic corpora of deterministic pseudo-random
  * hashes (xxhash64 bits; no image decode, because saturation is
  * keyspace-vs-corpus arithmetic and this isolates exactly that).
  * For each corpus size it reports [[graft.llm.BandedHamming]]'s
  * truncation telemetry for BOTH layouts: `candidate_pairs` is the
  * verification work the banded join would emit — the number that
  * goes quadratic once buckets saturate at |corpus| ≈ 2^16·cap.
  *
  * Prints one JSON line:
  * {{{ {"metric":"band_saturation","rows":[{"n":…,"layout":"16bit",…}…]} }}}
  *
  * Run: {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BandSaturation" }}}
  */
object BandSaturation {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = Seq(100000L, 500000L, 2000000L)
    val cap = 10000

    def narrow(n: Long) = spark.range(n).select(
      col("id").as("media_id") +:
        (0 until 4).map(k => shiftright(xxhash64(col("id")), 16 * k)
          .bitwiseAND(lit(0xFFFFL)).as(s"b$k")): _*)
    def wide(n: Long) = spark.range(n).select(
      col("id").as("media_id") +:
        (0 until 8).map(k => shiftright(xxhash64(col("id"), lit(k / 2)), 32 * (k % 2))
          .bitwiseAND(lit(0xFFFFFFFFL)).as(s"w$k")): _*)

    val rows = sizes.flatMap { n =>
      Seq("16bit" -> graft.llm.BandedHamming.bucketCost(narrow(n), cap),
        "32bit" -> graft.llm.ImageDedup.bucketCostWide(wide(n), cap))
        .map { case (layout, df) =>
          val r = df.collect().head
          s"""{"n":$n,"layout":"$layout","candidate_pairs":${r.getLong(0)},""" +
            s""""capped_pairs":${r.getLong(1)},"max_bucket":${r.getLong(3)}}"""
        }
    }
    println(s"""{"metric":"band_saturation","cap":$cap,"rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
