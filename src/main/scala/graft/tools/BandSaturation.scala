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

    // ----- guard-SHAPE A/B: a manufactured hot key (every 2nd item
    // shares one hash → a 20M-row bucket per band — the Zipf-head
    // geometry the cap exists for). The old count-window guard lands
    // that bucket's every row on ONE task just to count-and-drop it;
    // the production groupBy + broadcast anti-join counts map-side.
    // Both arms consume the guarded relation; drops are identical by
    // construction. (At 2M items / 500k-row hot bucket the two arms
    // measured a wash locally — the cliff prices in once the hot
    // bucket outgrows one task's comfortable sort, hence this tier.) -----
    val nG = 40000000L
    val skewed = spark.range(nG).select(
      col("id").as("media_id") +:
        (0 until 4).map(k => when(col("id") % 2 === 0, lit(12345L))
          .otherwise(shiftright(xxhash64(col("id")), 16 * k)
            .bitwiseAND(lit(0xFFFFL))).as(s"b$k")): _*)
    def keyed = skewed.select(col("media_id"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band"), col(s"b$k").cast("long").as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    def timeArm(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      mk().count() // warm-up
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val c = mk().count()
        ((System.nanoTime() - t0) / 1e9, c)
      }.minBy(_._1) match { case (t, c) => (math.rint(t * 1000) / 1000, c) }
    }
    val (tG, cG) = timeArm(() =>
      graft.llm.BandedHamming.dropOverCap(keyed, Seq("band", "key"), cap))
    val (tW, cW) = timeArm { () =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key"))
      keyed.withColumn("__n", count(lit(1)).over(w))
        .filter(col("__n") <= cap).drop("__n")
    }
    require(cG == cW, s"guard arms disagree: $cG vs $cW")
    val guardJson = s""""guard_ab":{"n":$nG,"hot_rows_per_band":${nG / 2},""" +
      s""""survivors":$cG,"groupby_sec":$tG,"window_sec":$tW}"""

    println(s"""{"metric":"band_saturation","cap":$cap,""" +
      s"""$guardJson,"rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
