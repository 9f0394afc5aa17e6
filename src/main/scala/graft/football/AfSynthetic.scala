package graft.football

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic BigDataBowl-style CSV fixtures, derived from
  * the driver's lineitem parquet (same derivation idea as
  * [[graft.tracking.SyntheticTracking]]).
  *
  * The engine's AF surface is a CSV *ingest* (S2/S3) — so the fixture
  * must be actual CSV files with headers, "NA"/empty null markers,
  * height strings like "6-2", degree angles, and left/right play
  * directions. The generator writes three deterministic CSVs
  * (tracking/players/plays) under /tmp once per (sfDir, JVM); both the
  * Spark queries and the DuckDB oracle read the same files, so the
  * verified surface is the ingest + transform pipeline, not the
  * generator.
  *
  * Layout per lineitem orderkey (deduplicated like SyntheticTracking):
  * one frame; linenumbers 1-6 × clones k∈{0,1,2} = 18 players (even
  * linenumber → BUF, odd → KC), linenumber 7 → the football (nflId NA,
  * o/dir NA). ~19 objects/frame keeps the ≥10-object frame filter
  * meaningful. Some o values are NA (every 13th) to exercise null
  * handling.
  */
object AfSynthetic {

  private val generated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Returns the fixture directory, generating the CSVs on first use. */
  def dir(spark: SparkSession, sfDir: String): String =
    generated.getOrElseUpdate(sfDir, {
      val out = s"/tmp/graft_af_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
      generate(spark, sfDir, out)
      out
    })

  def trackingGlob(root: String): String = s"$root/tracking/*.csv"
  def playersGlob(root: String): String = s"$root/players/*.csv"
  def playsGlob(root: String): String = s"$root/plays/*.csv"

  private def generate(spark: SparkSession, sfDir: String, out: String): Unit = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

    val ks = Seq(0, 1, 2).toDF("k")
    val rows = li
      .join(ks, col("l_linenumber") =!= 7 || col("k") === 0)
      .withColumn("isBall", col("l_linenumber") === 7)
      .withColumn("gameId", col("l_orderkey") % 3)
      .withColumn("playId", (col("l_orderkey") / 20).cast("long"))
      .withColumn("frameId", col("l_orderkey") % 20 + 1)
      .withColumn("nflIdNum", col("l_linenumber") * 10 + col("k"))
      .withColumn("nflId", when(col("isBall"), lit("NA"))
        .otherwise(col("nflIdNum").cast("string")))
      .withColumn("club", when(col("isBall"), lit("football"))
        .when(col("l_linenumber") % 2 === 0, lit("BUF")).otherwise(lit("KC")))
      .withColumn("playDirection", when(col("l_orderkey") % 2 === 0, lit("left")).otherwise(lit("right")))
      .withColumn("x", ((col("l_partkey") + col("k") * 97) % 1200).cast("double") / 10.0)
      .withColumn("y", ((col("l_suppkey") * 37 + col("l_partkey") * 13 + col("k") * 53) % 533).cast("double") / 10.0)
      .withColumn("s", ((col("l_suppkey") + col("k") * 7) % 120).cast("double") / 10.0)
      .withColumn("a", ((col("l_partkey") + col("k") * 11) % 60).cast("double") / 10.0)
      .withColumn("o", when(col("isBall") || (col("l_partkey") + col("k")) % 13 === 0, lit("NA"))
        .otherwise((((col("l_partkey") * 7 + col("k") * 101) % 3600).cast("double") / 10.0).cast("string")))
      .withColumn("dir", when(col("isBall"), lit("NA"))
        .otherwise((((col("l_suppkey") * 11 + col("k") * 31) % 3600).cast("double") / 10.0).cast("string")))

    rows.select("gameId", "playId", "frameId", "nflId", "club", "playDirection",
        "x", "y", "s", "a", "o", "dir")
      .orderBy(col("gameId"), col("playId"), col("frameId"), col("nflId"), col("club"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(s"$out/tracking")

    // players: 18 stable nflIds; heights "F-I" strings, weights in lbs,
    // one NA height (nflId 30) to exercise null extraction
    val players = (1 to 6).flatMap { ln =>
      (0 to 2).map { k =>
        val id = ln * 10 + k
        val height = if (id == 30) "NA" else s"${5 + id % 2}-${id % 12}"
        val pos = if (k == 0 && ln <= 2) "QB" else Seq("WR", "RB", "TE", "CB", "LB", "S")(ln - 1)
        (id, height, 180 + id, pos, "1990-01-15")
      }
    }.toDF("nflId", "height", "weight", "position", "birthDate")
    players
      .orderBy("nflId")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(s"$out/players")

    rows.select("gameId", "playId").distinct()
      .withColumn("possessionTeam", when(col("playId") % 2 === 0, lit("BUF")).otherwise(lit("KC")))
      .orderBy("gameId", "playId")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(s"$out/plays")
  }
}
