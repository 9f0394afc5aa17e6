package graft.tracking

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for HawkEye tracking — one of the ~9 providers
  * the reference accepts through kloppy
  * (`/root/reference/README.md:36`, `kloppy_polars.py:194-218`;
  * kloppy's HawkEye deserializer). No public fixture ships with the
  * reference, so like the other fixture-less providers the format
  * contract is pinned by a synthetic round-trip ([[writeFeeds]] →
  * [[load]], `HawkEyeSourceSpec`) and the DuckDB oracle re-parses the
  * same JSON (`q_hawkeye_load`).
  *
  * HawkEye delivers per-MINUTE JSON documents in two parallel feeds
  * (one file per match minute each — a directory of small files, which
  * Spark parallelizes by file):
  *
  *  - '''ball feed''' (one object per file):
  *    {{{ {"details":{"period":1,"minute":3},
  *         "samples":{"ball":[{"time":12.34,"pos":[x,y,z]},…]}} }}}
  *  - '''centroid feed''' (player positions):
  *    {{{ {"details":{"period":1,"minute":3},
  *         "samples":{"people":[{"personId":"p1",
  *           "role":{"name":"Goalkeeper"},"teamId":"t-h",
  *           "centroid":[{"time":12.34,"pos":[x,y,z]},…]}]}} }}}
  *
  * Coordinates are meters, center origin. `time` is seconds on the
  * running match clock within the file's minute; `minute` may be
  * match-global (period 2 starting at 46) or period-local — the loader
  * computes the raw clock `(minute-1)*60 + time` and rebases it per
  * (game, period) to canonical micros-since-period-start, so both
  * conventions load identically (the StatsPerform clock treatment).
  * HawkEye samples carry no frame numbers: frame ids are derived from
  * the raw clock at the capture rate (`fps`, default 50), which keeps
  * ball and centroid samples of the same instant on the same frame.
  *
  * Metadata: the compact single-object JSON
  * `{"gameId","homeTeamId","awayTeamId","pitchLength","pitchWidth"}`
  * (the [[SecondSpectrumSource]] minimal contract — kloppy can read
  * HawkEye metadata-less; the canonical table needs the home/away
  * mapping for team sides and the orientation flip).
  *
  * Scale shape: two multiLine JSON scans parallelized by file
  * (declared schemas), two explodes on the centroid side and one on
  * the ball side, a broadcast join against the 1-row match doc, a
  * broadcast of the tiny per-(game, period) clock base, and the shared
  * STATIC_HOME_AWAY flip. No shuffle of sample data.
  */
object HawkEyeSource {
  import Cols._

  private val sampleType = StructType(Seq(
    StructField("time", DoubleType),
    StructField("pos", ArrayType(DoubleType))))

  val ballSchema: StructType = StructType(Seq(
    StructField("details", StructType(Seq(
      StructField("period", IntegerType),
      StructField("minute", IntegerType)))),
    StructField("samples", StructType(Seq(
      StructField("ball", ArrayType(sampleType)))))))

  val peopleSchema: StructType = StructType(Seq(
    StructField("details", StructType(Seq(
      StructField("period", IntegerType),
      StructField("minute", IntegerType)))),
    StructField("samples", StructType(Seq(
      StructField("people", ArrayType(StructType(Seq(
        StructField("personId", StringType),
        StructField("role", StructType(Seq(StructField("name", StringType)))),
        StructField("teamId", StringType),
        StructField("centroid", ArrayType(sampleType)))))))))))

  /** Raw running clock in micros: minutes are 1-based and may be
    * match-global; [[load]] rebases per period. */
  private def rawClock(minuteCol: Column, timeCol: Column): Column =
    round(((minuteCol - lit(1)).cast(DoubleType) * 60.0 + timeCol) * 1000000.0)
      .cast(LongType)

  /** Full load of one match (ball glob + centroid glob + meta) into
    * the canonical long table (same contract as
    * [[SportecSource.load]]). */
  def load(
      spark: SparkSession,
      ballPath: String,
      peoplePath: String,
      metaPath: String,
      fps: Int = 50,
      orientation: String = "static_home_away"): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    require(fps > 0, "fps must be positive")
    val gamesDf = SecondSpectrumSource.games(spark, metaPath)
    val nGames = gamesDf.limit(2).count()
    require(nGames == 1,
      s"metaPath must describe exactly one HawkEye match (found " +
        s"${if (nGames == 0) "none" else "several"}: $metaPath); feed files " +
        "carry no match id, so load one match at a time")

    val frameUs = 1000000.0 / fps

    val ballRows = spark.read.option("multiLine", true).schema(ballSchema)
      .json(ballPath)
      .filter(col("details.period").isNotNull && col("details.minute").isNotNull)
      .select(col("details.period").as(PeriodId),
        col("details.minute").as("minute"),
        explode(col("samples.ball")).as("s"))
      .select(col(PeriodId),
        rawClock(col("minute"), col("s.time")).as("raw_us"),
        lit(Ball).as(ObjectId),
        lit(null).cast(StringType).as("teamId"),
        lit(Ball).as("role_name"),
        try_element_at(col("s.pos"), lit(1)).as(X),
        try_element_at(col("s.pos"), lit(2)).as(Y),
        coalesce(try_element_at(col("s.pos"), lit(3)), lit(0.0)).as(Z),
        lit(true).as("is_ball_row"))
      .filter(col(X).isNotNull && col(Y).isNotNull && col("raw_us").isNotNull)

    val peopleRows = spark.read.option("multiLine", true).schema(peopleSchema)
      .json(peoplePath)
      .filter(col("details.period").isNotNull && col("details.minute").isNotNull)
      .select(col("details.period").as(PeriodId),
        col("details.minute").as("minute"),
        explode(col("samples.people")).as("p"))
      .select(col(PeriodId), col("minute"),
        col("p.personId").as(ObjectId),
        col("p.teamId").as("teamId"),
        col("p.role.name").as("role_name"),
        explode(col("p.centroid")).as("s"))
      .select(col(PeriodId),
        rawClock(col("minute"), col("s.time")).as("raw_us"),
        col(ObjectId), col("teamId"), col("role_name"),
        try_element_at(col("s.pos"), lit(1)).as(X),
        try_element_at(col("s.pos"), lit(2)).as(Y),
        lit(0.0).as(Z),
        lit(false).as("is_ball_row"))
      .filter(col(ObjectId).isNotNull && col(X).isNotNull &&
        col(Y).isNotNull && col("raw_us").isNotNull)

    val all = ballRows.unionByName(peopleRows)
      .crossJoin(broadcast(gamesDf.select(col(GameId),
        col("homeTeamId"), col("awayTeamId"))))

    // per-(game, period) clock rebase: micros since period start,
    // whether minutes were match-global or period-local
    val base0 = all.groupBy(col(GameId), col(PeriodId))
      .agg(min(col("raw_us")).as("raw0"))
    val rebased = all.join(broadcast(base0), Seq(GameId, PeriodId))

    val isHome = col("teamId") === col("homeTeamId")
    val base = rebased.select(
      col(GameId), col(PeriodId),
      // frame id from the clock at the capture rate: ball and centroid
      // samples of the same instant land on the same frame
      round(col("raw_us").cast(DoubleType) / frameUs).cast(LongType).as(FrameId),
      (col("raw_us") - col("raw0")).as(Timestamp),
      col(ObjectId),
      when(col("is_ball_row"), lit(Ball))
        .when(isHome, col("homeTeamId"))
        .otherwise(col("awayTeamId")).as(TeamId),
      col("role_name").as(PositionName),
      col(X), col(Y), col(Z),
      // the public HawkEye sample shape carries no ball status or
      // possession stream
      lit(null).cast(StringType).as(BallState),
      lit(null).cast(StringType).as(BallOwningTeamId),
      col("is_ball_row"),
      (!col("is_ball_row") && isHome).as("is_home_side"))

    val oriented = orientation match {
      case "raw" => base
      case _ =>
        val ltr = Orientation.detectHomeLtr(base,
          col("is_home_side"), col("is_ball_row"))
        Orientation.staticHomeAway(base, ltr)
    }
    oriented.select(GameId, PeriodId, FrameId, Timestamp, ObjectId, TeamId,
      PositionName, X, Y, Z, BallState, BallOwningTeamId)
  }

  /** Round-trip fixture generator: canonical long table → per-minute
    * ball + centroid JSON files + meta JSON under `outDir`
    * (`ball/p<period>_m<minute>.json`, `people/…`, `meta.json`). A
    * TEST/fixture tool for one match; team ids must be literal
    * "home"/"away" (the synthetic convention). Minutes are written
    * MATCH-GLOBAL (period 2 starts at minute 46) to exercise the
    * loader's per-period rebase; `time` carries the sub-minute clock.
    * Assumes the canonical 25 fps synthetic table, so frame ids
    * round-trip at fps=25. */
  def writeFeeds(df: DataFrame, outDir: String): Unit = {
    val isBall = col(TeamId) === Ball
    // match-global running clock: period offset 45 min per completed
    // period + the canonical period-relative timestamp
    val glob = df
      .withColumn("glob_us",
        (col(PeriodId).cast(LongType) - 1L) * (45L * 60L * 1000000L) + col(Timestamp))
      .withColumn("minute", (col("glob_us") / (60L * 1000000L)).cast(IntegerType) + 1)
      .withColumn("time",
        (col("glob_us") - (col("minute") - 1).cast(LongType) * 60L * 1000000L)
          .cast(DoubleType) / 1000000.0)

    def sample = struct(col("time"), array(col(X), col(Y), col(Z)).as("pos"))

    val ballDocs = glob.filter(isBall)
      .groupBy(col(PeriodId), col("minute"))
      .agg(array_sort(collect_list(sample)).as("ball"))
      .select(col(PeriodId), col("minute"), to_json(struct(
        struct(col(PeriodId).as("period"), col("minute")).as("details"),
        struct(col("ball")).as("samples"))).as("doc"))

    val peopleDocs = glob.filter(!isBall)
      .groupBy(col(PeriodId), col("minute"), col(ObjectId), col(TeamId))
      .agg(first(col(PositionName), ignoreNulls = true).as("role_name"),
        array_sort(collect_list(sample)).as("centroid"))
      .groupBy(col(PeriodId), col("minute"))
      .agg(array_sort(collect_list(struct(
        col(ObjectId).as("personId"),
        struct(col("role_name").as("name")).as("role"),
        col(TeamId).as("teamId"),
        col("centroid")))).as("people"))
      .select(col(PeriodId), col("minute"), to_json(struct(
        struct(col(PeriodId).as("period"), col("minute")).as("details"),
        struct(col("people")).as("samples"))).as("doc"))

    def writeDocs(docs: Array[org.apache.spark.sql.Row], sub: String): Unit = {
      val dir = java.nio.file.Paths.get(s"$outDir/$sub")
      java.nio.file.Files.createDirectories(dir)
      docs.foreach { r =>
        java.nio.file.Files.write(
          dir.resolve(s"p${r.getInt(0)}_m${r.getInt(1)}.json"),
          r.getString(2).getBytes("UTF-8"))
      }
    }
    // per-minute docs: ≤ ~95 files per feed for a full match — a
    // fixture-sized driver collect, like the other writer tools
    writeDocs(ballDocs.collect(), "ball")
    writeDocs(peopleDocs.collect(), "people")

    val game = df.select(col(GameId)).head().getString(0)
    val meta =
      s"""{"gameId": "$game", "homeTeamId": "home", "awayTeamId": "away",
         | "pitchLength": 105.0, "pitchWidth": 68.0}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/meta.json"), meta.getBytes("UTF-8"))
  }
}
