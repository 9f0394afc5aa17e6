package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for Tracab/ChyronHego DAT tracking — the
  * most-used commercial feed among the ~9 providers the reference
  * accepts through kloppy (`kloppy_polars.py:194-218`; kloppy's
  * `TRACABDatDeserializer`). The reference repo ships no Tracab
  * fixture, so the format is pinned by a synthetic round-trip
  * ([[writeDat]] → [[load]], `TracabSourceSpec`) and the DuckDB oracle
  * re-parses the same DAT text with SQL string functions
  * (`q_tracab_load`).
  *
  * DAT format (public; one line per frame):
  * {{{ <frameId>:<t1>;<t2>;…;:<ballX>,<ballY>,<ballZ>,<speed>,<H|A>,<Alive|Dead>;: }}}
  * with each target `<team>,<targetId>,<jerseyNo>,<x>,<y>,<speed>`;
  * coordinates are centimeters, center origin. Team codes: 1 home,
  * 0 away, anything else (referees −1, officials 3/4) is dropped —
  * kloppy does the same. Periods are frame ranges in the companion
  * metadata XML (`<match iFrameRateFps=…><period iId iStartFrame
  * iEndFrame/>…`); frames outside every period range are warm-up/
  * half-time noise and drop. The basic Tracab metadata carries no team
  * identifiers, so like kloppy the loader synthesizes `"home"` /
  * `"away"` team ids.
  *
  * Scale shape: one text scan (splittable, line = frame), a single
  * projection chain of string splits (whole-stage codegen, no UDF),
  * one explode for targets, and two broadcast joins against the
  * match-row and period-range tables. No shuffle of the frame data.
  */
object TracabSource {
  import Cols._

  private val periodType = StructType(Seq(
    StructField("_iId", StringType),
    StructField("_iStartFrame", StringType),
    StructField("_iEndFrame", StringType)))

  val matchSchema: StructType = StructType(Seq(
    StructField("_iId", StringType),
    StructField("_iFrameRateFps", StringType),
    StructField("_fPitchXSizeMeters", StringType),
    StructField("_fPitchYSizeMeters", StringType),
    StructField("period", ArrayType(periodType))))

  /** One row per match: id, fps, pitch size. Tiny — broadcast it. */
  def matches(spark: SparkSession, metaPath: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "match")
      .schema(matchSchema)
      .load(metaPath)
      .select(
        col("_iId").as(GameId),
        coalesce(col("_iFrameRateFps").try_cast(IntegerType), lit(25)).as("fps"),
        coalesce(col("_fPitchXSizeMeters").try_cast(DoubleType), lit(105.0)).as("pitch_length"),
        coalesce(col("_fPitchYSizeMeters").try_cast(DoubleType), lit(68.0)).as("pitch_width"),
        col("period"))

  /** Period frame ranges: (game_id, period_id, start_frame, end_frame). */
  def periods(spark: SparkSession, metaPath: String): DataFrame =
    matches(spark, metaPath)
      .select(col(GameId), explode(col("period")).as("p"))
      .select(col(GameId),
        col("p._iId").try_cast(IntegerType).as(PeriodId),
        col("p._iStartFrame").try_cast(LongType).as("start_frame"),
        col("p._iEndFrame").try_cast(LongType).as("end_frame"))
      .filter(col(PeriodId).isNotNull && col("start_frame").isNotNull)

  /** Full load of one match: DAT glob + metadata XML → canonical long
    * table (same contract as [[SportecSource.load]]). The reference
    * requests STATIC_HOME_AWAY for every provider
    * (`kloppy_polars.py:194-218`), so the same per-(game, period)
    * mean-x flip the other readers apply is the default here too;
    * `orientation="raw"` keeps provider coordinates. */
  def load(
      spark: SparkSession,
      datPath: String,
      metaPath: String,
      orientation: String = "static_home_away",
      onlyAlive: Boolean = false): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    val matchDf = matches(spark, metaPath).drop("period")
    val nMatches = matchDf.limit(2).count()
    require(nMatches == 1,
      s"metaPath must describe exactly one Tracab match (found " +
        s"${if (nMatches == 0) "none" else "several"}: $metaPath); DAT files " +
        "carry no match id, so load one match at a time")

    // The ball block rides every line, so the frame-level possession /
    // status flags are extracted at LINE level and inherited by the
    // player rows — the canonical contract (ball_state / owning on
    // every row, matching the Sportec/SkillCorner readers) costs no
    // fan-out window or join here, and kloppy's only_alive filter
    // becomes a plain line predicate.
    val seg = split(col("value"), ":")
    val lineBall = split(try_element_at(split(try_element_at(seg, lit(3)), ";"), lit(1)), ",")
    val base = spark.read.text(datPath)
      .select(
        try_element_at(seg, lit(1)).try_cast(LongType).as("n"),
        try_element_at(seg, lit(2)).as("tgt"),
        lineBall.as("b"))
      .filter(col("n").isNotNull)
      .withColumn("own_flag", try_element_at(col("b"), lit(5)))
      .withColumn("status_flag", try_element_at(col("b"), lit(6)))

    val a = split(col("t"), ",")
    val players = base
      .select(col("n"), col("own_flag"), col("status_flag"),
        explode(split(col("tgt"), ";")).as("t"))
      .filter(col("t") =!= "")
      .select(col("n"), col("own_flag"), col("status_flag"), a.as("a"))
      .filter(try_element_at(col("a"), lit(1)).isin("0", "1"))
      .select(col("n"),
        try_element_at(col("a"), lit(2)).as(ObjectId),
        when(try_element_at(col("a"), lit(1)) === "1", "home").otherwise("away").as(TeamId),
        lit(null).cast(StringType).as(PositionName),
        (try_element_at(col("a"), lit(4)).try_cast(IntegerType) / 100.0).as(X),
        (try_element_at(col("a"), lit(5)).try_cast(IntegerType) / 100.0).as(Y),
        lit(0.0).as(Z),
        col("own_flag"), col("status_flag"))
      // corrupt/truncated targets (unparseable cm ints) drop instead of
      // leaking null coordinates into kinematics — the same contract as
      // the wide-CSV melt and the Metrica reader
      .filter(col(X).isNotNull && col(Y).isNotNull)

    val ball = base
      .filter(size(col("b")) >= 6)
      .select(col("n"),
        lit(Ball).as(ObjectId),
        lit(Ball).as(TeamId),
        lit(Ball).as(PositionName),
        (try_element_at(col("b"), lit(1)).try_cast(IntegerType) / 100.0).as(X),
        (try_element_at(col("b"), lit(2)).try_cast(IntegerType) / 100.0).as(Y),
        (try_element_at(col("b"), lit(3)).try_cast(IntegerType) / 100.0).as(Z),
        col("own_flag"), col("status_flag"))
      .filter(col(X).isNotNull && col(Y).isNotNull)

    val rows = players.unionByName(ball)
      .crossJoin(broadcast(matchDf))

    // period by frame range; frames outside every period drop (kloppy)
    val perDf = periods(spark, metaPath)
      .select(col(GameId).as("p_game"), col(PeriodId),
        col("start_frame"), col("end_frame"))
    val canonical = rows
      .join(broadcast(perDf),
        col(GameId) === col("p_game") &&
          col("n").between(col("start_frame"), col("end_frame")))
      .select(
        col(GameId), col(PeriodId),
        col("n").as(FrameId),
        // round, don't truncate: for fps that doesn't divide 1e6 (e.g.
        // 24) a floor drifts up to 1us below kloppy's frame/fps delta
        round((col("n") - col("start_frame")) * (lit(1000000L) / col("fps")))
          .cast(LongType).as(Timestamp),
        col(ObjectId), col(TeamId), col(PositionName),
        col(X), col(Y), col(Z),
        when(col("status_flag") === "Alive", "alive")
          .when(col("status_flag") === "Dead", "dead")
          .otherwise(lit(null).cast(StringType)).as(BallState),
        when(col("own_flag") === "H", lit("home"))
          .when(col("own_flag") === "A", lit("away"))
          .otherwise(lit(null).cast(StringType)).as(BallOwningTeamId))
    // kloppy's TRACABDatDeserializer defaults only_alive=True; ours
    // defaults false so dead-ball analysis stays possible — pass true
    // for kloppy-default behavior
    val filtered =
      if (onlyAlive) canonical.filter(col(BallState) === "alive") else canonical
    orientation match {
      case "raw" => filtered
      case _ =>
        // the filtered relation here IS the cheap upstream (one text
        // scan + broadcast joins), so detecting from it directly keeps
        // the source-scan count bounded
        val ltr = Orientation.detectHomeLtr(filtered,
          col(TeamId) === "home", col(TeamId) === Ball)
        Orientation.staticHomeAway(filtered, ltr)
    }
  }

  /** Round-trip fixture generator: canonical long table → DAT text +
    * metadata XML under `outDir` (`dat/part-*.txt`, `meta.xml`). A
    * TEST/fixture tool, not a product sink — one match per call,
    * coordinates must sit on the centimeter grid for exact round-trips.
    * Frames of period p are offset by `periodOffset·(p−1)` so periods
    * become the disjoint frame ranges the DAT model requires;
    * `iStartFrame` is each period's minimum (offset) frame. Null
    * owning/state emit the `-` placeholder, which loads back as null. */
  def writeDat(df: DataFrame, outDir: String, periodOffset: Long = 10000000L): Unit = {
    // overlapping period ranges would make load's between-join match a
    // frame to several periods — refuse inputs the offset can't separate
    val maxFrame = df.agg(max(col(FrameId))).head().getLong(0)
    require(maxFrame < periodOffset,
      s"periodOffset=$periodOffset must exceed the max frame id $maxFrame " +
        "or the generated period ranges overlap")
    val n = col(FrameId) + (col(PeriodId).cast("long") - 1) * periodOffset
    val isBall = col(TeamId) === Ball
    val cm = (c: org.apache.spark.sql.Column) => round(c * 100).cast("int").cast("string")
    val target = concat_ws(",",
      when(col(TeamId) === "home", "1").otherwise("0"),
      col(ObjectId), col(ObjectId), cm(col(X)), cm(col(Y)), lit("0"))
    val ballTxt = concat_ws(",",
      cm(col(X)), cm(col(Y)), cm(col(Z)), lit("0"),
      when(col(BallOwningTeamId) === "home", "H")
        .when(col(BallOwningTeamId) === "away", "A").otherwise("-"),
      when(col(BallState) === "alive", "Alive")
        .when(col(BallState) === "dead", "Dead").otherwise("-"))

    val lines = df
      .groupBy(n.as("n"))
      .agg(
        array_sort(collect_list(when(!isBall, struct(col(ObjectId), target.as("txt")))))
          .as("tgts"),
        max(when(isBall, ballTxt)).as("ball"))
      .select(concat(
        col("n").cast("string"), lit(":"),
        transformTargets(col("tgts")), lit(":"),
        coalesce(concat(col("ball"), lit(";")), lit("")), lit(":")).as("value"))
    lines.coalesce(1).write.mode("overwrite").text(s"$outDir/dat")

    // tiny per-period ranges → driver-side meta.xml
    val per = df.groupBy(col(PeriodId))
      .agg(min(col(FrameId)).as("mn"), max(col(FrameId)).as("mx"))
      .collect().sortBy(_.getInt(0))
    val game = df.select(col(GameId)).head().getString(0)
    val periodXml = per.map { r =>
      val p = r.getInt(0)
      val off = (p - 1) * periodOffset
      s"""    <period iId="$p" iStartFrame="${r.getLong(1) + off}" iEndFrame="${r.getLong(2) + off}"/>"""
    }.mkString("\n")
    val xml =
      s"""<TracabMetaData sVersion="1.0">
         |  <match iId="$game" iFrameRateFps="25" fPitchXSizeMeters="105.00" fPitchYSizeMeters="68.00">
         |$periodXml
         |  </match>
         |</TracabMetaData>
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/meta.xml"), xml.getBytes("UTF-8"))
  }

  /** Sorted (id, txt) structs → the `t1;t2;…;` target section. */
  private def transformTargets(tgts: org.apache.spark.sql.Column) =
    when(size(tgts) > 0,
      concat(array_join(transform(tgts, _.getField("txt")), ";"), lit(";")))
      .otherwise(lit(""))
}
