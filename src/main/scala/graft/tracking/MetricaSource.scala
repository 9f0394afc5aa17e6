package graft.tracking

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for Metrica Sports open-data tracking CSV — the
  * public sample format widely used in sports-analytics research and
  * one of the kloppy providers the reference accepts
  * (`kloppy_polars.py:194-218`).
  *
  * Format (public sample-data repo): one CSV per side
  * (`…RawTrackingData_Home_Team.csv` / `…_Away_Team.csv`) with a
  * 3-row header — row 1 the team name spread over each player's
  * column pair, row 2 the jersey numbers, row 3
  * `Period,Frame,Time [s],Player<j>,…,Ball` — then data rows of
  * `period, frame, time-in-seconds` followed by one (x, y) pair per
  * player and the ball pair last. Coordinates are pitch-normalized to
  * [0, 1] with the origin TOP-left (y grows downward).
  *
  * Canonicalization (kloppy-equivalent semantics):
  *  - meters, center origin, y up: `x_m = (x − 0.5)·length`,
  *    `y_m = (0.5 − y)·width` (the y flip converts the format's
  *    top-to-bottom vertical orientation);
  *  - `id = "<side>_<jersey>"`, team ids `"home"`/`"away"` (the files
  *    carry no identifiers beyond jerseys);
  *  - `timestamp` rebases `Time [s]` (which runs continuously across
  *    the match) to micros since each period's start;
  *  - the ball is taken from the HOME file (both files repeat it);
  *  - rows with missing coordinates (player off pitch) drop, like the
  *    wide-CSV melt;
  *  - ball_state / owning team are absent in the format → null;
  *  - the shared per-(game, period) STATIC_HOME_AWAY flip applies by
  *    default (`orientation="raw"` opts out).
  *
  * The jersey layout is discovered from a driver-side peek at the two
  * 3-line headers (tiny, per match); the frame data itself is read
  * with a DECLARED all-string schema + try_cast (the
  * corruption-resilient pattern the other readers use) in one
  * splittable scan per side. No reference fixture exists, so the
  * contract is pinned by a synthetic round-trip and the
  * `q_metrica_load` oracle re-reads the same CSVs with DuckDB.
  */
object MetricaSource {
  import Cols._

  /** Jersey numbers in column order, from the 3-row header. */
  private[tracking] def headerJerseys(spark: SparkSession, csvPath: String): Seq[String] = {
    val head = spark.read.textFile(csvPath).head(3)
    require(head.length == 3 && head(2).startsWith("Period"),
      s"$csvPath does not look like Metrica tracking (expected 3 header rows)")
    // row 2 carries the jersey over the x column of each pair; the ball
    // pair has no jersey (named in row 3 instead)
    val jerseyRow = head(1).split(",", -1).drop(3)
    jerseyRow.zipWithIndex.collect {
      case (j, i) if i % 2 == 0 && j.trim.nonEmpty => j.trim
    }.toSeq
  }

  private def sideLong(
      spark: SparkSession, csvPath: String, side: String,
      includeBall: Boolean): DataFrame = {
    val jerseys = headerJerseys(spark, csvPath)
    val coordCols = jerseys.flatMap(j => Seq(s"p${j}_x", s"p${j}_y")) ++
      Seq("ball_x", "ball_y")
    val schema = StructType(
      Seq("period", "frame", "time").map(StructField(_, StringType)) ++
        coordCols.map(StructField(_, StringType)))
    val raw = spark.read.schema(schema).option("header", false).csv(csvPath)
      .select(
        col("period").try_cast(IntegerType).as(PeriodId),
        col("frame").try_cast(LongType).as(FrameId),
        col("time").try_cast(DoubleType).as("time_s"),
        struct(coordCols.map(c => col(c).try_cast(DoubleType).as(c)): _*).as("c"))
      .filter(col(FrameId).isNotNull) // drops the 3 header rows + corrupt lines
    val objects = jerseys.map(j =>
      struct(lit(s"${side}_$j").as("id"), lit(side).as("team"),
        col(s"c.p${j}_x").as("xn"), col(s"c.p${j}_y").as("yn"))) ++
      (if (includeBall) Seq(struct(lit(Ball).as("id"), lit(Ball).as("team"),
        col("c.ball_x").as("xn"), col("c.ball_y").as("yn")))
      else Nil)
    raw.select(col(PeriodId), col(FrameId), col("time_s"),
        explode(array(objects: _*)).as("o"))
      .select(col(PeriodId), col(FrameId), col("time_s"),
        col("o.id").as(ObjectId), col("o.team").as(TeamId),
        col("o.xn"), col("o.yn"))
      .filter(col("xn").isNotNull && col("yn").isNotNull)
  }

  /** Full load of one match: home + away CSVs → canonical long table
    * (same contract as [[SportecSource.load]]). */
  def load(
      spark: SparkSession,
      homeCsv: String,
      awayCsv: String,
      gameId: String = "metrica",
      pitchLength: Double = 105.0,
      pitchWidth: Double = 68.0,
      orientation: String = "static_home_away"): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    val long = sideLong(spark, homeCsv, "home", includeBall = true)
      .unionByName(sideLong(spark, awayCsv, "away", includeBall = false))

    // Time [s] runs continuously across periods → rebase per period.
    // Tiny per-(period) aggregate, broadcast back.
    val offsets = long.groupBy(col(PeriodId))
      .agg(min(col("time_s")).as("t0"))
    val canonical = long
      .join(broadcast(offsets), Seq(PeriodId))
      .select(
        lit(gameId).as(GameId), col(PeriodId), col(FrameId),
        round((col("time_s") - col("t0")) * 1000000.0).cast(LongType).as(Timestamp),
        col(ObjectId), col(TeamId),
        when(col(TeamId) === Ball, lit(Ball))
          .otherwise(lit(null).cast(StringType)).as(PositionName),
        ((col("xn") - 0.5) * pitchLength).as(X),
        ((lit(0.5) - col("yn")) * pitchWidth).as(Y),
        lit(0.0).as(Z),
        lit(null).cast(StringType).as(BallState),
        lit(null).cast(StringType).as(BallOwningTeamId))

    orientation match {
      case "raw" => canonical
      case _ =>
        val ltr = Orientation.detectHomeLtr(canonical,
          col(TeamId) === "home", col(TeamId) === Ball)
        Orientation.staticHomeAway(canonical, ltr)
    }
  }

  /** Round-trip fixture generator: canonical long table → the two
    * Metrica-layout CSVs under `outDir` (`home/part-*.csv`,
    * `away/part-*.csv`). A TEST/fixture tool for one match; team ids
    * must be literal "home"/"away" and object ids numeric jerseys. */
  def writeCsv(
      df: DataFrame, outDir: String,
      pitchLength: Double = 105.0, pitchWidth: Double = 68.0): Unit = {
    val jerseys = df.filter(col(TeamId) =!= Ball)
      .select(col(TeamId), col(ObjectId)).distinct().collect()
      .map(r => r.getString(0) -> r.getString(1))
    def side(team: String): Seq[String] =
      jerseys.filter(_._1 == team).map(_._2).sortBy(_.toInt).toSeq

    def write(team: String): Unit = {
      val js = side(team)
      // only this side's players (plus the ball) feed the side file —
      // without the filter, home/away players SHARING a jersey number
      // would corrupt each other's columns through the bare-id match
      val sideDf = df.filter(col(TeamId) === team || col(TeamId) === Ball)
      def coord(j: String, c: Column) =
        max(when(col(ObjectId) === (if (j == Ball) Ball else j), c)).as(s"c_$j")
      val xn = (col(X) / pitchLength) + 0.5
      val yn = lit(0.5) - (col(Y) / pitchWidth)
      val pairs = js.flatMap(j => Seq(coord(j, xn).as(s"x_$j"), coord(j, yn).as(s"y_$j"))) ++
        Seq(coord(Ball, xn).as("x_ball"), coord(Ball, yn).as("y_ball"))
      val header1 = (Seq("", "", "") ++ js.flatMap(_ => Seq(team, "")) ++
        Seq("", "")).mkString(",")
      val header2 = (Seq("", "", "") ++ js.flatMap(j => Seq(j, "")) ++
        Seq("", "")).mkString(",")
      val header3 = (Seq("Period", "Frame", "Time [s]") ++
        js.flatMap(j => Seq(s"Player$j", "")) ++ Seq("Ball", "")).mkString(",")
      // concat_ws skips nulls (which would misalign columns) — empty
      // cells must stay as empty strings, like the real format's
      // off-pitch players
      def cell(c: Column) = coalesce(c.cast(StringType), lit(""))
      val rows = sideDf
        .groupBy(col(PeriodId), col(FrameId))
        .agg(min(col(Timestamp)).as("ts"), pairs: _*)
        .orderBy(col(FrameId))
        .select(concat_ws(",",
          (Seq(col(PeriodId), col(FrameId), col("ts") / 1000000.0) ++
            js.flatMap(j => Seq(col(s"x_$j"), col(s"y_$j"))) ++
            Seq(col("x_ball"), col("y_ball"))).map(cell): _*).as("value"))
      val body = rows.coalesce(1).collect().map(_.getString(0))
      val all = (Seq(header1, header2, header3) ++ body).mkString("\n") + "\n"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outDir/$team"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$team/tracking.csv"), all.getBytes("UTF-8"))
    }
    write("home"); write("away")
  }
}
