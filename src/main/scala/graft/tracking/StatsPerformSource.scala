package graft.tracking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-native reader for StatsPerform (Opta) tracking — MA25
  * tracking TXT plus the MA1 match/lineup feed — one of the ~9
  * providers the reference accepts through kloppy
  * (`/root/reference/README.md:36`, `kloppy_polars.py:194-218`;
  * kloppy's StatsPerform deserializer). The reference repo ships no
  * StatsPerform fixture, so like the Tracab/SecondSpectrum/Metrica
  * readers the format contract is pinned by a synthetic round-trip
  * ([[writeMa25]] → [[load]], `StatsPerformSourceSpec`) and the DuckDB
  * oracle re-parses the same text (`q_statsperform_load`).
  *
  * MA25 line grammar (one line per frame, three `:` sections like the
  * other frame-per-line feeds):
  * {{{ <utcMs>;<frameIdx>;<periodId>,<clockMs>,<status>,<own>:<p1>;<p2>;…;:<bx>,<by>,<bz> }}}
  * with each player chunk `<side>,<playerId>,<jerseyNo>,<x>,<y>`;
  * side 0 = home, 1 = away, anything else (officials, referees) is
  * dropped. Coordinates are centimeter integers, center origin
  * (loaded as meters). `status` 1 = alive, 0 = dead; `own` H/A (`-`
  * unknown). The match clock `clockMs` is milliseconds on the running
  * match clock; the loader rebases it per (game, period) to the
  * canonical micros-since-period-start, so both per-period-reset and
  * continuously-running clocks load identically.
  *
  * MA1 feed (JSON): `matchInfo.id`, `matchInfo.contestant[]`
  * (id/name/position home|away) and
  * `liveData.lineUp[].player[]` (playerId/matchName/shirtNumber/
  * position) — the public Opta SDAPI MA1 shape. Contestant ids become
  * canonical team ids (this feed, unlike Tracab's basic metadata,
  * carries real ids); lineup positions become `position_name`.
  *
  * Scale shape: one splittable text scan, codegen'd string splits, one
  * explode for player chunks, broadcast joins against the one-row
  * match doc, the lineup table, and the tiny per-(game, period) clock
  * base. No shuffle of the frame data beyond the clock-base
  * aggregation's partial-agg pass.
  */
object StatsPerformSource {
  import Cols._

  private val contestantType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("position", StringType)))

  private val playerType = StructType(Seq(
    StructField("playerId", StringType),
    StructField("matchName", StringType),
    StructField("shirtNumber", IntegerType),
    StructField("position", StringType)))

  val ma1Schema: StructType = StructType(Seq(
    StructField("matchInfo", StructType(Seq(
      StructField("id", StringType),
      StructField("contestant", ArrayType(contestantType))))),
    StructField("liveData", StructType(Seq(
      StructField("lineUp", ArrayType(StructType(Seq(
        StructField("contestantId", StringType),
        StructField("player", ArrayType(playerType)))))))))))

  /** One row per match: game id + home/away contestant ids. Tiny —
    * broadcast it. */
  def matches(spark: SparkSession, ma1Path: String): DataFrame =
    spark.read.option("multiLine", true).schema(ma1Schema).json(ma1Path)
      .select(col("matchInfo.id").as(GameId),
        col("matchInfo.contestant").as("cs"))
      .select(col(GameId),
        try_element_at(filter(col("cs"), _.getField("position") === "home"), lit(1))
          .getField("id").as("home_team_id"),
        try_element_at(filter(col("cs"), _.getField("position") === "away"), lit(1))
          .getField("id").as("away_team_id"))

  /** Lineup roster: (game_id, id, team_id, is_home, position_name,
    * shirt_number, name). Tiny — broadcast it. */
  def roster(spark: SparkSession, ma1Path: String): DataFrame =
    spark.read.option("multiLine", true).schema(ma1Schema).json(ma1Path)
      .select(col("matchInfo.id").as(GameId),
        try_element_at(filter(col("matchInfo.contestant"),
          _.getField("position") === "home"), lit(1)).getField("id").as("home_id"),
        explode(col("liveData.lineUp")).as("lu"))
      .select(col(GameId),
        col("lu.contestantId").as(TeamId),
        (col("lu.contestantId") === col("home_id")).as("is_home"),
        explode(col("lu.player")).as("p"))
      .select(col(GameId), col(TeamId), col("is_home"),
        col("p.playerId").as(ObjectId),
        col("p.position").as(PositionName),
        col("p.shirtNumber").as("shirt_number"),
        col("p.matchName").as("name"))

  /** Full load of one match: MA25 TXT glob + MA1 JSON → canonical long
    * table (same contract as [[SportecSource.load]]). STATIC_HOME_AWAY
    * by default — the reference requests it for every provider
    * (`kloppy_polars.py:194-218`); `orientation="raw"` keeps provider
    * coordinates. */
  def load(
      spark: SparkSession,
      ma25Path: String,
      ma1Path: String,
      orientation: String = "static_home_away",
      onlyAlive: Boolean = false): DataFrame = {
    require(Set("static_home_away", "raw")(orientation),
      "orientation should be 'static_home_away' or 'raw'")
    val matchDf = matches(spark, ma1Path)
    val nMatches = matchDf.limit(2).count()
    require(nMatches == 1,
      s"ma1Path must describe exactly one StatsPerform match (found " +
        s"${if (nMatches == 0) "none" else "several"}: $ma1Path); MA25 lines " +
        "carry no match id, so load one match at a time")

    // frame-level header fields are extracted at LINE level and
    // inherited by the player rows (ball_state / owning on every row —
    // the canonical contract, same as the Tracab reader)
    val seg = split(col("value"), ":")
    val hdr = split(try_element_at(seg, lit(1)), ";")
    val fhd = split(try_element_at(col("hdr"), lit(3)), ",")
    val base = spark.read.text(ma25Path)
      .select(hdr.as("hdr"),
        try_element_at(seg, lit(2)).as("pstr"),
        split(try_element_at(seg, lit(3)), ",").as("b"))
      .select(
        try_element_at(col("hdr"), lit(2)).try_cast(LongType).as("n"),
        try_element_at(fhd, lit(1)).try_cast(IntegerType).as(PeriodId),
        try_element_at(fhd, lit(2)).try_cast(LongType).as("clock_ms"),
        try_element_at(fhd, lit(3)).as("status_flag"),
        try_element_at(fhd, lit(4)).as("own_flag"),
        col("pstr"), col("b"))
      .filter(col("n").isNotNull && col(PeriodId).isNotNull &&
        col("clock_ms").isNotNull)

    val a = split(col("t"), ",")
    val players = base
      .select(col("n"), col(PeriodId), col("clock_ms"),
        col("own_flag"), col("status_flag"),
        explode(split(col("pstr"), ";")).as("t"))
      .filter(col("t") =!= "")
      .select(col("n"), col(PeriodId), col("clock_ms"),
        col("own_flag"), col("status_flag"), a.as("a"))
      .filter(try_element_at(col("a"), lit(1)).isin("0", "1"))
      .select(col("n"), col(PeriodId), col("clock_ms"),
        col("own_flag"), col("status_flag"),
        try_element_at(col("a"), lit(2)).as(ObjectId),
        (try_element_at(col("a"), lit(1)) === "0").as("is_home_side"),
        (try_element_at(col("a"), lit(4)).try_cast(IntegerType) / 100.0).as(X),
        (try_element_at(col("a"), lit(5)).try_cast(IntegerType) / 100.0).as(Y),
        lit(0.0).as(Z))
      // corrupt/truncated chunks drop instead of leaking null
      // coordinates into kinematics — same contract as the other readers
      .filter(col(X).isNotNull && col(Y).isNotNull)

    val ball = base
      .filter(size(col("b")) >= 3)
      .select(col("n"), col(PeriodId), col("clock_ms"),
        col("own_flag"), col("status_flag"),
        lit(Ball).as(ObjectId),
        lit(null).cast(BooleanType).as("is_home_side"),
        (try_element_at(col("b"), lit(1)).try_cast(IntegerType) / 100.0).as(X),
        (try_element_at(col("b"), lit(2)).try_cast(IntegerType) / 100.0).as(Y),
        (try_element_at(col("b"), lit(3)).try_cast(IntegerType) / 100.0).as(Z))
      .filter(col(X).isNotNull && col(Y).isNotNull)

    val rows = players.unionByName(ball).crossJoin(broadcast(matchDf))

    // rebase the running match clock to micros-since-period-start: the
    // per-(game, period) clock base is a tiny partial-agg aggregate —
    // broadcast it back (the Sportec reader's min-frame rebase pattern)
    val clockBase = rows.groupBy(col(GameId), col(PeriodId))
      .agg(min(col("clock_ms")).as("clock0"))

    val rosterDf = roster(spark, ma1Path)
      .select(col(GameId).as("r_game"), col(ObjectId).as("r_id"),
        col(PositionName).as("r_pos"))

    val canonical = rows
      .join(broadcast(clockBase), Seq(GameId, PeriodId))
      .join(broadcast(rosterDf),
        col(GameId) === col("r_game") && col(ObjectId) === col("r_id"), "left")
      .select(
        col(GameId), col(PeriodId),
        col("n").as(FrameId),
        ((col("clock_ms") - col("clock0")) * 1000L).as(Timestamp),
        col(ObjectId),
        when(col(ObjectId) === Ball, lit(Ball))
          .when(col("is_home_side"), col("home_team_id"))
          .otherwise(col("away_team_id")).as(TeamId),
        when(col(ObjectId) === Ball, lit(Ball))
          .otherwise(col("r_pos")).as(PositionName),
        col(X), col(Y), col(Z),
        when(col("status_flag") === "1", "alive")
          .when(col("status_flag") === "0", "dead")
          .otherwise(lit(null).cast(StringType)).as(BallState),
        when(col("own_flag") === "H", col("home_team_id"))
          .when(col("own_flag") === "A", col("away_team_id"))
          .otherwise(lit(null).cast(StringType)).as(BallOwningTeamId),
        col("home_team_id"))

    val filtered =
      if (onlyAlive) canonical.filter(col(BallState) === "alive") else canonical
    val result = orientation match {
      case "raw" => filtered.drop("home_team_id")
      case _ =>
        val ltr = Orientation.detectHomeLtr(filtered,
          col(TeamId) === col("home_team_id"), col(TeamId) === Ball)
        Orientation.staticHomeAway(filtered, ltr).drop("home_team_id")
    }
    result
  }

  /** Round-trip fixture generator: canonical long table → MA25 text +
    * MA1 JSON under `outDir` (`ma25/part-*.txt`, `ma1.json`). A
    * TEST/fixture tool, not a product sink — one match per call; input
    * `team_id` must be exactly {"home", "away", ball} (they become the
    * MA1 contestant ids, so the round trip is id-stable), coordinates
    * must sit on the centimeter grid and timestamps on the millisecond
    * grid. The emitted clock runs continuously from kickoff
    * (`periodClockOffsetMs` per period boundary) to exercise the
    * loader's rebase. */
  def writeMa25(
      df: DataFrame, outDir: String,
      kickoffUtcMs: Long = 1700000000000L,
      periodClockOffsetMs: Long = 45L * 60L * 1000L): Unit = {
    val isBall = col(TeamId) === Ball
    val cm = (c: org.apache.spark.sql.Column) => round(c * 100).cast("int").cast("string")
    val clockMs = (col(Timestamp) / 1000L).cast("long") +
      (col(PeriodId).cast("long") - 1) * periodClockOffsetMs
    val chunk = concat_ws(",",
      when(col(TeamId) === "home", "0").otherwise("1"),
      col(ObjectId), col(ObjectId), cm(col(X)), cm(col(Y)))
    val ballTxt = concat_ws(",", cm(col(X)), cm(col(Y)), cm(col(Z)))

    val lines = df
      .groupBy(col(PeriodId).as("p"), col(FrameId).as("n"), clockMs.as("ck"))
      .agg(
        array_sort(collect_list(when(!isBall, struct(col(ObjectId), chunk.as("txt")))))
          .as("chunks"),
        max(when(isBall, ballTxt)).as("ball"),
        max(when(isBall,
          when(col(BallState) === "alive", "1")
            .when(col(BallState) === "dead", "0").otherwise("-"))).as("st"),
        max(when(isBall,
          when(col(BallOwningTeamId) === "home", "H")
            .when(col(BallOwningTeamId) === "away", "A").otherwise("-"))).as("ow"))
      .select(concat(
        (col("ck") + kickoffUtcMs).cast("string"), lit(";"),
        col("n").cast("string"), lit(";"),
        concat_ws(",", col("p").cast("string"), col("ck").cast("string"),
          coalesce(col("st"), lit("-")), coalesce(col("ow"), lit("-"))),
        lit(":"),
        concat(array_join(transform(col("chunks"), _.getField("txt")), ";"),
          when(size(col("chunks")) > 0, ";").otherwise("")),
        lit(":"),
        coalesce(col("ball"), lit(""))).as("value"))
    lines.coalesce(1).write.mode("overwrite").text(s"$outDir/ma25")

    // tiny lineup table → driver-side ma1.json
    val ros = df.filter(!isBall)
      .groupBy(col(TeamId), col(ObjectId))
      .agg(first(col(PositionName), ignoreNulls = true).as("pos"))
      .collect()
    val game = df.select(col(GameId)).head().getString(0)
    def playersJson(team: String) = ros.filter(_.getString(0) == team)
      .sortBy(_.getString(1)).map { r =>
        val pos = Option(r.getString(2))
          .map(p => s""","position":"$p"""").getOrElse("")
        s"""{"playerId":"${r.getString(1)}","matchName":"${r.getString(1)}","shirtNumber":0$pos}"""
      }.mkString(",")
    val json =
      s"""{"matchInfo":{"id":"$game","contestant":[
         |{"id":"home","name":"Home","position":"home"},
         |{"id":"away","name":"Away","position":"away"}]},
         |"liveData":{"lineUp":[
         |{"contestantId":"home","player":[${playersJson("home")}]},
         |{"contestantId":"away","player":[${playersJson("away")}]}]}}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/ma1.json"), json.getBytes("UTF-8"))
  }
}
