package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Strict-sequence funnel and retention cohorts on a hand-built event
  * log (the registered queries run the same shapes on the testdata). */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("funnel counts strict view→click→purchase sequences only") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // u1: full sequence; u2: click BEFORE view (no step 2);
    // u3: view only; u4: purchase without click (no step 3)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "click", ts(0)), (2L, "view", ts(1)), (2L, "purchase", ts(2)),
      (3L, "view", ts(0)),
      (4L, "view", ts(0)), (4L, "purchase", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    assert(v.count() === 4)
    assert(c.collect().map(_.getLong(0)).toSet === Set(1L))
    assert(p.collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("retention offsets count distinct users per cohort week") {
    import spark.implicits._
    // user 10 first active day 0, returns day 8 (offset week 1);
    // user 11 first active day 7 (cohort week 1), returns day 7 again
    val ev = Seq((10L, 0L), (10L, 8L), (10L, 8L), (11L, 7L), (11L, 7L))
      .toDF("user_id", "day")
    val first = ev.groupBy($"user_id").agg(min($"day").as("day0"))
    val got = ev.join(first, "user_id")
      .select($"user_id", expr("day0 div 7").as("cohort_week"),
        expr("(day - day0) div 7").as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
  }
}
