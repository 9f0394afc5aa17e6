package graft.queries

import graft.core.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational operator inventory (SURVEY.md §2.2-2.8) exercised over the
  * driver's synthetic TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Float-stability conventions (oracle hash-matches exact values):
  *  - money-like 2-decimal doubles are cast to DECIMAL(18,2) *before*
  *    SUM so the aggregate is order-insensitive, then cast back to
  *    DOUBLE (deterministic in both engines);
  *  - libm-dependent functions (sin/cos/atan2/exp) are round()ed to 6
  *    decimals;
  *  - integral-valued doubles (l_quantity) sum exactly in any order.
  */
object RelationalQueries extends QueryModule {

  override def queries: Seq[GraftQuery] = Seq(
    // ----- A1 aggregation (TPC-H Q1 shape): groupBy + scalar aggs -----
    GraftQuery(
      "q_agg_pricing",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            count(lit(1)).as("n_rows"),
            sum($"l_extendedprice".cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"),
            (sum($"l_discount".cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1))).as("avg_disc"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  count(*) AS n_rows,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // ----- P4 filter: between, boolean algebra, modulo sampling -----
    GraftQuery(
      "q_filter_sample",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_quantity".between(5, 30) && $"l_discount" > 0.02 && $"l_orderkey" % 7 === 0)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity BETWEEN 5 AND 30 AND l_discount > 0.02 AND l_orderkey % 7 = 0""".stripMargin)),

    // ----- P3 chained conditional expression -----
    GraftQuery(
      "q_case_bucket",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d).select(
          $"o_orderkey",
          when($"o_totalprice" > 200000, "big")
            .when($"o_totalprice" > 50000, "mid")
            .otherwise("small").as("bucket"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice > 200000 THEN 'big'
             |       WHEN o_totalprice > 50000 THEN 'mid'
             |       ELSE 'small' END AS bucket
             |FROM orders""".stripMargin)),

    // ----- F1-F4 string functions -----
    GraftQuery(
      "q_string_funcs",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d).select(
          $"p_partkey",
          upper($"p_brand").as("brand_u"),
          substring($"p_name", 1, 5).as("name5"),
          concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
          regexp_replace($"p_name", "a", "@").as("name_at"),
          element_at(split($"p_type", " "), 1).as("type_head"))
      },
      Some("""SELECT p_partkey,
             |  upper(p_brand) AS brand_u,
             |  substring(p_name, 1, 5) AS name5,
             |  concat_ws('-', p_brand, p_type) AS brand_type,
             |  regexp_replace(p_name, 'a', '@', 'g') AS name_at,
             |  string_split(p_type, ' ')[1] AS type_head
             |FROM part""".stripMargin)),

    // ----- F6 date truncation / bucketing -----
    GraftQuery(
      "q_date_trunc",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(date_trunc("month", $"o_orderdate").as("omonth"))
          .agg(count(lit(1)).as("n_orders"),
               sum($"o_totalprice".cast(DecimalType(18, 2))).cast(DoubleType).as("month_total"))
      },
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS omonth,
             |  count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
             |FROM orders GROUP BY 1""".stripMargin)),

    // ----- F7 math scalar functions + clip -----
    GraftQuery(
      "q_math_funcs",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d).select(
          $"l_orderkey", $"l_linenumber",
          round(sin($"l_quantity") + cos($"l_discount"), 6).as("trig"),
          round(atan2($"l_quantity", lit(1.0) + $"l_extendedprice" / 1000), 6).as("ang"),
          round(exp(least($"l_discount" * 10, lit(5.0))), 6).as("ex"),
          round(sqrt($"l_extendedprice"), 6).as("rt"),
          least(greatest($"l_quantity", lit(5.0)), lit(40.0)).as("clipped"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(sin(l_quantity) + cos(l_discount), 6) AS trig,
             |  round(atan2(l_quantity, 1.0 + l_extendedprice/1000), 6) AS ang,
             |  round(exp(least(l_discount*10, 5.0)), 6) AS ex,
             |  round(sqrt(l_extendedprice), 6) AS rt,
             |  least(greatest(l_quantity, 5.0), 40.0) AS clipped
             |FROM lineitem""".stripMargin)),

    // ----- R1 unpivot wide→long (stack) -----
    GraftQuery(
      "q_unpivot",
      (s, d) =>
        Tables.part(s, d).selectExpr(
          "p_partkey",
          "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (metric, value)"),
      Some("""SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
             |UNION ALL
             |SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part""".stripMargin)),

    // ----- R4 explode list→rows -----
    GraftQuery(
      "q_explode_words",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select($"doc_id", explode(split($"text", " ")).as("word"))
      },
      Some("SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents")),

    // ----- A2 arg-min (deterministic window formulation) -----
    GraftQuery(
      "q_argmin",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_orderkey").orderBy($"l_extendedprice", $"l_suppkey")
        Tables.lineitem(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"l_orderkey", $"l_suppkey".as("cheapest_supp"), $"l_extendedprice".as("min_price"))
      },
      Some("""SELECT l_orderkey, l_suppkey AS cheapest_supp, l_extendedprice AS min_price
             |FROM lineitem
             |QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice, l_suppkey) = 1""".stripMargin)),

    // ----- A3 conditional aggregation -----
    GraftQuery(
      "q_cond_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            count(when($"l_quantity" > 25, 1)).as("n_big"),
            count(when($"l_discount" === 0, 1)).as("n_nodisc"),
            countDistinct($"l_suppkey").as("n_supp"))
      },
      Some("""SELECT l_returnflag,
             |  count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
             |  count(CASE WHEN l_discount = 0 THEN 1 END) AS n_nodisc,
             |  count(DISTINCT l_suppkey) AS n_supp
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ----- A4 distinct rows -----
    GraftQuery(
      "q_distinct_pairs",
      (s, d) => Tables.orders(s, d).select("o_custkey", "o_orderstatus").dropDuplicates(),
      Some("SELECT DISTINCT o_custkey, o_orderstatus FROM orders")),

    // ----- J1/J3 broadcast dimension joins -----
    GraftQuery(
      "q_join_dims",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .select($"c_custkey", $"n_name", $"r_name")
      },
      Some("""SELECT c_custkey, n_name, r_name
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey""".stripMargin),
      headline = true),

    // ----- J4 anti join -----
    GraftQuery(
      "q_anti_customers",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // ----- J5 semi join -----
    GraftQuery(
      "q_semi_parts",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .join(Tables.lineitem(s, d), $"p_partkey" === $"l_partkey", "left_semi")
          .select($"p_partkey", $"p_name")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin)),

    // ----- W1 lag / finite difference -----
    GraftQuery(
      "q_lag_delta",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.events(s, d)
          .withColumn("dv", $"value" - lag($"value", 1).over(w))
          .select($"event_id", $"user_id", $"dv")
      },
      Some("""SELECT event_id, user_id,
             |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
             |FROM events""".stripMargin)),

    // ----- W2 min over partition -----
    GraftQuery(
      "q_min_over",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        Tables.events(s, d)
          .withColumn("minv", min($"value").over(w))
          .withColumn("maxv", max($"value").over(w))
          .select($"event_id", $"user_id", $"minv", $"maxv")
      },
      Some("""SELECT event_id, user_id,
             |  min(value) OVER (PARTITION BY user_id) AS minv,
             |  max(value) OVER (PARTITION BY user_id) AS maxv
             |FROM events""".stripMargin)),

    // ----- W3 sessionization: change-flag + running sum -----
    GraftQuery(
      "q_sessionize",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val prev = lag($"event_type", 1).over(w)
        Tables.events(s, d)
          .withColumn("chg", when(prev.isNull || prev =!= $"event_type", 1).otherwise(0))
          .withColumn("session_id",
            sum($"chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select($"event_id", $"user_id", $"session_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |FROM (
             |  SELECT *, CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
             |  FROM events)""".stripMargin),
      headline = true),

    // ----- W4/O7 top-k per group -----
    GraftQuery(
      "q_topk_group",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
             |FROM orders
             |QUALIFY rn <= 3""".stripMargin)),

    // ----- W6 forward fill (nulls synthesized deterministically) -----
    GraftQuery(
      "q_ffill",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("v0", when($"event_type" === "error", lit(null).cast(DoubleType)).otherwise($"value"))
          .withColumn("ffilled", last($"v0", ignoreNulls = true).over(w))
          .select($"event_id", $"user_id", $"ffilled")
      },
      Some("""SELECT event_id, user_id,
             |  last_value(v0 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffilled
             |FROM (SELECT *, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v0 FROM events)""".stripMargin)),

    // ----- O1/O2 global ordered top-k -----
    GraftQuery(
      "q_top10_orders",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(10)
          .select($"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ----- strict-sequence funnel (view → click → purchase) -----
    // Per user: earliest view, earliest click AFTER that view,
    // earliest purchase AFTER that click; emit users-per-step reached.
    // `ts` is INT64 TIMESTAMP(MICROS) in the parquet — TIMESTAMP_NTZ
    // in Spark, TIMESTAMP in DuckDB. Spark compares the timestamps
    // directly; the oracle maps through epoch_ns (order-preserving),
    // and only counts are output. Scale shape: one conditional agg
    // over the user-keyed stream per step plus user-keyed broadcast-
    // able step tables; no windows, no self-join on the event stream.
    GraftQuery(
      "q_evt_funnel",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("t1"))
        val c = ev.filter($"event_type" === "click").join(v, "user_id")
          .filter($"ts" > $"t1")
          .groupBy($"user_id").agg(min($"ts").as("t2"))
        val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
          .filter($"ts" > $"t2")
          .groupBy($"user_id").agg(min($"ts").as("t3"))
        val one = (df: org.apache.spark.sql.DataFrame, step: Int, name: String) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(step).cast("long").as("step"), lit(name).as("event_type"),
              col("n_users"))
        one(v, 1, "view")
          .unionByName(one(c, 2, "click"))
          .unionByName(one(p, 3, "purchase"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tn FROM events),
             |v AS (SELECT user_id, min(tn) AS t1 FROM e
             |      WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(tn) AS t2 FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'click' AND tn > t1 GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(tn) AS t3 FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'purchase' AND tn > t2 GROUP BY e.user_id)
             |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, count(*) AS n_users FROM v
             |UNION ALL
             |SELECT 2, 'click', count(*) FROM c
             |UNION ALL
             |SELECT 3, 'purchase', count(*) FROM p""".stripMargin)),

    // ----- retention cohorts on integer day arithmetic -----
    // Cohort = the user's first-event week (floor of epoch days / 7);
    // one row per (cohort_week, week_offset) with distinct active
    // users. Integer nanos → exact in both engines; no calendar
    // functions on the nanos-typed column.
    GraftQuery(
      "q_evt_retention",
      (s, d) => {
        import s.implicits._
        // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and
        // epoch micros exceed 2^53 — the quotient would be inexact at
        // day boundaries. ts is TIMESTAMP_NTZ (micros); the session is
        // pinned UTC, so the NTZ→instant cast is identity and
        // unix_micros mirrors DuckDB's epoch_us exactly.
        val ev = Tables.events(s, d)
          .select($"user_id",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
        val first = ev.groupBy($"user_id").agg(min($"day").as("day0"))
        ev.join(first, "user_id")
          .select($"user_id", expr("day0 div 7").as("cohort_week"),
            expr("(day - day0) div 7").as("week_offset"))
          .groupBy($"cohort_week", $"week_offset")
          .agg(countDistinct($"user_id").as("n_users"))
      },
      Some("""WITH e AS (SELECT user_id,
             |    epoch_us(ts) // 86400000000 AS day FROM events),
             |f AS (SELECT user_id, min(day) AS day0 FROM e GROUP BY user_id)
             |SELECT CAST(day0 // 7 AS BIGINT) AS cohort_week,
             |       CAST((day - day0) // 7 AS BIGINT) AS week_offset,
             |       count(DISTINCT user_id) AS n_users
             |FROM e JOIN f USING (user_id)
             |GROUP BY 1, 2""".stripMargin)))
}
