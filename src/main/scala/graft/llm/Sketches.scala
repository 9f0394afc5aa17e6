package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size mergeable sketches — the approximate-aggregation layer a
  * 100 TB curation run uses where exact answers would shuffle the whole
  * corpus:
  *
  *  - [[hllDistinct]] — HyperLogLog distinct counting (Flajolet et al.
  *    2007). The exact `count(distinct token)` a pipeline wants per
  *    language/source/shard needs a corpus-wide shuffle on the token
  *    itself; the HLL register table is `m` rows per group REGARDLESS
  *    of cardinality, built with one map-side-combinable
  *    `groupBy(group, register).max(rho)` — the shuffle carries at most
  *    `m × partitions` rows, not the token stream.
  *  - [[cmsSketch]] / [[cmsHeavyHitters]] — Count-Min sketch (Cormode &
  *    Muthukrishnan 2005). Heavy-hitter frequencies from a `d × w`
  *    counter grid: the build is `groupBy(row, bucket).count()` over a
  *    keyspace of `d·w` cells (3072 here), so partial aggregation
  *    collapses every partition's contribution to ≤ d·w rows before the
  *    exchange. Estimates are upper bounds (`min` over the d rows);
  *    error ≤ εN with ε = e/w at confidence 1 − e^(−d).
  *
  * Both sketches are DETERMINISTIC given the shared [[TextHash.polyHash]]
  * (no seeded RNG), so — unlike Spark's built-in `approx_count_distinct`
  * (HLL++ with engine-private hashing) — every register/counter and the
  * final estimates replay bit-for-bit in the DuckDB oracle
  * (`q_doc_hll`, `q_doc_cms_topk`).
  *
  * Float determinism: the HLL harmonic sum's terms are dyadic rationals
  * `2^-M_j` with `M_j ≤ 25`, so the sum of 64 of them is EXACT in IEEE
  * double regardless of order; the only non-exact steps (the α·m²/S
  * divide, the linear-counting `ln`) are rounded to 6 decimals, the
  * same convention as [[Bm25]].
  */
object Sketches {

  private val P = TextHash.Prime

  /** HLL registers per group: 2^6. polyHash's domain [0, 1e9+7) leaves
    * 24 usable bits above the 6 register bits. */
  val HllM = 64
  private val HllW = 24 // bit width of the rank window
  /** Standard bias correction α for m = 64. */
  val HllAlpha = 0.709

  /** rho(h) = 1-based position of the first set bit of the rank window
    * `w = h div m` (within [[HllW]] bits); all-zero window → W+1.
    * `length(bin(w))` is the integer bit length in BOTH engines. */
  private def rho(w: Column): Column =
    when(w === 0, lit(HllW + 1)).otherwise(lit(HllW + 1) - length(bin(w)))

  /** Per-group HLL distinct-token estimate.
    *
    * Input: one row per token OCCURRENCE (no pre-distinct — register
    * maxima over occurrences equal maxima over the distinct set; that
    * idempotence is the whole point of the sketch). Output one row per
    * group: `v_zero` empty registers, `est_raw` (α·m²/S), `est`
    * (linear-counting corrected when raw ≤ 2.5m and empties exist).
    */
  def hllDistinct(occ: DataFrame, groupCol: String, tokCol: String): DataFrame =
    hllEstimate(hllRegisters(occ, groupCol, tokCol), groupCol)

  /** The register table (group, reg, mj) — the sketch's whole state, ≤
    * [[HllM]] rows per group. Also valid as a streaming aggregation
    * ([[graft.streaming.StreamingSketch]]): maxima only grow, state is
    * fixed-size. */
  def hllRegisters(occ: DataFrame, groupCol: String, tokCol: String): DataFrame = {
    val h = TextHash.polyHash(col(tokCol))
    occ
      .select(col(groupCol), pmod(h, lit(HllM.toLong)).as("reg"),
        floor(h / HllM).cast("long").as("rw"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(rho(col("rw"))).as("mj"))
  }

  /** Estimate arithmetic over a register table. */
  def hllEstimate(regs: DataFrame, groupCol: String): DataFrame = {
    // 2^-mj is exact; absent registers contribute 2^0 = 1 each
    val per = regs.groupBy(col(groupCol)).agg(
      (sum(pow(lit(2.0), -col("mj"))) + (lit(HllM) - count(lit(1)))).as("s"),
      (lit(HllM) - count(when(col("mj") > 0, 1))).cast("long").as("v_zero"))
    val raw = (lit(HllAlpha) * HllM * HllM) / col("s")
    per.select(
      col(groupCol),
      col("v_zero"),
      round(raw, 6).as("est_raw"),
      when(raw <= 2.5 * HllM && col("v_zero") > 0,
        round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_zero")), 6))
        .otherwise(round(raw, 6)).as("est"))
  }

  /** DuckDB SQL replaying [[hllDistinct]] from a relation `(g, tok)` of
    * token occurrences; emits CTEs `hreg`/`hll` with `hll(g, v_zero,
    * est_raw, est)`. */
  def hllSql(occRel: String, g: String): String = {
    val h = "h"
    s"""hocc AS (SELECT $g, ${TextHash.polyHashSql("tok")} AS $h FROM $occRel),
       |hreg AS (SELECT $g, $h % $HllM AS reg,
       |    max(CASE WHEN $h // $HllM = 0 THEN ${HllW + 1}
       |        ELSE ${HllW + 1} - length(bin($h // $HllM)) END) AS mj
       |  FROM hocc GROUP BY $g, $h % $HllM),
       |hsum AS (SELECT $g,
       |    sum(pow(CAST(2.0 AS DOUBLE), -mj)) + ($HllM - count(*)) AS s,
       |    CAST($HllM - count(CASE WHEN mj > 0 THEN 1 END) AS BIGINT) AS v_zero
       |  FROM hreg GROUP BY $g),
       |hll AS (SELECT $g, v_zero,
       |    round(CAST($HllAlpha AS DOUBLE) * $HllM * $HllM / s, 6) AS est_raw,
       |    CASE WHEN CAST($HllAlpha AS DOUBLE) * $HllM * $HllM / s <= 2.5 * $HllM
       |              AND v_zero > 0
       |         THEN round(CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / v_zero), 6)
       |         ELSE round(CAST($HllAlpha AS DOUBLE) * $HllM * $HllM / s, 6) END AS est
       |  FROM hsum)""".stripMargin
  }

  /** CMS depth (independent hash rows) and width (buckets per row). */
  val CmsD = 3
  val CmsW = 1024
  /** Pairwise-independent row hashes `(a·h + b) mod P mod w`; a,b < 2^10
    * keep `a·h + b` far below 2^63 (see [[TextHash.Prime]]). */
  val CmsRows: Seq[(Int, Int)] = Seq((31, 7), (37, 11), (41, 13))

  private def cmsBucket(h: Column, a: Int, b: Int): Column =
    pmod(pmod(h * a + b, lit(P)), lit(CmsW.toLong))

  /** The d×w counter grid from a token-occurrence stream: one row per
    * non-empty cell `(row, bucket, cnt)` — at most d·w = 3072 rows
    * total, so it broadcasts onto any probe side. */
  def cmsSketch(occ: DataFrame, tokCol: String): DataFrame = {
    val h = TextHash.polyHash(col(tokCol))
    val cells = array(CmsRows.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), cmsBucket(h, a, b).as("bucket"))
    }: _*)
    occ.select(explode(cells).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Top-k heavy hitters by CMS estimate: probe each candidate token's
    * d cells against the broadcast sketch and take the min. Output:
    * `rank, tok, est, true_cnt` (true counts kept alongside to expose
    * the sketch's one-sided error; drop that branch at scale). */
  def cmsHeavyHitters(occ: DataFrame, tokCol: String, k: Int): DataFrame = {
    val sketch = cmsSketch(occ, tokCol)
    val cand = occ.groupBy(col(tokCol).as("tok"))
      .agg(count(lit(1)).as("true_cnt"))
    val h = TextHash.polyHash(col("tok"))
    val probes = cand.select(col("tok"), col("true_cnt"),
      explode(array(CmsRows.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("row"), cmsBucket(h, a, b).as("bucket"))
      }: _*)).as("c"))
    val est = probes
      .join(broadcast(sketch),
        col("c.row") === sketch("row") && col("c.bucket") === sketch("bucket"))
      .groupBy(col("tok"), col("true_cnt"))
      .agg(min(col("cnt")).as("est"))
    import org.apache.spark.sql.expressions.Window
    est.withColumn("rank",
        row_number().over(Window.orderBy(col("est").desc, col("tok"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("tok"), col("est"), col("true_cnt"))
  }

  /** Equi-width histogram quantile sketch: `bins` fixed counters over
    * [lo, hi) — the mergeable alternative to an exact sort-based
    * quantile (which shuffles the full value column). Build is
    * `groupBy(bucket).count()` over a `bins`-sized keyspace (map-side
    * combine collapses each partition to ≤ bins rows); the estimate
    * for quantile q is the upper edge of the first bucket whose
    * cumulative count reaches ⌈q·N⌉. Everything is integer arithmetic
    * plus exact-width bucket edges, so the oracle replays it exactly.
    *
    * Output: (q, bucket, cum, est) per requested quantile. */
  def histQuantiles(
      df: DataFrame,
      valueCol: String,
      lo: Long,
      hi: Long,
      bins: Int,
      quantiles: Seq[Double]): DataFrame = {
    require((hi - lo) % bins == 0, "integer bucket width keeps both engines exact")
    val width = (hi - lo) / bins
    val b = least(greatest(floor((col(valueCol) - lo) / width), lit(0)),
      lit(bins - 1)).cast("long")
    val counts = df.select(b.as("bucket")).groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("n"))))
    val qs = quantiles.map { q =>
      // target rank ⌈q·N⌉ — integer compare, no float boundary
      val target = ceil(lit(q) * col("n")).cast("long")
      cum.filter(col("cum") >= target)
        .orderBy(col("bucket"))
        .limit(1)
        .select(lit(q).as("q"), col("bucket"),
          col("cum"), (lit(lo) + (col("bucket") + 1) * width).as("est"))
    }
    qs.reduce(_ unionByName _)
  }

  /** DuckDB SQL replaying [[histQuantiles]]; final CTE
    * `histq(q, bucket, cum, est)`. */
  def histQuantilesSql(
      rel: String,
      valueExpr: String,
      lo: Long,
      hi: Long,
      bins: Int,
      quantiles: Seq[Double]): String = {
    val width = (hi - lo) / bins
    val qvals = quantiles.map(q => s"SELECT CAST($q AS DOUBLE) AS q")
      .mkString(" UNION ALL ")
    s"""hcnt AS (SELECT CAST(least(greatest(floor(($valueExpr - $lo) / $width), 0),
       |    ${bins - 1}) AS BIGINT) AS bucket, count(*) AS cnt
       |  FROM $rel GROUP BY 1),
       |hcum AS (SELECT bucket, cnt,
       |    sum(cnt) OVER (ORDER BY bucket) AS cum,
       |    sum(cnt) OVER () AS n
       |  FROM hcnt),
       |hq AS ($qvals),
       |histq AS (SELECT q, bucket, cum, $lo + (bucket + 1) * $width AS est
       |  FROM (SELECT hq.q, h.bucket, CAST(h.cum AS BIGINT) AS cum,
       |          row_number() OVER (PARTITION BY hq.q ORDER BY h.bucket) AS rn
       |        FROM hq JOIN hcum h
       |          ON h.cum >= CAST(ceil(hq.q * h.n) AS BIGINT))
       |  WHERE rn = 1)""".stripMargin
  }

  /** DuckDB SQL replaying [[cmsHeavyHitters]] from a relation `(tok)`
    * of occurrences; final CTE `cmstop(rank, tok, est, true_cnt)`. */
  def cmsSql(occRel: String, k: Int): String = {
    val rows = CmsRows.zipWithIndex.map { case ((a, b), i) =>
      s"SELECT $i AS row, $a AS a, $b AS b"
    }.mkString(" UNION ALL ")
    s"""cocc AS (SELECT tok, ${TextHash.polyHashSql("tok")} AS h FROM $occRel),
       |crows AS ($rows),
       |csk AS (SELECT r.row, (o.h * r.a + r.b) % $P % $CmsW AS bucket,
       |    count(*) AS cnt
       |  FROM cocc o CROSS JOIN crows r GROUP BY 1, 2),
       |ccand AS (SELECT tok, min(h) AS h, count(*) AS true_cnt
       |  FROM cocc GROUP BY tok),
       |cest AS (SELECT c.tok, c.true_cnt, min(s.cnt) AS est
       |  FROM ccand c CROSS JOIN crows r
       |  JOIN csk s ON s.row = r.row
       |    AND s.bucket = (c.h * r.a + r.b) % $P % $CmsW
       |  GROUP BY c.tok, c.true_cnt),
       |cmstop AS (SELECT * FROM (
       |    SELECT row_number() OVER (ORDER BY est DESC, tok) AS rank,
       |           tok, est, true_cnt
       |    FROM cest) WHERE rank <= $k)""".stripMargin
  }
}
