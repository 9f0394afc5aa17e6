package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic source-mixing: down-sample each source (domain,
  * crawl, provider) to a fixed keep-rate — the "data mixing weights"
  * step of LLM corpus assembly, where e.g. web crawl is kept at 30%
  * while books/code are kept whole.
  *
  * Sampling is md5-keyed, not `rand()`-keyed: a row is kept iff the
  * integer value of the first 8 hex chars of `md5(salt|id)` falls
  * under `rate · 2^32`. That makes the sample (a) deterministic and
  * repeatable across runs and engines — md5 is bit-identical
  * everywhere, so DuckDB replays the exact row set (the same trick as
  * [[graft.graphs.GraphDataset.shuffledExact]]), (b) stable under
  * re-partitioning — membership depends only on the row key, never on
  * partition layout or evaluation order, and (c) shuffle-free — the
  * predicate is a per-row map, so at 100 TB it runs inside the scan
  * with zero data movement.
  */
object Mixer {

  /** The keep-predicate's uniform variate in [0, 2^32): first 8 md5
    * hex chars of the salted id, as a long. */
  def hashVariate(idCol: Column, salt: String): Column =
    conv(substring(md5(concat_ws("|", lit(salt), idCol)), 1, 8), 16, 10)
      .cast("long")

  /** Keep rows of `docs` whose source matches its configured
    * keep-rate; sources absent from `rates` fall back to
    * `defaultRate` (1.0 = keep all). */
  def sample(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = "graft-mix"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    docs.filter(
      hashVariate(col(idCol).cast("string"), salt).cast("double") <
        rate * 4294967296.0)
  }

  /** α-temperature mixing (the T5 / multilingual sampling rule):
    * source s with n_s rows gets sampling weight w_s ∝ n_s^α — α < 1
    * flattens the distribution toward rare sources, α = 1 is
    * proportional (no re-weighting). Keep-rates are sized so the
    * EXPECTED kept total is `targetFrac` of the corpus:
    * rate_s = min(1, targetFrac · N · w_s / (Σw · n_s)), rounded to 6
    * decimals so the md5-threshold compare replays bit-identically in
    * the oracle (`q_doc_temp_mix`).
    *
    * Scale shape: the per-source count is one partial-aggregable
    * groupBy producing a source-cardinality-sized relation; the Σ
    * terms are DECIMAL-exact (merge-order-free) one-row aggregates;
    * rates come back to the corpus as a broadcast join, so the corpus
    * side stays a scan + map-side predicate — zero data shuffle, same
    * as [[sample]]. */
  def temperatureSample(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double,
      targetFrac: Double,
      salt: String = "graft-mix"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 9)
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    // self-join lineage (tot derives from counts): alias both sides so
    // the analyzer can tell the branches apart
    val tot = counts.agg(
      sum(col("__n").cast(dec)).cast("double").as("__tn"),
      sum(pow(col("__n"), lit(alpha)).cast(dec)).cast("double").as("__tw"))
    val rates = counts.as("c").crossJoin(broadcast(tot.as("t")))
      .select(col(s"c.$sourceCol"),
        round(least(lit(1.0),
          lit(targetFrac) * col("t.__tn") *
            (pow(col("c.__n"), lit(alpha)).cast(dec).cast("double")) /
            (col("t.__tw") * col("c.__n"))), 6).as("__rate"))
    docs.join(broadcast(rates), sourceCol)
      .filter(
        hashVariate(col(idCol).cast("string"), salt).cast("double") <
          col("__rate") * 4294967296.0)
      .drop("__rate")
  }

  /** Weighted sampling WITHOUT replacement, exact size k — the
    * Efraimidis–Spirakis A-ES scheme (2006): each row draws the
    * deterministic md5 uniform u ∈ (0,1) and keeps the k largest
    * priorities u^(1/w), realized as the monotone-equivalent key
    * ln(u)/w (larger = better; heavier rows need smaller |ln u| to
    * win). The per-row key is engine-neutral (md5 variate + one libm
    * `ln` rounded through DECIMAL(20,9)) and ranking ties break on
    * the id, so the kept SET replays exactly in DuckDB
    * (`q_doc_priority_sample`) — unlike `rand()`-keyed reservoirs.
    *
    * Scale shape: the key is a scan-stage expression (zero shuffle);
    * top-k is orderBy+limit = TakeOrderedAndProject — a distributed
    * partial top-k, each partition contributes at most k candidates,
    * never a global sort. [[sample]] gives Bernoulli rates; this
    * gives exact-k with weights — the two standard sampling contracts
    * of a curation pipeline.
    *
    * Contract: `weightCol` must be strictly positive (enforced with a
    * per-row runtime check — A-ES is undefined at w ≤ 0). */
  def prioritySample(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "graft-mix"): DataFrame = {
    // (v + 0.5) / 2^32 ∈ (0,1): exact dyadic, never 0 or 1
    val u = (hashVariate(col(idCol).cast("string"), salt).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    // the DECIMAL(20,9) cast collapses any last-ulp libm divergence
    // before the rank compares keys; ties break on the id
    val key = (log(u) / col(weightCol)).cast("decimal(20,9)")
    // contract: weights must be strictly positive. w=0 gives ln(u)/0 =
    // -Inf, whose DECIMAL cast NULLs in Spark but errors in the DuckDB
    // oracle; w<0 inverts the priority order — either silently corrupts
    // the sample, so fail fast. Guard as a FILTER (assert_true is null
    // on success — no row dropped, and a filter cannot be pruned away
    // like a projected-then-dropped assert column would be)
    docs.filter(assert_true(col(weightCol) > 0,
        lit(s"prioritySample: $weightCol must be > 0 " +
          "(A-ES keys are ln(u)/w — zero divides, negatives invert the order)")).isNull)
      .select(col(idCol), col(weightCol), key.as("priority"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol),
        col("priority").cast("double").as("priority"))
  }
}
