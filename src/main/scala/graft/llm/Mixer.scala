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
}
