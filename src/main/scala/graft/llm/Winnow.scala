package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local fingerprinting algorithm): hash every character
  * k-gram with a rolling polynomial hash, slide a window of `w`
  * consecutive k-gram hashes, and keep the minimum of each window.
  * The distinct kept hashes are the document's fingerprint set; any
  * shared substring of length >= k + w - 1 between two documents is
  * guaranteed to produce a shared fingerprint.
  *
  * Pure column algebra — fingerprints are computed where each row
  * lives (no shuffle; the only downstream shuffle is whatever key the
  * consumer joins on, typically the fingerprint value as an inverted
  * index). Cost is O(len * (k + w)) per document inside whole-stage
  * codegen, independent of corpus size — the 100 TB path is exactly
  * the row-parallel path.
  */
object Winnow {

  val K: Int = 8 // k-gram length (characters)
  val W: Int = 4 // winnowing window (k-gram hashes)

  /** Character codes of the lower-cased text as ARRAY<BIGINT>. */
  private def codes(text: Column): Column =
    transform(filter(split(lower(text), ""), ch => ch =!= ""),
      ch => ascii(ch).cast("long"))

  /** K-gram hash array of a materialized codes column. */
  private def kgramHashes(cs: Column, k: Int): Column =
    when(size(cs) >= k,
      transform(sequence(lit(1), size(cs) - (k - 1)),
        i => aggregate(slice(cs, i, lit(k)), lit(0L),
          (acc, x) => (acc * 31 + x) % TextHash.Prime)))
      .otherwise(array().cast("array<bigint>"))

  /** Window minima of a materialized k-gram hash column. */
  private def windowMinima(kh: Column, w: Int): Column =
    when(size(kh) >= w,
      transform(sequence(lit(1), size(kh) - (w - 1)),
        j => array_min(slice(kh, j, lit(w)))))
      .otherwise(array().cast("array<bigint>"))

  /** ARRAY<BIGINT> of winnowed fingerprint hashes (with duplicates and
    * in window order). Single-Column convenience form; the table path
    * below stages the intermediates instead — higher-order-function
    * lambdas are interpreted, so embedding the k-gram array inside the
    * window lambda would re-evaluate it per window position (O(len²·k)
    * per document instead of O(len·(k+w))). */
  def fingerprints(text: Column, k: Int = K, w: Int = W): Column =
    windowMinima(kgramHashes(codes(text), k), w)

  /** One row per distinct (id, fingerprint). Each pipeline stage is a
    * separate materialized projection — referenced multiply, so
    * CollapseProject keeps them per-row, not per-lambda-element. */
  def fingerprintTable(docs: DataFrame, idCol: String, textCol: String,
      k: Int = K, w: Int = W): DataFrame =
    docs.select(col(idCol), codes(col(textCol)).as("__cs"))
      .withColumn("__kh", kgramHashes(col("__cs"), k))
      .withColumn("__fps", windowMinima(col("__kh"), w))
      .select(col(idCol), explode(array_distinct(col("__fps"))).as("fp"))

  /** DuckDB mirror of [[fingerprints]] + distinct unnest, as a
    * SELECT producing (doc_id, fp) from `documents`. */
  def fingerprintSql(k: Int = K, w: Int = W): String = {
    val cs = "list_transform(list_filter(string_split(lower(text), ''), " +
      "ch -> ch <> ''), ch -> CAST(ascii(ch) AS BIGINT))"
    val kh = s"list_transform(generate_series(1, len(cs) - ${k - 1}), " +
      s"i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+${k - 1}]), " +
      s"(acc, c) -> (acc * 31 + c) % ${TextHash.Prime}))"
    s"""WITH c AS (SELECT doc_id, $cs AS cs FROM documents),
       |kh AS (SELECT doc_id, CASE WHEN len(cs) >= ${k + w - 1} THEN $kh
       |         ELSE [] END AS kh FROM c),
       |fps AS (SELECT doc_id, list_transform(generate_series(1, len(kh) - ${w - 1}),
       |          j -> list_min(kh[j:j+${w - 1}])) AS fps FROM kh)
       |SELECT DISTINCT doc_id, unnest(fps) AS fp FROM fps""".stripMargin
  }
}
