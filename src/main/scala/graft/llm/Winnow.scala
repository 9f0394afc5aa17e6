package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local fingerprinting algorithm): hash every character
  * k-gram with the polynomial hash, slide a window of `w` consecutive
  * k-gram hashes, and keep the minimum of each window. The distinct
  * kept hashes are the document's fingerprint set; any shared substring
  * of length >= k + w - 1 between two documents is guaranteed to
  * produce a shared fingerprint.
  *
  * Pure column algebra — fingerprints are computed where each row
  * lives (no shuffle; the only downstream shuffle is whatever key the
  * consumer joins on, typically the fingerprint value as an inverted
  * index). The k-gram hash is the codegen'd native
  * [[graft.functions.PolyHash]] over substrings; each pipeline stage is
  * a separate materialized projection, referenced multiply so
  * CollapseProject keeps it per-row — interpreted HOF lambdas
  * re-evaluate embedded subtrees per element, so folding the stages
  * into one expression would cost O(len²·k) per document instead of
  * O(len·(k+w)).
  */
object Winnow {

  val K: Int = 8 // k-gram length (characters)
  val W: Int = 4 // winnowing window (k-gram hashes)

  /** Window minima of a materialized k-gram hash column. */
  private def windowMinima(kh: Column, w: Int): Column =
    when(size(kh) >= w,
      transform(sequence(lit(1), size(kh) - (w - 1)),
        j => array_min(slice(kh, j, lit(w)))))
      .otherwise(array().cast("array<bigint>"))

  /** One row per distinct (id, fingerprint). */
  def fingerprintTable(docs: DataFrame, idCol: String, textCol: String,
      k: Int = K, w: Int = W): DataFrame =
    docs.select(col(idCol), lower(col(textCol)).as("__lt"))
      .withColumn("__kh",
        when(length(col("__lt")) >= k,
          transform(sequence(lit(1), length(col("__lt")) - (k - 1)),
            i => TextHash.polyHash(col("__lt").substr(i, lit(k)))))
          .otherwise(array().cast("array<bigint>")))
      .withColumn("__fps", windowMinima(col("__kh"), w))
      .select(col(idCol), explode(array_distinct(col("__fps"))).as("fp"))

  /** Winnowing near-duplicate pairs: documents sharing >= `minShared`
    * fingerprints (MOSS's match criterion). The fingerprint value is
    * the inverted-index shuffle key; `maxDf` drops corpus-ubiquitous
    * fingerprints from candidate generation (boilerplate guard, same
    * shape as [[Jaccard]]'s df cap) so no single fingerprint key
    * concentrates quadratic pair work. */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = K,
      w: Int = W,
      minShared: Int = 2,
      maxDf: Int = 50): DataFrame = {
    val fps = fingerprintTable(docs, idCol, textCol, k, w)
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select(col("fp"))
    val idx = fps.join(rare, "fp")
    idx.toDF("fp", "id_a").join(idx.toDF("fp", "id_b"), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** DuckDB mirror of [[fingerprintTable]], as a SELECT producing
    * (doc_id, fp) from `documents`. */
  def fingerprintSql(k: Int = K, w: Int = W): String = {
    val gram = s"lt[i:i+${k - 1}]"
    val kh = s"list_transform(generate_series(1, length(lt) - ${k - 1}), " +
      s"i -> ${TextHash.polyHashSql(gram)})"
    s"""WITH lt AS (SELECT doc_id, lower(text) AS lt FROM documents),
       |kh AS (SELECT doc_id, CASE WHEN length(lt) >= $k THEN $kh
       |         ELSE [] END AS kh FROM lt),
       |fps AS (SELECT doc_id, CASE WHEN len(kh) >= $w THEN
       |          list_transform(generate_series(1, len(kh) - ${w - 1}),
       |            j -> list_min(kh[j:j+${w - 1}])) ELSE [] END AS fps FROM kh)
       |SELECT DISTINCT doc_id, unnest(fps) AS fp FROM fps""".stripMargin
  }
}
