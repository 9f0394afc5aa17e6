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

  /** The at-rest per-fingerprint document-frequency side-table that
    * makes [[nearDuplicatesIncremental]] fully increment-sized — the
    * [[Jaccard.indexDfs]] recipe for this family. Build once next to
    * the fingerprint table (bucket by fp); maintain by increment-ADD
    * (union + per-fp sum — only increment-touched fps change). */
  def indexDfs(index: DataFrame): DataFrame =
    index.toDF("__id", "fp").groupBy(col("fp")).agg(count(lit(1)).as("df"))

  /** INCREMENTAL winnowing near-dup: a NEW batch against the AT-REST
    * fingerprint table of the accumulated corpus (a [[fingerprintTable]]
    * — (id, fp), id column first, ids disjoint) — bit-identical to
    * [[nearDuplicates]] over old ∪ new restricted to pairs with ≥ 1
    * new doc, WITHOUT the old×old inverted-index self-join. The
    * boilerplate `maxDf` cap counts document frequency over the UNION
    * of both sides — exactly the df the batch run would see — so the
    * restriction identity holds capped or not (the union-counting rule
    * every incremental guard here follows); over-cap fps leave both
    * sides via broadcast anti-joins.
    *
    * `dfs = Some(indexDfs table)` replaces the one remaining
    * corpus-sized aggregate (the union df count) with an
    * increment-keyed left join against the stored relation — only fps
    * the increment touches can generate candidates, so old-only
    * over-cap fps stay unlisted AND pairless, and the output is
    * bit-identical with or without. */
  def nearDuplicatesIncremental(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      k: Int = K,
      w: Int = W,
      minShared: Int = 2,
      maxDf: Int = 50,
      dfs: Option[DataFrame] = None): DataFrame = {
    val fpN = fingerprintTable(newDocs, idCol, textCol, k, w)
    val fpO = index.toDF(idCol, "fp")
    val over = dfs match {
      case Some(d) =>
        fpN.groupBy(col("fp")).agg(count(lit(1)).as("__ndf"))
          .join(d.toDF("fp", "__odf"), Seq("fp"), "left")
          .filter(col("__ndf") + coalesce(col("__odf"), lit(0L)) > maxDf)
          .select(col("fp"))
      case None =>
        fpN.select(col("fp")).unionByName(fpO.select(col("fp")))
          .groupBy(col("fp")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select(col("fp"))
    }
    // using-columns joins move the key first — re-select by name
    val gN = fpN.join(Guards.broadcastBounded(over), Seq("fp"), "left_anti")
      .select(col(idCol), col("fp"))
    val gO = fpO.join(Guards.broadcastBounded(over), Seq("fp"), "left_anti")
      .select(col(idCol), col("fp"))
    val newOld = gN.toDF("id_n", "fp")
      .join(gO.toDF("id_o", "fp"), Seq("fp"))
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"))
    val newNew = gN.toDF("id_a", "fp")
      .join(gN.toDF("id_b", "fp"), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    newOld.unionByName(newNew)
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
