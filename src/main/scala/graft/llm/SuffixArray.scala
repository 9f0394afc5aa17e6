package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed suffix ranking by prefix doubling (Larsson–Sadakane /
  * pDC3 family) — the suffix-array layer under ExactSubstr-style dedup
  * (Lee et al. 2022). [[SpanDedup]] finds fixed-n repeated spans with
  * one hash groupBy; the suffix RANK gives the stronger primitive the
  * single-machine reference tools get from a suffix array: a total
  * order of every corpus position by its following text, from which
  * repeated substrings of ANY length fall out as equal-rank runs.
  *
  * Context is bounded to `window` tokens (like ExactSubstr's chunked
  * matching): rank(i) orders the `window`-token slice starting at i,
  * shorter-suffix-first at document ends. That keeps each doubling
  * round's key two fixed longs, independent of document length.
  *
  * Scale shape — the textbook distributed construction, O(log window)
  * rounds, NEVER a corpus-length sequential scan:
  *  - round 0 ranks single tokens; round j doubles context by keying
  *    each position with `(rank_j(i), rank_j(i + 2^j))` (−1 sentinel
  *    past the end — exactly shorter-lexicographic order);
  *  - the pair pull is a per-document `lead` window (document-sized
  *    partitions, no corpus-wide state);
  *  - dense ranking of the keys is a range-partitioned sort of the
  *    DISTINCT keys plus `zipWithIndex` (per-partition counts +
  *    offsets — contiguous global ids with no single-partition
  *    window), joined back on the key.
  *
  * The DuckDB oracle computes the SAME ranks by a completely different
  * algorithm — materializing each position's token slice and sorting
  * it directly (`dense_rank() OVER (ORDER BY slice)`), so the
  * correctness check is an algorithmic cross-validation, not a replay.
  */
object SuffixArray {

  /** Distributed dense rank: contiguous 0-based ids in `keyCols` order
    * (ties share an id), via sort + zipWithIndex + join-back. */
  private def withDenseRank(
      df: DataFrame,
      keyCols: Seq[String],
      out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(keyCols.map(col): _*).distinct()
      .orderBy(keyCols.map(col): _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    df.join(ranked, keyCols)
  }

  /** (doc_id, pos, srank): dense 1-based rank of the `window`-token
    * bounded suffix at each token position, over the whole corpus.
    * `window` must be a power of two. */
  def boundedSuffixRanks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8): DataFrame = {
    require(window >= 2 && (window & (window - 1)) == 0, "window must be a power of two")
    val pos = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(Shingles.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    var ranked = withDenseRank(pos, Seq("tok"), "r")
      .select(col("doc_id"), col("pos"), col("r"))
    var span = 1
    while (span < window) {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val paired = ranked.withColumn("r2", lead(col("r"), span, -1L).over(w))
      ranked = withDenseRank(paired, Seq("r", "r2"), "rr")
        .select(col("doc_id"), col("pos"), col("rr").as("r"))
      span *= 2
    }
    ranked.select(col("doc_id"), col("pos"), (col("r") + 1).as("srank"))
  }

  /** Repeated-substring positions through the suffix order: positions
    * whose bounded suffix is shared verbatim by ≥ `minDocs` distinct
    * documents (equal-rank runs across documents). Output:
    * (doc_id, pos, srank, n_docs). */
  def crossDocRepeats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8,
      minDocs: Int = 2): DataFrame = {
    val ranks = boundedSuffixRanks(docs, idCol, textCol, window)
    val shared = ranks.groupBy(col("srank"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    ranks.join(shared, "srank")
      .select(col("doc_id"), col("pos"), col("srank"), col("n_docs"))
  }

  /** DuckDB SQL for the direct-sort cross-check: CTEs ending in
    * `sranks(doc_id, pos, srank)` — dense rank over the materialized
    * `window`-token slice of each position. */
  def sranksSql(window: Int): String = {
    val toksSql = Shingles.tokensSql("text")
    s"""sa_t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sa_p AS (SELECT doc_id, toks,
       |    unnest(generate_series(1, len(toks))) AS p FROM sa_t),
       |sa_sl AS (SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
       |    toks[p:p + ${window - 1}] AS suf FROM sa_p),
       |sranks AS (SELECT doc_id, pos,
       |    CAST(dense_rank() OVER (ORDER BY suf) AS BIGINT) AS srank
       |  FROM sa_sl)""".stripMargin
  }
}
