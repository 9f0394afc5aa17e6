package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (lexical + dense) retrieval fusion — reciprocal-rank fusion
  * (Cormack, Clarke & Buettcher, SIGIR 2009): the standard way a
  * curation/RAG pipeline combines a BM25 ranking with an
  * embedding-cosine ranking without score calibration, since RRF
  * consumes only RANKS:
  *
  *   `rrf(d) = Σ_lists 1 / (k0 + rank_list(d))`, k0 = 60.
  *
  * Scale shape: both inputs are already top-k relations (≤ |queries|·k
  * rows), so the fusion itself is a full-outer join on (query_id,
  * doc_id) between two tiny relations followed by a per-query rank
  * window — nothing corpus-sized flows through this operator; the heavy
  * lifting stays in the upstream rankers ([[Bm25.topkPerQuery]],
  * [[Similarity.topKCosine]]), each with its own scale path.
  *
  * Float determinism: each reciprocal `1/(k0+rank)` is a single IEEE
  * divide rounded to 9 decimals and cast to DECIMAL before the
  * two-term sum, so the fused score replays bit-for-bit in DuckDB.
  */
object Hybrid {

  val RrfK = 60

  /** Fuse two per-query rankings. Inputs must have columns
    * (query_id, doc_id, rank); ranks are 1-based. Output per query:
    * fused_rank, doc_id, rrf (6-dp), rank_lex, rank_dense (0 = the
    * document was absent from that list).
    *
    * The per-query rank window below is STRUCTURALLY bounded — it
    * ranks the full-outer join of two already-top-k lists, ≤ 2k rows
    * per query by construction — so it is NOT the unbounded-partition
    * cliff class [[Bm25.rankTail]]/[[Similarity]] replaced with the
    * k-bounded aggregate; no arm swap is needed here. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int): DataFrame = {
    def side(df: DataFrame, rankName: String): DataFrame =
      df.select(col("query_id"), col("doc_id"), col("rank").as(rankName))
    val l = side(lex, "rank_lex")
    val d = side(dense, "rank_dense")
    def recip(rank: org.apache.spark.sql.Column) =
      coalesce(round(lit(1.0) / (rank + RrfK), 9).cast("decimal(20,9)"),
        lit(0).cast("decimal(20,9)"))
    val fused = l.join(d, Seq("query_id", "doc_id"), "full_outer")
      .select(
        col("query_id"),
        col("doc_id"),
        (recip(col("rank_lex")) + recip(col("rank_dense")))
          .cast("double").as("__rrf"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__rrf").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("fused_rank"), col("doc_id"),
        round(col("__rrf"), 9).as("rrf"), col("rank_lex"), col("rank_dense"))
  }
}
