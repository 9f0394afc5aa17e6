package graft.queries

import graft.core.{GraftQuery, QueryModule, Tables}
import graft.llm._
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation and hybrid retrieval — the
  * fixed-size-state operators a 100 TB curation run uses where exact
  * answers would shuffle the whole corpus (see [[graft.llm.Sketches]]),
  * plus reciprocal-rank fusion over the BM25/cosine rankers
  * ([[graft.llm.Hybrid]]).
  *
  * All three sketches/fusions are deterministic (shared
  * [[graft.llm.TextHash.polyHash]], no seeded RNG), so the DuckDB
  * oracles replay every register, counter, and reciprocal bit-for-bit —
  * including the approximation error itself (the HLL estimate vs the
  * exact distinct count, the CMS upper bound vs the true frequency).
  */
object SketchQueries extends QueryModule {

  private val toksSql = Shingles.tokensSql("text")

  /** The literal hybrid-retrieval query set: 4 queries, each a term
    * list (lexical half) paired with the same-id embedding row (dense
    * half, doc_id == vec_id in the testdata). */
  val RrfQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join"),
    1L -> Seq("window", "stream"),
    2L -> Seq("hash", "merge"),
    3L -> Seq("scan", "batch"))

  override def queries: Seq[GraftQuery] = Seq(

    // ----- HyperLogLog distinct tokens per language -----
    GraftQuery(
      "q_doc_hll",
      (s, d) => {
        val occ = Tables.documents(s, d)
          .select(col("lang"), explode(Shingles.tokens(col("text"))).as("tok"))
        val exact = occ.groupBy("lang")
          .agg(countDistinct(col("tok")).as("n_exact"))
        Sketches.hllDistinct(occ, "lang", "tok")
          .join(exact, "lang")
          .select(col("lang"), col("v_zero"), col("est_raw"), col("est"),
            col("n_exact"))
      },
      Some {
        s"""WITH occ AS (
           |  SELECT lang, unnest($toksSql) AS tok FROM documents),
           |${Sketches.hllSql("occ", "lang")},
           |ex AS (SELECT lang, count(DISTINCT tok) AS n_exact
           |       FROM occ GROUP BY lang)
           |SELECT h.lang, h.v_zero, h.est_raw, h.est, ex.n_exact
           |FROM hll h JOIN ex USING (lang)""".stripMargin
      }),

    // ----- Count-Min-sketch heavy hitters (top 25 tokens) -----
    GraftQuery(
      "q_doc_cms_topk",
      (s, d) => {
        val occ = Tables.documents(s, d)
          .select(explode(Shingles.tokens(col("text"))).as("tok"))
        Sketches.cmsHeavyHitters(occ, "tok", k = 25)
      },
      Some {
        s"""WITH occ AS (
           |  SELECT unnest($toksSql) AS tok FROM documents),
           |${Sketches.cmsSql("occ", k = 25)}
           |SELECT rank, tok, est, true_cnt FROM cmstop""".stripMargin
      }),

    // ----- histogram-sketch quantiles over document length -----
    GraftQuery(
      "q_doc_len_hist",
      (s, d) => Sketches.histQuantiles(Tables.documents(s, d), "n_chars",
        lo = 0L, hi = 4096L, bins = 64, quantiles = Seq(0.5, 0.9, 0.99)),
      Some {
        val ctes = Sketches.histQuantilesSql("documents", "n_chars",
          lo = 0L, hi = 4096L, bins = 64, quantiles = Seq(0.5, 0.9, 0.99))
        s"""WITH $ctes
           |SELECT q, bucket, cum, est FROM histq""".stripMargin
      }),

    // ----- reciprocal-rank fusion: BM25 top-20 + cosine top-20 → top-10 -----
    GraftQuery(
      "q_doc_rrf_fusion",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val lex = Bm25.topkPerQuery(docs, "doc_id", "text", RrfQueries, k = 20)
        val dense = Similarity
          .topKCosine(emb, emb.filter(col("vec_id") < RrfQueries.size), "vec_id",
            "embedding", k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        Hybrid.rrfFuse(lex, dense, k = 10)
      },
      Some {
        val qt = RrfQueries
          .flatMap { case (q, ts) => ts.map(w => s"($q, '$w')") }
          .mkString(", ")
        val allTerms =
          RrfQueries.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
        val cos = Similarity.cosineSql("q.qv", "c.cv")
        val recip = (r: String) =>
          s"coalesce(CAST(round(CAST(1.0 AS DOUBLE) / ($r + ${Hybrid.RrfK}), 9)" +
            s" AS DECIMAL(20,9)), CAST(0 AS DECIMAL(20,9)))"
        s"""WITH t0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |t AS (SELECT doc_id, toks, len(toks) AS dl FROM t0 WHERE len(toks) > 0),
           |st AS (SELECT count(*) AS n_docs,
           |  round(CAST(sum(dl) AS DOUBLE) / count(*), 6) AS avgdl FROM t),
           |tk AS (SELECT doc_id, dl, unnest(toks) AS w FROM t),
           |ftk AS (SELECT * FROM tk WHERE w IN ($allTerms)),
           |tf AS (SELECT doc_id, dl, w, count(*) AS tf
           |       FROM ftk GROUP BY doc_id, dl, w),
           |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
           |pt AS (SELECT tf.doc_id, tf.w,
           |  CAST(round(
           |    ln(CAST(1.0 AS DOUBLE) +
           |       (st.n_docs - df.df + CAST(0.5 AS DOUBLE)) /
           |       (df.df + CAST(0.5 AS DOUBLE))) *
           |    (tf.tf * CAST(2.2 AS DOUBLE)) /
           |    (tf.tf + CAST(1.2 AS DOUBLE) *
           |      (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
           |       CAST(0.75 AS DOUBLE) * tf.dl / st.avgdl)), 6)
           |    AS DECIMAL(20,9)) AS sc
           |  FROM tf JOIN df USING (w) CROSS JOIN st),
           |qt(query_id, w) AS (VALUES $qt),
           |qsc AS (SELECT q.query_id, p.doc_id,
           |        round(CAST(sum(p.sc) AS DOUBLE), 6) AS score
           |        FROM pt p JOIN qt q USING (w) GROUP BY 1, 2),
           |lex AS (SELECT query_id, doc_id, rank FROM (
           |  SELECT query_id, doc_id,
           |         row_number() OVER (PARTITION BY query_id
           |                            ORDER BY score DESC, doc_id) AS rank
           |  FROM qsc) WHERE rank <= 20),
           |dq AS (SELECT vec_id AS query_id, embedding AS qv
           |       FROM embeddings WHERE vec_id < ${RrfQueries.size}),
           |dc AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
           |den AS (SELECT query_id, neighbor_id AS doc_id, rank FROM (
           |  SELECT q.query_id, c.neighbor_id,
           |         row_number() OVER (PARTITION BY q.query_id
           |                            ORDER BY $cos DESC, c.neighbor_id) AS rank
           |  FROM dq q CROSS JOIN dc c
           |  WHERE q.query_id <> c.neighbor_id) WHERE rank <= 20),
           |f AS (SELECT coalesce(l.query_id, d.query_id) AS query_id,
           |             coalesce(l.doc_id, d.doc_id) AS doc_id,
           |             CAST(${recip("l.rank")} + ${recip("d.rank")} AS DOUBLE) AS rrf0,
           |             coalesce(l.rank, 0) AS rank_lex,
           |             coalesce(d.rank, 0) AS rank_dense
           |      FROM lex l FULL OUTER JOIN den d
           |        ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
           |SELECT query_id, fused_rank, doc_id, round(rrf0, 9) AS rrf,
           |       rank_lex, rank_dense
           |FROM (SELECT *,
           |        row_number() OVER (PARTITION BY query_id
           |                           ORDER BY rrf0 DESC, doc_id) AS fused_rank
           |      FROM f) WHERE fused_rank <= 10""".stripMargin
      }))
}
