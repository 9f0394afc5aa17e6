package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share
  * token n-grams with an evaluation/benchmark corpus, the standard
  * guard against test-set leakage when assembling LLM training data
  * (the GPT-3 appendix-C / C4 style 13-gram overlap check).
  *
  * Scale shape — the asymmetry IS the design: the benchmark side is
  * bounded (benchmarks are megabytes; the corpus is the 100 TB side),
  * so its distinct shingle set is broadcast and the corpus side never
  * shuffles its text — each doc partition streams through a map-side
  * hash join against the broadcast shingles, and only the (doc_id,
  * bench_id) hit counts (a vanishingly small relation) reach the
  * aggregation shuffle. With partial aggregation that shuffle carries
  * one row per (doc, bench) pair that actually overlaps.
  *
  * Mirrors the reference's curation intent (unravelsports has no
  * decontamination op; this is part of the training-data surface the
  * engine adds on top).
  */
object Decontaminate {

  /** Overlap pairs: one row per (doc, bench) pair sharing at least
    * `minOverlap` DISTINCT token n-grams.
    * Output: doc_id, bench_id, overlap_ngrams. */
  def overlaps(
      docs: DataFrame,
      docId: String,
      docText: String,
      bench: DataFrame,
      benchId: String,
      benchText: String,
      n: Int = 13,
      minOverlap: Int = 1): DataFrame = {
    val d = docs.select(col(docId).as("doc_id"),
        explode(Shingles.shingles(Shingles.tokens(col(docText)), n)).as("s"))
      .distinct()
    val b = bench.select(col(benchId).as("bench_id"),
        explode(Shingles.shingles(Shingles.tokens(col(benchText)), n)).as("s"))
      .distinct()
    d.join(broadcast(b), "s")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap_ngrams"))
      .filter(col("overlap_ngrams") >= minOverlap)
  }

  /** Clean corpus: drop every document that overlaps any benchmark
    * entry at `minOverlap`+ distinct n-grams (left-anti join on the
    * contaminated id set — no text moves through the anti join). */
  def clean(
      docs: DataFrame,
      docId: String,
      docText: String,
      bench: DataFrame,
      benchId: String,
      benchText: String,
      n: Int = 13,
      minOverlap: Int = 1): DataFrame = {
    val hit = overlaps(docs, docId, docText, bench, benchId, benchText, n, minOverlap)
      .select(col("doc_id").as(docId)).distinct()
    docs.join(hit, Seq(docId), "left_anti")
  }
}
