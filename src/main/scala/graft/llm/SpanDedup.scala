package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring detection at n-gram granularity —
  * the relational form of ExactSubstr dedup (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better"): any ≥n-token span that
  * appears verbatim in two or more documents is flagged, and adjacent
  * flagged positions merge into maximal duplicated regions (a span of
  * k > n shared tokens appears as k−n+1 consecutive flagged n-grams,
  * so the island IS the maximal repeated substring). Line dedup
  * ([[LineDedup]]) catches structured boilerplate; this catches
  * arbitrary-alignment copying — quotes, mirrored paragraphs,
  * templated articles.
  *
  * Scale shape (reference tools build a corpus-wide suffix array —
  * inherently single-machine):
  *  - the span table is a positional explode of each document where it
  *    lives (no shuffle);
  *  - repeated-span discovery is one `groupBy` on the span hash
  *    (map-side combined; the distinct-doc count is a two-level agg);
  *  - flagging joins spans to the duplicated-hash set on the same hash
  *    key — the shuffle both sides already have;
  *  - region merging is a per-document window (`pos − row_number()`
  *    islands), partitioned by the doc id, bounded by document length.
  *
  * Everything is integer arithmetic — the oracle replays it exactly
  * with no float-parity care needed.
  */
object SpanDedup {

  /** Flagged span positions: (doc_id, pos, h) for every n-gram at
    * token position `pos` (0-based) that also occurs in ≥ minDocs−1
    * OTHER documents. */
  def dupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    val spans = docs
      .select(col(idCol).cast("long").as("doc_id"),
        Shingles.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(Shingles.shingles(col("toks"), n)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        TextHash.polyHash(col("s")).as("h"))
    val dup = spans.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    spans.join(dup, "h").select(col("doc_id"), col("pos"), col("h"))
  }

  /** Maximal duplicated regions per document: consecutive flagged
    * positions merged, end extended to cover the final n-gram.
    * Output: doc_id, start_pos, end_pos (inclusive token positions),
    * n_spans (flagged n-grams merged into the region). */
  def dupRegions(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    // (doc_id, pos) is unique by construction — one n-gram per
    // position, joined to at most one dup-hash row — so no distinct
    // (and no extra shuffle) is needed before the island window
    val flagged = dupSpans(docs, idCol, textCol, n, minDocs)
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flagged
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + lit((n - 1).toLong)).as("end_pos"),
        count(lit(1)).as("n_spans"))
      .select(col("doc_id"), col("start_pos"), col("end_pos"), col("n_spans"))
  }

  /** Per-document duplication pressure: how much of the token stream
    * sits inside a duplicated region. Output: doc_id, n_tokens,
    * dup_tokens (exact region-union coverage), n_regions. */
  def stats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    val lens = docs.select(col(idCol).cast("long").as("doc_id"),
      size(Shingles.tokens(col(textCol))).cast("long").as("n_tokens"))
    val regions = dupRegions(docs, idCol, textCol, n, minDocs)
      .groupBy(col("doc_id"))
      .agg(sum(col("end_pos") - col("start_pos") + lit(1L)).as("dup_tokens"),
        count(lit(1)).as("n_regions"))
    lens.join(regions, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_tokens", "n_regions"))
  }

  /** The CUT step that completes the ExactSubstr journey: rebuild each
    * document's text with every duplicated region removed (Lee et al.
    * drop the repeated span from all but one occurrence; like their
    * released tool we cut ALL flagged occurrences and leave policy to
    * the caller). Documents that lose everything are kept with empty
    * text so downstream joins see the full id set.
    *
    * Scale shape: regions explode to flagged positions (bounded by
    * document length, same order as the token stream they cut); the
    * cut is a left-anti join on (doc_id, pos) — both sides already
    * carry the doc key; reassembly sorts WITHIN the per-doc collect
    * (array_sort of (pos, tok) structs), never globally.
    *
    * Output: doc_id, n_kept, clean_text. */
  def dedupText(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(Shingles.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val cut = dupRegions(docs, idCol, textCol, n, minDocs)
      .select(col("doc_id"),
        explode(sequence(col("start_pos"), col("end_pos"))).as("pos"))
    val kept = toks.join(cut, Seq("doc_id", "pos"), "left_anti")
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("pos"), col("tok"))).as("__pt"))
      .select(col("doc_id"),
        size(col("__pt")).cast("long").as("n_kept"),
        array_join(transform(array_sort(col("__pt")), _.getField("tok")), " ")
          .as("clean_text"))
    ids.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
