package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level line deduplication — the C4/RefinedWeb cleanup that
  * strips boilerplate (nav bars, cookie banners, license footers) by
  * removing every line whose EXACT text occurs more than
  * `maxOccurrences` times across the whole corpus, then reassembling
  * the surviving lines in document order.
  *
  * Scale shape: one posexplode (line index kept for reassembly), one
  * partial-aggregable groupBy on the line hash to find banned lines
  * (map-side combine collapses per-partition repeats of hot
  * boilerplate before the shuffle), one anti-join of the exploded rows
  * against the (small: only lines OVER the threshold) banned table,
  * and one per-document collect to rebuild the text. Lines travel as
  * 64-bit hashes through the count/join, never as strings, so the hot
  * path shuffles ~16 bytes per line; the rebuilt text is assembled
  * from the exploded rows that never left their document's partition
  * lineage. Hash collisions (xxhash64) can at worst drop a unique line
  * that collides with boilerplate — the standard trade every
  * hash-keyed dedup makes; swap in the full line as the key if
  * exactness beats width. */
object LineDedup {

  def dedupLines(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxOccurrences: Long = 2L): DataFrame = {
    val lines = lineRows(docs, idCol, textCol)

    val banned = lines.groupBy(col("__h")).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > maxOccurrences)
      .select(col("__h"))

    val rebuilt = lines.join(banned, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__idx"), col("__line")))),
          s => s.getField("__line")),
        "\n").as(textCol))

    // A document whose EVERY line is banned boilerplate has no
    // surviving rows and would vanish from the aggregate — surface it
    // as an empty-text row instead so downstream doc_id joins keep it.
    docs.select(col(idCol)).dropDuplicates(idCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  private def lineRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")))
      .withColumn("__h", xxhash64(col("__line")))

  /** The at-rest state table for [[dedupLinesIncremental]]: per-line-
    * hash OCCURRENCE counts of the accumulated corpus — `(h, cnt)`.
    * Build once (bucket by h), advance per increment by adding the
    * increment's own [[lineCounts]] and re-summing per hash (the same
    * increment-ADD rule as [[Jaccard.indexDfs]]). */
  def lineCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")))
      .select(xxhash64(col("__line")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))

  /** INCREMENTAL corpus-level line dedup: a NEW batch cleaned against
    * the accumulated corpus's at-rest [[lineCounts]] — bit-identical
    * to [[dedupLines]] over old ∪ new RESTRICTED to the new ids,
    * without re-reading the old corpus. The union-counting rule the
    * incremental dedup family shares: a line is banned when its
    * at-rest count PLUS its in-batch count exceeds `maxOccurrences`
    * (exactly the batch rule), and only increment-touched hashes can
    * ban a new line, so the check is an increment-keyed left join
    * against the stored counts — never a pass over the corpus.
    *
    * What this arm deliberately does NOT emit: rewrites of OLD
    * documents whose lines newly crossed the threshold (a batch rerun
    * would strip those too). [[newlyBannedLines]] surfaces the
    * hash-level delta so a consumer can schedule old-shard rewrites
    * against a (line-hash → doc) inverted index if it keeps one;
    * resolving hashes to documents here would require exactly the
    * corpus pass this arm exists to avoid. */
  def dedupLinesIncremental(
      newDocs: DataFrame,
      counts: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxOccurrences: Long = 2L): DataFrame = {
    val lines = lineRows(newDocs, idCol, textCol)
    val banned = lines.groupBy(col("__h")).agg(count(lit(1)).as("__bcnt"))
      .join(counts.toDF("__h", "__ocnt"), Seq("__h"), "left")
      .filter(col("__bcnt") + coalesce(col("__ocnt"), lit(0L)) > maxOccurrences)
      .select(col("__h"))
    val rebuilt = lines.join(banned, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__idx"), col("__line")))),
          s => s.getField("__line")),
        "\n").as(textCol))
    newDocs.select(col(idCol)).dropDuplicates(idCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  /** The hash-level at-rest delta of an increment: line hashes whose
    * total count first EXCEEDS `maxOccurrences` because of this batch
    * (at-rest ≤ max < at-rest + batch) — the lines a batch rerun would
    * now strip from OLD documents too. Increment-keyed, like the ban
    * check itself. Output: (h, cnt) with the new union count. */
  def newlyBannedLines(
      newDocs: DataFrame,
      counts: DataFrame,
      textCol: String = "text",
      maxOccurrences: Long = 2L): DataFrame =
    lineCounts(newDocs, textCol).toDF("h", "__bcnt")
      .join(counts.toDF("h", "__ocnt"), Seq("h"), "left")
      .filter(coalesce(col("__ocnt"), lit(0L)) <= maxOccurrences &&
        col("__bcnt") + coalesce(col("__ocnt"), lit(0L)) > maxOccurrences)
      .select(col("h"), (col("__bcnt") + coalesce(col("__ocnt"), lit(0L))).as("cnt"))

  /** The (line-hash → doc) inverted index that makes OLD-shard
    * rewrites increment-sized: `(h, idCol)` DISTINCT pairs. Build once
    * next to [[lineCounts]] (bucket by h — [[rewritesIncremental]]'s
    * lookup is then exchange-free); advance per increment by APPENDING
    * the increment's own index rows (disjoint ids contribute disjoint
    * pairs — no re-aggregation at all). */
  def lineIndex(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(xxhash64(col("__line")).as("h"), col(idCol))
      .distinct()

  /** The OLD-document rewrites an increment forces — the other half of
    * [[dedupLinesIncremental]]'s contract (which rewrites only the NEW
    * batch and surfaces [[newlyBannedLines]] as a hash-level delta).
    * With the [[lineIndex]] at rest, resolving that delta to documents
    * is increment-sized, not a corpus pass:
    *
    *  1. newly-banned hashes (increment-keyed, see
    *     [[newlyBannedLines]]);
    *  2. affected old docs = one semi-join of the index against the
    *     broadcast banned set — at most `maxOccurrences` old docs per
    *     newly-banned hash (its at-rest count was ≤ the cap), so the
    *     affected set is increment-BOUNDED, and broadcasting it back
    *     onto `oldDocs` (id-keyed, partition-prunable) fetches only
    *     the texts that change;
    *  3. rebuild those docs under the union ban rule (at-rest + batch
    *     counts > cap) — the at-rest counts are read through a
    *     semi-join restricted to the affected docs' own line hashes.
    *
    * Output: `(idCol, textCol)` — bit-identical to
    * `dedupLines(old ∪ new)` RESTRICTED to the old docs containing a
    * newly-banned line (every other old doc is untouched by a batch
    * rerun: union counts only grow, so a doc's rebuild changes iff one
    * of its lines crosses the cap BECAUSE of this batch). Spec-pinned
    * and oracle-replayed (`q_doc_line_dedup_rewrites`). */
  def rewritesIncremental(
      oldDocs: DataFrame,
      index: DataFrame,
      counts: DataFrame,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxOccurrences: Long = 2L): DataFrame = {
    val nb = newlyBannedLines(newDocs, counts, textCol, maxOccurrences)
      .select(col("h"))
    val affectedIds = index.join(Guards.broadcastBounded(nb), Seq("h"), "left_semi")
      .select(col(idCol)).distinct()
    val affected = oldDocs.join(Guards.broadcastBounded(affectedIds), Seq(idCol), "left_semi")
    val lines = lineRows(affected, idCol, textCol)
    // union ban rule over ONLY the affected docs' line hashes: restrict
    // the corpus-sized at-rest counts map-side, then assemble the
    // banned set from increment-bounded relations
    val touched = lines.select(col("__h")).distinct()
    val atRest = counts.toDF("__h", "__ocnt")
      .join(Guards.broadcastBounded(touched), Seq("__h"), "left_semi")
    val inBatch = lineCounts(newDocs, textCol).toDF("__h", "__bcnt")
      .join(Guards.broadcastBounded(touched), Seq("__h"), "left_semi")
    val banned = touched
      .join(Guards.broadcastBounded(atRest), Seq("__h"), "left")
      .join(Guards.broadcastBounded(inBatch), Seq("__h"), "left")
      .filter(coalesce(col("__ocnt"), lit(0L)) + coalesce(col("__bcnt"), lit(0L)) >
        maxOccurrences)
      .select(col("__h"))
    val rebuilt = lines.join(banned, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__idx"), col("__line")))),
          s => s.getField("__line")),
        "\n").as(textCol))
    affectedIds
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }
}
