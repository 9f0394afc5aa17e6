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
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")))
      .withColumn("__h", xxhash64(col("__line")))

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
}
