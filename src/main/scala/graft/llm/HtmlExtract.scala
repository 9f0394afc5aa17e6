package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step a web-crawl pipeline runs before
  * ANY text operator in this library sees a byte (C4 used a rule
  * extractor of exactly this family; trafilatura/jusText are the
  * richer descendants). A deterministic, pinned-rule extractor — not
  * a browser: the rules below ARE the contract, chosen so the whole
  * pipeline is a shuffle-free chain of codegen'd `regexp_replace`
  * column expressions that rides the scan at any corpus size.
  *
  * Pinned rules, applied in order:
  *   1. drop the entire `<head>…</head>` block (its `<title>` is
  *      surfaced as its own column, not body text), then
  *      `<script>…</script>`, `<style>…</style>` blocks and
  *      `<!-- … -->` comments ((?is): case-insensitive, dot-all);
  *   2. closing block tags (`</p> </div> </h1..6> </li> </tr>`) and
  *      `<br>` variants become newlines (text keeps its paragraph
  *      structure);
  *   3. every remaining tag is stripped;
  *   4. a pinned entity set decodes: `&lt; &gt; &quot; &#39; &apos;
  *      &nbsp;` then `&amp;` LAST (so `&amp;lt;` decodes to the
  *      literal `&lt;`, not `<`);
  *   5. runs of spaces/tabs collapse to one space, lines are trimmed,
  *      empty lines drop.
  *
  * Alongside the text: the `<title>`, and the classic boilerplate
  * signal `link_density` — the fraction of extracted characters that
  * lived inside `<a>` anchors (navigation-heavy pages score high;
  * gate on it like the quality rules).
  */
object HtmlExtract {

  private def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
    val base = steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
    regexp_replace(base, java.util.regex.Pattern.quote("&amp;"), "&")
  }

  private def stripAndNormalize(c: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "(?is)<head[^>]*>.*?</head>", " "),
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val blocksToNewlines = regexp_replace(noBlocks,
      "(?i)</(p|div|h[1-6]|li|tr)>|<br\\s*/?>", "\n")
    val noTags = regexp_replace(blocksToNewlines, "(?s)<[^>]*>", " ")
    val decoded = decodeEntities(noTags)
    val collapsed = regexp_replace(decoded, "[ \\t]+", " ")
    array_join(filter(transform(split(collapsed, "\n"), l => trim(l)),
      l => l =!= ""), "\n")
  }

  /** Adds `text` (the extracted body), `title`, and `link_density`
    * (round 6) to the input. A pure projection — zero shuffles; the
    * regex chain is whole-stage-codegen'd column algebra. */
  def extract(df: DataFrame, htmlCol: String): DataFrame = {
    val html = col(htmlCol)
    val title = trim(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))
    val text = stripAndNormalize(html)
    // anchor texts: inner tags stripped, entities decoded, chars summed
    val anchors = regexp_extract_all(html, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))
    val anchorChars = aggregate(anchors, lit(0L), (acc, a) =>
      acc + length(trim(regexp_replace(
        decodeEntities(regexp_replace(a, "(?s)<[^>]*>", " ")), "[ \\t]+", " "))))
    df.withColumn("title", title)
      .withColumn("text", text)
      .withColumn("link_density",
        round((anchorChars.cast("double") /
          greatest(length(text), lit(1)).cast("double")).cast("decimal(20,9)"), 6)
          .cast("double"))
  }
}
