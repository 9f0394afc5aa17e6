package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step a web-crawl pipeline runs before
  * ANY text operator in this library sees a byte (C4 used a rule
  * extractor of exactly this family; trafilatura/jusText are the
  * richer descendants). A deterministic, pinned-rule extractor — not
  * a browser: the rules below ARE the contract, chosen so the whole
  * pipeline is a shuffle-free chain of codegen'd column expressions
  * that rides the scan at any corpus size.
  *
  * Pinned rules, applied in order:
  *   0. the two sentinel codepoints U+0002/U+0003 are dropped from the
  *      input (they are reserved by the numeric-entity tokenizer below
  *      and have no business in text anyway);
  *   1. drop the entire `<head>…</head>` block (its `<title>` is
  *      surfaced as its own column, not body text), then
  *      `<script>…</script>`, `<style>…</style>` blocks and
  *      `<!-- … -->` comments ((?is): case-insensitive, dot-all);
  *   2. closing block tags (`</p> </div> </h1..6> </li> </tr>`) and
  *      `<br>` variants become newlines (text keeps its paragraph
  *      structure);
  *   3. every remaining tag is stripped;
  *   4. entities decode in pinned order: the named set `&lt; &gt;
  *      &quot; &#39; &apos; &nbsp;`, then NUMERIC entities `&#NNN;`
  *      (1–7 decimal digits) and `&#xHH;`/`&#XHH;` (1–6 hex digits)
  *      for codepoints 32..255 only — the ASCII+Latin-1 range both
  *      engines agree on; out-of-range or over-long codes stay
  *      verbatim — then `&amp;` LAST (so `&amp;lt;` decodes to the
  *      literal `&lt;`, not `<`, and `&amp;#60;` to the literal
  *      `&#60;`). Numeric decodes map to the raw codepoint (e.g.
  *      `&#160;` is U+00A0, not the plain space `&nbsp;` maps to).
  *      A numeric AMPERSAND (`&#38;`/`&#x26;`) decodes to a sentinel
  *      released to `&` only after the `&amp;` pass, so its output can
  *      never be re-decoded: `&#38;amp;` is the literal `&amp;` — the
  *      ampersand-last no-cascade rule is airtight for numeric codes
  *      too;
  *   5. runs of spaces/tabs collapse to one space, lines are trimmed,
  *      empty lines drop.
  *
  * Alongside the text: the `<title>` (extracted from the raw head,
  * entity-decoded), and the classic boilerplate signal `link_density`
  * — the fraction of extracted characters that lived inside `<a>`
  * anchors (navigation-heavy pages score high; gate on it like the
  * quality rules). Anchors are counted on the SAME
  * head/script/style/comment-stripped intermediate the body text is
  * extracted from — anchor-shaped strings inside scripts or dropped
  * blocks contribute nothing (they never reach the text either) — and
  * the ratio is clamped to 1.0 (per-anchor trimming can over-count a
  * boundary space in pathological all-anchor markup).
  */
object HtmlExtract {

  /** Numeric-entity tokenizer sentinels (rule 0 strips them from the
    * input so they can never be forged). */
  private val S2 = "\u0002"
  private val S3 = "\u0003"

  /** Decodes one numeric-entity code body (`233` or `xE9`/`XE9`) to
    * its character when the codepoint is in 32..255, else re-emits
    * the entity verbatim. `conv(hex, 16, 10)` mirrors DuckDB's
    * native `CAST('0x…' AS INTEGER)`. Codepoint 38 (`&`) emits the
    * [[S2]] sentinel instead of the raw ampersand — released AFTER the
    * `&amp;` pass so a numeric ampersand's output is never re-decoded
    * (`&#38;amp;` → literal `&amp;`). */
  private def decodeNumericCode(code: Column): Column = {
    val isHex = code.startsWith("x") || code.startsWith("X")
    val value = when(isHex,
      conv(code.substr(lit(2), length(code) - 1), 16, 10).cast("int"))
      .otherwise(code.cast("int"))
    when(value === 38, lit(S2))
      .when(value.between(32, 255), chr(value))
      .otherwise(concat(lit("&#"), code, lit(";")))
  }

  /** Rule-4 numeric pass: tokenize on pinned sentinels (entity code
    * bracketed S2…S3), decode each code element, reassemble. A bounded
    * split/transform chain — still shuffle-free column algebra. */
  private def decodeNumericEntities(c: Column): Column = {
    val marked = regexp_replace(c,
      "&#((?:[0-9]{1,7})|(?:[xX][0-9a-fA-F]{1,6}));", S2 + "$1" + S3)
    val decoded = array_join(transform(split(marked, S2), e =>
      when(instr(e, S3) > 0,
        concat(
          decodeNumericCode(substring_index(e, S3, 1)),
          e.substr(instr(e, S3) + 1, length(e))))
        .otherwise(e)), "")
    // most corpus text has no numeric entity at all — skip the
    // mark/split/reassemble passes unless "&#" occurs (codegen CSE
    // shares the input subtree between the probe and the branches)
    when(instr(c, "&#") > 0, decoded).otherwise(c)
  }

  private def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
    val named = steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
    val numeric = decodeNumericEntities(named)
    val amp = regexp_replace(numeric, java.util.regex.Pattern.quote("&amp;"), "&")
    // release the numeric-ampersand sentinel LAST (rule 0 strips the
    // sentinel codepoints from the input, so it cannot be forged)
    regexp_replace(amp, S2, "&")
  }

  /** Rules 0–1: sentinel strip, then head/script/style/comment block
    * removal — the shared intermediate BOTH the body text and the
    * anchor accounting start from. */
  private def stripBlocks(c: Column): Column = {
    val clean = regexp_replace(c, "[\u0002\u0003]", "")
    regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(clean, "(?is)<head[^>]*>.*?</head>", " "),
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
  }

  /** Rules 2–5 over a [[stripBlocks]] intermediate. */
  private def normalizeFrom(noBlocks: Column): Column = {
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
    * regex chain is whole-stage-codegen'd column algebra. The stripped
    * intermediate is a shared local expression referenced by both the
    * body text and the anchor accounting — Catalyst's subexpression
    * elimination evaluates the identical subtree once per row, and no
    * temporary column is added (an input that already has a column
    * named like an internal temp can no longer be clobbered). */
  def extract(df: DataFrame, htmlCol: String): DataFrame = {
    // rule 0 for the title path too (stripBlocks applies it for the
    // body): the sentinel codepoints must never reach decodeEntities
    val html = regexp_replace(col(htmlCol), "[\u0002\u0003]", "")
    val title = trim(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))
    // anchor texts from the SAME stripped intermediate as the body:
    // inner tags stripped, entities decoded, chars summed per anchor
    val stripped = stripBlocks(html)
    val anchors = regexp_extract_all(stripped,
      lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))
    val anchorChars = aggregate(anchors, lit(0L), (acc, a) =>
      acc + length(trim(regexp_replace(
        decodeEntities(regexp_replace(a, "(?s)<[^>]*>", " ")), "[ \\t]+", " "))))
    df.withColumn("title", title)
      .withColumn("text", normalizeFrom(stripped))
      .withColumn("link_density",
        least(round((anchorChars.cast("double") /
          greatest(length(col("text")), lit(1)).cast("double")).cast("decimal(20,9)"), 6)
          .cast("double"), lit(1.0)))
  }
}
