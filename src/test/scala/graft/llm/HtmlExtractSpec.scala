package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule checks of the pinned HTML extractor on hand-written
  * pages (the oracle exercises the composed template; these pin each
  * rule in isolation). */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(html: String): (String, String, Double) = {
    val r = HtmlExtract.extract(Seq((1L, html)).toDF("id", "html"), "html")
      .select("title", "text", "link_density").collect().head
    (r.getString(0), r.getString(1), r.getDouble(2))
  }

  test("script/style in the body are dropped; block tags break lines") {
    val (_, text, _) = run(
      "<body><p>one</p><script>var a = '<p>not text</p>';</script>" +
        "<style>.x { color: red }</style><h2>two</h2><div>three</div></body>")
    assert(text === "one\ntwo\nthree")
  }

  test("head block (and its title) never leaks into the text; title is its own column") {
    val (title, text, _) = run(
      "<html><head><title>My &quot;Page&quot;</title></head><body>hello</body></html>")
    assert(title === "My \"Page\"")
    assert(text === "hello")
  }

  test("entity order: &amp;lt; decodes to the literal string '&lt;'") {
    val (_, text, _) = run("<body>a &amp;lt; b &lt; c &amp; d &nbsp;e</body>")
    assert(text === "a &lt; b < c & d e")
  }

  test("br variants and blank-line collapse") {
    val (_, text, _) = run("<body>x<br>y<BR/>z<br  />   <p>  </p>w</body>")
    assert(text === "x\ny\nz\nw")
  }

  test("link density counts anchor text (inner tags stripped) over total") {
    val (_, text, ld) = run(
      "<body><a href='/'><b>Home</b> page</a> and some other words here</body>")
    // anchor text: "Home page" = 9 chars (link_density is rounded to 6dp)
    assert(math.abs(ld - 9.0 / text.length) < 1e-6)
    assert(ld > 0.0 && ld < 1.0)
  }

  test("a page with no title and no anchors: empty title, zero density") {
    val (title, text, ld) = run("<body><p>just text</p></body>")
    assert(title === "" && text === "just text" && ld === 0.0)
  }

  test("numeric entities decode in the 32..255 window, dec and hex") {
    val (_, text, _) = run("<body>caf&#233; A=&#65; lt=&#x3C; pound=&#xa3;</body>")
    assert(text === "café A=A lt=< pound=£")
  }

  test("numeric entities outside 32..255 (or malformed) stay verbatim") {
    val (_, text, _) = run(
      "<body>big &#1000000; ctrl &#7; nosemi &#60x emoji &#x1F600; ok &#60;</body>")
    assert(text === "big &#1000000; ctrl &#7; nosemi &#60x emoji &#x1F600; ok <")
  }

  test("entity order: &amp;#60; decodes to the literal string '&#60;'") {
    val (_, text, _) = run("<body>a &amp;#60; b &#38;c</body>")
    // &#38; (the numeric ampersand) decodes in the numeric pass; the
    // &amp; pass runs LAST and single-pass, so no re-decoding cascade
    assert(text === "a &#60; b &c")
  }

  test("numeric ampersands never cascade: &#38;amp; is the literal '&amp;'") {
    // the numeric pass emits a sentinel for codepoint 38, released to
    // '&' only AFTER the &amp; pass — so its output is never re-decoded
    val (_, text, _) = run("<body>x &#38;amp; y &#x26;lt; z &#38; w</body>")
    assert(text === "x &amp; y &lt; z & w")
  }

  test("numeric entities decode inside titles and anchor accounting") {
    val (title, _, ld) = run(
      "<html><head><title>caf&#233;</title></head>" +
        "<body><a href='/'>go&#233;s</a> plus other text</body></html>")
    assert(title === "café")
    // anchor text "goés" = 4 chars after decode (5 undecoded would differ)
    val (_, text2, _) = run(
      "<html><head><title>x</title></head>" +
        "<body><a href='/'>go&#233;s</a> plus other text</body></html>")
    assert(math.abs(ld - 4.0 / text2.length) < 1e-6)
  }

  test("anchor-shaped strings inside dropped blocks don't count as link chars") {
    val (_, text, ld) = run(
      "<body><script>var s = \"<a href='/x'>CLICK HERE NOW</a>\";</script>" +
        "<p>real words only</p></body>")
    assert(text === "real words only")
    assert(ld === 0.0)
  }

  test("link density is clamped to 1.0 on all-anchor markup") {
    val (_, _, ld) = run("<body><a href='/'>one</a> <a href='/'>two</a></body>")
    assert(ld <= 1.0)
  }

  test("sentinel codepoints U+0002/U+0003 are stripped, never forgeable") {
    val (_, text, _) = run("<body>a\u0002#65;\u0003b &#65;</body>")
    assert(text === "a#65;b A")
  }
}
