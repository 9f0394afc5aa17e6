package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: (String, String)*) =
    QualityRules.signals(rows.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getString(0) -> r).toMap

  test("signals: bullets, ellipses, duplicate lines, symbols") {
    val good = ("good", ("the quick brown fox jumps over lazy dogs and cats " * 10).trim)
    val bullets = ("bullets", "- item one\n- item two\n- item three\n* item four")
    val dups = ("dups", "same line here\nsame line here\nsame line here\nother line")
    val symbols = ("symbols", "lots ## of ### hashes # everywhere ## ...")
    val m = run(good, bullets, dups, symbols)

    assert(m("good").getAs[Boolean]("gopher_pass"))
    assert(m("good").getAs[Double]("dup_line_frac") === 0.0)
    assert(m("good").getAs[Int]("stopword_distinct") >= 2) // the, and

    assert(m("bullets").getAs[Double]("bullet_line_ratio") === 1.0)
    assert(!m("bullets").getAs[Boolean]("gopher_pass"))

    assert(math.abs(m("dups").getAs[Double]("dup_line_frac") - 0.5) < 1e-12)

    // 6 '#' chars + one '...' over 7 tokens = 1.0
    assert(math.abs(m("symbols").getAs[Double]("symbol_word_ratio") - 1.0) < 1e-12)
    assert(!m("symbols").getAs[Boolean]("gopher_pass"))
  }

  test("signals: empty docs drop; alpha ratio counts lettered tokens") {
    val out = QualityRules.signals(Seq(
      ("empty", "   "), ("nums", "1 2 3 4 abc")).toDF("doc_id", "text")).collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "nums")
    assert(math.abs(out.head.getAs[Double]("alpha_word_ratio") - 0.2) < 1e-12)
  }

  test("scrub masks URLs, e-mails, IPv4s with counts; ordering protects nested matches") {
    val df = Seq(
      ("a", "visit https://x.org/a?b=1 or www.y.com now"),
      ("b", "mail bob@corp.io and alice@ex.co from 192.168.1.7"),
      ("c", "clean text only")).toDF("doc_id", "text")
    val m = Scrub.scrub(df).collect().map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Int]("n_urls") === 2)
    assert(m("a").getAs[String]("scrubbed") === "visit <URL> or <URL> now")
    assert(m("b").getAs[Int]("n_emails") === 2 && m("b").getAs[Int]("n_ips") === 1)
    assert(m("b").getAs[String]("scrubbed") === "mail <EMAIL> and <EMAIL> from <IP>")
    assert(m("c").getAs[String]("scrubbed") === "clean text only")
    // a URL containing an e-mail-ish path is consumed by the URL pass
    val nested = Scrub.scrub(Seq(("n", "http://h.io/u@v.w rest")).toDF("doc_id", "text")).head()
    assert(nested.getAs[String]("scrubbed") === "<URL> rest")
    assert(nested.getAs[Int]("n_emails") === 0)
  }

  test("gopherGate keeps only rule-passing documents") {
    val df = Seq(
      ("pass", ("the quick brown fox jumps over lazy dogs and cats " * 10).trim),
      ("fail", "- a\n- b\n- c")).toDF("doc_id", "text")
    val kept = graft.api.CurationPipeline.gopherGate(df)
      .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(kept === Seq("pass"))
  }

  test("dedupLines removes corpus-repeated lines, keeps document order, empties all-banned docs") {
    val df = Seq(
      ("a", "keep a1\nBOILER\nkeep a2"),
      ("b", "BOILER\nkeep b1"),
      ("c", "keep c1\nBOILER"),
      ("d", "BOILER")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, maxOccurrences = 2L).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") === "keep a1\nkeep a2") // order preserved around the removed line
    assert(out("b") === "keep b1")
    assert(out("c") === "keep c1")
    assert(out("d") === "") // every line banned → doc survives as empty text
    // at the threshold (exactly maxOccurrences) lines survive
    val ok = LineDedup.dedupLines(
      Seq(("x", "twice"), ("y", "twice")).toDF("doc_id", "text"), maxOccurrences = 2L)
      .count()
    assert(ok === 2L)
  }

  test("incremental line dedup: union counting equals the batch restriction") {
    // maxOccurrences = 2 → banned iff total occurrences > 2
    val old = Seq(
      (1L, "alpha\nFOOTER"),
      (2L, "FOOTER\nbeta"),    // FOOTER ×2 at rest (not yet banned)
      (3L, "EDGE\nEDGE\nEDGE") // EDGE already over the cap at rest
    ).toDF("doc_id", "text")
    val nw = Seq(
      (10L, "FOOTER\nkeep ten"),          // FOOTER crosses ONLY via old+new
      (11L, "NEWSPAM\nNEWSPAM\nNEWSPAM"), // banned within the batch alone
      (12L, "EDGE\nkeep twelve"),         // banned via the at-rest count alone
      (13L, "FOOTER")                     // all lines banned → empty row
    ).toDF("doc_id", "text")
    val counts = LineDedup.lineCounts(old).localCheckpoint()
    val inc = LineDedup.dedupLinesIncremental(nw, counts).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inc === Map(10L -> "keep ten", 11L -> "", 12L -> "keep twelve", 13L -> ""))
    // the restriction identity against the batch run over old ∪ new
    val batch = LineDedup.dedupLines(old.unionByName(nw))
      .filter(col("doc_id") >= 10L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inc === batch)
    // hash-level delta: FOOTER and NEWSPAM newly cross; EDGE was
    // already banned at rest and must NOT reappear
    def h(line: String) = Seq(line).toDF("l")
      .select(xxhash64(col("l"))).collect().head.getLong(0)
    val newly = LineDedup.newlyBannedLines(nw, counts).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(newly === Map(h("FOOTER") -> 4L, h("NEWSPAM") -> 3L))
  }

  test("line dedup rewrites: the increment's old-doc half equals the batch restriction") {
    // maxOccurrences = 2. GRP sits in exactly two old docs (<= cap) and
    // one new doc pushes it over -> newly banned -> docs 1 and 2 are the
    // affected set. EDGE is banned AT REST (4 old occurrences) -> doc 4,
    // which holds EDGE but no newly-banned line, must NOT be rewritten;
    // doc 1's rebuild must still strip EDGE alongside GRP.
    val old = Seq(
      (1L, "alpha\nGRP\nEDGE"),
      (2L, "GRP"),                // every line newly banned -> empty row
      (3L, "EDGE\nEDGE\nEDGE"),
      (4L, "EDGE\ngamma")
    ).toDF("doc_id", "text")
    val nw = Seq(
      (10L, "GRP\nnew ten"),
      (11L, "NEWSPAM\nNEWSPAM\nNEWSPAM") // newly banned but in no old doc
    ).toDF("doc_id", "text")
    val counts = LineDedup.lineCounts(old).localCheckpoint()
    val index = LineDedup.lineIndex(old).localCheckpoint()
    val got = LineDedup.rewritesIncremental(old, index, counts, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "alpha", 2L -> ""))
    // the restriction identity: batch dedup over old ∪ new, restricted
    // to the affected old ids
    val batch = LineDedup.dedupLines(old.unionByName(nw))
      .filter(col("doc_id").isin(1L, 2L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === batch)
    // index maintenance is pure append: old index + the increment's own
    // rows equals the union-built index
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(index.unionByName(LineDedup.lineIndex(nw))) ===
      rows(LineDedup.lineIndex(old.unionByName(nw))))
  }

  test("topBigramCoverage: counts, fraction, lexicographic tie-break") {
    val df = Seq(
      ("rep", "a b a b a b c"),      // "a b" x3 of 6 bigrams, n=7
      ("tie", "x y z"),              // "x y" and "y z" once each -> smallest wins
      ("short", "solo")).toDF("doc_id", "text")
    val m = QualityRules.topBigramCoverage(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!m.contains("short")) // <2 tokens
    assert(m("rep").getAs[String]("top_bigram") === "a b")
    assert(m("rep").getAs[Long]("top_bigram_count") === 3L)
    assert(math.abs(m("rep").getAs[Double]("top_bigram_frac") - 6.0 / 7.0) < 1e-12)
    assert(m("tie").getAs[String]("top_bigram") === "x y")
  }

  test("repetitionSignals: hand-computed fractions on a tiny corpus") {
    // doc "r": 12 tokens of 2 chars (24 token chars), duplicated line,
    // one paragraph. Bigrams: "ab cd" x4 ties "cd ab" x4 -> lexicographic
    // winner "ab cd", chars 4*4=16. Duplicate trigrams "ab cd ab" (x4) and
    // "cd ab cd" (x2) cover token positions {1-5, 8-12} = 10 of 12 -> 20 chars.
    val r = "ab cd ab cd ab\nzz qq\nab cd ab cd ab"
    // doc "c": 12 unique tokens, no repetition anywhere; top bigram
    // count 1 -> 4/24 = 1/6 <= 0.20 threshold -> rep_pass.
    val c = "aa bb cc dd ee ff gg hh ii jj kk ll"
    val out = QualityRules.repetitionSignals(
      Seq(("r", r), ("c", c), ("empty", "  \n ")).toDF("doc_id", "text"),
      topNs = Seq(2), dupNs = Seq(3))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(out.keySet === Set("r", "c")) // token-less doc drops

    val d = out("r")
    assert(math.abs(d.getAs[Double]("dup_line_frac") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(d.getAs[Double]("dup_line_char_frac") - 28.0 / 33.0) < 1e-12)
    assert(d.getAs[Double]("dup_para_frac") === 0.0)
    assert(d.getAs[Double]("dup_para_char_frac") === 0.0)
    assert(math.abs(d.getAs[Double]("top_2gram_char_frac") - 16.0 / 24.0) < 1e-12)
    assert(math.abs(d.getAs[Double]("dup_3gram_char_frac") - 20.0 / 24.0) < 1e-12)
    assert(!d.getAs[Boolean]("rep_pass"))

    val e = out("c")
    assert(e.getAs[Double]("dup_line_frac") === 0.0)
    assert(math.abs(e.getAs[Double]("top_2gram_char_frac") - 4.0 / 24.0) < 1e-12)
    assert(e.getAs[Double]("dup_3gram_char_frac") === 0.0)
    assert(e.getAs[Boolean]("rep_pass"))
  }

  test("c4Clean: line rules, blocklist docs, and the min-lines gate") {
    val good = Seq(
      "here is a first proper sentence today.",
      "tiny.", // < 5 words
      "please enable JavaScript to continue browsing now.", // javascript
      "does this second question have enough words?",
      "line with no terminal punctuation at all",
      "and a third full sentence closes the page.").mkString("\n")
    val blocked = good + "\nplus some Lorem Ipsum filler here."
    val thin = "only one good sentence lives in here.\nshort.\nnope"
    val out = QualityRules.c4Clean(Seq(
      (1L, good), (2L, blocked), (3L, thin)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(1L)) // 2 blocklisted, 3 under min lines
    val (text, kept, dropped) = out(1L)
    assert(kept === 3L && dropped === 3L)
    assert(text === Seq(
      "here is a first proper sentence today.",
      "does this second question have enough words?",
      "and a third full sentence closes the page.").mkString("\n"))
  }

  test("repetitionSignals: default ns emit the full Gopher Table-A1 matrix") {
    val doc = ("d", ("one two three four five six seven eight nine ten " * 3).trim)
    val row = QualityRules.repetitionSignals(Seq(doc).toDF("doc_id", "text"))
      .collect().head
    val cols = row.schema.fieldNames.toSet
    val expected = Set("doc_id", "dup_line_frac", "dup_line_char_frac",
      "dup_para_frac", "dup_para_char_frac", "rep_pass") ++
      Seq(2, 3, 4).map(n => s"top_${n}gram_char_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac")
    assert(cols === expected)
    // the tripled body duplicates every n-gram family up to n=10
    (5 to 10).foreach { n =>
      assert(row.getAs[Double](s"dup_${n}gram_char_frac") > 0.5,
        s"tripled text must have heavy dup-$n-gram coverage")
    }
    assert(!row.getAs[Boolean]("rep_pass"))
  }
}
