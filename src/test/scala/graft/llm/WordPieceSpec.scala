package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece greedy tokenization. Cross-engine value parity is pinned
  * by the `q_doc_wordpiece{,_vocab}` oracles; these specs pin the
  * kernel's contract directly: longest-match-first, ## position
  * classing, same-corpus coverage (no [UNK]), and lossless
  * reassembly.
  */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("segmentWord is greedy longest-match with ## continuations") {
    val voc = Set(
      (false, "un"), (false, "u"), (false, "r"),
      (true, "believ"), (true, "able"), (true, "b"), (true, "e"),
      (true, "l"), (true, "i"), (true, "v"), (true, "a"), (true, "n"))
    assert(WordPiece.segmentWord("unbelievable", voc, maxLen = 6) ===
      Vector("un", "##believ", "##able"))
    // greedy ≠ optimal: takes the longest prefix even when a shorter
    // one would allow fewer pieces later
    val voc2 = Set((false, "ab"), (false, "a"), (true, "bc"), (true, "b"), (true, "c"))
    assert(WordPiece.segmentWord("abc", voc2, maxLen = 2) ===
      Vector("ab", "##c"))
  }

  test("unmatchable position collapses the whole word to [UNK]") {
    val voc = Set((false, "a"), (true, "b"))
    assert(WordPiece.segmentWord("axb", voc, maxLen = 4) === Vector(WordPiece.Unk))
  }

  test("same-corpus segmentation covers every word and reassembles losslessly") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quicker the better"),
      (3L, "quick brown foxes run")).toDF("doc_id", "text")
    val seg = WordPiece.segments(docs, "doc_id", "text", topMulti = 8, maxLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(seg.forall(_._4 != WordPiece.Unk), "training corpus can never dead-end")
    // pieces reassemble to the original word, ## stripped
    val rebuilt = seg.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      k -> rows.sortBy(_._3).map(_._4.stripPrefix("##")).mkString
    }
    val words = docs.as[(Long, String)].collect().flatMap { case (d, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).zipWithIndex.map {
        case (w, i) => (d, i.toLong) -> w
      }
    }.toMap
    assert(rebuilt === words)
    // only the word-initial piece of each word lacks the ## prefix
    seg.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      rows.sortBy(_._3).zipWithIndex.foreach { case (t, i) =>
        assert(t._4.startsWith("##") === (i > 0), s"piece $t at index $i")
      }
    }
  }

  test("vocabulary keeps full single-char coverage in both position classes") {
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val v = WordPiece.vocab(docs, "text", topMulti = 2, maxLen = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(v.contains((0, "a", "a")) && v.contains((0, "b", "b")))
    assert(v.contains((1, "a", "##a")) && v.contains((1, "b", "##b")))
  }
}
