package graft.api

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // long English-ish docs pass the quality gate; 1/2 near-identical;
  // 4 is junk (repeated token -> low distinct ratio)
  private val base = "the quick brown fox jumps over the lazy dog while many other " +
    "animals watch from the forest edge and the birds sing in the morning light"
  private def docs = Seq(
    (1L, base),
    (2L, base + " today"),
    (3L, "a completely different long document about the weather patterns over " +
      "the northern mountains where the snow falls early and the rivers freeze"),
    (4L, Seq.fill(40)("spam").mkString(" "))).toDF("doc_id", "text")

  test("score adds stats; gate drops junk; dedup keeps one of the near-identical pair") {
    val scored = CurationPipeline.score(docs)
    assert(scored.columns.toSet.intersect(Set("n_tokens", "lang_guess", "quality")).size === 3)

    val gated = CurationPipeline.gate(scored, minQuality = 0.5)
    val gatedIds = gated.select("doc_id").as[Long].collect().toSet
    assert(gatedIds.contains(1L) && gatedIds.contains(3L))
    assert(!gatedIds.contains(4L)) // repeated-token spam gated out

    val pairs = CurationPipeline.nearDuplicatePairs(gated, threshold = 0.5)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet === Set((1L, 2L)))

    val kept = CurationPipeline.dedup(gated, pairs)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds.contains(1L) && !keptIds.contains(2L) && keptIds.contains(3L))
  }

  test("scoring stages: perplexity, importance weights, retrieval over the same corpus") {
    val ppl = CurationPipeline.perplexityScore(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every multi-token doc gets a score; the all-"spam" doc is the
    // single most predictable sequence in the corpus
    assert(ppl.keySet === Set(1L, 2L, 3L, 4L))
    assert(ppl(4L) === ppl.values.min)

    // target slice is doc_id % 17 == 3: empty here -> uniform target
    // model; weights still defined for every doc
    val w = CurationPipeline.importanceWeights(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L))

    val hits = CurationPipeline.retrieve(docs, Seq("fox", "weather"), 2)
      .select("doc_id").as[Long].collect().toSet
    assert(hits.subsetOf(Set(1L, 2L, 3L)) && hits.size === 2)
  }

  test("urlHygiene dedups canonical URLs then caps hosts") {
    val rows = Seq(
      (1L, "a " * 20, "http://big.com/page?utm_source=s"),
      (2L, "b " * 20, "HTTP://big.com:80/page"), // same canonical as 1
      (3L, "c " * 20, "http://big.com/other1"),
      (4L, "d " * 20, "http://big.com/other2"),
      (5L, "e " * 20, "https://small.com/x"))
      .toDF("doc_id", "text", "url")
    val kept = CurationPipeline.urlHygiene(rows, maxPerHost = 2)
      .select("doc_id").as[Long].collect().toSet
    // doc 2 loses the URL dedup to doc 1; the cap then keeps the 2
    // smallest-ids on big.com (1, 3) and small.com survives whole
    assert(kept === Set(1L, 3L, 5L))
  }

  test("repetitionGate drops the doc that fails the Table-A1 thresholds") {
    val rep = (("ab cd " * 30).trim + "\n" + ("ab cd " * 30).trim)
    val ok = (1 to 60).map(i => s"w$i").mkString(" ")
    val kept = CurationPipeline.repetitionGate(
      Seq((1L, rep), (2L, ok)).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
  }

  test("run end-to-end emits chunks only for surviving docs") {
    val out = CurationPipeline.run(docs, minQuality = 0.5, dupThreshold = 0.5,
      chunkSize = 16, chunkStride = 12)
    val byDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet === Set(1L, 3L))
    assert(byDoc(1L) >= 2) // ~26 tokens / stride 12 -> 3 chunks
  }
}
