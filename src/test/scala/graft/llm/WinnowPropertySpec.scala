package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing guarantee (Schleimer et al. 2003, §2): any shared
  * substring of length >= k + w - 1 produces at least one shared
  * fingerprint. Checked with planted shared substrings inside seeded
  * random noise, evaluated through the actual Spark pipeline (all
  * cases batched into one job). */
class WinnowPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val rng = new scala.util.Random(101L)
  private def word(n: Int): String =
    Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString

  test("shared substring of length >= k+w-1 implies a shared fingerprint (40 seeded cases)") {
    import spark.implicits._
    val guard = Winnow.K + Winnow.W - 1
    val cases = (0 until 40).map { c =>
      val core = word(guard)
      (c, word(rng.nextInt(30)) + core + word(rng.nextInt(30)),
          word(rng.nextInt(30)) + core + word(rng.nextInt(30)))
    }
    val docs = cases.flatMap { case (c, d1, d2) =>
      Seq((c.toLong * 2, d1), (c.toLong * 2 + 1, d2))
    }.toDF("doc_id", "text")
    val m = Winnow.fingerprintTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    cases.foreach { case (c, d1, d2) =>
      val shared = m.getOrElse(c.toLong * 2, Set.empty) & m.getOrElse(c.toLong * 2 + 1, Set.empty)
      assert(shared.nonEmpty, s"case $c: no shared fingerprint for '$d1' vs '$d2'")
    }
  }

  test("fingerprints are a subset of the document's own k-gram hashes (10 seeded cases)") {
    import spark.implicits._
    val texts = (0 until 10).map(i => (i.toLong, word(20 + rng.nextInt(80))))
    val docs = texts.toDF("doc_id", "text")
    val m = Winnow.fingerprintTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    texts.foreach { case (i, t) =>
      val grams = (0 to t.length - Winnow.K)
        .map(j => graft.functions.PolyHash.hash(t.substring(j, j + Winnow.K))).toSet
      assert(m.getOrElse(i, Set.empty).subsetOf(grams), s"doc $i")
    }
  }
}
