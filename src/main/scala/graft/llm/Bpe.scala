package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding tokenization against a merge-rank table —
  * the GPT-2 `bpe()` scheduling exactly: repeatedly find the
  * lowest-rank adjacent symbol pair present in the word and merge ALL
  * its non-overlapping occurrences left to right, until no pair in
  * the table remains. (The BPE-ish regex in [[TextStats]] stays as
  * the cheap counter; this is the faithful segmentation.)
  *
  * Per-word merging is inherently sequential — the same category as
  * the Hungarian assignment and the hysteresis fold — so the kernel
  * runs as a partition-local `mapPartitions` with the rank table
  * broadcast once and a per-partition word→pieces memo (real BPE
  * implementations memoize the same way; natural-language corpora
  * repeat words heavily). Everything around the kernel is relational:
  * tokenize, posexplode, then the flatMap. No shuffle beyond the
  * source partitioning.
  *
  * The merge table is data, not code: pass any `(a, b)` rank list —
  * e.g. one imported from a trained tokenizer's merges file.
  * [[DefaultMerges]] is a small multi-level English table used by the
  * oracle query, which replays the exact scheduling in SQL
  * (`replace()` on a double-separator symbol string IS left-to-right
  * non-overlapping merge-all; a LATERAL min-rank probe picks the next
  * merge; recursion ends when no pattern matches).
  */
object Bpe {

  /** Small multi-level merge table (rank = position). Shared verbatim
    * with the DuckDB oracle via [[mergesSql]]. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e", "h" -> "e",
    "a" -> "t", "o" -> "r", "e" -> "n", "a" -> "l", "e" -> "s",
    "s" -> "t", "t" -> "o", "i" -> "t", "o" -> "f", "e" -> "d",
    "i" -> "s", "a" -> "r", "o" -> "u", "l" -> "e", "c" -> "o",
    "the" -> "r", "w" -> "h", "wh" -> "e", "l" -> "l", "o" -> "o",
    "u" -> "n", "q" -> "u")

  /** `(rank, 'a', 'b'), …` VALUES rows for the oracle SQL. */
  def mergesSql(merges: Seq[(String, String)] = DefaultMerges): String =
    merges.zipWithIndex
      .map { case ((a, b), r) => s"($r, '$a', '$b')" }.mkString(", ")

  /** Load a trained tokenizer's merges file (GPT-2 `merges.txt`
    * layout: one "a b" pair per line in rank order, `#`-prefixed
    * header lines skipped). The table is driver-side by design — it
    * is bounded (≤ ~100k lines for real tokenizers) and becomes the
    * broadcast the kernel reads. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] =
    spark.read.textFile(path).collect().toSeq
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val p = l.split(" ", 2)
        require(p.length == 2 && p(1).nonEmpty, s"malformed merges line: '$l'")
        (p(0), p(1))
      }

  /** Canonical greedy BPE of one word (code-point symbols). */
  def encodeWord(word: String, rank: Map[(String, String), Int]): IndexedSeq[String] = {
    var syms: Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestA = ""; var bestB = ""
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestA = syms(i); bestB = syms(i + 1) }
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            out += bestA + bestB; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** LEARN a merge table from the corpus — the training side of BPE:
    * each iteration counts adjacent symbol pairs corpus-wide (one
    * partial-agg shuffle on the pair key over the per-word vocabulary,
    * NOT the raw corpus — words dedup to a (word, count) table first,
    * exactly how reference BPE trainers work), picks the most frequent
    * pair (ties broken lexicographically, so learning is
    * deterministic), and merges it everywhere.
    *
    * The per-iteration state (the word vocabulary with symbol lists
    * and counts) is localCheckpoint-ed so N iterations do not stack N
    * plans. At 100 TB you learn from a sampled vocabulary ([[Mixer]]
    * is the sampler); the vocab table after the initial groupBy is
    * unique-words-sized, not corpus-sized, so iterations are cheap
    * regardless of corpus scale. */
  def learn(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(Shingles.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      // split keeps the trailing "" the end-of-string lookahead match
      // produces (Spark split is limit -1, unlike Java's) — drop it
      .select(filter(split(col("word"), "(?!^)"), s => length(s) > lit(0)).as("syms"),
        col("cnt"))
      .as[(Seq[String], Long)]
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = vocab.flatMap { case (syms, cnt) =>
          syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, cnt))
        }.toDF("a", "b", "cnt")
        .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).as[(String, String, Long)]
        .collect()
      top.headOption.filter(_._3 >= minCount) match {
        case None => exhausted = true
        case Some((a, b, _)) =>
          merges += ((a, b))
          val prev = vocab
          vocab = prev.map { case (syms, cnt) =>
            val out = Seq.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += a + b; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), cnt)
          }.localCheckpoint()
          prev.unpersist()
          i += 1
      }
    }
    merges.result()
  }

  /** BPE segmentation of every whitespace token of every document.
    * Output: doc_id, word_idx, piece_idx, piece. */
  def segments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)] = DefaultMerges,
      memoCap: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(Shingles.tokens(col(textCol))).as(Seq("word_idx", "word")))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val rk = ranksB.value
        // bounded memo: corpora repeat words heavily; the cap keeps
        // executor memory flat on adversarial unique-word streams
        val memo = scala.collection.mutable.HashMap.empty[String, IndexedSeq[String]]
        it.flatMap { case (d, w, word) =>
          val pieces =
            memo.getOrElse(word, {
              val p = encodeWord(word, rk)
              if (memo.size < memoCap) memo.update(word, p)
              p
            })
          pieces.iterator.zipWithIndex.map { case (p, i) =>
            (d, w.toLong, i.toLong, p)
          }
        }
      }
      .toDF("doc_id", "word_idx", "piece_idx", "piece")
  }
}
