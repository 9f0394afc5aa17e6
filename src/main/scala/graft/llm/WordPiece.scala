package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Wu et al. 2016, "Google's Neural Machine
  * Translation System"; the BERT-family tokenizer) — the third classic
  * subword scheme next to [[Bpe]] (merge rules) and [[Unigram]]
  * (max-likelihood DP): GREEDY longest-match-first against a
  * position-aware vocabulary where continuation pieces carry the `##`
  * prefix, and a word with any unmatchable position becomes a single
  * `[UNK]`.
  *
  * Vocabulary training is the frequency form: every substring of every
  * distinct word (weighted by word count) is a candidate, keyed by its
  * POSITION CLASS — word-initial substrings train start pieces, others
  * train `##` continuation pieces. All single-character pieces of both
  * classes are kept unconditionally (the same-corpus coverage
  * guarantee: a word's first character always trains its start piece,
  * later characters their continuation piece — so greedy matching
  * can never dead-end on the training corpus), plus the top `topMulti`
  * multi-character pieces by (count desc, display-form asc) — a
  * distributed TakeOrdered, never a global sort.
  *
  * Scale shape mirrors [[Unigram]]: training shuffles once on the
  * (class, core) piece key over the DISTINCT-word table (unique-words-
  * sized, not corpus-sized); segmentation is a partition-local
  * memoized kernel over the exploded words with the bounded vocabulary
  * broadcast — no shuffle beyond the source partitioning. The greedy
  * scan is inherently sequential per word (same category as the BPE
  * merge loop), and everything around it is relational.
  *
  * Every step — substring weights, the coverage/top-V split, the
  * longest-match choice — is integer/string algebra, so the DuckDB
  * oracle (`q_doc_wordpiece`) replays training AND the greedy scan
  * exactly (a recursive CTE advancing one piece per step with a
  * LATERAL longest-match probe).
  */
object WordPiece {

  val Unk = "[UNK]"

  /** Trained vocabulary: (cont 0/1, core, piece, cnt) where `piece` is
    * the display form (`##`-prefixed iff cont=1). */
  def vocab(
      docs: DataFrame,
      textCol: String,
      topMulti: Int = 48,
      maxLen: Int = 4): DataFrame = {
    val wc = docs
      .select(explode(Shingles.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
    val subs = wc
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("wcnt"), col("s"),
        explode(sequence(lit(1),
          least(lit(maxLen), length(col("word")) - col("s") + 1))).as("l"))
      .select(when(col("s") > 1, lit(1)).otherwise(lit(0)).as("cont"),
        expr("substr(word, s, l)").as("core"), col("wcnt"))
    val pc = subs.groupBy(col("cont"), col("core"))
      .agg(sum(col("wcnt")).as("cnt"))
      .withColumn("piece",
        when(col("cont") === 1, concat(lit("##"), col("core")))
          .otherwise(col("core")))
    val singles = pc.filter(length(col("core")) === 1)
    val multis = pc.filter(length(col("core")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(topMulti)
    singles.unionByName(multis)
      .select(col("cont"), col("core"), col("piece"), col("cnt"))
  }

  /** Greedy longest-match-first split of one word; any unmatchable
    * position collapses the WHOLE word to `[UNK]` (the WordPiece
    * contract — cannot occur when training and segmentation share a
    * corpus). */
  def segmentWord(
      word: String,
      voc: Set[(Boolean, String)],
      maxLen: Int): IndexedSeq[String] = {
    val n = word.length
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < n) {
      val cont = pos > 0
      var len = math.min(maxLen, n - pos)
      var hit = -1
      while (len >= 1 && hit < 0) {
        if (voc((cont, word.substring(pos, pos + len)))) hit = len
        else len -= 1
      }
      if (hit < 0) return Vector(Unk)
      val core = word.substring(pos, pos + hit)
      out += (if (cont) "##" + core else core)
      pos += hit
    }
    out.result()
  }

  /** Segment every word of the corpus against a vocabulary trained on
    * the corpus itself. Output: (doc_id, word_idx, piece_idx, piece) —
    * the [[Bpe.segments]] shape, so downstream packing/counting is
    * interchangeable. */
  def segments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topMulti: Int = 48,
      maxLen: Int = 4,
      memoCap: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // bounded by construction: single-char coverage + topMulti pieces
    val voc = vocab(docs, textCol, topMulti, maxLen)
      .select(col("cont"), col("core"))
      .collect().map(r => (r.getInt(0) == 1, r.getString(1))).toSet
    val vocB = spark.sparkContext.broadcast(voc)
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(Shingles.tokens(col(textCol))).as(Seq("word_idx", "word")))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val v = vocB.value
        val memo = scala.collection.mutable.HashMap.empty[String, IndexedSeq[String]]
        it.flatMap { case (d, w, word) =>
          val pieces = memo.getOrElse(word, {
            val p = segmentWord(word, v, maxLen)
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
