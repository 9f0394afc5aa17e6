package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM language-model tokenization — the
  * other classic subword scheme next to [[Bpe]] (LLaMA-family
  * tokenizers are unigram models): a piece vocabulary with
  * log-probabilities, and per-word segmentation that picks the
  * maximum-likelihood split by Viterbi DP.
  *
  * Training here is the frequency-initialized form: piece scores are
  * corpus substring frequencies (every substring up to `maxLen` of
  * every word, weighted by word count) rather than full EM — the
  * standard initialization step of the SentencePiece trainer, which
  * is already a usable vocabulary; EM refinement only re-weights it.
  * ALL single characters are kept unconditionally (the coverage
  * guarantee), plus the top-`topMulti` multi-character pieces by
  * (count desc, piece asc) — a distributed TakeOrdered, never a
  * global sort. Log-probs are `round(ln(cnt / total), 6)` so every
  * DP comparison replays bit-identically in the DuckDB oracle.
  *
  * Segmentation maximizes Σ logp; ties prefer the LONGER final piece
  * at each DP cell (deterministic, engine-neutral). Per-word DP is
  * inherently sequential — the same category as the BPE merge loop —
  * so the kernel runs as a partition-local `mapPartitions` over the
  * exploded words with the (bounded) vocabulary broadcast and a
  * per-partition memo; everything around it is relational. Scale
  * shape: vocab training shuffles once on the piece key over the
  * DISTINCT-word table (unique-words-sized, not corpus-sized);
  * segmentation adds no shuffle beyond the source partitioning.
  */
object Unigram {

  /** Score floor for characters unseen at training time (cannot occur
    * when training and segmentation share a corpus; kept for
    * vocabulary reuse across corpora). */
  val UnkLogp: Double = -100.0

  /** Trained vocabulary: (piece, cnt, logp). */
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
      .select(expr("substr(word, s, l)").as("piece"), col("wcnt"))
    val pc = subs.groupBy(col("piece")).agg(sum(col("wcnt")).as("cnt"))
    val singles = pc.filter(length(col("piece")) === 1)
    val multis = pc.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(topMulti)
    val voc = singles.unionByName(multis)
    val tot = voc.agg(sum(col("cnt")).cast("double").as("__t"))
    voc.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__t")), 6).as("logp"))
  }

  /** Viterbi maximum-likelihood split of one word. dp(j) = best score
    * of word[0,j); candidates are vocabulary pieces ending at j, ties
    * to the longer piece. */
  def segmentWord(
      word: String,
      logp: Map[String, Double],
      maxLen: Int): IndexedSeq[String] = {
    val n = word.length
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    dp(0) = 0.0
    var j = 1
    while (j <= n) {
      var len = 1
      while (len <= math.min(maxLen, j)) {
        if (dp(j - len) != Double.NegativeInfinity) {
          logp.get(word.substring(j - len, j)).foreach { p =>
            val s = dp(j - len) + p
            if (s > dp(j) || (s == dp(j) && len > back(j))) {
              dp(j) = s; back(j) = len
            }
          }
        }
        len += 1
      }
      if (back(j) == 0) { dp(j) = dp(j - 1) + UnkLogp; back(j) = 1 } // unseen char
      j += 1
    }
    var pos = n
    val rev = Vector.newBuilder[String]
    while (pos > 0) {
      val len = back(pos)
      rev += word.substring(pos - len, pos)
      pos -= len
    }
    rev.result().reverse.toIndexedSeq
  }

  /** Segment every word of the corpus against a vocabulary trained on
    * `vocabDocs` (defaults to the corpus itself). Output:
    * (doc_id, word_idx, piece_idx, piece) — the [[Bpe.segments]]
    * shape, so downstream packing/counting is interchangeable. */
  def segments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topMulti: Int = 48,
      maxLen: Int = 4,
      memoCap: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // bounded by construction: all single chars + topMulti pieces
    val lp = vocab(docs, textCol, topMulti, maxLen)
      .select(col("piece"), col("logp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val lpB = spark.sparkContext.broadcast(lp)
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(Shingles.tokens(col(textCol))).as(Seq("word_idx", "word")))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val m = lpB.value
        val memo = scala.collection.mutable.HashMap.empty[String, IndexedSeq[String]]
        it.flatMap { case (d, w, word) =>
          val pieces = memo.getOrElse(word, {
            val p = segmentWord(word, m, maxLen)
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

  /** One hard-EM (Viterbi-EM) refinement round — the SentencePiece
    * trainer's iteration with the E-step's expected counts replaced by
    * the Viterbi path's actual counts: re-estimate every piece's
    * probability from its usage in the maximum-likelihood segmentation
    * of the corpus, prune multi-char pieces the Viterbi path never
    * uses, and keep all single chars (the coverage guarantee) at the
    * [[UnkLogp]] floor when unused.
    *
    * Scale shape: the segmentation pass is [[segments]] (shuffle-free
    * beyond the source partitioning); the M-step is ONE `groupBy` on
    * the piece key of the segmented stream — vocabulary-sized output —
    * plus a broadcast of the 1-row total. Each additional EM round
    * costs exactly one more corpus pass, nothing accumulates.
    *
    * Output: (piece, cnt, logp0, used, logp1) — training count and
    * initial score, Viterbi usage, re-estimated score. */
  def emRound(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topMulti: Int = 48,
      maxLen: Int = 4): DataFrame = {
    val voc = vocab(docs, textCol, topMulti, maxLen)
    val usage = segments(docs, idCol, textCol, topMulti, maxLen)
      .groupBy(col("piece")).agg(count(lit(1)).as("used"))
    val kept = voc.join(usage, Seq("piece"), "left")
      .select(col("piece"), col("cnt"), col("logp").as("logp0"),
        coalesce(col("used"), lit(0L)).as("used"))
      .filter(col("used") > 0 || length(col("piece")) === 1)
    val tot = kept.agg(sum(col("used")).cast("double").as("__t"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"), col("logp0"), col("used"),
        when(col("used") > 0,
          round(log(col("used").cast("double") / col("__t")), 6))
          .otherwise(lit(UnkLogp)).as("logp1"))
  }
}
