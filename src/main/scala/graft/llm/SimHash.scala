package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprints (Charikar 2002): each token hash votes
  * ±1 per bit position; the sign of each bit's vote sum becomes one bit
  * of the fingerprint. Near-duplicates land within a small Hamming
  * distance of each other.
  *
  * Pure column algebra over the token array — one pass per document,
  * no shuffle at all for fingerprint computation (the operator is
  * embarrassingly parallel; only a downstream Hamming-join shuffles,
  * typically on rotated-prefix keys).
  */
object SimHash {

  /** Number of fingerprint bits. Token hashes live in [0, 1e9+7) —
    * ~30 usable bits; 16 keeps the oracle SQL tractable while
    * preserving the locality property. */
  val Bits: Int = 16

  /** SimHash of a text column. */
  def simhash(text: Column, hash: Column => Column = TextHash.polyHash): Column = {
    val hashes = transform(Shingles.tokens(text), t => hash(t))
    def bitVote(b: Int): Column =
      aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
    (0 until Bits)
      .map(b => when(bitVote(b) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** DuckDB SQL computing exactly [[simhash]] over token hashes
    * `hashesExpr` (a BIGINT list expression). */
  def simhashSql(hashesExpr: String): String =
    (0 until Bits).map { b =>
      s"(CASE WHEN list_sum(list_transform($hashesExpr, " +
        s"h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
