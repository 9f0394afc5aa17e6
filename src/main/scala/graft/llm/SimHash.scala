package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** SimHash over a MATERIALIZED token-hash array column. Use this form
    * in pipelines: each of the [[Bits]] bit-vote aggregates evaluates
    * its input array expression, so an embedded tokenize+hash subtree
    * would run [[Bits]] times per row. */
  def simhashOfHashes(hashes: Column): Column = {
    def bitVote(b: Int): Column =
      aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
    (0 until Bits)
      .map(b => when(bitVote(b) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** SimHash of a text column (single-Column convenience form). */
  def simhash(text: Column, hash: Column => Column = TextHash.polyHash): Column =
    simhashOfHashes(transform(Shingles.tokens(text), t => hash(t)))

  /** One row per (id, simhash), with the token-hash array materialized
    * in its own projection. */
  def fingerprintTable(docs: DataFrame, idCol: String, textCol: String,
      hash: Column => Column = TextHash.polyHash): DataFrame =
    docs.select(col(idCol), transform(Shingles.tokens(col(textCol)), t => hash(t)).as("__h"))
      .select(col(idCol), simhashOfHashes(col("__h")).as("simhash"))

  /** DuckDB SQL computing exactly [[simhash]] over token hashes
    * `hashesExpr` (a BIGINT list expression). */
  def simhashSql(hashesExpr: String): String =
    (0 until Bits).map { b =>
      s"(CASE WHEN list_sum(list_transform($hashesExpr, " +
        s"h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Band count/width for [[nearDuplicates]] candidate generation:
    * 4 bands of 4 bits. By pigeonhole, any pair within Hamming
    * distance Bands-1 (= 3) shares at least one untouched band, so
    * band-collision candidate generation is EXACT for maxHamming <= 3,
    * never just heuristic. */
  val Bands: Int = 4
  val BandBits: Int = Bits / Bands

  /** Near-duplicate pairs (id_a < id_b) within `maxHamming` bits.
    * Candidates come from a self-equi-join on (band, band-value) — the
    * shuffle key is the 4-bit band slice, never an all-pairs product;
    * verification is an exact popcount on the XOR. Scale shape matches
    * [[MinHash.candidatePairs]]: per-bucket cost is bounded by the
    * band-value collision count (2^BandBits buckets per band). */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = Bands - 1,
      hash: Column => Column = TextHash.polyHash): DataFrame = {
    require(maxHamming <= Bands - 1,
      s"band collision candidates are exact only for maxHamming <= ${Bands - 1}")
    val fp = fingerprintTable(docs, idCol, textCol, hash)
    val l = bandRows(fp, idCol).toDF("id_a", "band", "key", "sim_a")
    val r = bandRows(fp, idCol).toDF("id_b", "band", "key", "sim_b")
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** The (id, band, 4-bit slice, simhash) relation both the batch and
    * incremental candidate joins shuffle on. */
  private def bandRows(fp: DataFrame, idCol: String): DataFrame =
    (0 until Bands).map { b =>
      fp.select(col(idCol), lit(b).as("band"),
        shiftright(col("simhash"), b * BandBits).bitwiseAND(lit((1L << BandBits) - 1)).as("key"),
        col("simhash"))
    }.reduce(_ unionByName _)

  /** INCREMENTAL SimHash near-dup: a NEW batch against the AT-REST
    * fingerprint table of the accumulated corpus — the
    * [[MinHash.nearDuplicatesIncremental]] shape for this family (a
    * simhash table IS its own at-rest index: one BIGINT per doc).
    * Bit-identical to [[nearDuplicates]] over old ∪ new restricted to
    * pairs involving ≥ 1 new doc, WITHOUT the old×old candidate join
    * (band collision is pairwise, so the restriction identity is
    * exact). `index` must be a [[fingerprintTable]] of the old corpus
    * — (id, simhash), id column first — ids disjoint from the batch's.
    * Scale shape: the new side is increment-sized everywhere; the
    * at-rest side pays one scan into the (band, key) join, and only
    * buckets an increment key lands in materialize. */
  def nearDuplicatesIncremental(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      maxHamming: Int = Bands - 1,
      hash: Column => Column = TextHash.polyHash): DataFrame = {
    require(maxHamming <= Bands - 1,
      s"band collision candidates are exact only for maxHamming <= ${Bands - 1}")
    val bN = bandRows(fingerprintTable(newDocs, idCol, textCol, hash), idCol)
    val bO = bandRows(index.toDF(idCol, "simhash"), idCol)
    val newOld = bN.toDF("id_n", "band", "key", "sim_n")
      .join(bO.toDF("id_o", "band", "key", "sim_o"), Seq("band", "key"))
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"),
        bit_count(col("sim_n").bitwiseXOR(col("sim_o"))).cast("long").as("hamming"))
    val newNew = bN.toDF("id_a", "band", "key", "sim_a")
      .join(bN.toDF("id_b", "band", "key", "sim_b"), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
    newOld.unionByName(newNew).distinct().filter(col("hamming") <= maxHamming)
  }
}
