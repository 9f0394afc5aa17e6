package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Johnson-Lindenstrauss dimensionality reduction by a DETERMINISTIC
  * sign random projection (Achlioptas 2003, "Database-friendly random
  * projections"): y_j = (1/√k)·Σ_i s(i,j)·v_i with s(i,j) ∈ {±1}
  * drawn from a hash of the coordinate pair — the standard cheap
  * preprocessing step before LSH/ANN when the native dimension is
  * large (JL: pairwise distances are preserved to 1±ε at
  * k = O(ln n / ε²) output dims, independent of the input dimension).
  *
  * The "random" matrix is never materialized anywhere: s(i,j) is the
  * parity of the first hex character of md5("i_j"), recomputed on
  * demand — identical on every executor, across runs, and in the
  * DuckDB oracle (`q_emb_jl_project`), with no broadcast state at
  * all. Scale shape: one posexplode to (vec, i, v) rows, a bounded
  * ×k fan-out, and ONE (vec, j)-keyed partial-aggregable groupBy —
  * map-side combine collapses the fan-out to k cells per vector
  * before the shuffle; nothing driver-side.
  *
  * Per-cell products are DECIMAL(20,9)-rounded before the sum, so the
  * projection is merge-order-free and bit-replayable.
  */
object RandomProjection {

  private val dec = DecimalType(20, 9)

  /** ±1 from the coordinate-pair hash: parity of the first hex char
    * of md5(i_j). */
  def sign(i: Column, j: Column): Column =
    when(ascii(substring(md5(concat_ws("_", i, j)), 1, 1)) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** DuckDB mirror of [[sign]]. */
  def signSql(i: String, j: String): String =
    s"CASE WHEN ascii(substr(md5($i || '_' || $j), 1, 1)) % 2 = 0 " +
      s"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END"

  /** [[sign]] evaluated eagerly (JDK md5 — bit-identical to Spark's
    * and DuckDB's): used to pre-build the d×k sign matrix as a plan
    * LITERAL, so the hot path does an array lookup per cell instead
    * of an md5 (measured 20× on the soak — the md5-per-cell form ran
    * 2M digests for 2k×64×16). */
  private def signAt(i: Long, j: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
      .take(1).map(b => f"$b%02x").mkString
    if (hex.charAt(0).toInt % 2 == 0) 1.0 else -1.0
  }

  /** Projects every vector to `k` output dims; `dim` is the input
    * dimension (bounds the pre-built sign matrix — input coordinates
    * beyond it would need the on-demand [[sign]] form).
    * Output: (vec_id, j, value) — value = round(y_j, 6). */
  def project(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int = 64): DataFrame = {
    val scale = lit(1.0 / math.sqrt(k.toDouble))
    // the "matrix" is still a pure function of (i, j) — this literal
    // is just its memoized first d×k window, identical to sign()
    val signs = typedLit((0L until dim).map(i => (0L until k).map(j => signAt(i, j))))
    // fail fast instead of silently dropping coordinates: element_at
    // past the literal's end is null under non-ANSI SQL, so an input
    // vector longer than `dim` would quietly lose its tail from the
    // projection — raise the bound (the sign matrix is 8·dim·k bytes)
    // or pre-truncate explicitly. Guard as a FILTER (assert_true is
    // null on success, so no row is dropped) — a projected-then-
    // dropped assert column would be pruned before it ever evaluated
    emb.filter(assert_true(size(col(vecCol)) <= dim,
        lit(s"random projection: input vector longer than dim=$dim — " +
          "raise `dim` or truncate the vectors first")).isNull)
      .select(col(idCol).cast("long").as("vec_id"),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        col("v").cast("double").as("v"))
      .withColumn("j", explode(sequence(lit(0L), lit(k - 1L))))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum((element_at(element_at(signs, (col("i") + 1).cast("int")),
          (col("j") + 1).cast("int")) * col("v")).cast(dec)).as("__s"))
      .select(col("vec_id"), col("j"),
        round((col("__s").cast("double") * scale).cast(dec), 6)
          .cast("double").as("value"))
  }
}
