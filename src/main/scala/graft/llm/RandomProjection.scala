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

  /** Projects every vector to `k` output dims.
    * Output: (vec_id, j, value) — value = round(y_j, 6). */
  def project(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val scale = lit(1.0 / math.sqrt(k.toDouble))
    emb.select(col(idCol).cast("long").as("vec_id"),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        col("v").cast("double").as("v"))
      .withColumn("j", explode(sequence(lit(0L), lit(k - 1L))))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum((sign(col("i"), col("j")) * col("v")).cast(dec)).as("__s"))
      .select(col("vec_id"), col("j"),
        round((col("__s").cast("double") * scale).cast(dec), 6)
          .cast("double").as("value"))
  }
}
