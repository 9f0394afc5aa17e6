package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding quantization: symmetric per-vector int8 codes, the
  * standard 4× memory cut before ANN index build or shipping vectors
  * to a serving tier.
  *
  * `code_i = floor(v_i · 127 / amax)` with `amax = max_i |v_i|`.
  * Every step is chosen for cross-engine bit-determinism, so the
  * oracle can replay codes exactly: float32 → float64 widening is
  * exact; `v · 127` is exact in a double (24 + 7 mantissa bits); the
  * single IEEE division is then identical on any engine evaluating
  * the same shape; and `floor` has no round-half tie to disagree on.
  * The all-zero vector quantizes to all-zero codes.
  *
  * Scale shape: row-local `transform` over the vector column — no
  * shuffle, stays in the scan stage; codes plus one double per vector
  * replace the float payload.
  */
object Quantize {

  /** Output: idCol, amax (double, exact), codes (array<int> in
    * [-127, 127]). */
  def int8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("amax",
        array_max(transform(col("__v"), x => abs(x.cast("double")))))
      .withColumn("codes",
        when(col("amax") > 0d,
          transform(col("__v"),
            x => floor(x.cast("double") * lit(127.0) / col("amax")).cast("int")))
          .otherwise(transform(col("__v"), _ => lit(0))))
      .drop("__v")
}
