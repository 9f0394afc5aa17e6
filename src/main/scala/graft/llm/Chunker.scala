package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training-data preparation: split each
  * document's token stream into fixed-size windows with a stride
  * (overlap = size − stride), the standard context-window packing step
  * before tokenization/training.
  *
  * Pure row-local algebra — tokenize, explode the chunk starts, slice.
  * No shuffle at all: chunks are emitted where the document row lives,
  * and the explode fan-out is bounded by ⌈len/stride⌉. The token array
  * is materialized in its own projection before any lambda consumes it
  * (interpreted-HOF re-evaluation trap — see [[Winnow]]).
  *
  * Chunk starts are 1, 1+stride, … ≤ n_tokens, so every token lands in
  * at least one chunk and the final chunk may be short (the common
  * sliding-window convention).
  */
object Chunker {

  def chunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      size: Int = 64,
      stride: Int = 48): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    docs
      .select(col(idCol), Shingles.tokens(col(textCol)).as("__toks"))
      .filter(org.apache.spark.sql.functions.size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1),
          org.apache.spark.sql.functions.size(col("__toks")), lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        org.apache.spark.sql.functions.size(
          slice(col("__toks"), col("__start"), lit(size))).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(size))).as("chunk_text"))
  }
}
