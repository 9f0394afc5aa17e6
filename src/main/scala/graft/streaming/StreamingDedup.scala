package graft.streaming

import graft.llm.TextHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming document deduplication — the continuous-ingest form of the
  * batch dedup family ([[graft.llm.TextStats.exactDupClusters]] /
  * [[graft.llm.MinHash]]).
  *
  * A training-data ingest stream cannot hold every fingerprint it has
  * ever seen: state must be bounded. `dropDuplicatesWithinWatermark`
  * keyed on the content fingerprint keeps exactly the state the
  * watermark requires (fingerprints seen within the lateness horizon)
  * and drops duplicates arriving inside it — the standard design for
  * at-scale streaming dedup, where an upstream batch job (the
  * MinHash/LSH family here) handles cross-horizon duplicates.
  *
  * The fingerprint is the same engine-neutral [[TextHash.polyHash]] the
  * batch operators key on, so batch and stream agree on what counts as
  * a duplicate.
  */
object StreamingDedup {

  /** Content fingerprint used as the dedup key. */
  def fingerprint(text: Column): Column = TextHash.polyHash(lower(text))

  /** Exact-dedup a document stream: emits the first arrival of each
    * fingerprint, drops later copies within the watermark horizon.
    *
    * @param docs    streaming DataFrame with `textCol` and `tsCol`
    *                (micros-since-epoch event time)
    * @param horizon watermark delay, e.g. "10 minutes" — bounds state
    */
  def exactDedupStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__event_time", timestamp_micros(col(tsCol)))
      .withColumn("__fp", fingerprint(col(textCol)))
      .withWatermark("__event_time", horizon)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__event_time", "__fp")
}
