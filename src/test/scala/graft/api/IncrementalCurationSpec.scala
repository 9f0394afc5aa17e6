package graft.api

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the composed daily-increment journey against the batch
  * pipeline: one step over a monotone-id batch equals
  * [[CurationPipeline]] over old ∪ new restricted to new ids, the
  * advanced state equals the state rebuilt from the union, and two
  * chained steps equal one big batch.
  *
  * State tables are materialized between steps (localCheckpoint) —
  * exactly what production does by persisting them as the at-rest
  * parquet artifacts; chaining raw lazy plans instead would carry the
  * whole history into every downstream plan. */
class IncrementalCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  // 300 docs keep the minhash pipelines test-sized while still
  // producing a non-trivial near-dup graph at threshold 0.05
  private def docs = graft.core.Tables.documents(spark, sf)
    .filter(col("doc_id") < 300)

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).as[Long].collect().toSet

  private def atRest(s: IncrementalCuration.State): IncrementalCuration.State =
    IncrementalCuration.State(s.shingleIndex.localCheckpoint(), s.labels.localCheckpoint())

  private def atRestUrl(s: IncrementalCuration.UrlState): IncrementalCuration.UrlState =
    IncrementalCuration.UrlState(s.seenUrls.localCheckpoint(), s.hostCounts.localCheckpoint())

  private def batchSurvivors(all: DataFrame, dupThreshold: Double): DataFrame = {
    val gated = CurationPipeline.gate(CurationPipeline.score(all), 0.5)
    CurationPipeline.dedup(gated,
      CurationPipeline.nearDuplicatePairs(gated, threshold = dupThreshold))
  }

  test("chained steps compose: two increments equal one big batch, state included") {
    val threshold = 0.05
    val d0 = docs.filter(col("doc_id") < 150)
    val d1 = docs.filter(col("doc_id") >= 150 && col("doc_id") < 220)
    val d2 = docs.filter(col("doc_id") >= 220)
    val (_, s1) = IncrementalCuration.step(
      d1, atRest(IncrementalCuration.stateOf(d0, dupThreshold = threshold)),
      dupThreshold = threshold)
    val (survivors2, s2) = IncrementalCuration.step(d2, atRest(s1),
      dupThreshold = threshold)
    val batch = batchSurvivors(docs, threshold).filter(col("doc_id") >= 220)
    assert(ids(survivors2) === ids(batch))
    // the fixture must exercise drops on the new side
    assert(ids(survivors2).size < d2.count(),
      "some new doc must lose to an accumulated near-duplicate")
    // advanced state equals the union-built state
    val unionState = IncrementalCuration.stateOf(docs, dupThreshold = threshold)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(s2.labels) === rows(unionState.labels))
    assert(rows(s2.shingleIndex) === rows(unionState.shingleIndex))
  }

  test("url hygiene step equals the batch composition restricted to new ids") {
    def withUrl(df: DataFrame) =
      df.select(col("doc_id"),
        when(col("doc_id") % 13 === 0, lit("no scheme here"))
          .otherwise(concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
            lit(".example.com/p/"), (col("doc_id") % 50).cast("string"))).as("url"))
    val cap = 15
    val (survivors, next) = IncrementalCuration.urlHygieneStep(
      withUrl(docs.filter(col("doc_id") >= 200)),
      atRestUrl(IncrementalCuration.urlStateOf(withUrl(docs.filter(col("doc_id") < 200)))),
      maxPerHost = cap)
    val batch = CurationPipeline.urlHygiene(withUrl(docs), maxPerHost = cap)
      .filter(col("doc_id") >= 200)
    assert(ids(survivors) === ids(batch))
    // the advanced state equals the union-built state
    val unionState = IncrementalCuration.urlStateOf(withUrl(docs))
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(next.seenUrls) === rows(unionState.seenUrls))
    assert(rows(next.hostCounts) === rows(unionState.hostCounts))
  }
}
