package graft.api

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the composed daily-increment journey against the batch
  * pipeline: one step over a disjoint-id batch equals
  * [[CurationPipeline]] over old ∪ new restricted to new ids, the
  * ACCUMULATED survivor chain (step survivors minus later
  * revocations) equals the batch survivor set, the advanced state
  * equals the state rebuilt from the union, and the watermark guard
  * fails a backfill batch fast.
  *
  * State tables are materialized between steps (localCheckpoint) —
  * exactly what production does by persisting them as the at-rest
  * parquet artifacts; chaining raw lazy plans instead would carry the
  * whole history into every downstream plan. */
@graft.SlowTest
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
    IncrementalCuration.State(s.shingleIndex.localCheckpoint(),
      s.labels.localCheckpoint(), s.maxId.map(_.localCheckpoint()),
      s.bands.map(bi => graft.llm.MinHash.BandIndex(
        bi.bandKeys.localCheckpoint(),
        bi.bucketCounts.localCheckpoint(),
        bi.sizes.localCheckpoint())))

  private def atRestJ(s: IncrementalCuration.JaccardState): IncrementalCuration.JaccardState =
    IncrementalCuration.JaccardState(s.shingleIndex.localCheckpoint(),
      s.dfs.localCheckpoint(), s.sizes.localCheckpoint(),
      s.labels.localCheckpoint(), s.maxId.map(_.localCheckpoint()))

  private def atRestUrl(s: IncrementalCuration.UrlState): IncrementalCuration.UrlState =
    IncrementalCuration.UrlState(s.seenUrls.localCheckpoint(),
      s.hostCounts.localCheckpoint(), s.maxId.map(_.localCheckpoint()))

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
    val (s1v, r1, s1) = IncrementalCuration.step(
      d1, atRest(IncrementalCuration.stateOf(d0, dupThreshold = threshold)),
      dupThreshold = threshold)
    val acc1 = (ids(batchSurvivors(d0, threshold)) ++ ids(s1v)) -- ids(r1)
    val (s2v, r2, s2) = IncrementalCuration.step(d2, atRest(s1),
      dupThreshold = threshold)
    val batch = batchSurvivors(docs, threshold).filter(col("doc_id") >= 220)
    assert(ids(s2v) === ids(batch))
    // the fixture must exercise drops on the new side
    assert(ids(s2v).size < d2.count(),
      "some new doc must lose to an accumulated near-duplicate")
    // the CONSUMER identity: accumulated survivors (bootstrap batch +
    // step survivors − revocations) equal the one-big-batch set —
    // without subtracting revoked, a bridged old canonical would
    // linger in the accumulated set
    val accumulated = (acc1 ++ ids(s2v)) -- ids(r2)
    assert(accumulated === ids(batchSurvivors(docs, threshold)))
    // advanced state equals the union-built state — including the
    // increment-ADDED banded-LSH side-tables (stateOf carries them by
    // default, so this chain ran the side-table serve path throughout)
    val unionState = IncrementalCuration.stateOf(docs, dupThreshold = threshold)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(s2.labels) === rows(unionState.labels))
    assert(rows(s2.shingleIndex) === rows(unionState.shingleIndex))
    assert(rows(s2.maxId.get) === rows(unionState.maxId.get))
    assert(s2.bands.isDefined, "stateOf must carry the band side-tables")
    assert(rows(s2.bands.get.bandKeys) === rows(unionState.bands.get.bandKeys))
    assert(rows(s2.bands.get.bucketCounts) === rows(unionState.bands.get.bucketCounts))
    assert(rows(s2.bands.get.sizes) === rows(unionState.bands.get.sizes))
  }

  test("jaccard-flavor chained steps compose, side-tables advancing by increment-add") {
    val threshold = 0.05
    val d0 = docs.filter(col("doc_id") < 150)
    val d1 = docs.filter(col("doc_id") >= 150 && col("doc_id") < 220)
    val d2 = docs.filter(col("doc_id") >= 220)
    def batchJ(all: DataFrame): DataFrame = {
      val gated = CurationPipeline.gate(CurationPipeline.score(all), 0.5)
      CurationPipeline.dedup(gated,
        graft.llm.Jaccard.nearDuplicates(gated, "doc_id", "text", threshold = threshold))
    }
    val (s1v, r1, s1) = IncrementalCuration.stepJaccard(
      d1, atRestJ(IncrementalCuration.jaccardStateOf(d0, jaccardThreshold = threshold)),
      jaccardThreshold = threshold)
    val (s2v, r2, s2) = IncrementalCuration.stepJaccard(d2, atRestJ(s1),
      jaccardThreshold = threshold)
    assert(ids(s2v) === ids(batchJ(docs).filter(col("doc_id") >= 220)))
    assert(ids(s2v).size < d2.count(),
      "some new doc must lose to an accumulated near-duplicate")
    val accumulated =
      (((ids(batchJ(d0)) ++ ids(s1v)) -- ids(r1)) ++ ids(s2v)) -- ids(r2)
    assert(accumulated === ids(batchJ(docs)))
    // advanced state equals the union-built state — including the
    // increment-ADDED df/size side-tables
    val unionState = IncrementalCuration.jaccardStateOf(docs, jaccardThreshold = threshold)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(s2.labels) === rows(unionState.labels))
    assert(rows(s2.shingleIndex) === rows(unionState.shingleIndex))
    assert(rows(s2.dfs) === rows(unionState.dfs))
    assert(rows(s2.sizes) === rows(unionState.sizes))
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
    assert(rows(next.maxId.get) === rows(unionState.maxId.get))
  }

  test("watermark guard: a backfill batch raises instead of returning wrong survivors") {
    def withUrl(df: DataFrame) =
      df.select(col("doc_id"),
        concat(lit("https://h.example.com/p/"),
          col("doc_id").cast("string")).as("url"))
    val state = atRestUrl(IncrementalCuration.urlStateOf(
      withUrl(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))))
    // a batch whose ids sit BELOW the at-rest watermark (a backfill)
    val backfill = withUrl(docs.filter(col("doc_id") < 100))
    val (survivors, _) = IncrementalCuration.urlHygieneStep(backfill, state)
    val e = intercept[Exception] { survivors.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("monotone-id contract violated")),
      s"unexpected error: $e")
    // the dedup step guards too — it raises during step() itself
    // (GraphX's Pregel evaluates the guarded pair subtree eagerly),
    // so the whole call sits inside the intercept
    val dState = atRest(IncrementalCuration.stateOf(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)))
    val e2 = intercept[Exception] {
      val (sv, _, _) = IncrementalCuration.step(docs.filter(col("doc_id") < 100), dState)
      sv.collect()
    }
    assert(msgs(e2).exists(_.contains("monotone-id contract violated")),
      s"unexpected error: $e2")
    // and a clean monotone batch still passes through the guard
    val (ok, _) = IncrementalCuration.urlHygieneStep(
      withUrl(docs.filter(col("doc_id") >= 200 && col("doc_id") < 230)), state)
    assert(ok.count() > 0)
  }

  test("line-dedup step: cleaned batch + old rewrites chain to the batch corpus") {
    import graft.llm.LineDedup
    // the oracle's salt shape: a footer line shared by EVERY doc
    // (banned at bootstrap), a 3-doc group line whose groups straddle
    // the batch boundaries (newly banned as members arrive -> old
    // rewrites), and a unique line (never banned)
    val salted = graft.core.Tables.documents(spark, sf).select(col("doc_id"),
      concat(col("text"), lit("\nSHARED BOILERPLATE FOOTER\ngrp "),
        expr("doc_id div 3"), lit("\nunique "), col("doc_id")).as("text"))
    // split points must not be multiples of 3, or no grp group
    // straddles the boundary and the steps stop forcing rewrites
    val d0 = salted.filter(col("doc_id") < 100)
    val b1 = salted.filter(col("doc_id") >= 100 && col("doc_id") < 181)
    val b2 = salted.filter(col("doc_id") >= 181)
    def texts(df: DataFrame): Map[Long, String] =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def atRestL(s: IncrementalCuration.LineState) =
      IncrementalCuration.LineState(
        s.counts.localCheckpoint(), s.index.localCheckpoint())
    // the published corpus: bootstrap clean, then per step the new
    // batch's cleaned rows plus the forced old rewrites REPLACE stale
    // entries — at every boundary it must equal the batch clean over
    // everything seen so far
    val s0 = atRestL(IncrementalCuration.lineStateOf(d0))
    var published = texts(LineDedup.dedupLines(d0))
    val (c1, r1, s1) = IncrementalCuration.lineDedupStep(b1, d0, s0)
    assert(texts(r1).nonEmpty, "step 1 must force old rewrites")
    published = published ++ texts(c1) ++ texts(r1)
    assert(published === texts(LineDedup.dedupLines(d0.unionByName(b1))))
    val (c2, r2, s2) = IncrementalCuration.lineDedupStep(
      b2, d0.unionByName(b1), atRestL(s1))
    assert(texts(r2).nonEmpty, "step 2 must force old rewrites")
    published = published ++ texts(c2) ++ texts(r2)
    assert(published === texts(LineDedup.dedupLines(salted)))
    // state advance equals the union-built state, row for row
    val unionState = IncrementalCuration.lineStateOf(salted)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(s2.counts) === rows(unionState.counts))
    assert(rows(s2.index) === rows(unionState.index))
  }
}
