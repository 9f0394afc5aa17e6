package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the batch-restriction identities of the round-13 incremental
  * crawl-hygiene family: each operator run against its at-rest index
  * must equal the full batch run over old ∪ new restricted to the new
  * batch — old×old work structurally absent. */
class IncrementalCrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, sf)
  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("simhash incremental equals the batch run restricted to new-doc pairs") {
    val isNew = col("doc_id") % 5 === 0
    val inc = SimHash.nearDuplicatesIncremental(
      docs.filter(isNew), "doc_id", "text",
      SimHash.fingerprintTable(docs.filter(!isNew), "doc_id", "text"),
      maxHamming = 3)
    val batch = SimHash.nearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
    assert(rowsOf(inc) === rowsOf(batch))
    assert(inc.count() > 0, "fixture must produce pairs or the identity is vacuous")
  }

  test("winnow incremental equals the batch run restricted to new-doc pairs") {
    val isNew = col("doc_id") % 5 === 0
    val inc = Winnow.nearDuplicatesIncremental(
      docs.filter(isNew), "doc_id", "text",
      Winnow.fingerprintTable(docs.filter(!isNew), "doc_id", "text"),
      minShared = 5, maxDf = 10)
    val batch = Winnow.nearDuplicates(docs, "doc_id", "text", minShared = 5, maxDf = 10)
      .filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
    assert(rowsOf(inc) === rowsOf(batch))
    assert(inc.count() > 0, "fixture must produce pairs or the identity is vacuous")
    // the at-rest df side-table changes the shape, not the answer —
    // the increment-keyed guard must drop the same over-cap fps the
    // union count does (maxDf = 10 provably bites on this corpus);
    // and its increment-ADD maintenance equals the union bootstrap
    val index = Winnow.fingerprintTable(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text")
    val dfs = Winnow.indexDfs(index)
    val incSide = Winnow.nearDuplicatesIncremental(
      docs.filter(isNew), "doc_id", "text", index,
      minShared = 5, maxDf = 10, dfs = Some(dfs))
    assert(rowsOf(incSide) === rowsOf(batch))
    val newIdx = Winnow.fingerprintTable(docs.filter(isNew), "doc_id", "text")
    val advanced = dfs.unionByName(Winnow.indexDfs(newIdx))
      .groupBy(col("fp")).agg(sum(col("df")).as("df"))
    assert(rowsOf(advanced) ===
      rowsOf(Winnow.indexDfs(Winnow.fingerprintTable(docs, "doc_id", "text"))))
  }

  test("jaccard incremental equals the batch run restricted to new-doc pairs") {
    val isNew = col("doc_id") % 5 === 0
    val index = MinHash.shingleIndex(docs.filter(!isNew), "doc_id", "text", n = 3)
    val inc = Jaccard.nearDuplicatesIncremental(
      docs.filter(isNew), "doc_id", "text", index,
      n = 3, threshold = 0.1, maxDf = 50)
    val batch = Jaccard.nearDuplicates(docs, "doc_id", "text",
      n = 3, threshold = 0.1, maxDf = 50)
      .filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
    assert(rowsOf(inc) === rowsOf(batch))
    assert(inc.count() > 0, "fixture must produce pairs or the identity is vacuous")
    // the at-rest df/size side-tables change the shape, not the answer
    val incSide = Jaccard.nearDuplicatesIncremental(
      docs.filter(isNew), "doc_id", "text", index,
      n = 3, threshold = 0.1, maxDf = 50,
      sideTables = Some((Jaccard.indexDfs(index), Jaccard.indexSizes(index, "doc_id"))))
    assert(rowsOf(incSide) === rowsOf(batch))
  }

  test("exact-dedup incremental: batch-restricted rows, correct old-aware sizes") {
    val isNew = col("doc_id") % 5 === 0
    val index = TextStats.exactDupIndex(docs.filter(!isNew), "doc_id", "text")
    val inc = TextStats.exactDupClustersIncremental(
      docs.filter(isNew), "doc_id", "text", index)
    val batch = TextStats.exactDupClusters(docs, "doc_id", "text")
      .filter(col("doc_id") % 5 === 0)
    assert(rowsOf(inc) === rowsOf(batch))
    // the index delta upserted into the at-rest index equals the
    // union's index (untouched fps keep their old rows)
    val delta = TextStats.exactDupIndexDelta(docs.filter(isNew), "doc_id", "text", index)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val oldIdx = index.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val unionIdx = TextStats.exactDupIndex(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(oldIdx ++ delta === unionIdx)
  }

  test("exact-dedup delta: a smaller new id takes over an at-rest cluster's canonical") {
    val old = Seq((10L, "same text"), (12L, "other")).toDF("doc_id", "text")
    val nw = Seq((3L, "same text"), (20L, "same text")).toDF("doc_id", "text")
    val index = TextStats.exactDupIndex(old, "doc_id", "text")
    val inc = TextStats.exactDupClustersIncremental(nw, "doc_id", "text", index)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(inc(3L) === ((3L, 3L)))  // canonical moves to the new min; size = old 1 + new 2
    assert(inc(20L) === ((3L, 3L)))
  }

  test("url dedup incremental equals the batch run restricted to new ids (monotone crawl)") {
    def withUrl(df: DataFrame) =
      df.select(col("doc_id"), concat(lit("https://h"),
        (col("doc_id") % 37).cast("string"), lit(".example.com/p")).as("url"))
    val inc = Urls.dedupByUrlIncremental(
      withUrl(docs.filter(col("doc_id") >= 400)), "doc_id", "url",
      Urls.seenUrls(withUrl(docs.filter(col("doc_id") < 400)), "url"))
      .select(col("doc_id"), col("canonical_url"))
    val batch = Urls.dedupByUrl(withUrl(docs), "doc_id", "url")
      .filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("canonical_url"))
    assert(rowsOf(inc) === rowsOf(batch))
    // with 37 hosts over 0..499, every URL is already seen: no survivors
    assert(inc.count() === 0)
    // and a genuinely-new URL in the batch survives exactly once
    val inc2 = Urls.dedupByUrlIncremental(
      Seq((500L, "https://brand.new/x"), (501L, "https://brand.new/x"))
        .toDF("doc_id", "url"), "doc_id", "url",
      Urls.seenUrls(withUrl(docs.filter(col("doc_id") < 400)), "url"))
    assert(inc2.select(col("doc_id")).as[Long].collect().toSeq === Seq(500L))
  }

  test("host cap incremental equals the batch run restricted to new ids") {
    def withUrl(df: DataFrame) =
      df.select(col("doc_id"),
        when(col("doc_id") % 11 === 0, lit("not a url")) // null-host rows pass through
          .otherwise(concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string"))).as("url"))
    val cap = 40 // 500 docs / 7 hosts ≈ 65 per host: old fills some hosts past cap
    val inc = Urls.hostCapIncremental(
      withUrl(docs.filter(col("doc_id") >= 400)), "doc_id", "url", cap,
      Urls.hostSeenCounts(withUrl(docs.filter(col("doc_id") < 400)), "url"))
      .select(col("doc_id"), col("host"), col("canonical_url"))
    val batch = Urls.hostCap(withUrl(docs), "doc_id", "url", cap)
      .filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("host"), col("canonical_url"))
    assert(rowsOf(inc) === rowsOf(batch))
    // the fixture must exercise all three host classes
    val got = inc.collect()
    assert(got.exists(_.isNullAt(1)), "null-host rows must pass through")
    assert(got.length < docs.filter(col("doc_id") >= 400).count(),
      "some over-headroom host must have dropped rows")
  }

  test("host cap incremental: zero-headroom hosts drop the whole batch contribution") {
    val counts = Seq(("full.example.com", 10L)).toDF("host", "n_seen")
    val nw = Seq((100L, "https://full.example.com/a"), (101L, "https://fresh.example.com/b"))
      .toDF("doc_id", "url")
    val got = Urls.hostCapIncremental(nw, "doc_id", "url", maxPerHost = 10, counts)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(got === Seq(101L))
  }
}
