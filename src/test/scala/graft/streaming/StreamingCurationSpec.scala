package graft.streaming

import graft.SparkTestSession
import graft.api.{CurationPipeline, IncrementalCuration}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch parity for the streaming curation journey: a document stream
  * split across arbitrary micro-batches must leave the
  * [[StreamingCuration.CurationStore]] holding EXACTLY the survivors
  * (and state) one batch [[CurationPipeline]] run over every document
  * ever seen would produce — including a trigger whose near-duplicate
  * BRIDGES two at-rest components and so RETRACTS a previously-emitted
  * survivor (the case a survivors-only accumulator gets wrong).
  *
  * The bridge is manufactured: two synthetic old docs with disjoint
  * vocabulary (separate singleton components, both bootstrap
  * survivors) and a later stream doc spliced from half of each — a
  * near-dup of BOTH, merging them under the smaller id and revoking
  * the larger. minQuality = 0 keeps the gate out of the fixture's way
  * (the quality path is pinned by CurationPipelineSpec). */
@graft.SlowTest
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val threshold = 0.05

  // A splice bridge must band-collide (4×3 over the 12 fixed MinHash
  // perms) with BOTH parents while the parents don't collide with each
  // other — at ~0.5 Jaccard per side that's a property of the specific
  // shingle hashes, not of similarity alone, so the texts were found by
  // deterministic search over seeded word sequences (stopwords
  // interleaved so language ID stays confident). The collisions are
  // fixed by the library's pinned hash constants; the spec would fail
  // loudly if they ever drifted.
  private val t1 = "with w12x812 with w12x133 in w12x211 in w12x15 in " +
    "w12x221 a w12x872 the w12x507 in w12x764 in w12x31 and w12x803 a " +
    "w12x682 a w12x717 and w12x238 in w12x658 in w12x277"
  private val t2 = "with w13x100 in w13x998 with w13x710 of w13x213 of " +
    "w13x114 the w13x316 to w13x155 of w13x154 and w13x769 of w13x24 in " +
    "w13x478 in w13x869 and w13x937 of w13x282 of w13x355"
  // first 22 words of t1 + t2 from word 4: a banded near-dup of both
  private val bridge =
    (t1.split(" ").take(22) ++ t2.split(" ").drop(4)).mkString(" ")

  private def real(lo: Long, hi: Long) =
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)

  private def synth(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def ids(df: DataFrame): Set[Long] = {
    import spark.implicits._
    df.select(col("doc_id")).as[Long].collect().toSet
  }

  private def batchSurvivors(all: DataFrame): DataFrame = {
    val gated = CurationPipeline.gate(CurationPipeline.score(all), 0.0)
    CurationPipeline.dedup(gated,
      CurationPipeline.nearDuplicatePairs(gated, threshold = threshold))
  }

  test("micro-batched doc stream equals one batch pipeline, retractions included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, String, String, Long)]
    val d0 = real(0, 60).unionByName(synth(Seq(100L -> t1, 101L -> t2)))
    val stream = source.toDF().toDF(d0.columns: _*)

    // bootstrap from a prior batch run — the production shape
    val store = new StreamingCuration.CurationStore(
      IncrementalCuration.stateOf(d0, minQuality = 0.0, dupThreshold = threshold),
      batchSurvivors(d0))
    val bootIds = ids(store.survivors)
    assert(bootIds.contains(100L) && bootIds.contains(101L),
      "both synthetic singletons must survive the bootstrap")
    val q = StreamingCuration.attach(stream, store,
      minQuality = 0.0, dupThreshold = threshold,
      queryName = "curation_journey_spec")
    try {
      def docRows(df: DataFrame) =
        df.as[(Long, String, String, String, Long)].collect().toIndexedSeq
      val batches = Seq(
        real(110, 160),
        real(161, 200).unionByName(synth(Seq(210L -> bridge))))
      var seen = d0
      batches.foreach { b =>
        source.addData(docRows(b))
        q.processAllAvailable()
        seen = seen.unionByName(b)
        assert(ids(store.survivors) === ids(batchSurvivors(seen)))
      }
      // the bridge doc merged {100} and {101}: 101 was emitted by the
      // bootstrap and must now be RETRACTED, 210 loses to the merged
      // component's canonical, 100 stays
      val fin = ids(store.survivors)
      assert(fin.contains(100L) && !fin.contains(101L) && !fin.contains(210L),
        s"bridge retraction missing: $fin")
      // an empty trigger leaves the store untouched
      q.processAllAvailable()
      assert(ids(store.survivors) === fin)
      // the advanced state equals the union-built state
      val unionState = IncrementalCuration.stateOf(
        seen, minQuality = 0.0, dupThreshold = threshold)
      def rowSet(df: DataFrame) = df.collect().map(_.toSeq).toSet
      assert(rowSet(store.state.labels) === rowSet(unionState.labels))
      assert(rowSet(store.state.shingleIndex) === rowSet(unionState.shingleIndex))
      assert(rowSet(store.state.maxId.get) === rowSet(unionState.maxId.get))
    } finally q.stop()
  }

  test("full journey with URL hygiene: dup urls and an over-cap host cross batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cap = 25
    // every %10==7 doc shares ONE canonical url (first crawl wins —
    // later duplicates must drop even when they arrive in a later
    // trigger); every other %3==0 doc sits on a single hot host that
    // crosses the cap mid-stream (earliest fill first); the rest get
    // unique urls and pass through
    def withUrl(df: DataFrame) = df.withColumn("url",
      when(col("doc_id") % 10 === 7, lit("https://dup.example.com/same"))
        .when(col("doc_id") % 3 === 0,
          concat(lit("https://hot.example.com/p/"), col("doc_id")))
        .otherwise(concat(lit("https://h"), col("doc_id"),
          lit(".example.com/p/"), col("doc_id"))))
    def batchFull(all: DataFrame): DataFrame = {
      val hyg = CurationPipeline.urlHygiene(all, maxPerHost = cap)
      val gated = CurationPipeline.gate(CurationPipeline.score(hyg), 0.0)
      CurationPipeline.dedup(gated,
        CurationPipeline.nearDuplicatePairs(gated, threshold = threshold))
    }
    val d0 = withUrl(real(0, 60))
    val source = MemoryStream[(Long, String, String, String, Long, String)]
    val stream = source.toDF().toDF(d0.columns: _*)
    val store = new StreamingCuration.CurationStore(
      IncrementalCuration.stateOf(
        CurationPipeline.urlHygiene(d0, maxPerHost = cap),
        minQuality = 0.0, dupThreshold = threshold),
      batchFull(d0),
      Some(IncrementalCuration.urlStateOf(d0)))
    val q = StreamingCuration.attach(stream, store,
      minQuality = 0.0, dupThreshold = threshold, maxPerHost = cap,
      queryName = "curation_full_journey_spec")
    try {
      def docRows(df: DataFrame) =
        df.as[(Long, String, String, String, Long, String)].collect().toIndexedSeq
      var seen = d0
      Seq(withUrl(real(110, 160)), withUrl(real(161, 200))).foreach { b =>
        source.addData(docRows(b))
        q.processAllAvailable()
        seen = seen.unionByName(b)
        assert(ids(store.survivors) === ids(batchFull(seen)))
      }
      // the fixture must BITE at the hygiene stage across boundaries:
      // every late arrival on the already-seen url drops, and the hot
      // host saturates mid-stream so some streamed hot doc drops too
      val hygAll = ids(CurationPipeline.urlHygiene(seen, maxPerHost = cap))
      val lateDups = (110L until 200L).filter(_ % 10 == 7)
      assert(lateDups.nonEmpty && lateDups.forall(!hygAll.contains(_)),
        "later duplicates of a seen url must drop")
      val seenIds = ids(seen)
      val streamedHot = (110L until 200L)
        .filter(i => i % 10 != 7 && i % 3 == 0 && seenIds.contains(i))
      assert(streamedHot.exists(!hygAll.contains(_)),
        "the hot host must saturate during the stream, dropping a late doc")
      assert(streamedHot.exists(hygAll.contains),
        "the cap must fill partway through the stream, not before it")
      // url state advanced to the union-built state
      val unionUrl = IncrementalCuration.urlStateOf(seen)
      def rowSet(df: DataFrame) = df.collect().map(_.toSeq).toSet
      assert(rowSet(store.urlState.get.seenUrls) === rowSet(unionUrl.seenUrls))
      assert(rowSet(store.urlState.get.hostCounts) === rowSet(unionUrl.hostCounts))
      assert(rowSet(store.urlState.get.maxId.get) === rowSet(unionUrl.maxId.get))
    } finally q.stop()
  }

  test("persistent store runs the FULL journey: durable URL hygiene + dedup, reopened from disk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cap = 25
    // same URL fixture as the in-memory full-journey test above: one
    // shared canonical url crossing triggers, one hot host crossing
    // the cap mid-stream, unique urls elsewhere
    def withUrl(df: DataFrame) = df.withColumn("url",
      when(col("doc_id") % 10 === 7, lit("https://dup.example.com/same"))
        .when(col("doc_id") % 3 === 0,
          concat(lit("https://hot.example.com/p/"), col("doc_id")))
        .otherwise(concat(lit("https://h"), col("doc_id"),
          lit(".example.com/p/"), col("doc_id"))))
    def batchFull(all: DataFrame): DataFrame = {
      val hyg = CurationPipeline.urlHygiene(all, maxPerHost = cap)
      val gated = CurationPipeline.gate(CurationPipeline.score(hyg), 0.0)
      CurationPipeline.dedup(gated,
        CurationPipeline.nearDuplicatePairs(gated, threshold = threshold))
    }
    val root = java.nio.file.Files.createTempDirectory("graft_pstore_full").toString
    val d0 = withUrl(real(0, 60))
    val store = PersistentCurationStore.bootstrap(spark, root,
      IncrementalCuration.stateOf(
        CurationPipeline.urlHygiene(d0, maxPerHost = cap),
        minQuality = 0.0, dupThreshold = threshold),
      batchFull(d0),
      Some(IncrementalCuration.urlStateOf(d0)))
    val source = MemoryStream[(Long, String, String, String, Long, String)]
    val stream = source.toDF().toDF(d0.columns: _*)
    val q = StreamingCuration.attach(stream, store,
      minQuality = 0.0, dupThreshold = threshold, maxPerHost = cap,
      queryName = "pstore_full_journey_spec")
    try {
      def docRows(df: DataFrame) =
        df.as[(Long, String, String, String, Long, String)].collect().toIndexedSeq
      var seen = d0
      Seq(withUrl(real(110, 160)), withUrl(real(161, 200))).foreach { b =>
        source.addData(docRows(b))
        q.processAllAvailable()
        seen = seen.unionByName(b)
        assert(ids(store.survivors) === ids(batchFull(seen)))
      }
      // the durable url state, reopened from disk, equals the
      // union-built state — the append log stayed distinct and the
      // additive host deltas sum to the batch counts
      val reopened = new PersistentCurationStore(spark, root)
      assert(ids(reopened.survivors) === ids(batchFull(seen)))
      val unionUrl = IncrementalCuration.urlStateOf(seen)
      def rowSet(df: DataFrame) = df.collect().map(_.toSeq).toSet
      assert(rowSet(reopened.urlState.get.seenUrls) === rowSet(unionUrl.seenUrls))
      assert(rowSet(reopened.urlState.get.hostCounts) === rowSet(unionUrl.hostCounts))
      assert(rowSet(reopened.urlState.get.maxId.get) === rowSet(unionUrl.maxId.get))
      // compaction folds the url tables too
      reopened.compact(files = 2)
      assert(rowSet(reopened.urlState.get.seenUrls) === rowSet(unionUrl.seenUrls))
      assert(rowSet(reopened.urlState.get.hostCounts) === rowSet(unionUrl.hostCounts))
      assert(ids(reopened.survivors) === ids(batchFull(seen)))
    } finally q.stop()
  }

  test("persistent store: durable parity across triggers, reopened from disk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_pstore").toString
    val d0 = real(0, 60).unionByName(synth(Seq(100L -> t1, 101L -> t2)))
    val store = PersistentCurationStore.bootstrap(spark, root,
      IncrementalCuration.stateOf(d0, minQuality = 0.0, dupThreshold = threshold),
      batchSurvivors(d0))
    val source = MemoryStream[(Long, String, String, String, Long)]
    val stream = source.toDF().toDF(d0.columns: _*)
    val q = StreamingCuration.attach(stream, store,
      minQuality = 0.0, dupThreshold = threshold, queryName = "pstore_spec")
    try {
      def docRows(df: DataFrame) =
        df.as[(Long, String, String, String, Long)].collect().toIndexedSeq
      val batches = Seq(
        real(110, 160),
        real(161, 200).unionByName(synth(Seq(210L -> bridge))))
      var seen = d0
      batches.foreach { b =>
        source.addData(docRows(b))
        q.processAllAvailable()
        seen = seen.unionByName(b)
        assert(ids(store.survivors) === ids(batchSurvivors(seen)))
      }
      // the bridge retraction survives the append-log composition:
      // surv_adds \ revoked drops the bootstrap-emitted 101
      val fin = ids(store.survivors)
      assert(fin.contains(100L) && !fin.contains(101L) && !fin.contains(210L),
        s"bridge retraction missing from the durable logs: $fin")
      // REOPEN from disk — a fresh instance (restart) sees everything
      val reopened = new PersistentCurationStore(spark, root)
      assert(ids(reopened.survivors) === fin)
      val unionState = IncrementalCuration.stateOf(
        seen, minQuality = 0.0, dupThreshold = threshold)
      def rowSet(df: DataFrame) = df.collect().map(_.toSeq).toSet
      assert(rowSet(reopened.state.labels) === rowSet(unionState.labels))
      assert(rowSet(reopened.state.shingleIndex) === rowSet(unionState.shingleIndex))
      assert(rowSet(reopened.state.maxId.get) === rowSet(unionState.maxId.get))
      assert(rowSet(reopened.state.bands.get.bandKeys) ===
        rowSet(unionState.bands.get.bandKeys))
      assert(rowSet(reopened.state.bands.get.bucketCounts) ===
        rowSet(unionState.bands.get.bucketCounts))
      assert(rowSet(reopened.state.bands.get.sizes) ===
        rowSet(unionState.bands.get.sizes))
      // compaction folds files, not rows
      reopened.compact(files = 2)
      assert(ids(reopened.survivors) === fin)
      assert(rowSet(reopened.state.shingleIndex) === rowSet(unionState.shingleIndex))
    } finally q.stop()
  }
}
