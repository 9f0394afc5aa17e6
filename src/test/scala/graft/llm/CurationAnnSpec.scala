package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 curation additions: SemDeDup (cluster-local semantic
  * dedup), product-quantization ANN, and bloom-filter
  * decontamination. Cross-engine value parity is pinned by the DuckDB
  * oracles (`q_emb_semdedup`, `q_emb_pq_ann`, `q_doc_bloom_decontam`);
  * these specs pin the algebraic properties the oracles can't state.
  */
class CurationAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f, 0f)),          // exact dup of 1
    (3L, Array(0f, 1f, 0f, 0f)),          // orthogonal to 1/2
    (4L, Array(0.999f, 0.05f, 0f, 0f)),   // near-dup of 1
    (5L, Array(0f, 0f, 1f, 0f))
  ).toDF("vec_id", "embedding")

  test("semDeDup drops larger-id near-duplicates, keeps singletons") {
    val r = Similarity.semDeDup(vecs, "vec_id", "embedding",
        threshold = 0.95, nCells = 3)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r.size === 5)
    assert(r(1), "smallest id of the duplicate group is kept")
    assert(!r(2), "exact duplicate with larger id is dropped")
    assert(r(3), "orthogonal vector is kept")
    assert(r(5), "singleton is kept")
  }

  test("semDeDup keeps at least one vector per cell") {
    val byCell = Similarity.semDeDup(vecs, "vec_id", "embedding",
        threshold = 0.5, nCells = 2)
      .groupBy($"cell").agg(sum(when($"keep", 1).otherwise(0)).as("kept"))
      .collect()
    assert(byCell.nonEmpty)
    assert(byCell.forall(_.getLong(1) >= 1L))
  }

  private def pqCorpus = Seq(
    (10L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
    (11L, Array(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)),
    (12L, Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f)),
    (13L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0.1f, 0f)), // near 10
    (14L, Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f))
  ).toDF("vec_id", "embedding")

  test("pq encode: M codes per vector, all within the codebook") {
    val k = 4
    val enc = Pq.encode(pqCorpus, "vec_id", "embedding", m = 2, subDim = 4, k = k)
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(enc.size === 5)
    assert(enc.values.forall(_.size === 2))
    assert(enc.values.forall(_.forall(c => c >= 0 && c < k)))
  }

  test("pq adc: a vector's nearest encoded neighbor is its near-twin") {
    val top = Pq.topKAdc(pqCorpus, pqCorpus.filter($"vec_id" === 10L),
        "vec_id", "embedding", kNeighbors = 1, dim = 8, m = 2, k = 5)
      .collect()
    assert(top.length === 1)
    assert(top.head.getLong(1) === 13L,
      "vector 13 differs from 10 only by 0.1 in one dim — ADC must rank it first")
  }

  test("pq adc on codebook-sized corpus reproduces exact distances") {
    // When every corpus vector IS a codebook entry, encoding is
    // lossless and ADC == exact squared L2 (mod the DECIMAL sum).
    val exact = pqCorpus.as("a").crossJoin(pqCorpus.as("b"))
      .filter($"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("q"), $"b.vec_id".as("n"),
        round(Pq.l2sq($"a.embedding", $"b.embedding"), 6).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val adc = Pq.topKAdc(pqCorpus, pqCorpus, "vec_id", "embedding",
        kNeighbors = 4, dim = 8, m = 2, k = 5)
      .collect()
    assert(adc.nonEmpty)
    adc.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getDouble(3) - exact(key)) < 1e-6,
        s"ADC distance for $key diverges from exact")
    }
  }

  private def twoBlobs = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f)),
    (3L, Array(1.1f, -0.1f, 0f, 0f)),
    (4L, Array(0f, 0f, 1f, 0f)),
    (5L, Array(0f, 0.1f, 0.9f, 0f)),
    (6L, Array(0f, -0.1f, 1.1f, 0f))
  ).toDF("vec_id", "embedding")

  test("kmeans separates two blobs into two clusters") {
    val (cents, asg) = KMeansLite.fit(twoBlobs, "vec_id", "embedding", k = 2, iters = 2)
    val byId = asg.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId.size === 6)
    assert(Set(byId(1L), byId(2L), byId(3L)).size === 1, "blob A splits clusters")
    assert(Set(byId(4L), byId(5L), byId(6L)).size === 1, "blob B splits clusters")
    assert(byId(1L) !== byId(4L), "both blobs collapsed into one cluster")
    assert(cents.count() === 2)
  }

  test("kmeans centroid update is the exact member mean") {
    val (cents, asg) = KMeansLite.fit(twoBlobs, "vec_id", "embedding", k = 2, iters = 2)
    val byId = asg.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val c = cents.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // blob A = vectors 1..3; its centroid's dim-0 mean is (1+0.9+1.1)/3 = 1.0
    val blobACluster = byId(1L)
    assert(math.abs(c(blobACluster)(0) - 1.0) < 1e-6)
    assert(math.abs(c(blobACluster)(2) - 0.0) < 1e-6)
  }

  test("kmeans float codebook round-trips the serving shape") {
    val (cents, _) = KMeansLite.fit(twoBlobs, "vec_id", "embedding", k = 2, iters = 2)
    val fc = KMeansLite.asFloatCodebook(cents)
    assert(fc.columns.toSeq === Seq("cell", "__cent"))
    val rows = fc.collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getSeq[Float](1).size === 4))
  }

  test("trained-codebook ivf searches within the trained cells") {
    val (cents, _) = KMeansLite.fit(twoBlobs, "vec_id", "embedding", k = 2, iters = 2)
    val r = Similarity.topKCosineIvfTrained(twoBlobs, twoBlobs,
        "vec_id", "embedding", k = 2, KMeansLite.asFloatCodebook(cents))
      .collect()
    assert(r.nonEmpty)
    val blobA = Set(1L, 2L, 3L)
    r.foreach { row =>
      val (q, n) = (row.getLong(0), row.getLong(1))
      assert(blobA.contains(q) === blobA.contains(n),
        s"query $q matched neighbor $n across the blob boundary — cells leaked")
    }
  }

  test("sharder: two-level rank equals the single-window deal order") {
    val docs = (1L to 97L).map(i => (i, Seq.fill((i % 13).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Sharder.assign(docs, "doc_id", "text", nShards = 4,
        bandWidth = 5L, bucketSize = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // reference: plain per-band round-robin in doc_id order
    val expected = docs.collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
      .groupBy { case (_, n) => n / 5 }.toSeq
      .flatMap { case (_, members) =>
        members.sortBy(_._1).zipWithIndex.map { case ((id, _), i) => id -> (i % 4).toLong }
      }
    expected.foreach { case (id, s) =>
      assert(got(id) === s, s"doc $id dealt to ${got(id)}, single-window order says $s")
    }
  }

  test("sharder: every band deals each shard the same doc count, within one") {
    val docs = (1L to 500L).map(i => (i, Seq.fill((i % 37).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val perBandShard = Sharder.assign(docs, "doc_id", "text", nShards = 4, bandWidth = 8L)
      .groupBy($"band", $"shard").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bands = perBandShard.keySet.map(_._1)
    assert(bands.nonEmpty)
    bands.foreach { b =>
      val counts = (0L until 4L).map(s => perBandShard.getOrElse((b, s), 0L))
      assert(counts.max - counts.min <= 1L,
        s"band $b deals unevenly across shards: $counts")
    }
    // and the resulting token totals land close to perfectly even
    val totals = Sharder.shardStats(
        Sharder.assign(docs, "doc_id", "text", nShards = 4, bandWidth = 8L))
      .collect().map(_.getLong(2))
    assert(totals.max - totals.min < totals.sum / 4 / 5,
      s"shard token totals drifted past 20% of the mean: ${totals.toSeq}")
  }

  test("temperature mixing: alpha<1 favors rare sources, alpha=1 is proportional") {
    val docs = ((1L to 400L).map(i => (i, "common")) ++
        (401L to 440L).map(i => (i, "rare")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    def keptBySource(alpha: Double) =
      Mixer.temperatureSample(docs, "doc_id", "source", alpha, targetFrac = 0.5)
        .groupBy($"source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
    val flat = keptBySource(0.3)
    assert(flat("rare").toDouble / 40 > flat("common").toDouble / 400,
      s"alpha=0.3 must up-sample the rare source: $flat")
    val prop = keptBySource(1.0)
    // alpha=1: every source keeps targetFrac in expectation; md5
    // sampling concentrates tightly at these counts
    assert(math.abs(prop("common").toDouble / 400 - 0.5) < 0.15, s"got $prop")
    assert((prop("common") + prop("rare")).toDouble / 440 > 0.3)
  }

  test("unigram viterbi: maximum-likelihood split beats char-by-char") {
    val lp = Map("s" -> -3.0, "i" -> -3.0, "n" -> -3.0, "g" -> -3.0, "ing" -> -2.5)
    assert(Unigram.segmentWord("singing", lp, maxLen = 4)
      === IndexedSeq("s", "ing", "ing"))
  }

  test("unigram viterbi: exact ties prefer the longer piece") {
    val lp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(Unigram.segmentWord("ab", lp, maxLen = 4) === IndexedSeq("ab"))
  }

  test("unigram vocab: full single-char coverage, bounded multis, normalized logp") {
    val docs = Seq((1L, "banana band banana"), (2L, "bandana banana")).toDF("doc_id", "text")
    val v = Unigram.vocab(docs, "text", topMulti = 5, maxLen = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    Set("b", "a", "n", "d").foreach(c => assert(v.contains(c), s"single '$c' missing"))
    assert(v.count(_._1.length > 1) <= 5)
    assert(v.contains("ana"), "most frequent trigram must survive the top-k cut")
    assert(v.values.forall(_ < 0.0), "log-probs of a normalized vocab are negative")
  }

  test("unigram segments: pieces concatenate back to each word") {
    val docs = Seq((1L, "banana band banana"), (2L, "bandana banana")).toDF("doc_id", "text")
    val rejoined = Unigram.segments(docs, "doc_id", "text", topMulti = 5, maxLen = 3)
      .groupBy($"doc_id", $"word_idx")
      .agg(concat_ws("", array_sort(collect_list(struct($"piece_idx", $"piece")))
        .getField("piece")).as("word"))
      .collect().map(_.getString(2)).sorted
    assert(rejoined === Array("banana", "banana", "banana", "band", "bandana").sorted)
  }

  test("pca: top component is unit norm and aligns with the dominant axis") {
    val vecs = (1 to 40).map { k =>
      (k.toLong, Array.tabulate(8)(d =>
        if (d == 0) (k % 7).toFloat else (k % 3) * 0.1f))
    }.toDF("vec_id", "embedding")
    val rows = Pca.topComponent(vecs, "embedding", dim = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows.size === 8)
    val norm = math.sqrt(rows.values.map { case (_, pc) => pc * pc }.sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"pc not unit norm: $norm")
    assert(math.abs(rows(0L)._2) > 0.9,
      s"dominant-variance axis not found: pc=${rows.toSeq.sortBy(_._1)}")
    // mean of dim 0: (1%7 + 2%7 + ... + 40%7)/40
    val expectedMu = (1 to 40).map(_ % 7).sum / 40.0
    assert(math.abs(rows(0L)._1 - expectedMu) < 1e-5)
  }

  private def benchDocs = Seq(
    (100L, "alpha beta gamma delta epsilon zeta eta theta")
  ).toDF("bench_id", "text")

  private def corpusDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // contains bench 5-grams
    (2L, "totally different words with no benchmark overlap at all"),
    (3L, "prefix words then alpha beta gamma delta epsilon more")
  ).toDF("doc_id", "text")

  test("bloom: every exactly-contaminated doc is flagged (no false negatives)") {
    val bm = Bloom.buildBitmap(benchDocs, "text", n = 5, mBits = 1 << 12)
    val flags = Bloom.contaminationFlags(corpusDocs, "doc_id", "text", bm,
        n = 5, mBits = 1 << 12)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val exact = Decontaminate.overlaps(corpusDocs, "doc_id", "text",
        benchDocs, "bench_id", "text", n = 5, minOverlap = 1)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(exact.contains(1L) && exact.contains(3L))
    exact.foreach(id => assert(flags(id), s"doc $id overlaps exactly but bloom missed it"))
  }

  test("bloom: bitmap construction is deterministic and bounded") {
    val bm1 = Bloom.buildBitmap(benchDocs, "text", n = 5, mBits = 1 << 12)
    val bm2 = Bloom.buildBitmap(benchDocs, "text", n = 5, mBits = 1 << 12)
    assert(bm1.length === (1 << 12) / 64)
    assert(bm1.toSeq === bm2.toSeq)
    assert(bm1.exists(_ != 0L), "benchmark n-grams must set bits")
  }

  test("bloom: membership is exact for hashes that were inserted") {
    val bm = Bloom.buildBitmap(benchDocs, "text", n = 5, mBits = 1 << 12)
    val hit = benchDocs
      .select(explode(Shingles.shingles(Shingles.tokens($"text"), 5)).as("s"))
      .select(Bloom.mightContain(TextHash.polyHash($"s"), bm, 1 << 12).as("hit"))
      .collect()
    assert(hit.nonEmpty)
    assert(hit.forall(_.getBoolean(0)))
  }
}
