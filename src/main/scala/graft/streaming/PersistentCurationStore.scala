package graft.streaming

import graft.api.IncrementalCuration
import graft.api.IncrementalCuration.State
import graft.core.CacheScope
import graft.llm.{Guards, Jaccard, MinHash, Urls}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The DURABLE twin of [[StreamingCuration.CurationStore]]: the
  * journey's state lives at `root` as at-rest parquet, and each
  * micro-batch advances it with write I/O proportional to the BATCH
  * for every table — a log-structured layout where the only
  * corpus-sized I/O is the scheduled [[compact]].
  *
  * == Layout ==
  *
  * Every table is a set of data directories `\<table\>/g{G}_a{N}`
  * (generation G, trigger epoch N) plus a commit log under
  * `_commits/`:
  *
  *  - a marker file `_commits/\<N\>` (content: the foreachBatch
  *    batchId that produced it) makes trigger N visible — readers
  *    only ever see directories with N ≤ the max marker, so a crash
  *    anywhere inside [[advance]] leaves the previous trigger as the
  *    consistent state (uncommitted `a{N}` directories are invisible
  *    garbage, overwritten by the replay);
  *  - a marker `_commits/gen_\<table\>_{G}` makes compaction
  *    generation G current — [[compact]] writes the folded table into
  *    a NEW generation's directories before bumping the marker, so a
  *    compaction crash never loses data (the old generation serves
  *    until the marker lands; stale generations are GC'd later).
  *
  * == Per-table write rule (all increment-sized per trigger) ==
  *
  *  - `index` (id, h), `bandkeys` (id, band, key), `sizes` (id, sz),
  *    `surv_adds`, `revoked` — pure APPEND of the increment's own
  *    rows (disjoint ids ⇒ disjoint rows);
  *  - `labels` — a LAST-WINS delta log: trigger N writes only the
  *    [[graft.llm.DedupClusters.LabelUpdate.delta]] (changed + new
  *    rows — increment-sized); reads resolve base ∖ delta-nodes ∪
  *    latest-delta-per-node with one broadcast anti-join map pass
  *    over the base (never a corpus shuffle). [[compact]] folds the
  *    log into a new base CLUSTERED BY COMPONENT — the componentDelta
  *    store recipe: the full label table is rewritten only at
  *    compaction cadence, never per trigger;
  *  - `bucketcounts` — an ADDITIVE delta log: trigger N appends the
  *    increment's per-(band, key) counts; reads resolve
  *    base + Σdeltas with broadcast joins (two map passes over the
  *    base, no shuffle);
  *  - `maxid` — last-wins (read the newest committed directory).
  *
  * == Idempotency (at-least-once foreachBatch) ==
  *
  * A crash or task retry replays the current micro-batch. [[advance]]
  * compares the incoming batchId against the one recorded in the
  * newest commit marker: a replay of an already-committed trigger is
  * SKIPPED (otherwise its appends would land twice, silently
  * inflating exact-Jaccard intersections); a replay of a trigger that
  * crashed before its marker re-runs and OVERWRITES the partial
  * `a{N}` directories. Negative batchIds (direct non-stream callers)
  * never skip. The protection assumes one batchId sequence per store
  * root — reattaching an UNCHECKPOINTED stream to an existing root
  * restarts batchIds at 0 and must use a fresh root; [[advance]] now
  * fails fast when a non-negative batchId is BEHIND the newest
  * committed one (batchIds are monotone within one sequence), turning
  * that misuse into an error instead of a silent double-append.
  *
  * == Single writer process ==
  *
  * [[advance]]/[[compact]] are `synchronized` per INSTANCE only: the
  * design assumes exactly one writer JVM per store root at a time. Do
  * NOT run an external compaction cron against a root a live stream
  * is writing — `gcStaleGenerations` in one process can delete
  * directories the other is mid-write, and concurrent commits can
  * interleave epochs. Schedule compaction from the writer process
  * (e.g. inside foreachBatch every N triggers).
  *
  * == Readers ==
  *
  * Reads reconstruct everything from disk, so a new instance over the
  * same `root` (a restart, another application) sees the full journey
  * state. [[advance]] never deletes or rewrites a committed
  * directory, so a DataFrame obtained from [[state]]/[[survivors]]
  * stays valid — and keeps seeing its own consistent snapshot —
  * across later triggers (spec-pinned). Only [[compact]] deletes
  * data directories; plans held across a compaction may fail and
  * must be re-read.
  *
  * `survivors` = `surv_adds` anti-join `revoked`: a revoked doc never
  * re-survives (min-label keep rule), so the two append-only logs
  * compose to exactly the retraction-correct accumulated set.
  *
  * Scope: the dedup journey ([[IncrementalCuration.step]]), plus —
  * when bootstrapped with a [[IncrementalCuration.UrlState]] — the
  * pre-hygiene URL stage by the same recipe: `seenurls` is a pure
  * append log (each trigger writes only its FRESH canonical URLs,
  * resolved by one broadcast semi-join map pass over the at-rest
  * set), `hostcounts` an additive delta log keyed by host, and the
  * id watermark is one shared `maxid` table guarding both stages.
  *
  * Append erosion: every trigger adds one directory (few small
  * files) per table, and the labels/bucketcounts resolution
  * broadcasts grow with the deltas since the last fold — run
  * [[compact]] on a cadence (the loop any log-structured store
  * schedules; [[fileStats]] is the erosion telemetry to drive it). */
final class PersistentCurationStore(spark: SparkSession, root: String)
    extends StreamingCuration.JourneyStore {
  import PersistentCurationStore._

  private val log = new Layout(spark, root)

  def state: State = State(
    log.appendRead("index"),
    log.labelsRead(),
    Some(log.maxIdRead()),
    Some(MinHash.BandIndex(
      log.appendRead("bandkeys"),
      log.bucketCountsRead(),
      log.appendRead("sizes"))))

  def survivors: DataFrame =
    log.appendRead("surv_adds")
      .join(log.appendRead("revoked"), Seq("doc_id"), "left_anti")

  /** The at-rest crawl-hygiene state, when the store was bootstrapped
    * with one ([[bootstrap]]'s `urlState`): `seenUrls` is a pure
    * append log of each trigger's FRESH canonical URLs (so the union
    * stays distinct by construction), `hostCounts` an additive delta
    * log keyed by host, and the watermark is SHARED with the dedup
    * state (one `maxid` table guards both stages). `None` when the
    * store scopes the bare dedup journey. */
  def urlState: Option[IncrementalCuration.UrlState] =
    if (!log.hasTable("seenurls")) None
    else Some(IncrementalCuration.UrlState(
      log.appendRead("seenurls"),
      log.additiveRead("hostcounts", Seq("host"), "n_seen"),
      Some(log.maxIdRead())))

  /** One trigger (public — a daily-batch cron job calls this directly;
    * a stream drives it through [[StreamingCuration.attach]]). When
    * the store carries URL state, the batch flows through incremental
    * URL hygiene (first-crawl-wins dedup against the at-rest seen set,
    * then the per-host cap against the at-rest counts) BEFORE
    * score/gate/dedup, exactly like the batch composition
    * `urlHygiene → run`; otherwise `maxPerHost` is unused. The host
    * counts resolve increment-keyed; the seen-set anti-join still
    * SHUFFLES the at-rest `seenurls` append log when it outgrows the
    * broadcast threshold (it is stored as plain appended parquet, not
    * bucketed by canonical_url — the known residual, see Urls.scala's
    * bucketing prescription for the at-scale layout). `batchId ≥ 0` enables replay skipping (see the
    * idempotency section of the class doc). */
  def advance(
      batch: DataFrame,
      minQuality: Double = 0.5,
      dupThreshold: Double = 0.8,
      maxBucket: Option[Int] = Some(10000),
      maxPerHost: Int = 10000,
      batchId: Long = -1L): Unit = synchronized {
    val committed = log.committedEpoch
    if (batchId >= 0L && log.committedBatchId.contains(batchId)) return // replay
    // batchIds are monotone within one stream's lifetime, so a LOWER id
    // than the newest committed one means a different (uncheckpointed)
    // stream re-attached to this root and restarted at 0 — the exact
    // double-append corruption the replay skip exists to prevent. Fail
    // fast instead of silently appending the whole history again.
    log.committedBatchId.filter(c => batchId >= 0L && batchId < c).foreach { c =>
      throw new IllegalStateException(
        s"batchId $batchId is behind the newest committed batchId $c for this " +
          "store root: reattaching a fresh (uncheckpointed) stream to an " +
          "existing root would silently double-append; use the original " +
          "checkpoint or a new root")
    }
    val epoch = committed + 1
    val st = state // resolves at `committed`; immune to the writes below
    val scope = new CacheScope
    try {
      val hygienic = urlState match {
        case Some(u) =>
          // survivors mirror IncrementalCuration.urlHygieneStep; the
          // STATE updates are the store's delta-log rules instead of
          // the in-memory corpus-sized union/distinct re-aggregates
          val deduped = scope.persist(Urls
            .dedupByUrlIncremental(batch, "doc_id", "url", u.seenUrls, u.maxId)
            .drop("host", "canonical_url"))
          // fresh canonical URLs only (keeps the append log distinct):
          // one broadcast semi-join map pass over the at-rest set
          // resolves which batch URLs are already seen — the at-rest
          // side is never shuffled
          val newUrls = Urls.seenUrls(batch, "url")
          val inStore = u.seenUrls.toDF("canonical_url")
            .join(Guards.broadcastBounded(newUrls), Seq("canonical_url"), "left_semi")
          log.write("seenurls", epoch,
            newUrls.join(Guards.broadcastBounded(inStore),
              Seq("canonical_url"), "left_anti"))
          // additive per-host delta of the URL-DEDUPED stream (the
          // batch composition's intermediate — what hostCap ranks over)
          log.write("hostcounts", epoch, Urls.hostSeenCounts(deduped, "url"))
          Urls.hostCapIncremental(deduped, "doc_id", "url", maxPerHost,
            u.hostCounts, u.maxId)
        case None => batch
      }
      val res = IncrementalCuration.stepDetailed(
        hygienic, st, minQuality, dupThreshold, maxBucket, scope)
      // every write below targets the NEW epoch's directories, so the
      // lazy plans reading ≤ `committed` stay consistent throughout —
      // no defensive materialization needed (the step's internal
      // persists already collapse the fan-out)
      val survCols = log.appendRead("surv_adds").columns
      log.write("surv_adds", epoch, res.survivors.select(survCols.map(col): _*))
      log.write("revoked", epoch, res.revoked)
      // the label DELTA (changed + new rows) — the full merged table
      // (res.nextState.labels) is corpus-sized and is exactly what
      // this layout exists to never write per trigger
      log.write("labels", epoch, res.update.delta(st.labels))
      val newIndex = scope.persist(
        MinHash.shingleIndex(res.gated, "doc_id", "text"))
      log.write("index", epoch, newIndex)
      val nbk = scope.persist(MinHash.indexBandKeys(newIndex, "doc_id"))
      log.write("bandkeys", epoch, nbk)
      log.write("sizes", epoch, Jaccard.indexSizes(newIndex, "doc_id"))
      log.write("bucketcounts", epoch, MinHash.bandBucketCounts(nbk))
      // the watermark advances over the RAW batch (not the hygiene
      // survivors): monotone ids are a property of arrival order, and
      // a dropped max-id doc must still move the guard forward
      log.write("maxid", epoch, st.maxId.get
        .unionByName(Urls.idWatermark(batch, "doc_id"))
        .agg(max(col("max_id")).as("max_id")))
      log.commit(epoch, batchId) // the atomic point: trigger N is now visible
    } finally scope.unpersistAll() // precise lifecycle — never clearCache
  }

  /** Fold each table's accumulated directories into one new-GENERATION
    * directory of `files` clustered parquet files (index by (id, h)
    * and sizes by id — the verify stage's serve keys; bandkeys/
    * bucketcounts by (band, key); labels by COMPONENT, making the
    * folded base the component-clustered table the delta recipe
    * prescribes). Corpus-sized I/O by design — schedule it, don't run
    * it per trigger.
    *
    * Crash-safe by generations: the fold WRITES into `g{G+1}_a{C}`
    * directories while the old generation keeps serving, then bumps
    * the per-table generation markers, then deletes the old
    * directories — a failure at any point leaves a complete
    * generation serving (no executor-memory materialization is
    * involved, unlike an in-place overwrite). Concurrent readers
    * holding pre-compact plans can hit deleted files once the old
    * generation is GC'd — re-read after a compaction. */
  def compact(files: Int = 32): Unit = synchronized {
    val epoch = log.committedEpoch
    log.gcStaleGenerations() // leftovers from a previously crashed compact
    val urlFolds: Seq[(String, DataFrame, Seq[Column])] =
      if (!log.hasTable("seenurls")) Seq.empty
      else Seq(
        ("seenurls", log.appendRead("seenurls"), Seq(col("canonical_url"))),
        ("hostcounts", log.additiveRead("hostcounts", Seq("host"), "n_seen"),
          Seq(col("host"))))
    val folded: Seq[(String, DataFrame, Seq[Column])] = Seq(
      ("index", log.appendRead("index"), Seq(col("doc_id"), col("h"))),
      ("bandkeys", log.appendRead("bandkeys"), Seq(col("band"), col("key"))),
      ("sizes", log.appendRead("sizes"), Seq(col("doc_id"))),
      ("surv_adds", log.appendRead("surv_adds"), Seq(col("doc_id"))),
      ("revoked", log.appendRead("revoked"), Seq(col("doc_id"))),
      ("labels", log.labelsRead(), Seq(col("component"))),
      ("bucketcounts", log.bucketCountsRead(), Seq(col("band"), col("key"))),
      ("maxid", log.maxIdRead(), Seq(col("max_id")))) ++ urlFolds
    val nextGen = folded.map { case (t, df, keys) =>
      val g = log.generation(t) + 1
      df.repartitionByRange(files, keys: _*)
        .sortWithinPartitions(keys: _*)
        .write.mode("overwrite").parquet(log.dataDir(t, g, epoch))
      t -> g
    }
    nextGen.foreach { case (t, g) => log.bumpGeneration(t, g) }
    log.gcStaleGenerations()
  }

  /** Erosion telemetry: per table, the number of committed data
    * directories, parquet files, and total bytes — what a production
    * scheduler reads to decide when [[compact]] is due (directory and
    * file counts grow per trigger; the labels/bucketcounts delta
    * resolution also deepens with directory count). */
  def fileStats: Seq[TableStats] = log.fileStats
}

object PersistentCurationStore {

  private[streaming] val Tables = Seq(
    "index", "bandkeys", "sizes", "surv_adds", "revoked",
    "labels", "bucketcounts", "maxid")

  /** Present only when the store carries crawl-hygiene state. */
  private[streaming] val UrlTables = Seq("seenurls", "hostcounts")

  final case class TableStats(table: String, dirs: Int, files: Int, bytes: Long)

  /** Initialize `root` from a bootstrap batch run: the [[State]]
    * (bands REQUIRED — [[IncrementalCuration.stateOf]] carries them)
    * and its survivor set, written as generation-0 epoch-0 bases and
    * committed. Pass `urlState = Some(urlStateOf(...))` to run the
    * FULL durable journey — every subsequent [[PersistentCurationStore
    * .advance]] then applies incremental URL hygiene before the dedup
    * step (its watermark is ignored: the store shares one `maxid`
    * table between the stages). */
  def bootstrap(
      spark: SparkSession,
      root: String,
      state: State,
      survivors: DataFrame,
      urlState: Option[IncrementalCuration.UrlState] = None): PersistentCurationStore = {
    val bands = state.bands.getOrElse(throw new IllegalArgumentException(
      "PersistentCurationStore needs the banded side-tables; build the " +
        "state with IncrementalCuration.stateOf (bands = Some(...))"))
    val log = new Layout(spark, root)
    // persist the shingle index for the DURATION of the bootstrap
    // writes: bandkeys/bucketcounts/sizes all embed its plan (stateOf
    // derives them from it), and without the cache each table write
    // re-runs the full score→gate→tokenize corpus pipeline — measured
    // at the sf1 store soak as ~8 corpus passes for one bootstrap
    val scope = new CacheScope
    try {
      scope.persist(state.shingleIndex)
      urlState.foreach { u =>
        log.write("seenurls", 0L, u.seenUrls)
        log.write("hostcounts", 0L, u.hostCounts)
      }
      bootstrapWrites(log, state, bands, survivors) // commits epoch 0 last
    } finally scope.unpersistAll(blocking = true) // free BEFORE the first trigger's jobs
    new PersistentCurationStore(spark, root)
  }

  private def bootstrapWrites(
      log: Layout,
      state: State,
      bands: MinHash.BandIndex,
      survivors: DataFrame): Unit = {
    log.write("index", 0L, state.shingleIndex)
    log.write("bandkeys", 0L, bands.bandKeys)
    log.write("sizes", 0L, bands.sizes)
    log.write("surv_adds", 0L, survivors)
    log.write("revoked", 0L, survivors.select(col("doc_id")).limit(0))
    log.write("labels", 0L, state.labels)
    log.write("bucketcounts", 0L, bands.bucketCounts)
    log.write("maxid", 0L, state.maxId.getOrElse(throw new IllegalArgumentException(
      "PersistentCurationStore needs the id watermark (stateOf carries it)")))
    log.commit(0L, -1L)
  }

  /** The commit-log + directory mechanics shared by every table. */
  private[streaming] final class Layout(spark: SparkSession, root: String) {
    private def fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def commitsDir = new Path(s"$root/_commits")

    private def markerNames: Seq[String] = {
      if (!fs.exists(commitsDir)) return Seq.empty
      fs.listStatus(commitsDir).toSeq.map(_.getPath.getName)
        .filterNot(_.startsWith("."))
    }

    /** The newest committed trigger epoch (−1 before bootstrap). */
    def committedEpoch: Long =
      markerNames.filter(_.forall(_.isDigit)).map(_.toLong)
        .foldLeft(-1L)(math.max)

    /** The batchId recorded in the newest commit marker. */
    def committedBatchId: Option[Long] = {
      val e = committedEpoch
      if (e < 0L) None
      else {
        val in = fs.open(new Path(commitsDir, e.toString))
        try {
          val s = scala.io.Source.fromInputStream(in).mkString.trim
          if (s.isEmpty) None else Some(s.toLong)
        } finally in.close()
      }
    }

    /** Write marker `epoch` (content: batchId) via create-then-rename
      * so a half-written marker is never visible. */
    def commit(epoch: Long, batchId: Long): Unit = {
      fs.mkdirs(commitsDir)
      val tmp = new Path(commitsDir, s".tmp_$epoch")
      val out = fs.create(tmp, true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      val dst = new Path(commitsDir, epoch.toString)
      // the rename IS the atomic commit point: a false return (dest
      // exists, FS quirk, concurrent writer) must surface as a
      // retryable error — returning success here would let the stream
      // checkpoint advance past a trigger whose data stays invisible
      require(fs.rename(tmp, dst), s"commit rename failed for $dst")
    }

    /** Current compaction generation of `table` (0 until first fold). */
    def generation(table: String): Long =
      markerNames.collect {
        case n if n.startsWith(s"gen_${table}_") => n.drop(s"gen_${table}_".length)
      }.filter(s => s.nonEmpty && s.forall(_.isDigit)).map(_.toLong)
        .foldLeft(0L)(math.max)

    def bumpGeneration(table: String, g: Long): Unit = {
      fs.mkdirs(commitsDir)
      val tmp = new Path(commitsDir, s".tmp_gen_${table}_$g")
      val out = fs.create(tmp, true)
      try out.write("1".getBytes("UTF-8")) finally out.close()
      val dst = new Path(commitsDir, s"gen_${table}_$g")
      require(fs.rename(tmp, dst), s"generation-bump rename failed for $dst")
    }

    def dataDir(table: String, gen: Long, epoch: Long): String =
      s"$root/$table/g${gen}_a$epoch"

    /** Committed data directories of `table`'s current generation,
      * as (epoch, path), unsorted. */
    def committedDirs(table: String): Seq[(Long, Path)] = {
      val c = committedEpoch
      val g = generation(table)
      val dir = new Path(s"$root/$table")
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.filter(_.isDirectory)
        .map(_.getPath)
        .flatMap { p =>
          p.getName match {
            case s if s.startsWith(s"g${g}_a") =>
              val n = s.drop(s"g${g}_a".length)
              if (n.nonEmpty && n.forall(_.isDigit) && n.toLong <= c)
                Some(n.toLong -> p)
              else None
            case _ => None
          }
        }
    }

    def write(table: String, epoch: Long, df: DataFrame): Unit =
      df.write.mode("overwrite")
        .parquet(dataDir(table, generation(table), epoch))

    /** Union of all committed directories — the append tables. */
    def appendRead(table: String): DataFrame = {
      val ds = committedDirs(table)
      require(ds.nonEmpty, s"no committed data under $root/$table — bootstrap first")
      spark.read.parquet(ds.map(_._2.toString): _*)
    }

    /** Last-wins delta-log resolution for `labels`: the oldest
      * directory is the base; newer directories are increment-sized
      * deltas, resolved latest-epoch-per-node, then merged with ONE
      * broadcast anti-join map pass over the base. */
    def labelsRead(): DataFrame = {
      val ds = committedDirs("labels").sortBy(_._1)
      require(ds.nonEmpty, s"no committed data under $root/labels — bootstrap first")
      val base = spark.read.parquet(ds.head._2.toString)
      if (ds.sizeIs == 1) base
      else {
        val tagged = ds.tail.map { case (n, p) =>
          spark.read.parquet(p.toString).select(col("node"),
            struct(lit(n).as("__e"), col("component").as("__c")).as("__m"))
        }.reduce(_ unionByName _)
        val resolved = tagged.groupBy(col("node")).agg(max(col("__m")).as("__m"))
          .select(col("node"), col("__m").getField("__c").as("component"))
        base
          .join(Guards.broadcastBounded(resolved.select(col("node"))),
            Seq("node"), "left_anti")
          .unionByName(resolved)
      }
    }

    def bucketCountsRead(): DataFrame =
      additiveRead("bucketcounts", Seq("band", "key"), "n")

    /** Additive delta-log resolution (bucketcounts, hostcounts):
      * totals = base + Σdeltas per key with two broadcast-join map
      * passes over the base (matched keys add; unmatched delta keys
      * append) — the base is never shuffled. */
    def additiveRead(table: String, keys: Seq[String], valueCol: String): DataFrame = {
      val ds = committedDirs(table).sortBy(_._1)
      require(ds.nonEmpty, s"no committed data under $root/$table — bootstrap first")
      val base = spark.read.parquet(ds.head._2.toString)
      if (ds.sizeIs == 1) base
      else {
        val kc = keys.map(col)
        val dsum = ds.tail.map(p => spark.read.parquet(p._2.toString))
          .reduce(_ unionByName _)
          .groupBy(kc: _*).agg(sum(col(valueCol)).as("__dn"))
        val merged = base
          .join(Guards.broadcastBounded(dsum), keys, "left")
          .select(kc :+
            (col(valueCol) + coalesce(col("__dn"), lit(0L))).as(valueCol): _*)
        val inBase = base
          .join(Guards.broadcastBounded(dsum.select(kc: _*)), keys, "left_semi")
          .select(kc: _*)
        val fresh = dsum
          .join(Guards.broadcastBounded(inBase), keys, "left_anti")
          .select(kc :+ col("__dn").as(valueCol): _*)
        merged.unionByName(fresh)
      }
    }

    /** Whether `table` has any committed data (the URL tables exist
      * only when the store was bootstrapped with a [[IncrementalCuration
      * .UrlState]]). */
    def hasTable(table: String): Boolean = committedDirs(table).nonEmpty

    /** Last-wins single-row table: read only the newest directory. */
    def maxIdRead(): DataFrame = {
      val ds = committedDirs("maxid")
      require(ds.nonEmpty, s"no committed data under $root/maxid — bootstrap first")
      spark.read.parquet(ds.maxBy(_._1)._2.toString)
    }

    /** Delete data directories from superseded generations (and any
      * ABANDONED newer-generation directories a crashed compact left
      * behind — their markers never landed). */
    def gcStaleGenerations(): Unit = (Tables ++ UrlTables).foreach { t =>
      val g = generation(t)
      val dir = new Path(s"$root/$t")
      if (fs.exists(dir))
        fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath)
          .foreach { p =>
            val name = p.getName
            if (name.startsWith("g") && !name.startsWith(s"g${g}_a"))
              fs.delete(p, true)
          }
    }

    def fileStats: Seq[TableStats] =
      (Tables ++ UrlTables.filter(hasTable)).map { t =>
        val ds = committedDirs(t)
        val files = ds.flatMap(d => fs.listStatus(d._2).toSeq)
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        TableStats(t, ds.size, files.size, files.map(_.getLen).sum)
      }
  }
}
