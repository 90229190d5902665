package graft.streaming

import graft.text.Urls
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** URL-level dedup at ingest with a GROWING stored canonical-URL
  * index — the [[CorpusIndexStore]] recipe at the cheapest
  * granularity there is: a crawl firehose re-delivers the same page
  * under scheme/case/port/tracking variants, and dropping those by
  * canonical URL BEFORE any content hashing removes whole documents
  * for the cost of one string expression + one narrow equi-join per
  * micro-batch.
  *
  * Storage layout (parquet under `path`, partitioned by
  * `ingest_batch`):
  *  - `urls/` — one row per ACCEPTED canonical URL (canonical_url)
  *  - `accepted/` — the surviving documents (all input columns +
  *    canonical_url)
  *
  * Idempotence / restart: the [[CorpusIndexStore]] contract — each
  * batch OVERWRITES its own `ingest_batch=<id>` partitions and the
  * membership check excludes the current batch id, so a redelivered
  * batch sees the index exactly as before its first attempt.
  *
  * Per batch: canonicalization is a pure row expression; batch-
  * internal first-wins is one batch-scale min groupBy; the corpus
  * check probes the batch's DISTINCT canonicals against the stored
  * table via the pruned-IN exact confirm (stored side SCANNED —
  * row-group-pruned over the compacted url-sorted base — never
  * shuffled; the old direct left join re-shuffled the corpus-scale
  * url table every micro-batch), with the batch-scale known set
  * broadcast into the anti filter. Rows whose URL doesn't
  * canonicalize (null/scheme-less) are always accepted and never
  * indexed. */
final class UrlIndexStore(spark: SparkSession, path: String,
    idCol: String = "doc_id", urlCol: String = "url",
    trackingParams: Seq[String] = Urls.DefaultTrackingParams) {

  private val urlsPath = s"$path/urls"
  private val acceptedPath = s"$path/accepted"

  /** Batch-build: URL-dedup the seed corpus ([[Urls
    * .dedupByCanonicalUrl]] keepers); accepted rows and their
    * canonicals land as `ingest_batch=-1`, wiping prior state. */
  def initialize(corpus: DataFrame): Unit = {
    StorePaths.wipe(spark, Seq(urlsPath, acceptedPath,
      s"$path/checkpoint"))
    val kept = Urls.dedupByCanonicalUrl(corpus, urlCol, idCol,
        trackingParams)
      .where(!col("is_url_dup"))
      .drop("is_url_dup", "url_domain")
      .localCheckpoint(false)
    kept.write.mode("overwrite")
      .parquet(s"$acceptedPath/ingest_batch=-1")
    kept.select(col("canonical_url"))
      .where(col("canonical_url").isNotNull).distinct()
      .write.mode("overwrite").parquet(s"$urlsPath/ingest_batch=-1")
  }

  /** Canonical URLs accepted so far (base build + every batch). */
  def urlTable: DataFrame =
    spark.read.parquet(urlsPath).drop("ingest_batch")

  /** The URL-deduped corpus so far. */
  def accepted: DataFrame =
    spark.read.parquet(acceptedPath).drop("ingest_batch")

  /** How many `ingest_batch=*` partitions the url index holds — one
    * per ingested batch plus the base build. The URL store has no
    * bloom artifact, so its compaction pressure IS partition
    * accretion: every per-batch membership confirm opens every
    * partition's files, and thousands of tiny directories turn the
    * row-group-pruned scan into an open()-bound crawl. */
  def ingestBatchCount: Long =
    StorePaths.ingestBatchCount(spark, urlsPath)

  /** True once the partition count crosses `maxBatches` — run
    * [[compact]] in an idle window (never mid-ingest: it wipes and
    * rewrites the tables an in-flight batch reads) to fold
    * everything into one url-sorted base. The default bounds the per-batch confirm at
    * ~64 directory opens; tune by batch cadence vs. available idle
    * windows — the [[SentenceIndexStore.needsCompaction]] contract at
    * this store's granularity. */
  def needsCompaction(maxBatches: Int = 64): Boolean =
    ingestBatchCount > maxBatches

  /** Start the growing ingest over a streaming frame carrying
    * (idCol, urlCol, …payload). */
  def ingest(stream: DataFrame,
      checkpointLocation: Option[String] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$path/checkpoint"))
      .start()

  /** One micro-batch — package-visible so the spec can replay a
    * batch id and prove idempotence. */
  private[streaming] def processBatch(batch: DataFrame,
      batchId: Long): Unit = {
    val stored = spark.read.parquet(urlsPath)
      .where(col("ingest_batch") =!= batchId).drop("ingest_batch")
    // batch-internal first-wins; barriered because BOTH the probe
    // (eager) and the membership anti-join consume it
    val deduped = Urls.dedupByCanonicalUrl(batch, urlCol, idCol,
        trackingParams)
      .where(!col("is_url_dup"))
      .drop("is_url_dup", "url_domain")
      .localCheckpoint(false)
    // corpus membership via the pruned-IN confirm (the sentence/
    // paragraph stores' exact-confirm shape, no bloom needed — the
    // batch's distinct canonicals ARE the probe set): the old direct
    // left join re-SHUFFLED the stored url table every micro-batch;
    // now the stored side is scanned (row-group-pruned over the
    // compacted url-sorted base) and only the batch-scale known set
    // re-enters the plan, broadcast into the anti filter
    val batchUrls = deduped.select(col("canonical_url"))
      .where(col("canonical_url").isNotNull).distinct()
    val (known0, knownLocal) = graft.text.Curation
      .confirmKnownStringsImpl(
        stored.select(col("canonical_url")), "canonical_url",
        batchUrls)
    val known = known0.withColumn("known_", lit(1))
    // broadcast only the batch-scale confirmed set; the over-cap
    // fallback's confirmed frame is corpus-scale and distributed —
    // force-broadcasting it would rebuild the driver-memory hazard
    // the collect cap exists to remove
    val joinedKnown =
      if (knownLocal) deduped.join(broadcast(known),
        Seq("canonical_url"), "left")
      else deduped.join(known, Seq("canonical_url"), "left")
    val kept = joinedKnown
      .where(col("canonical_url").isNull || col("known_").isNull)
      .drop("known_")
      .localCheckpoint(false) // feeds the fold-back AND the append
    kept.write.mode("overwrite")
      .parquet(s"$acceptedPath/ingest_batch=$batchId")
    kept.select(col("canonical_url"))
      .where(col("canonical_url").isNotNull).distinct()
      .write.mode("overwrite")
      .parquet(s"$urlsPath/ingest_batch=$batchId")
  }

  /** Maintenance compaction — the shared
    * [[StorePaths.compactStore]] protocol (see
    * [[SentenceIndexStore.compact]]): a long ingest degrades into one
    * tiny `ingest_batch=*` partition per batch; fold everything into
    * a fresh base build with crash-resume and stale-snapshot
    * protection. Membership and accepted rows exactly preserved; no
    * re-canonicalization (the stored tables are already the derived
    * artifacts). */
  def compact(): Unit = compactImpl(None)

  /** Takedown deletion — remove every accepted row whose id appears
    * in `ids` (a frame carrying the store's `idCol` column), AND the
    * canonical urls those rows owned from the url index, under the
    * same snapshot protocol as [[compact]]. Dropping the canonicals
    * is the takedown-correct half: the membership evidence for a
    * deleted document must not keep rejecting future submissions of
    * its URL (the page may return, legitimately, after the disputed
    * content changed). Crash-resume restores the already-filtered
    * snapshots. */
  def deleteIds(ids: DataFrame): Unit = {
    // eager pins at deletion scale: both frames are consumed inside
    // the snapshot closures, and the canonicals read the LIVE
    // accepted table — which the protocol later wipes
    val del = ids.select(col(idCol)).distinct().localCheckpoint(true)
    val delUrls = accepted.join(del, Seq(idCol), "left_semi")
      .select(col("canonical_url"))
      .where(col("canonical_url").isNotNull).distinct()
      .localCheckpoint(true)
    compactImpl(Some((del, delUrls)))
  }

  private def compactImpl(del: Option[(DataFrame, DataFrame)]): Unit =
    StorePaths.compactStore(spark,
      Seq(
        // base sorted on canonical_url — equality probes against the
        // url set prune row groups via min/max string stats
        StorePaths.CompactTable(
          () => del.fold(urlTable) { case (_, u) =>
            urlTable.join(u, Seq("canonical_url"), "left_anti") },
          s"$path/compact_tmp_urls",
          s"$urlsPath/ingest_batch=-1",
          sortCol = Some("canonical_url")),
        StorePaths.CompactTable(
          () => del.fold(accepted) { case (d, _) =>
            accepted.join(d, Seq(idCol), "left_anti") },
          s"$path/compact_tmp_accepted",
          s"$acceptedPath/ingest_batch=-1")),
      // checkpoint KEPT — the [[SentenceIndexStore]] compactImpl
      // rationale: a wiped checkpoint + replayable source duplicates
      // accepted rows and, post-deleteIds, resurrects taken-down urls
      Seq(urlsPath, acceptedPath),
      pendingDeletion = del.isDefined) { _ => () }
}
