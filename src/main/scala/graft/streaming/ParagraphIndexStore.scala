package graft.streaming

import graft.text.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Paragraph-level dedup at ingest with a GROWING stored hash index —
  * the [[CorpusIndexStore]] recipe applied to `Curation`'s Dolma-style
  * paragraph dedup: every micro-batch's documents lose any paragraph
  * already kept by the corpus (or by an earlier document of the same
  * batch), and the paragraphs they KEEP fold back into the stored
  * index — so a quote arriving five minutes after its original is
  * dropped even though neither was in the initial corpus, and the
  * corpus converges to one canonical copy per distinct paragraph under
  * any batch slicing.
  *
  * Storage layout (parquet under `path`, partitioned by
  * `ingest_batch`):
  *  - `paragraphs/` — `Curation.paragraphHashes` rows of every KEPT
  *    paragraph (narrow (id, idx, chars, hash))
  *  - `cleaned/` (idCol, n_paras, n_dropped, text) — the deduped
  *    corpus itself
  *
  * Idempotence / restart: identical to [[CorpusIndexStore]] — each
  * batch OVERWRITES its own `ingest_batch=<id>` partitions, the
  * membership check excludes the current batch id (a redelivered
  * batch sees the index as it stood before its first attempt), and
  * the checkpoint is store-owned by default so batch ids stay unique
  * for the store's lifetime.
  *
  * Scale shape per batch — the sharded-Bloom front is WIRED IN, like
  * [[SentenceIndexStore]] (the old direct
  * [[Curation.dedupParagraphsAgainst]] hash join re-SHUFFLED the
  * stored table every micro-batch — corpus-proportional network every
  * few seconds): [[Curation.dedupParagraphsAgainstSharded]] probes
  * the batch's DISTINCT paragraph hashes against the RAW sub-filter
  * table via the scan-probe (`blooms/`, one sub-filter table per
  * batch — [[Curation.paragraphBloomShards]]; hashes broadcast over
  * an in-place scan, one sketch deserialized per row, nothing
  * capacity-sized crossing an exchange), exactly confirms only the flagged MAYBEs against the
  * stored table via the pruned-IN / broadcast-semi-join confirm (the
  * stored side is scanned — row-group-pruned over the compacted
  * hash-sorted base — never shuffled), and runs the batch-internal
  * first-wins keeper at batch scale. Bloom filters have no false
  * negatives, so the result is identical to the exact join —
  * spec-pinned. The sharding is what survives 100 TB: a single
  * driver sketch caps out near 10⁹ stored paragraphs, the shard
  * TABLE is bounded only by the cluster. */
final class ParagraphIndexStore(spark: SparkSession, path: String,
    idCol: String = "doc_id", sep: String = "\n\n",
    minParaChars: Int = 1, bloomShardCount: Int = 32,
    bloomItemsPerShard: Long = 1L << 22, bloomFpp: Double = 0.01) {

  private val paraPath = s"$path/paragraphs"
  private val cleanedPath = s"$path/cleaned"
  private val bloomPath = s"$path/blooms"

  private def writeBloomShards(cleanedBatch: DataFrame,
      textCol: String, batchId: Long): Unit =
    Curation.paragraphBloomShards(
        Curation.paragraphHashes(cleanedBatch, textCol, idCol, sep)
          .where(col("para_chars") >= minParaChars),
        bloomShardCount,
        expectedItems = bloomItemsPerShard * bloomShardCount,
        fpp = bloomFpp)
      .write.mode("overwrite")
      .parquet(s"$bloomPath/ingest_batch=$batchId")

  /** Batch-build: corpus-wide [[Curation.dedupParagraphs]] seeds the
    * cleaned corpus; its kept paragraphs seed the index. Lands as
    * `ingest_batch=-1`, wiping prior state under `path`. */
  def initialize(corpus: DataFrame, textCol: String): Unit = {
    StorePaths.wipe(spark, Seq(paraPath, cleanedPath, bloomPath,
      s"$path/checkpoint"))
    val cleaned = Curation.dedupParagraphs(corpus, textCol, idCol,
      sep, minParaChars).localCheckpoint(false)
    cleaned.write.mode("overwrite")
      .parquet(s"$cleanedPath/ingest_batch=-1")
    Curation.paragraphHashes(cleaned, textCol, idCol, sep)
      .write.mode("overwrite").parquet(s"$paraPath/ingest_batch=-1")
    writeBloomShards(cleaned, textCol, batchId = -1L)
  }

  /** Kept-paragraph hash table across the base build and every folded
    * batch. */
  def paragraphTable: DataFrame =
    spark.read.parquet(paraPath).drop("ingest_batch")

  /** One merged Bloom filter PER SHARD over every kept paragraph so
    * far (base build + folded batches): the per-batch sub-filter
    * tables are bit-compatible by construction, so the merged view is
    * exactly the filter a monolithic rebuild would produce. Feed to
    * [[Curation.flagMaybeKnownParagraphsSharded]] with this store's
    * `bloomShardCount`. */
  def bloomShards: DataFrame =
    Curation.mergeBloomShards(bloomSubFilters)

  /** The RAW per-batch sub-filter table (multiple rows per shard) —
    * what the per-batch probe consumes directly; see
    * [[SentenceIndexStore.bloomSubFilters]]. */
  def bloomSubFilters: DataFrame =
    spark.read.parquet(bloomPath).drop("ingest_batch")

  /** The deduped corpus so far. */
  def cleaned: DataFrame =
    spark.read.parquet(cleanedPath).drop("ingest_batch")

  /** How many per-batch Bloom sub-filters the busiest shard holds —
    * grows by one per batch between compactions, and each is sized to
    * the store's full capacity (the bit-compatibility contract), so
    * the per-batch probe's sub-filter scan grows linearly with it.
    * See [[SentenceIndexStore.bloomSubFiltersPerShard]]; 0 before the
    * first batch, never throws. */
  def bloomSubFiltersPerShard: Long =
    StorePaths.bloomSubFiltersPerShard(spark, bloomPath)

  /** True once any shard's sub-filter count crosses `maxSubFilters` —
    * run [[compact]] (idle window, not mid-ingest) to fold the
    * per-batch filters into one and re-bound the per-batch probe's
    * sub-filter scan. */
  def needsCompaction(maxSubFilters: Int = 16): Boolean =
    bloomSubFiltersPerShard > maxSubFilters

  /** Start the growing ingest over a streaming (idCol, textCol)
    * frame. */
  def ingest(stream: DataFrame, textCol: String,
      checkpointLocation: Option[String] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, textCol, batchId)
      }
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$path/checkpoint"))
      .start()

  /** One micro-batch — package-visible so the spec can replay a batch
    * id and prove idempotence directly. */
  private[graft] def processBatch(batch: DataFrame,
      textCol: String, batchId: Long): Unit = {
    val notThisBatch = col("ingest_batch") =!= batchId
    val stored = spark.read.parquet(paraPath)
      .where(notThisBatch).drop("ingest_batch")
    // membership resolves through the sharded-Bloom front + pruned
    // exact confirm (the SentenceIndexStore shape): the old direct
    // dedupParagraphsAgainst hash-join re-SHUFFLED the stored side
    // every micro-batch — corpus-proportional network per batch. The
    // Bloom front has no false negatives, so output is identical
    // (spec-pinned); the stored table is scanned (pruned over the
    // compacted hash-sorted base), never shuffled.
    // RAW sub-filters, no merge pass (scan-probe any-row-hits ==
    // OR-merged semantics; merging would shuffle the filter table)
    val shardFilters = spark.read.parquet(bloomPath)
      .where(notThisBatch).drop("ingest_batch")
    val cleanedBatch = Curation.dedupParagraphsAgainstSharded(batch,
        stored, shardFilters, bloomShardCount, textCol, idCol, sep,
        minParaChars)
      .localCheckpoint(false) // feeds the fold-back AND the append
    Curation.paragraphHashes(cleanedBatch, textCol, idCol, sep)
      .write.mode("overwrite")
      .parquet(s"$paraPath/ingest_batch=$batchId")
    cleanedBatch.write.mode("overwrite")
      .parquet(s"$cleanedPath/ingest_batch=$batchId")
    // the batch's own sub-filter overwrites its partition too, so a
    // redelivered batch leaves the merged view unchanged
    writeBloomShards(cleanedBatch, textCol, batchId)
  }

  /** Maintenance compaction: fold every `ingest_batch=*` partition
    * into one base build — a long ingest otherwise degrades into
    * thousands of tiny partitions per table. The index and cleaned
    * tables are snapshotted to DURABLE parquet first (a
    * localCheckpoint-only copy would die with one executor between
    * the wipe and the rewrite), then land back as single
    * `ingest_batch=-1` partitions with shard filters rebuilt from
    * the snapshot hash table; membership and cleaned text are
    * exactly preserved, no dedup recomputation. The store-owned
    * checkpoint is KEPT (folding invalidates neither source offsets
    * nor batch numbering). Crash safety is the shared
    * [[StorePaths.compactStore]] protocol (see
    * [[SentenceIndexStore.compact]]): resume only when the base
    * build is missing; stale snapshots after a complete rewrite are
    * ignored, never rolled back onto later batches. */
  def compact(): Unit = compactImpl(None)

  /** Takedown deletion — remove every document whose id appears in
    * `ids` (a frame carrying the store's `idCol` column) from the
    * cleaned corpus AND its kept paragraphs from the index, under the
    * same snapshot protocol as [[compact]]; shard filters rebuild
    * from the filtered index. Semantics and crash-safety contract:
    * [[SentenceIndexStore.deleteIds]] at paragraph granularity. */
  def deleteIds(ids: DataFrame): Unit = {
    val del = ids.select(col(idCol)).distinct().localCheckpoint(true)
    compactImpl(Some(del))
  }

  private def compactImpl(del: Option[DataFrame]): Unit = {
    def drop(df: DataFrame): DataFrame =
      del.fold(df)(d => df.join(d, Seq(idCol), "left_anti"))
    StorePaths.compactStore(spark,
      Seq(
        // base sorted on para_hash — membership probes with a
        // pushable hash predicate prune row groups post-compaction
        StorePaths.CompactTable(() => drop(paragraphTable),
          s"$path/compact_tmp_paragraphs",
          s"$paraPath/ingest_batch=-1", sortCol = Some("para_hash")),
        StorePaths.CompactTable(() => drop(cleaned),
          s"$path/compact_tmp_cleaned",
          s"$cleanedPath/ingest_batch=-1")),
      // checkpoint KEPT — the [[SentenceIndexStore]] compactImpl
      // rationale: a wiped checkpoint + replayable source duplicates
      // doc rows and, post-deleteIds, resurrects taken-down docs
      Seq(paraPath, cleanedPath, bloomPath),
      pendingDeletion = del.isDefined) {
      reread =>
        Curation.paragraphBloomShards(
            reread.head.where(col("para_chars") >= minParaChars),
            bloomShardCount,
            expectedItems = bloomItemsPerShard * bloomShardCount,
            fpp = bloomFpp)
          .write.mode("overwrite")
          .parquet(s"$bloomPath/ingest_batch=-1")
    }
  }
}
