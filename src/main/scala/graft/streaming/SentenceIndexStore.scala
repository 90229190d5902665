package graft.streaming

import graft.text.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Sentence-level dedup at ingest with a GROWING stored hash index —
  * the [[ParagraphIndexStore]] recipe one granularity down, completing
  * the streaming half of the line/sentence/paragraph/document ladder:
  * every micro-batch's documents lose any sentence already kept by the
  * corpus (or by an earlier document of the same batch), and the
  * sentences they KEEP fold back into the stored index — a syndicated
  * lead sentence arriving five minutes after its original dies even
  * though neither was in the initial corpus, and the corpus converges
  * to one canonical copy per distinct sentence under any batch
  * slicing.
  *
  * Storage layout (parquet under `path`, partitioned by
  * `ingest_batch`):
  *  - `sentences/` — `Curation.sentenceHashes` rows of every KEPT
  *    sentence of at least `minSentChars` chars (narrow (id, idx,
  *    chars, hash); shorter sentences are never deduped, so they stay
  *    OUT of the index entirely — which also binds the store to its
  *    ingest `minSentChars`: probe with the same threshold)
  *  - `cleaned/` (idCol, n_sentences, n_dropped, text) — the deduped
  *    corpus itself
  *  - `blooms/` — one SHARDED Bloom sub-filter table per batch
  *    (`Curation.sentenceBloomShards`), grown alongside the index
  *
  * Idempotence / restart: identical to [[ParagraphIndexStore]] — each
  * batch OVERWRITES its own `ingest_batch=<id>` partitions and the
  * membership check excludes the current batch id, so a redelivered
  * batch sees the index as it stood before its first attempt.
  *
  * Scale shape per batch — the sharded-Bloom front is WIRED IN, not
  * advisory (at sentence granularity a 100 TB ingest stores 10-100×
  * more items than paragraphs, so probing the full stored table per
  * micro-batch is a corpus-proportional join every few seconds):
  * [[Curation.dedupSentencesAgainstWithIndexSharded]] probes the
  * batch's DISTINCT sentence hashes against the RAW sub-filter table
  * via the scan-probe (hashes broadcast over an in-place scan — the
  * capacity-sized filter bytes never cross an exchange; one shard's
  * sketch deserialized per row), exactly confirms only the flagged
  * MAYBEs against the stored table via the pruned-IN /
  * broadcast-semi-join confirm (the stored side is scanned —
  * row-group-pruned over the compacted hash-sorted base — never
  * shuffled), and runs the batch-internal first-wins keeper at batch
  * scale. Bloom filters
  * have no false negatives, so the result is identical to the exact
  * join — spec-pinned. The fold-back writes batch-scale rows
  * (index + cleaned + the batch's own bloom sub-filter). Nothing
  * corpus-proportional is recomputed or shuffled per batch.
  *
  * Growth: every batch adds one parquet partition to each of the
  * three tables; a long-running ingest degrades into thousands of
  * tiny `ingest_batch=*` directories. [[compact]] folds all of them
  * into a fresh base build — WITHOUT re-running segmentation on the
  * rebuilt text (re-segmenting REBUILT text is non-invertible and
  * would corrupt the index — the dedupSentencesWithIndex lesson);
  * compaction snapshots the index and cleaned tables to durable
  * parquet, wipes the store, and lands both back as `ingest_batch=-1`
  * with freshly built shard filters. Membership is exactly
  * preserved. */
final class SentenceIndexStore(spark: SparkSession, path: String,
    idCol: String = "doc_id", minSentChars: Int = 1,
    bloomShardCount: Int = 32, bloomItemsPerShard: Long = 1L << 22,
    bloomFpp: Double = 0.01) {

  private val sentPath = s"$path/sentences"
  private val cleanedPath = s"$path/cleaned"
  private val bloomPath = s"$path/blooms"

  private def writeBloomShards(kept: DataFrame, batchId: Long): Unit =
    Curation.sentenceBloomShards(kept, bloomShardCount,
        expectedItems = bloomItemsPerShard * bloomShardCount,
        fpp = bloomFpp)
      .write.mode("overwrite")
      .parquet(s"$bloomPath/ingest_batch=$batchId")

  /** Batch-build: corpus-wide [[Curation.dedupSentencesWithIndex]]
    * seeds the cleaned corpus AND the index from one computation.
    * The index is the KEEPER DECISION's kept sentences — never a
    * re-segmentation of rebuilt text, which is not invertible
    * (rejoined sentences can merge across the no./st.-digit
    * protection and store one hash for two kept sentences, breaking
    * convergence — see dedupSentencesWithIndex). Lands as
    * `ingest_batch=-1`, wiping prior state under `path`. */
  def initialize(corpus: DataFrame, textCol: String): Unit = {
    StorePaths.wipe(spark, Seq(sentPath, cleanedPath, bloomPath,
      s"$path/checkpoint"))
    val (cleaned, kept) = Curation.dedupSentencesWithIndex(corpus,
      textCol, idCol, minSentChars)
    cleaned.write.mode("overwrite")
      .parquet(s"$cleanedPath/ingest_batch=-1")
    val keptOut = kept.localCheckpoint(false) // feeds index + blooms
    keptOut.write.mode("overwrite")
      .parquet(s"$sentPath/ingest_batch=-1")
    writeBloomShards(keptOut, batchId = -1L)
  }

  /** Kept-sentence hash table across the base build and every folded
    * batch. */
  def sentenceTable: DataFrame =
    spark.read.parquet(sentPath).drop("ingest_batch")

  /** One merged Bloom filter PER SHARD over every kept sentence so
    * far — the per-batch sub-filters are bit-compatible by
    * construction ([[Curation.mergeBloomShards]] contract). */
  def bloomShards: DataFrame =
    Curation.mergeBloomShards(bloomSubFilters)

  /** The RAW per-batch sub-filter table (multiple rows per shard) —
    * what the per-batch probe consumes directly: the scan-probe
    * ([[Curation.flagMaybeKnownHashes]]) needs no merged view, so the
    * capacity-sized filter bytes never cross an exchange per batch. */
  def bloomSubFilters: DataFrame =
    spark.read.parquet(bloomPath).drop("ingest_batch")

  /** How many per-batch Bloom SUB-FILTERS the busiest shard holds.
    * Every ingested batch adds one sub-filter per shard, and each is
    * sized to the store's FULL capacity (uniform sizing keeps the
    * sub-filters bit-compatible), so bloom storage — and the
    * per-batch probe's scan + per-row deserialization over the
    * sub-filter table — grow LINEARLY with the batch count between
    * compactions, ~`bloomItemsPerShard × bloomShardCount ×
    * 1.2 bytes` per batch at the 1% default fpp (a local read, no
    * shuffle, since the scan-probe rework — but still linear I/O).
    * [[compact]] folds them back to one sub-filter per shard;
    * [[needsCompaction]] is the cadence check. */
  def bloomSubFiltersPerShard: Long =
    StorePaths.bloomSubFiltersPerShard(spark, bloomPath)

  /** True once any shard's sub-filter count crosses `maxSubFilters` —
    * run [[compact]] (idle window, not mid-ingest) to fold the
    * per-batch filters into one and re-bound the per-batch probe's
    * sub-filter scan. The default keeps the per-batch filter read
    * under ~16× one filter's size; long-running ingests should check
    * this every few hundred batches. */
  def needsCompaction(maxSubFilters: Int = 16): Boolean =
    bloomSubFiltersPerShard > maxSubFilters

  /** The deduped corpus so far. */
  def cleaned: DataFrame =
    spark.read.parquet(cleanedPath).drop("ingest_batch")

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
  private[streaming] def processBatch(batch: DataFrame,
      textCol: String, batchId: Long): Unit = {
    val notThisBatch = col("ingest_batch") =!= batchId
    val stored = spark.read.parquet(sentPath)
      .where(notThisBatch).drop("ingest_batch")
    // RAW sub-filters, no merge pass: the scan-probe's any-row-hits
    // probe keeps the OR-merge's no-false-negative guarantee (the
    // bit-union could only add false positives), and merging would
    // shuffle the capacity-sized filter table every batch
    val shardFilters = spark.read.parquet(bloomPath)
      .where(notThisBatch).drop("ingest_batch")
    // cleaned text + kept-sentence index from ONE keeper computation
    // (re-segmenting the rebuilt text would merge sentences across
    // suppressed boundaries and corrupt the index — scaladoc above);
    // membership resolves through the sharded-Bloom front, exact
    // result guaranteed by the no-false-negative property
    val (cleanedBatch, kept) =
      Curation.dedupSentencesAgainstWithIndexSharded(batch, stored,
        shardFilters, bloomShardCount, textCol, idCol, minSentChars)
    val keptOut = kept.localCheckpoint(false) // feeds index + blooms
    keptOut.write.mode("overwrite")
      .parquet(s"$sentPath/ingest_batch=$batchId")
    cleanedBatch.write.mode("overwrite")
      .parquet(s"$cleanedPath/ingest_batch=$batchId")
    // the batch's own sub-filter overwrites its partition too, so a
    // redelivered batch leaves the merged view unchanged
    writeBloomShards(keptOut, batchId)
  }

  /** Maintenance compaction: fold every `ingest_batch=*` partition
    * into one fresh base build. UNLIKE [[CorpusIndexStore.compact]]
    * this must NOT re-run the dedup on the cleaned text — sentence
    * rebuilds are non-invertible to re-segment (class doc) — so the
    * INDEX and CLEANED tables are snapshotted as-is to durable
    * parquet (a localCheckpoint-only copy would die with one executor
    * between the wipe and the rewrite), the store is wiped, and both
    * land back as single `ingest_batch=-1` partitions with shard
    * filters rebuilt from the snapshot. Membership and cleaned text
    * are exactly preserved; the store-owned checkpoint is KEPT
    * (folding invalidates neither source offsets nor batch
    * numbering — see the wipe-paths note in `compactImpl`).
    *
    * CRASH SAFETY — the [[StorePaths.compactStore]] protocol, shared
    * with [[ParagraphIndexStore]]: the snapshots are the recovery
    * artifact (deleted only after the rewrite), resume fires ONLY
    * when the base build is actually missing, and stale snapshots
    * surviving a crash AFTER a complete rewrite are ignored rather
    * than rolled back onto batches ingested since. Crash → call
    * compact() again; spec-pinned incl. the stale-snapshot case. */
  def compact(): Unit = compactImpl(None)

  /** Takedown deletion — remove every document whose id appears in
    * `ids` (a frame carrying the store's `idCol` column) from the
    * cleaned corpus AND its kept sentences from the index, under the
    * SAME snapshot protocol as [[compact]] (deletion IS a compaction
    * with an anti-join; crash-resume restores the already-filtered
    * snapshot). Shard filters rebuild from the filtered index, so
    * membership forgets the deleted sentences too: a sentence whose
    * only keeper was deleted will be KEPT anew on next arrival — the
    * correct post-takedown semantics (the content left the corpus;
    * the store must not silently suppress its future copies on the
    * evidence of a row it no longer holds). */
  def deleteIds(ids: DataFrame): Unit = {
    // eager pin at deletion scale — consumed inside both snapshot
    // closures after reads of the live store begin
    val del = ids.select(col(idCol)).distinct().localCheckpoint(true)
    compactImpl(Some(del))
  }

  private def compactImpl(del: Option[DataFrame]): Unit = {
    def drop(df: DataFrame): DataFrame =
      del.fold(df)(d => df.join(d, Seq(idCol), "left_anti"))
    StorePaths.compactStore(spark,
      Seq(
        // the index base lands RANGE-PARTITIONED AND SORTED on
        // sent_hash: every file/row group covers a disjoint hash
        // range, so the per-batch exact-confirm probe (a pushable
        // IN over the batch's maybe-known hashes —
        // Curation.dedupSentencesAgainstWithIndexSharded) prunes
        // parquet row groups via min/max stats instead of reading
        // the whole index per micro-batch
        StorePaths.CompactTable(() => drop(sentenceTable),
          s"$path/compact_tmp_sentences",
          s"$sentPath/ingest_batch=-1", sortCol = Some("sent_hash")),
        StorePaths.CompactTable(() => drop(cleaned),
          s"$path/compact_tmp_cleaned",
          s"$cleanedPath/ingest_batch=-1")),
      // the store-owned checkpoint is KEPT (only initialize wipes
      // it): folding batches into the base changes neither source
      // offsets nor batch numbering, and a wiped checkpoint on a
      // replayable source re-delivers every historical offset — at
      // best duplicate doc rows in `cleaned` (membership strips the
      // CONTENT but each replayed doc still lands a row), and after
      // deleteIds it silently RESURRECTS the taken-down documents
      // (membership deliberately forgot them, so nothing stops the
      // replayed copy)
      Seq(sentPath, cleanedPath, bloomPath),
      pendingDeletion = del.isDefined) {
      reread => writeBloomShards(reread.head, batchId = -1L)
    }
  }
}
